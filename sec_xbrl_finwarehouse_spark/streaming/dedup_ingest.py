"""Streaming corpus builder: exactly-once document ingest with
incremental near-dup dedup against a STORED MinHash index.

This is the composition a production training-data pipeline actually
runs at the ingest edge: documents arrive as a stream, each micro-batch
is deduped against everything already accepted (plans/
incremental_dedup.py -- batch-sized cost, corpus-sized never), and only
novel documents land in the corpus table, with their signatures
appended to the index so the NEXT batch dedups against them too.

Delivery semantics (the same foreachBatch at-least-once problem
streaming/stream_sink.py solves, with one extra twist -- THREE tables
must stay mutually consistent):

* every write is an :func:`~..sinks.append_if_absent` into a versioned
  stored table, so each is STRUCTURALLY idempotent (a replayed batch's
  keys already exist; zero rows land);
* each table additionally carries the ``(app_id, batch_id)`` watermark
  of stream_sink, so a fully-committed batch replays as a metadata
  no-op without re-running the dedup plan;
* a crash BETWEEN the three appends leaves them inconsistent until the
  replay -- and the replay heals it, because the incremental dedup is
  replay-safe by construction: the candidate cross-join requires
  ``stored_id < new_id`` and the verifier anti-joins the batch's ids
  out of the stored shingles (see dedup_incremental_frames), so a
  batch whose signatures already landed re-dedups to the SAME keep
  set, and the append-if-absent writes converge. Net effect of any
  crash/retry sequence equals exactly-once across all three tables.

Write order (corpus -> bands -> shingles) puts the user-visible table
first: after any single failure the corpus never lags the index.

Scale shape per batch: signature computation is batch-sized; candidate
generation joins batch bands against the stored band table (at 100 TB
the index tables are bucketed by doc_id so these are co-located joins);
verification touches only candidate docs' shingle rows. The corpus
table itself is never scanned by the dedup path -- only the index.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import sinks
from ..plans.incremental_dedup import dedup_incremental_frames, incremental_keep
from ..plans.text_queries import minhash_bands_of, shingles_exploded_of
from .stream_sink import _already_committed, _txn_meta

BANDS_SCHEMA = "doc_id long, band int, bh long"
SHINGLES_SCHEMA = "doc_id long, shingle string"


def _stored_or_empty(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """The stored table's current version, or an empty frame with the
    index schema before the first batch ever commits."""
    if sinks.current_data_dir(path) is None:
        return spark.createDataFrame([], schema)
    return sinks.read_table(spark, path)


def foreach_batch_dedup_ingest(
    corpus_path: str,
    bands_path: str,
    shingles_path: str,
    app_id: str,
) -> Callable[[DataFrame, int], None]:
    """Build the ``foreachBatch`` function: dedup each (doc_id, text)
    micro-batch against the stored index, append only novel docs to the
    corpus table and their signatures to the index tables.

    Usage::

        (docs.writeStream
            .foreachBatch(foreach_batch_dedup_ingest(
                corpus, bands, shingles, app_id="docs-ingest-v1"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start())

    New doc_ids must be disjoint from previously-ingested ids and
    monotone across batches (the incremental-dedup contract; ingest
    sequence numbers give this for free).

    Concurrency: one logical stream per (corpus, index) tuple — the
    single-writer contract of the underlying versioned sinks. The
    per-batch hot-set conf toggle below is session-scoped, so a second
    UNRELATED stream sharing the SparkSession would observe it
    mid-batch; run concurrent streams in separate sessions (standard
    Structured Streaming deployment shape anyway).
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        paths = (corpus_path, bands_path, shingles_path)
        if all(_already_committed(p, app_id, batch_id) for p in paths):
            return  # fully-committed replay: metadata no-op
        spark = batch_df.sparkSession
        # disable the verifier's hot-set persist for the batch: each
        # persist() registers a CacheManager entry that only an explicit
        # unpersist frees, so a long-running stream would leak one
        # cached shingle set PER MICRO-BATCH (the exact long-lived-
        # session leak class embedding_queries' LSH path documents).
        # With the candidate-restricted verifier the recompute the
        # persist would save is candidate-sized -- not worth the entry.
        prior = spark.conf.get("spark.finwarehouse.hotSetStorageLevel", None)
        spark.conf.set("spark.finwarehouse.hotSetStorageLevel", "NONE")
        try:
            old_bands = _stored_or_empty(spark, bands_path, BANDS_SCHEMA)
            old_ex = _stored_or_empty(spark, shingles_path, SHINGLES_SCHEMA)
            pairs = dedup_incremental_frames(batch_df, old_bands, old_ex)
            # eager localCheckpoint: the dedup plan (band self-joins +
            # Jaccard verification) runs ONCE here; the three append
            # jobs below read the batch-sized checkpointed ids instead
            # of re-executing the whole dedup per job. Checkpoint
            # blocks are reclaimed by the ContextCleaner when the frame
            # is garbage-collected after the batch -- unlike a persist,
            # nothing needs an explicit unpersist (same lifecycle idiom
            # as operators/connected_components.py's iteration frames).
            kept_ids = (
                incremental_keep(batch_df, pairs)
                .filter(F.col("keep"))
                .select("doc_id")
                .localCheckpoint()
            )
            kept_docs = batch_df.join(F.broadcast(kept_ids), "doc_id")
            kept_ex = shingles_exploded_of(kept_docs)
            txn = _txn_meta(app_id, batch_id)
            sinks.append_if_absent(
                spark, corpus_path, kept_docs, ["doc_id"],
                audit=False, manifest_extra=txn,
            )
            sinks.append_if_absent(
                spark, bands_path, minhash_bands_of(kept_ex),
                ["doc_id", "band"], audit=False, manifest_extra=txn,
            )
            sinks.append_if_absent(
                spark, shingles_path, kept_ex,
                ["doc_id", "shingle"], audit=False, manifest_extra=txn,
            )
        finally:
            if prior is None:
                spark.conf.unset("spark.finwarehouse.hotSetStorageLevel")
            else:
                spark.conf.set("spark.finwarehouse.hotSetStorageLevel", prior)

    return _sink

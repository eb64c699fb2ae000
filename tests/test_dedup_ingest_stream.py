"""Streaming dedup ingest: exactly-once corpus building against the
stored MinHash index.

Covers the composition's claims:

* end-to-end: a two-micro-batch document stream lands exactly the
  from-scratch keep set in the corpus table, with the index tables
  holding signatures for exactly the kept docs;
* fully-committed replay is a metadata no-op (no new versions);
* crash healing: a failure BETWEEN the corpus append and the index
  appends leaves the three tables inconsistent, and the replay
  converges them to the same state as a crash-free run (the
  ``stored_id < new_id`` + anti-join replay-safety of
  dedup_incremental_frames).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sec_xbrl_finwarehouse_spark import sinks
from sec_xbrl_finwarehouse_spark.streaming import dedup_ingest
from sec_xbrl_finwarehouse_spark.streaming.dedup_ingest import (
    foreach_batch_dedup_ingest,
)

BASE = [f"w{i}" for i in range(40)]

BATCH0 = [
    (0, " ".join(BASE)),
    (1, " ".join(f"x{i}" for i in range(40))),
    (2, " ".join(f"y{i}" for i in range(40))),
]
BATCH1 = [
    (10, " ".join(BASE[:36] + ["n1", "n2", "n3", "n4"])),  # near-dup of 0
    (11, " ".join(f"z{i}" for i in range(40))),            # novel
    (12, " ".join(f"z{i}" for i in range(36)) + " q1 q2 q3 q4"),  # dup of 11
]
KEPT = {0, 1, 2, 11}


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _paths(tmp_path):
    return (str(tmp_path / "corpus"), str(tmp_path / "bands"),
            str(tmp_path / "shingles"))


def _run_stream(spark, tmp_path, sink_fn):
    src = tmp_path / "doc_src"
    src.mkdir()
    for i, rows in enumerate([BATCH0, BATCH1]):
        _docs(spark, rows).coalesce(1).write.parquet(
            str(src / f"batch_{i}.parquet")
        )
    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*/")
        .writeStream.foreachBatch(sink_fn)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within 120 s"


def _assert_converged(spark, corpus, bands, shingles):
    stored = {r["doc_id"] for r in
              sinks.read_table(spark, corpus).select("doc_id").collect()}
    assert stored == KEPT
    assert {r["doc_id"] for r in sinks.read_table(spark, bands)
            .select("doc_id").distinct().collect()} == KEPT
    assert {r["doc_id"] for r in sinks.read_table(spark, shingles)
            .select("doc_id").distinct().collect()} == KEPT


def test_stream_lands_from_scratch_keep_set(spark, tmp_path):
    corpus, bands, shingles = _paths(tmp_path)
    _run_stream(spark, tmp_path, foreach_batch_dedup_ingest(
        corpus, bands, shingles, app_id="docs-v1"))
    _assert_converged(spark, corpus, bands, shingles)
    # the kept near-dup survivors carry their original text
    texts = {r["doc_id"]: r["text"] for r in
             sinks.read_table(spark, corpus).collect()}
    assert texts[0] == " ".join(BASE)


def test_fully_committed_replay_is_metadata_noop(spark, tmp_path):
    corpus, bands, shingles = _paths(tmp_path)
    sink = foreach_batch_dedup_ingest(corpus, bands, shingles, app_id="docs-v1")
    sink(_docs(spark, BATCH0), 0)
    sink(_docs(spark, BATCH1), 1)
    versions = [sinks.current_data_dir(p) for p in (corpus, bands, shingles)]
    sink(_docs(spark, BATCH1), 1)  # replay of a fully-committed batch
    assert [sinks.current_data_dir(p)
            for p in (corpus, bands, shingles)] == versions
    _assert_converged(spark, corpus, bands, shingles)


def test_crash_between_appends_heals_on_replay(spark, tmp_path, monkeypatch):
    """Kill the sink after the corpus append of batch 1 (bands/shingles
    never land), then replay batch 1: the re-run must converge all
    three tables to the crash-free state."""
    corpus, bands, shingles = _paths(tmp_path)
    sink = foreach_batch_dedup_ingest(corpus, bands, shingles, app_id="docs-v1")
    sink(_docs(spark, BATCH0), 0)

    real_append = sinks.append_if_absent
    calls = {"n": 0}

    def exploding_append(spark_, path, incoming, keys, **kw):
        calls["n"] += 1
        if calls["n"] == 2:  # the bands write of batch 1
            raise RuntimeError("injected crash between appends")
        return real_append(spark_, path, incoming, keys, **kw)

    monkeypatch.setattr(dedup_ingest.sinks, "append_if_absent",
                        exploding_append)
    with pytest.raises(RuntimeError, match="injected crash"):
        sink(_docs(spark, BATCH1), 1)
    monkeypatch.setattr(dedup_ingest.sinks, "append_if_absent", real_append)

    # corpus is ahead of the index now; the replay must heal, not skip
    # and not double anything
    sink(_docs(spark, BATCH1), 1)
    _assert_converged(spark, corpus, bands, shingles)


def test_crash_after_index_append_heals_on_replay(spark, tmp_path, monkeypatch):
    """The other interleaving: batch signatures land in BOTH index
    tables but the shingle write crashes the publish of the corpus...
    here, the corpus lands FIRST by construction, so simulate the
    worst healing case directly: pre-append batch 1's signatures to the
    index (as if a prior replay died after the index writes were
    re-ordered by a future edit), then run the sink. The replay-safe
    dedup must still keep exactly the from-scratch set — batch docs
    must NOT be dropped as duplicates of their own stored signatures."""
    corpus, bands, shingles = _paths(tmp_path)
    sink = foreach_batch_dedup_ingest(corpus, bands, shingles, app_id="docs-v1")
    sink(_docs(spark, BATCH0), 0)

    from sec_xbrl_finwarehouse_spark.plans.incremental_dedup import (
        dedup_incremental_frames,
        incremental_keep,
    )
    from sec_xbrl_finwarehouse_spark.plans.text_queries import (
        minhash_bands_of,
        shingles_exploded_of,
    )

    batch = _docs(spark, BATCH1)
    old_bands = sinks.read_table(spark, bands)
    old_ex = sinks.read_table(spark, shingles)
    pairs = dedup_incremental_frames(batch, old_bands, old_ex)
    kept = incremental_keep(batch, pairs).filter(F.col("keep")).select("doc_id")
    kept_docs = batch.join(kept, "doc_id")
    kept_ex = shingles_exploded_of(kept_docs)
    sinks.append_if_absent(spark, bands, minhash_bands_of(kept_ex),
                           ["doc_id", "band"], audit=False)
    sinks.append_if_absent(spark, shingles, kept_ex,
                           ["doc_id", "shingle"], audit=False)

    sink(batch, 1)  # corpus watermark says batch 1 never committed
    _assert_converged(spark, corpus, bands, shingles)

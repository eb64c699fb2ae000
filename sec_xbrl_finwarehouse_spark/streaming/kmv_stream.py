"""Streaming distinct-count sketches: a KMV/theta sketch table
maintained across micro-batches via ``foreachBatch``.

Why this is the streaming distinct-count shape at 100 TB: exact
streaming distinct needs state proportional to the distinct population
(``dropDuplicates`` state grows without bound; watermarks only cap it
by TIME, not by cardinality). A KMV sketch is a bounded MERGEABLE
summary -- at most k rows per group, ever -- and its merge (keep the k
smallest distinct hashes of the union) is a SEMILATTICE operation:
idempotent, commutative, associative. Those three properties buy a
delivery-semantics story even the exactly-once sinks cannot match:
replaying a micro-batch into the stored sketch provably changes
nothing, so at-least-once ``foreachBatch`` delivery yields
exactly-once SKETCH STATE with no transactional machinery doing the
heavy lifting. The ``(app_id, batch_id)`` watermark of
streaming/stream_sink.py is still committed atomically with each
version -- not for correctness here, but so a fully-committed replay
can skip the merge job entirely and operators can read stream progress
off the manifest.

The hash arithmetic (md5-prefix fractions, estimate (k-1)/v_k) is
byte-identical to plans/events_queries.py's ``event_kmv_distinct`` --
see its docstring for the determinism argument; the batch query and
this stream therefore agree exactly on the same data, which the tests
assert (stream-vs-batch equivalence, the Structured Streaming
correctness idiom this repo uses throughout).

Scale shape per batch: the batch folds to (group, hash) pairs and is
pruned to k-per-group BEFORE touching the store (two-phase, map-side
first); the stored side is sketch-sized by construction (k rows per
group). The merge job's width is O(groups x k) regardless of how many
events the batch or the history carried.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import sinks
from ..plans.events_queries import KMV_K, kmv_frac_col, kmv_k_smallest
from .stream_sink import _already_committed, _txn_meta

SKETCH_SCHEMA = "group_key string, h string"


def merge_kmv_sketch(
    stored: DataFrame, batch: DataFrame, k: int = KMV_K
) -> DataFrame:
    """The semilattice merge: k smallest distinct hashes of the union,
    built by the SAME ``kmv_k_smallest`` the batch queries use (one
    implementation -> the tested stream-vs-batch bit-equality can
    never drift).

    ``stored`` is sketch-sized (k per group); ``batch`` is pre-hashed
    (group_key, h) rows of any size. Keeping the k smallest of
    (k smallest of A) union B equals the k smallest of (A union B) --
    the truncation loses only hashes that could never re-enter the
    sketch -- which is what makes incremental maintenance lossless."""
    return kmv_k_smallest(
        stored.unionByName(batch), ["group_key"], k
    ).drop("rk")


def hashes_of(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(group, value) -> the sketch's (group_key, h) hash rows."""
    return df.select(
        F.col(group_col).cast("string").alias("group_key"),
        F.md5(F.col(value_col).cast("string")).alias("h"),
    )


def _stored_or_empty(spark: SparkSession, path: str) -> DataFrame:
    if sinks.current_data_dir(path) is None:
        return spark.createDataFrame([], SKETCH_SCHEMA)
    return sinks.read_table(spark, path)


def foreach_batch_kmv(
    path: str,
    group_col: str,
    value_col: str,
    app_id: str = "kmv-stream",
    k: int = KMV_K,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink maintaining the stored KMV sketch at ``path``.

    Replay safety comes in two layers: the (app_id, batch_id) manifest
    watermark short-circuits a fully-committed batch (metadata no-op,
    no job), and even WITHOUT it the merge is idempotent -- re-merging
    a batch reproduces the stored sketch bit-for-bit, so any
    at-least-once interleaving converges to the crash-free state."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if _already_committed(path, app_id, batch_id):
            return
        spark = batch_df.sparkSession
        stored = _stored_or_empty(spark, path)
        merged = merge_kmv_sketch(
            stored, hashes_of(batch_df, group_col, value_col), k
        )
        sinks.write_replace(
            merged, path, manifest_extra=_txn_meta(app_id, batch_id)
        )

    return _sink


def kmv_estimate(spark: SparkSession, path: str, k: int = KMV_K) -> DataFrame:
    """Distinct-count estimates from the stored sketch alone: exact
    when a group's sketch holds fewer than k hashes (it then holds
    every hash ever seen), (k-1)/v_k otherwise -- the same estimator,
    same arithmetic, as the batch ``event_kmv_distinct``."""
    sk = sinks.read_table(spark, path)
    w = Window.partitionBy("group_key").orderBy("h")
    ranked = sk.withColumn("rk", F.row_number().over(w))
    agg = ranked.groupBy("group_key").agg(
        F.count("*").alias("n_sketch"),
        F.max(F.when(F.col("rk") == k, kmv_frac_col())).alias("v_k"),
    )
    est = F.when(
        F.col("n_sketch") >= k,
        F.round(F.lit(float(k - 1)) / F.col("v_k"), 4),
    ).otherwise(F.col("n_sketch").cast("double"))
    return agg.select("group_key", est.alias("kmv_estimate"))

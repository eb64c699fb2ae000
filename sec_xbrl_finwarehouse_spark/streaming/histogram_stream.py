"""Streaming histogram sketches: a (group, bin, cnt) table maintained
across micro-batches via ``foreachBatch`` -- the streaming twin of
``event_histogram_quantiles``.

The algebra contrast with streaming/kmv_stream.py is the point of this
module: bin counts merge by ADDITION -- a commutative MONOID, not a
semilattice. Addition is NOT idempotent, so a replayed micro-batch
would double-count and at-least-once delivery is NOT enough on its
own; the ``(app_id, batch_id)`` watermark that was a mere fast path
for the KMV sketch is LOAD-BEARING here. It commits atomically with
the merged histogram inside the version manifest
(streaming/stream_sink.py), so any crash/replay interleaving
converges: a batch either committed (replay is a metadata no-op) or
it didn't (no partial state exists -- the manifest pointer swap is
all-or-nothing). The tests assert both halves: a forced re-merge
WITHOUT the watermark visibly double-counts (proving the hazard is
real), and the sink's replay path does not.

Scale shape per batch: the batch folds map-side to (group, bin)
partial counts before touching the store; the stored side is bounded
by groups x range/width rows regardless of event count -- the same
bounded-state argument as the batch query, carried across time.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import sinks
from ..plans.events_queries import HIST_BIN_WIDTH
from .stream_sink import _already_committed, _txn_meta

HIST_SCHEMA = "group_key string, bin long, cnt long"


def bins_of(df: DataFrame, group_col: str, value_col: str,
            width: float = HIST_BIN_WIDTH) -> DataFrame:
    """(group, value) -> per-batch (group_key, bin, cnt) partials,
    the same bin arithmetic as the batch query (floor(value/width))."""
    return (
        df.select(
            F.col(group_col).cast("string").alias("group_key"),
            F.floor(F.col(value_col) / width).alias("bin"),
        )
        .groupBy("group_key", "bin")
        .agg(F.count("*").alias("cnt"))
    )


def merge_histogram(stored: DataFrame, batch: DataFrame) -> DataFrame:
    """The monoid merge: per-(group, bin) count ADDITION. Commutative
    and associative -- batches may merge in any order -- but NOT
    idempotent: the caller must guarantee each batch merges exactly
    once (the foreachBatch watermark below)."""
    return (
        stored.unionByName(batch)
        .groupBy("group_key", "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )


def _stored_or_empty(spark: SparkSession, path: str) -> DataFrame:
    if sinks.current_data_dir(path) is None:
        return spark.createDataFrame([], HIST_SCHEMA)
    return sinks.read_table(spark, path)


def foreach_batch_histogram(
    path: str,
    group_col: str,
    value_col: str,
    app_id: str = "hist-stream",
    width: float = HIST_BIN_WIDTH,
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink maintaining the stored histogram at ``path``.

    Exactly-once by watermark (NOT by algebra -- see module docstring):
    the merged table and the (app_id, batch_id) marker publish in one
    atomic manifest commit, so a replayed batch short-circuits before
    the merge and can never double-count."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if _already_committed(path, app_id, batch_id):
            return
        spark = batch_df.sparkSession
        merged = merge_histogram(
            _stored_or_empty(spark, path),
            bins_of(batch_df, group_col, value_col, width),
        )
        merged = merged.select(
            "group_key", F.col("bin").cast("long"),
            F.col("cnt").cast("long"),
        )
        sinks.write_replace(
            merged, path, manifest_extra=_txn_meta(app_id, batch_id)
        )

    return _sink


def histogram_quantiles(
    spark: SparkSession,
    path: str,
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    width: float = HIST_BIN_WIDTH,
) -> DataFrame:
    """Quantile estimates from the stored histogram alone -- the same
    interpolation arithmetic as the batch query's ``*_est`` columns
    (prev < q*n <= cum, linear within the hit bin), so the stream and
    batch estimates agree bit-exactly on the same data."""
    h = sinks.read_table(spark, path)
    w = Window.partitionBy("group_key").orderBy("bin")
    c = (
        h.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("prev", (F.col("cum") - F.col("cnt")).cast("double"))
    )
    n = h.groupBy("group_key").agg(F.sum("cnt").alias("n"))
    j = c.join(n, "group_key")
    aggs = []
    for q in qs:
        t = F.lit(q) * F.col("n")
        est = (
            F.col("bin") * width + width * (t - F.col("prev")) / F.col("cnt")
        )
        hit = (F.col("prev") < t) & (t <= F.col("cum"))
        tag = f"p{int(round(q * 100))}_est"
        aggs.append(F.round(F.min(F.when(hit, est)), 6).alias(tag))
    return j.groupBy("group_key").agg(*aggs).join(n, "group_key").select(
        "group_key", "n", *[f"p{int(round(q * 100))}_est" for q in qs]
    )

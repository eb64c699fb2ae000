"""Streaming Count-Min sketches: a (group, j, pos, c) counter table
maintained across micro-batches via ``foreachBatch`` -- the streaming
twin of ``event_cm_heavy_hitters``.

Same algebra class as the histogram stream: counters merge by ADDITION,
a commutative monoid that is NOT idempotent, so the ``(app_id,
batch_id)`` watermark is LOAD-BEARING -- a replayed micro-batch merged
twice would inflate every touched cell and (because Count-Min error is
one-sided) silently bias every estimate UP with no structural signal
that anything went wrong. The marker commits atomically with the merged
counters inside the version manifest (streaming/stream_sink.py), so any
crash/replay interleaving converges: a batch either committed (replay is
a metadata no-op) or it didn't (the manifest pointer swap is
all-or-nothing, no partial state exists). The tests assert both halves,
mirroring tests/test_histogram_stream.py.

Scale shape per batch: the batch folds map-side to (group, j, pos)
partials before touching the store; the stored side is bounded at
groups x d x w cells (the CM_D/CM_W constants the shared cell helper
bakes in) regardless of event count -- the same bounded-state argument
as the batch query, carried across time. The
estimate probe is the batch query's min-over-cells join, reading ONLY
the stored counters plus the caller's candidate items: the 100 TB
deployment pattern where the raw stream is never retained.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import sinks
from ..plans.events_queries import cm_with_cells
from .stream_sink import _already_committed, _txn_meta

CM_SCHEMA = "group_key string, j int, pos long, c long"


def cells_of(df: DataFrame, group_col: str, item_col: str) -> DataFrame:
    """(group, item) rows -> per-batch (group_key, j, pos, c) partials,
    the same cell arithmetic as the batch query
    (:func:`..plans.events_queries.cm_with_cells`)."""
    return (
        cm_with_cells(
            df.select(
                F.col(group_col).cast("string").alias("group_key"),
                F.col(item_col).alias("item"),
            ),
            "item",
        )
        .groupBy("group_key", "j", "pos")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def merge_cm(stored: DataFrame, batch: DataFrame) -> DataFrame:
    """The monoid merge: per-cell count ADDITION. Commutative and
    associative -- batches may merge in any order -- but NOT
    idempotent: the caller must guarantee each batch merges exactly
    once (the foreachBatch watermark below)."""
    return (
        stored.unionByName(batch)
        .groupBy("group_key", "j", "pos")
        .agg(F.sum("c").alias("c"))
    )


def _stored_or_empty(spark: SparkSession, path: str) -> DataFrame:
    if sinks.current_data_dir(path) is None:
        return spark.createDataFrame([], CM_SCHEMA)
    return sinks.read_table(spark, path)


def foreach_batch_cm(
    path: str,
    group_col: str,
    item_col: str,
    app_id: str = "cm-stream",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink maintaining the stored Count-Min counters at
    ``path``.

    Exactly-once by watermark (NOT by algebra -- see module docstring):
    the merged counters and the (app_id, batch_id) marker publish in
    one atomic manifest commit, so a replayed batch short-circuits
    before the merge and can never double-count."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if _already_committed(path, app_id, batch_id):
            return
        spark = batch_df.sparkSession
        merged = merge_cm(
            _stored_or_empty(spark, path),
            cells_of(batch_df, group_col, item_col),
        )
        merged = merged.select(
            "group_key", F.col("j").cast("int"),
            F.col("pos").cast("long"), F.col("c").cast("long"),
        )
        sinks.write_replace(
            merged, path, manifest_extra=_txn_meta(app_id, batch_id)
        )

    return _sink


def cm_estimate(
    spark: SparkSession, path: str, candidates: DataFrame
) -> DataFrame:
    """Frequency estimates for ``candidates(group_key, item)`` from the
    stored counters alone -- the same min-over-d-cells probe as the
    batch query, so stream and batch estimates agree bit-exactly on the
    same data. A candidate whose cells were never incremented estimates
    0 (Count-Min never undercounts, so absent cells mean a true zero
    count). The zero-fill must happen PER CELL, before the min:
    ``F.min`` skips NULLs, so a bare min over the left join would
    ignore a candidate's absent (true-zero) cells and report the min of
    only its collided ones -- inflating exactly the estimates where the
    sketch has proof of a smaller count."""
    counters = sinks.read_table(spark, path)
    probes = cm_with_cells(
        candidates.select(
            F.col("group_key").cast("string"), "item"
        ),
        "item",
    )
    return (
        probes.join(counters, ["group_key", "j", "pos"], "left")
        .groupBy("group_key", "item")
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long")
            .alias("cm_estimate")
        )
    )


def cm_sliding_estimate(
    spark: SparkSession,
    path: str,
    candidates: DataFrame,
    window_days: int | None = None,
) -> DataFrame:
    """Trailing-window frequency estimates for ``candidates(report_day,
    item)`` from STREAMED daily counters: run :func:`foreach_batch_cm`
    with the event DAY as the group column and the stored state IS the
    daily counter table ``q_event_cm_sliding`` builds from scratch --
    this reader sums each report day's member-day counters (the
    non-idempotent monoid merge, applied across TIME; each day's fold
    entered the store exactly once via the batch watermark) and probes
    min-over-d-cells, zero-filled per cell before the min (same
    rationale as :func:`cm_estimate`). Identical cell arithmetic to
    the batch query, so stream and batch window estimates agree
    bit-exactly on the same data (asserted in tests/test_cm_stream.py).
    The window merge reads days x d x w counter rows only."""
    from ..plans.events_queries import WAU_DAYS, cm_with_cells

    w = WAU_DAYS if window_days is None else window_days
    counters = sinks.read_table(spark, path).select(
        F.to_date("group_key").alias("day"), "j", "pos", "c"
    )
    winc = (
        counters.select(
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), w - 1))
            ).alias("report_day"),
            "j", "pos", "c",
        )
        .groupBy("report_day", "j", "pos")
        .agg(F.sum("c").alias("c"))
    )
    probes = cm_with_cells(
        candidates.select("report_day", "item"), "item"
    )
    return (
        probes.join(winc, ["report_day", "j", "pos"], "left")
        .groupBy("report_day", "item")
        .agg(
            F.min(F.coalesce(F.col("c"), F.lit(0))).cast("long")
            .alias("cm_estimate")
        )
    )

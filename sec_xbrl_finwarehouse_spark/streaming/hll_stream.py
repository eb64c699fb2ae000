"""Streaming HyperLogLog: a register table maintained across
micro-batches via ``foreachBatch`` -- the register-array sibling of
streaming/kmv_stream.py (see its docstring for why bounded mergeable
sketches are THE streaming distinct-count shape at 100 TB).

HLL state is even more compact than KMV's (at most m = 2^P rows per
group, each an 8-byte bucket + a tiny max-rho integer), and its merge
-- elementwise register MAX -- is a SEMILATTICE operation: idempotent,
commutative, associative. Replaying a micro-batch into the stored
registers provably changes nothing, so at-least-once ``foreachBatch``
delivery yields exactly-once SKETCH STATE with no transactional
machinery doing the heavy lifting; the (app_id, batch_id) manifest
watermark still short-circuits fully-committed replays to a metadata
no-op, same as every stream sink here.

The register arithmetic is byte-identical to
plans/events_queries.py's ``q_event_hll_distinct`` (shared
``hll_registers`` fold and ``hll_estimate_col`` estimator), so the
stream and the batch query agree exactly on the same data -- the
stream-vs-batch equivalence the tests assert.

Scale shape per batch: the batch folds to (group, bucket, rho)
map-side and arrives at the merge at most m rows per group per input
partition; the stored side is register-sized by construction. The
merge job's width is O(groups x m) regardless of how many events the
batch or the history carried.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import sinks
from ..plans.events_queries import hll_estimate_col, hll_registers
from .stream_sink import _already_committed, _txn_meta

REGISTER_SCHEMA = "group_key string, bucket long, mreg int"


def merge_hll_registers(stored: DataFrame, batch_regs: DataFrame) -> DataFrame:
    """The semilattice merge: elementwise register max of the union.
    max is idempotent/commutative/associative, so any at-least-once
    interleaving of batches converges to the crash-free register
    state."""
    return (
        stored.unionByName(batch_regs)
        .groupBy("group_key", "bucket")
        .agg(F.max("mreg").alias("mreg"))
    )


def registers_of(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """(group, value) rows -> their HLL register fold, via the SAME
    ``hll_registers`` the batch query uses (one implementation -> the
    tested stream-vs-batch bit-equality can never drift)."""
    h = df.select(
        F.col(group_col).cast("string").alias("group_key"),
        F.md5(F.col(value_col).cast("string")).alias("h"),
    )
    return hll_registers(h, ["group_key"])


def _stored_or_empty(spark: SparkSession, path: str) -> DataFrame:
    if sinks.current_data_dir(path) is None:
        return spark.createDataFrame([], REGISTER_SCHEMA)
    return sinks.read_table(spark, path)


def foreach_batch_hll(
    path: str,
    group_col: str,
    value_col: str,
    app_id: str = "hll-stream",
) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink maintaining the stored HLL registers at
    ``path``. Replay safety in two layers, exactly like the KMV twin:
    the (app_id, batch_id) watermark short-circuits a fully-committed
    batch, and even without it the register merge is idempotent."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if _already_committed(path, app_id, batch_id):
            return
        spark = batch_df.sparkSession
        stored = _stored_or_empty(spark, path)
        merged = merge_hll_registers(
            stored, registers_of(batch_df, group_col, value_col)
        )
        sinks.write_replace(
            merged, path, manifest_extra=_txn_meta(app_id, batch_id)
        )

    return _sink


def hll_estimate(spark: SparkSession, path: str) -> DataFrame:
    """Distinct-count estimates from the stored registers alone --
    the same estimator, same arithmetic, as the batch
    ``q_event_hll_distinct``."""
    regs = sinks.read_table(spark, path)
    z = regs.groupBy("group_key").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mreg"))).alias("z_present"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    return z.select("group_key", hll_estimate_col().alias("hll_estimate"))


def hll_sliding_estimate(
    spark: SparkSession, path: str, window_days: int | None = None
) -> DataFrame:
    """Trailing-window distinct estimates (day, hll_estimate) from
    STREAMED daily registers: run :func:`foreach_batch_hll` with the
    event DAY as the group column and the stored state IS the daily
    register table ``q_event_hll_sliding`` builds from scratch -- this
    reader answers any trailing window by the same explode + register
    max merge, without ever re-reading events. Same estimator
    arithmetic, so stream and batch sliding estimates agree bit-exactly
    on the same data (asserted in tests/test_hll_stream.py). Report
    days are restricted to stored (active) days, mirroring the batch
    query. The window merge reads days x m register rows only --
    metadata-sized at any event volume."""
    from ..plans.events_queries import WAU_DAYS

    w = WAU_DAYS if window_days is None else window_days
    regs = sinks.read_table(spark, path).select(
        F.to_date("group_key").alias("day"), "bucket", "mreg"
    )
    merged = (
        regs.select(
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), w - 1))
            ).alias("report_day"),
            "bucket", "mreg",
        )
        .groupBy("report_day", "bucket")
        .agg(F.max("mreg").alias("mreg"))
    )
    z = merged.groupBy("report_day").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mreg"))).alias("z_present"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    days = regs.select(F.col("day").alias("report_day")).distinct()
    return (
        z.join(F.broadcast(days), "report_day", "left_semi")
        .select(
            F.col("report_day").alias("day"),
            hll_estimate_col().alias("hll_estimate"),
        )
    )

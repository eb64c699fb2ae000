"""Structured Streaming twins of the batch event operators
(plans/events_queries.py).

The reference is pure batch (SURVEY.md §2.9) -- this module is the
beyond-reference streaming layer, built on the standard Structured
Streaming operators:

* ``windowed_counts``  -- tumbling event-time window + watermark; the
  exact streaming twin of ``q_event_window_agg`` (same logical plan,
  plus state eviction by watermark).
* ``sessionize_stream`` -- ``session_window`` with a 30-min gap, the
  streaming twin of the batch gaps-and-islands ``q_event_sessionize``
  (same gap semantics; batch/stream equivalence is unit-tested).
* ``user_running_totals`` -- custom stateful operator via
  ``applyInPandasWithState``: per-user cumulative totals maintained
  across micro-batches (the shape any bespoke stateful op takes when
  ``window``/``session_window`` can't express it).

Scale notes: state for both windows is keyed by (window/user) after a
single hash shuffle -- identical partitioning to the batch plans. The
watermark bounds state size; without it a 100 TB/day stream would
accumulate unbounded window state. Parquet file sources are used in
tests (``availableNow`` -> deterministic, replayable); in production the
same DataFrames run off Kafka sources unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP = "30 minutes"
WATERMARK = "1 hour"

EVENTS_STREAM_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("ts", TimestampType()),
    StructField("value", DoubleType()),
])


def stream_events(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream of event rows (one parquet file per
    micro-batch with ``maxFilesPerTrigger``; ``availableNow`` drains the
    directory deterministically in tests)."""
    return (
        spark.readStream.schema(EVENTS_STREAM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )


def dedup_stream(events: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Streaming exactly-once dedup on the natural key -- the streaming
    twin of the batch D1 ``natural_key_dedup`` and the ingestion shape
    of ``ON CONFLICT DO NOTHING`` (first observation wins, replays and
    at-least-once source duplicates are dropped).

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    watermark passes the key's event time, so state is bounded by the
    duplicate horizon (here 1 hour) instead of growing with the stream --
    the only form that survives an unbounded 100 TB/day feed. Duplicates
    arriving later than the watermark are the source's SLA violation,
    exactly like late events for the windowed aggregations."""
    return events.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def windowed_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling event-time window per event_type with watermark-bounded
    state -- streaming twin of q_event_window_agg."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
            F.avg("value").alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type", "n_events", "total_value", "avg_value",
        )
    )


def sessionize_stream(events: DataFrame, gap: str = SESSION_GAP) -> DataFrame:
    """Per-user sessions via the native ``session_window`` operator --
    merging state keyed (user_id, session) after one shuffle."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events", "total_value",
        )
    )


# ---- custom stateful operator: applyInPandasWithState ----------------------

RUNNING_TOTALS_STATE = StructType([
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

RUNNING_TOTALS_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])


def _update_running_totals(key, pdf_iter, state):
    """Accumulate (count, sum(value)) per user across micro-batches."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((n, total))
    import pandas as pd

    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def user_running_totals(events: DataFrame) -> DataFrame:
    """Per-user cumulative totals maintained in executor state across
    micro-batches (GroupState, Arrow-batched). Emits the updated total
    for each user seen in a batch -> use with outputMode('update')."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _update_running_totals,
        outputStructType=RUNNING_TOTALS_OUT,
        stateStructType=RUNNING_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def enrich_stream(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream x static-dimension enrichment join + per-dimension rollup:
    each event decorated with its user's dimension row (tier), then a
    watermarked windowed count/sum per (window, tier) -- the canonical
    "enrich the firehose with a small reference table" pattern.

    The dimension side is a BATCH DataFrame: Spark plans a stream-static
    join where the static side is broadcast to every executor and the
    stream is probed per micro-batch -- no state store at all (unlike
    stream-stream joins), no watermark needed on the dim, and the dim
    re-resolves per batch so slowly-changing reference data is picked up
    on restart. Left join keeps events whose user is missing from the
    dimension (tier NULL -> 'unknown'), the same null-tolerant shape as
    the batch broadcast joins in plans/api_queries.py."""
    enriched = events.join(F.broadcast(dim), "user_id", "left").withColumn(
        "tier", F.coalesce("tier", F.lit("unknown"))
    )
    return (
        enriched.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").alias("w"), "tier")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("bucket_start"), "tier",
                "n_events", "total_value")
    )


BAND = "5 minutes"


def click_view_stream_join(clicks: DataFrame, views: DataFrame) -> DataFrame:
    """Stream-stream inner join: each click matched to the same user's
    views within +-5 min of the click -- the streaming twin of the batch
    interval band join (plans/events_queries.interval_join_counts).

    Uses Spark's native watermarked stream-stream join: both sides carry
    a watermark, and the event-time RANGE condition in the join predicate
    is what lets the state store evict -- rows older than
    watermark + band can never match and are dropped. Without the range
    condition the join state would grow without bound; with it, state is
    O(rate x (watermark + band)) per side regardless of total stream
    length. The equi-key (user_id) keeps the join a hash join after one
    shuffle per side -- the same (user_id, bucket) co-location story as
    the batch spelling, with the band predicate applied post-match.
    """
    c = (
        clicks.withWatermark("ts", WATERMARK)
        .select("user_id", F.col("event_id").alias("click_event_id"),
                F.col("ts").alias("click_ts"))
    )
    v = (
        views.withWatermark("ts", WATERMARK)
        .select(F.col("user_id").alias("v_user_id"),
                F.col("event_id").alias("view_event_id"),
                F.col("ts").alias("view_ts"))
    )
    return c.join(
        v,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {BAND}"))
        & (F.col("view_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {BAND}")),
        "inner",
    ).select("user_id", "click_event_id", "click_ts", "view_event_id", "view_ts")


FUNNEL_STATE = StructType([
    StructField("stage", LongType()),
    StructField("view_us", LongType()),
    StructField("click_us", LongType()),
])

FUNNEL_OUT = StructType([
    StructField("user_id", LongType()),
    StructField("stage", LongType()),
])


def _update_funnel(key, pdf_iter, state):
    """Per-user funnel state machine (streaming twin of the batch
    q_event_funnel): first view, first click at-or-after it, first
    purchase at-or-after that -- stage only ever advances, carried in
    executor state across micro-batches as epoch-micros longs."""
    import pandas as pd

    stage, v_us, c_us = state.get if state.exists else (0, None, None)
    rows = []
    for pdf in pdf_iter:
        rows.append(pdf[["event_type", "ts"]])
    if rows:
        allr = pd.concat(rows).sort_values("ts")
        for et, ts in zip(allr["event_type"], allr["ts"]):
            us = int(pd.Timestamp(ts).value // 1000)
            if et == "view" and v_us is None:
                v_us, stage = us, max(stage, 1)
            elif (et == "click" and v_us is not None and c_us is None
                  and us >= v_us):
                c_us, stage = us, max(stage, 2)
            elif (et == "purchase" and c_us is not None and stage < 3
                  and us >= c_us):
                stage = 3
    state.update((stage, v_us, c_us))
    yield pd.DataFrame({"user_id": [key[0]], "stage": [stage]})


def funnel_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user funnel stage via ``applyInPandasWithState``.

    The batch spelling needs three corpus-wide aggregations; streaming
    keeps THREE LONGS of state per user and upgrades them in place as
    events arrive -- the state-machine shape any custom sequential
    operator takes when window/session_window can't express it. Stages
    are monotone under the >= semantics, so late events within the
    processing order can only advance a user, never regress one; use
    with outputMode('update'). Caveat (documented, inherent): events
    must arrive per-user in event-time order across micro-batches for
    exact batch parity -- a watermark-delayed reorder buffer is the
    production hardening."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _update_funnel,
        outputStructType=FUNNEL_OUT,
        stateStructType=FUNNEL_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

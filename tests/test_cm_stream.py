"""Streaming Count-Min maintenance (streaming/cm_stream.py).

The module's claims, each asserted (mirroring test_histogram_stream.py
-- same monoid algebra, same load-bearing watermark):

* stream-vs-batch equivalence: estimates probed from the streamed
  counters equal the batch ``event_cm_heavy_hitters`` estimates on the
  same events, and the one-sided guarantee (estimate >= exact) carries
  over;
* the monoid hazard is REAL: re-merging a batch without the watermark
  inflates cells (addition is not idempotent);
* the watermark prevents it: a fully-committed replay through the sink
  is a metadata no-op;
* absent candidates estimate exactly 0 (Count-Min never undercounts,
  so an untouched cell row proves a zero count);
* end-to-end through a real readStream/foreachBatch pipeline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sec_xbrl_finwarehouse_spark import sinks
from sec_xbrl_finwarehouse_spark.streaming.cm_stream import (
    cells_of,
    cm_estimate,
    foreach_batch_cm,
    merge_cm,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "event_type string, user_id long")


# skewed: user u appears (u % 4) * 5 + 1 times per batch for 'click';
# 'view' is a disjoint light group
BATCHES = [
    [("click", u) for u in range(12) for _ in range((u % 4) * 5 + 1)],
    [("click", u) for u in range(12) for _ in range((u % 4) * 5 + 1)],
    [("view", 100 + u) for u in range(6)],
]
ALL_ROWS = [r for b in BATCHES for r in b]


def _run(spark, tmp_path, app_id="cm-v1"):
    path = str(tmp_path / "cm")
    sink = foreach_batch_cm(path, "event_type", "user_id", app_id=app_id)
    for i, rows in enumerate(BATCHES):
        sink(_batch(spark, rows), i)
    return path, sink


def _candidates(spark):
    return spark.createDataFrame(
        [("click", u) for u in range(12)] + [("view", 100 + u)
                                             for u in range(6)],
        "group_key string, item long",
    )


def test_stream_estimates_equal_batch_query(spark, tmp_path):
    path, _ = _run(spark, tmp_path)
    got = {(r["group_key"], r["item"]): r["cm_estimate"]
           for r in cm_estimate(spark, path, _candidates(spark)).collect()}
    events_dir = tmp_path / "ev"
    spark.createDataFrame(
        [(i, u, et, None, 1.0) for i, (et, u) in enumerate(ALL_ROWS)],
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    ).write.parquet(str(events_dir / "events.parquet"))
    from sec_xbrl_finwarehouse_spark.plans.events_queries import (
        q_event_cm_heavy_hitters,
    )
    batch = q_event_cm_heavy_hitters(spark, str(events_dir)).collect()
    assert batch, "batch query returned nothing"
    for r in batch:  # every ranked user's estimate matches the stream's
        assert got[(r["event_type"], r["user_id"])] == r["cm_estimate"], r
    # one-sided guarantee carries to the streamed counters
    exact = {}
    for et, u in ALL_ROWS:
        exact[(et, u)] = exact.get((et, u), 0) + 1
    assert all(got[k] >= n for k, n in exact.items())


def test_monoid_double_counts_without_watermark(spark, tmp_path):
    path, _ = _run(spark, tmp_path)
    stored = sinks.read_table(spark, path)
    n0 = stored.agg(F.sum("c")).collect()[0][0]
    remerged = merge_cm(
        stored, cells_of(_batch(spark, BATCHES[1]), "event_type", "user_id")
    )
    n1 = remerged.agg(F.sum("c")).collect()[0][0]
    from sec_xbrl_finwarehouse_spark.plans.events_queries import CM_D

    assert n0 == len(ALL_ROWS) * CM_D
    # the hazard the watermark guards: replayed increments land again
    assert n1 == n0 + len(BATCHES[1]) * CM_D


def test_fully_committed_replay_is_metadata_noop(spark, tmp_path):
    path, sink = _run(spark, tmp_path)
    v = sinks.current_data_dir(path)
    sink(_batch(spark, BATCHES[1]), 1)  # replay
    assert sinks.current_data_dir(path) == v
    n = sinks.read_table(spark, path).agg(F.sum("c")).collect()[0][0]
    from sec_xbrl_finwarehouse_spark.plans.events_queries import CM_D

    assert n == len(ALL_ROWS) * CM_D


def test_absent_candidate_estimates_zero(spark, tmp_path):
    path, _ = _run(spark, tmp_path)
    ghosts = spark.createDataFrame(
        [("click", 999_999), ("never_seen_group", 1)],
        "group_key string, item long",
    )
    got = {(r["group_key"], r["item"]): r["cm_estimate"]
           for r in cm_estimate(spark, path, ghosts).collect()}
    # 'click' is a hot group: the ghost user may collide into nonzero
    # cells (one-sided error), but a group with NO counters must be 0
    assert got[("never_seen_group", 1)] == 0
    assert got[("click", 999_999)] >= 0


def test_streaming_end_to_end_availablenow(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(BATCHES):
        _batch(spark, rows).coalesce(1).write.parquet(
            str(src / f"b{i}.parquet")
        )
    path = str(tmp_path / "cm")
    q = (
        spark.readStream.schema("event_type string, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*/")
        .writeStream.foreachBatch(
            foreach_batch_cm(path, "event_type", "user_id", app_id="e2e")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within 120 s"
    n = sinks.read_table(spark, path).agg(F.sum("c")).collect()[0][0]
    from sec_xbrl_finwarehouse_spark.plans.events_queries import CM_D

    assert n == len(ALL_ROWS) * CM_D


def test_sliding_estimate_from_streamed_daily_counters(spark, tmp_path):
    """r10 wiring: maintain DAILY counters through the stream sink
    (group = event day), then answer the trailing-window frequency
    probe from the streamed state alone -- estimates must equal the
    batch q_event_cm_sliding's cm_estimate column, bit-for-bit, for
    every (day, user) the batch query ranks."""
    import datetime as dt

    from pyspark.sql import functions as F

    rows = []
    base = dt.datetime(2024, 3, 1, 9, 0, 0)
    uid = 0
    for d in range(5):
        for u in range(30):
            # user u fires (u % 4) + 1 events per active day
            for _ in range((u % 4) + 1):
                rows.append((uid, u + 7 * (d % 2), "view",
                             base + dt.timedelta(days=d), 1.0))
                uid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )
    events_dir = tmp_path / "ev"
    df.write.parquet(str(events_dir / "events.parquet"))

    path = str(tmp_path / "daily_cm")
    sink = foreach_batch_cm(path, "day", "user_id", app_id="cm-daily")
    for i in range(5):
        day = (base + dt.timedelta(days=i)).date()
        chunk = df.filter(F.to_date("ts") == F.lit(day)).withColumn(
            "day", F.to_date("ts")
        )
        sink(chunk, i)

    from sec_xbrl_finwarehouse_spark.plans.events_queries import (
        q_event_cm_sliding,
    )
    from sec_xbrl_finwarehouse_spark.streaming.cm_stream import (
        cm_sliding_estimate,
    )

    batch = q_event_cm_sliding(spark, str(events_dir)).collect()
    assert len(batch) > 0
    cands = spark.createDataFrame(
        [(r["day"], r["user_id"]) for r in batch],
        "report_day date, item long",
    )
    got = {
        (r["report_day"], r["item"]): r["cm_estimate"]
        for r in cm_sliding_estimate(spark, path, cands).collect()
    }
    want = {(r["day"], r["user_id"]): r["cm_estimate"] for r in batch}
    assert got == want

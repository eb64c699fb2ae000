"""Streaming HLL register maintenance (streaming/hll_stream.py).

Mirrors test_kmv_stream.py's coverage for the register-array sibling:

* stream-vs-batch equivalence: registers after N micro-batches equal
  the one-shot fold over the concatenated data, and the estimate
  equals the batch ``q_event_hll_distinct`` estimate on the same
  events;
* idempotent merge: replaying a batch WITHOUT the watermark fast path
  reproduces the stored registers bit-for-bit (the semilattice claim);
* fully-committed replay is a metadata no-op (no new version);
* bounded state: never more than HLL_M registers per group;
* order independence: merging the batches in any order yields the
  same registers (commutativity half of the semilattice claim).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sec_xbrl_finwarehouse_spark import sinks
from sec_xbrl_finwarehouse_spark.plans.events_queries import HLL_M
from sec_xbrl_finwarehouse_spark.streaming.hll_stream import (
    foreach_batch_hll,
    hll_estimate,
    merge_hll_registers,
    registers_of,
)

REGISTER_SCHEMA = "group_key string, bucket long, mreg int"


def _batch(spark, rows):
    return spark.createDataFrame(rows, "event_type string, user_id long")


BATCHES = [
    [("big", i) for i in range(150)] + [("small", i) for i in range(4)],
    [("big", i) for i in range(100, 250)] + [("small", 2), ("small", 99)],
    [("big", i) for i in range(200, 400)] + [("small", 4)],
]
ALL_ROWS = [r for b in BATCHES for r in b]
BIG_N = 400


def _run(spark, tmp_path, app_id="hll-v1"):
    path = str(tmp_path / "regs")
    sink = foreach_batch_hll(path, "event_type", "user_id", app_id=app_id)
    for i, rows in enumerate(BATCHES):
        sink(_batch(spark, rows), i)
    return path, sink


def _rows(df):
    return sorted((r["group_key"], r["bucket"], r["mreg"])
                  for r in df.collect())


def test_stream_equals_batch_registers_and_estimate(spark, tmp_path):
    path, _ = _run(spark, tmp_path)
    stored = sinks.read_table(spark, path)
    got = _rows(stored)
    want = _rows(registers_of(_batch(spark, ALL_ROWS),
                              "event_type", "user_id"))
    assert got == want
    # bounded state: at most HLL_M registers per group, ever
    per_group = {}
    for g, _, _ in got:
        per_group[g] = per_group.get(g, 0) + 1
    assert all(n <= HLL_M for n in per_group.values()), per_group

    est = {r["group_key"]: r["hll_estimate"]
           for r in hll_estimate(spark, path).collect()}
    events_dir = tmp_path / "ev"
    spark.createDataFrame(
        [(i, u, et, None, 1.0) for i, (et, u) in enumerate(ALL_ROWS)],
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    ).write.parquet(str(events_dir / "events.parquet"))
    from sec_xbrl_finwarehouse_spark.plans.events_queries import (
        q_event_hll_distinct,
    )
    batch_est = {
        r["event_type"]: r["hll_estimate"]
        for r in q_event_hll_distinct(spark, str(events_dir)).collect()
    }
    assert est == batch_est
    assert abs(est["big"] - BIG_N) / BIG_N < 0.5  # fixed-draw band


def test_merge_is_idempotent_without_watermark(spark, tmp_path):
    path, _ = _run(spark, tmp_path)
    stored = sinks.read_table(spark, path)
    replay = merge_hll_registers(
        stored,
        registers_of(_batch(spark, BATCHES[1]), "event_type", "user_id"),
    )
    assert _rows(replay) == _rows(stored)


def test_merge_is_order_independent(spark, tmp_path):
    empty = spark.createDataFrame([], REGISTER_SCHEMA)
    acc_fwd, acc_rev = empty, empty
    for rows in BATCHES:
        acc_fwd = merge_hll_registers(
            acc_fwd, registers_of(_batch(spark, rows),
                                  "event_type", "user_id"))
    for rows in reversed(BATCHES):
        acc_rev = merge_hll_registers(
            acc_rev, registers_of(_batch(spark, rows),
                                  "event_type", "user_id"))
    assert _rows(acc_fwd) == _rows(acc_rev)


def test_fully_committed_replay_is_metadata_noop(spark, tmp_path):
    path, sink = _run(spark, tmp_path)
    v = sinks.current_data_dir(path)
    sink(_batch(spark, BATCHES[2]), 2)  # replay last committed batch
    assert sinks.current_data_dir(path) == v


def test_streaming_end_to_end_availablenow(spark, tmp_path):
    """Drive the sink through a real readStream/foreachBatch pipeline
    (availableNow over per-batch parquet files)."""
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(BATCHES):
        _batch(spark, rows).coalesce(1).write.parquet(
            str(src / f"b{i}.parquet")
        )
    path = str(tmp_path / "regs")
    q = (
        spark.readStream.schema("event_type string, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*/")
        .writeStream.foreachBatch(
            foreach_batch_hll(path, "event_type", "user_id", app_id="e2e")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within 120 s"
    stored = sinks.read_table(spark, path)
    want = _rows(registers_of(_batch(spark, ALL_ROWS),
                              "event_type", "user_id"))
    assert _rows(stored) == want
    assert stored.groupBy("group_key").count().filter(
        F.col("count") > HLL_M
    ).count() == 0


def test_sliding_estimate_from_streamed_daily_registers(spark, tmp_path):
    """r10 wiring: maintain DAILY registers through the stream sink
    (group = event day), then answer the trailing-window query from the
    streamed state alone -- estimates must equal the batch
    q_event_hll_sliding's, bit-for-bit, on the same events."""
    import datetime as dt

    rows = []
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    uid = 0
    for d in range(6):
        # varying daily populations with cross-day overlap
        for u in range(40 + 13 * d):
            rows.append((uid, u % (60 + 5 * d),
                         "click", base + dt.timedelta(days=d), 1.0))
            uid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )
    events_dir = tmp_path / "ev"
    df.write.parquet(str(events_dir / "events.parquet"))

    # stream the same rows day by day (micro-batch = one day's events),
    # daily registers keyed by the event day
    path = str(tmp_path / "daily_regs")
    sink = foreach_batch_hll(path, "day", "user_id", app_id="hll-daily")
    for i in range(6):
        day = (base + dt.timedelta(days=i)).date()
        chunk = df.filter(F.to_date("ts") == F.lit(day)).withColumn(
            "day", F.to_date("ts")
        )
        sink(chunk, i)

    from sec_xbrl_finwarehouse_spark.plans.events_queries import (
        q_event_hll_sliding,
    )
    from sec_xbrl_finwarehouse_spark.streaming.hll_stream import (
        hll_sliding_estimate,
    )

    got = {
        r["day"]: r["hll_estimate"]
        for r in hll_sliding_estimate(spark, path).collect()
    }
    want = {
        r["day"]: r["hll_estimate"]
        for r in q_event_hll_sliding(spark, str(events_dir)).collect()
    }
    assert got == want and len(got) == 6

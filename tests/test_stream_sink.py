"""Exactly-once streaming ingest: foreachBatch -> stored-table upsert.

Covers the guarantees the sink claims:

* end-to-end: a multi-micro-batch stream upserted into a stored table
  equals the batch-computed last-wins merge of all batches;
* idempotent replay: re-delivering an already-committed ``batch_id``
  (Structured Streaming's at-least-once failure mode) changes nothing
  — not the rows, not the version pointer;
* app-id scoping: a NEW logical stream (fresh checkpoint, batch ids
  recycled from 0) under a new ``app_id`` is NOT mistaken for a replay
  (the Delta ``txnAppId``/``txnVersion`` contract);
* S6 append path: conflicts ignored, replays structurally no-op.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sec_xbrl_finwarehouse_spark import sinks
from sec_xbrl_finwarehouse_spark.streaming.events_stream import stream_events
from sec_xbrl_finwarehouse_spark.streaming.stream_sink import (
    foreach_batch_append_if_absent,
    foreach_batch_upsert,
    last_committed_txn,
)


def _ts(minute: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minute)


SCHEMA = ("event_id long, user_id long, event_type string, "
          "ts timestamp, value double")

BATCHES = [
    [(1, 1, "view", 0.0, 1.0), (2, 1, "click", 10.0, 2.0),
     (3, 2, "view", 20.0, 3.0)],
    # batch 1 rewrites event 2 (late correction) and adds event 4
    [(2, 1, "click", 10.0, 99.0), (4, 2, "view", 30.0, 4.0)],
]


def _write_batches(spark, tmp_path):
    src = tmp_path / "sink_src"
    src.mkdir()
    for i, rows in enumerate(BATCHES):
        spark.createDataFrame(
            [(e, u, t, _ts(m), v) for e, u, t, m, v in rows], SCHEMA
        ).coalesce(1).write.parquet(str(src / f"batch_{i}.parquet"))
    return str(src) + "/*/"


def _run_stream(spark, src, ckpt, sink_fn):
    q = (
        stream_events(spark, src)
        .writeStream.foreachBatch(sink_fn)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_stream_upsert_matches_batch_merge(spark, tmp_path):
    src = _write_batches(spark, tmp_path)
    table = str(tmp_path / "events_table")
    _run_stream(spark, src, str(tmp_path / "ckpt"),
                foreach_batch_upsert(table, ["event_id"], app_id="ingest-a"))

    stored = sinks.read_table(spark, table)
    rows = {r["event_id"]: r for r in stored.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[2]["value"] == 99.0  # later micro-batch won
    assert stored.filter(F.col("created_at").isNull()).count() == 0
    assert last_committed_txn(table) is not None


def test_replayed_batch_is_a_noop_but_new_app_id_is_not(spark, tmp_path):
    src = _write_batches(spark, tmp_path)
    table = str(tmp_path / "replay_table")
    sink = foreach_batch_upsert(table, ["event_id"], app_id="ingest-a")
    _run_stream(spark, src, str(tmp_path / "ckpt2"), sink)

    app, committed = last_committed_txn(table)
    assert app == "ingest-a"
    version_before = sinks.current_data_dir(table)
    before = {tuple(r) for r in sinks.read_table(spark, table).collect()}

    # simulate the at-least-once failure mode: redeliver old batches
    # (same app_id + batch_id) straight into the sink function
    replay = spark.createDataFrame(
        [(e, u, t, _ts(m), v) for e, u, t, m, v in BATCHES[0]], SCHEMA
    )
    sink(replay, 0)
    sink(replay, committed)
    assert sinks.current_data_dir(table) == version_before  # no publish
    after = {tuple(r) for r in sinks.read_table(spark, table).collect()}
    assert after == before

    # a genuinely NEW batch id still goes through
    nxt = spark.createDataFrame([(5, 3, "view", _ts(40.0), 5.0)], SCHEMA)
    sink(nxt, committed + 1)
    assert last_committed_txn(table) == ("ingest-a", committed + 1)
    assert sinks.read_table(spark, table).filter(
        F.col("event_id") == 5
    ).count() == 1

    # a DIFFERENT logical stream reusing batch_id 0 must NOT be skipped
    other = foreach_batch_upsert(table, ["event_id"], app_id="ingest-b")
    other(spark.createDataFrame([(6, 4, "view", _ts(50.0), 6.0)], SCHEMA), 0)
    assert last_committed_txn(table) == ("ingest-b", 0)
    assert sinks.read_table(spark, table).filter(
        F.col("event_id") == 6
    ).count() == 1


def test_append_if_absent_stream_never_rewrites(spark, tmp_path):
    src = _write_batches(spark, tmp_path)
    table = str(tmp_path / "append_table")
    _run_stream(spark, src, str(tmp_path / "ckpt3"),
                foreach_batch_append_if_absent(table, ["event_id"],
                                               app_id="append-a"))

    stored = sinks.read_table(spark, table)
    rows = {r["event_id"]: r for r in stored.collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert rows[2]["value"] == 2.0  # first write wins: conflict ignored

    # replay the whole stream as a NEW logical stream (fresh checkpoint
    # + fresh app_id, so the txn check does NOT mask the anti-join):
    # structurally a no-op — every key already present, bytes unchanged
    bytes_before = sinks.table_bytes(table)
    _run_stream(spark, src, str(tmp_path / "ckpt4"),
                foreach_batch_append_if_absent(table, ["event_id"],
                                               app_id="append-b"))
    assert sinks.table_bytes(table) == bytes_before
    assert sinks.read_table(spark, table).count() == 4


def test_partitioned_stream_upsert_rewrites_only_touched(spark, tmp_path):
    """Partition-pruned streaming ingest: a micro-batch touching one
    day rewrites only that day's partition (others hard-linked), the
    txn watermark still commits atomically, and replays no-op."""
    import os

    from sec_xbrl_finwarehouse_spark.streaming.stream_sink import (
        foreach_batch_upsert_partitioned,
        last_committed_txn,
    )

    table = str(tmp_path / "part_table")
    sink = foreach_batch_upsert_partitioned(
        table, ["day", "event_id"], "day", app_id="p-ingest")

    def frame(rows):
        return spark.createDataFrame(rows, "day string, event_id long, v double")

    sink(frame([("2024-01-01", 1, 1.0), ("2024-01-02", 2, 2.0)]), 0)
    day1_dir = os.path.join(
        sinks.current_data_dir(table), "day=2024-01-01")
    day1_inode = {f: os.stat(os.path.join(day1_dir, f)).st_ino
                  for f in os.listdir(day1_dir) if f.endswith(".parquet")}

    # batch 1 touches only day 2: day 1's files must be the SAME inodes
    sink(frame([("2024-01-02", 2, 20.0), ("2024-01-02", 3, 3.0)]), 1)
    day1_dir_after = os.path.join(
        sinks.current_data_dir(table), "day=2024-01-01")
    after = {f: os.stat(os.path.join(day1_dir_after, f)).st_ino
             for f in os.listdir(day1_dir_after) if f.endswith(".parquet")}
    assert after == day1_inode  # hard-linked, not rewritten

    rows = {r["event_id"]: r["v"]
            for r in sinks.read_table(spark, table).collect()}
    assert rows == {1: 1.0, 2: 20.0, 3: 3.0}
    assert last_committed_txn(table) == ("p-ingest", 1)

    # replay of batch 1: no-op (same version dir, same rows)
    ver = sinks.current_data_dir(table)
    sink(frame([("2024-01-02", 2, 20.0), ("2024-01-02", 3, 3.0)]), 1)
    assert sinks.current_data_dir(table) == ver

"""Streaming KMV sketch maintenance (streaming/kmv_stream.py).

Covers the module's claims:

* stream-vs-batch equivalence: the sketch after N micro-batches equals
  the batch sketch over the concatenated data, and the estimate equals
  the batch ``event_kmv_distinct`` estimate on the same events;
* idempotent merge: replaying a batch WITHOUT the watermark fast path
  reproduces the stored sketch bit-for-bit (the semilattice claim);
* fully-committed replay is a metadata no-op (no new version);
* exact-below-k: a group that never reaches k distinct values reports
  exactly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sec_xbrl_finwarehouse_spark import sinks
from sec_xbrl_finwarehouse_spark.plans.events_queries import KMV_K
from sec_xbrl_finwarehouse_spark.streaming.kmv_stream import (
    foreach_batch_kmv,
    hashes_of,
    kmv_estimate,
    merge_kmv_sketch,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "event_type string, user_id long")


BATCHES = [
    [("big", i) for i in range(150)] + [("small", i) for i in range(4)],
    [("big", i) for i in range(100, 250)] + [("small", 2), ("small", 99)],
    [("big", i) for i in range(200, 400)] + [("small", 4)],
]
ALL_ROWS = [r for b in BATCHES for r in b]
BIG_N, SMALL_N = 400, 6


def _run(spark, tmp_path, app_id="kmv-v1"):
    path = str(tmp_path / "sketch")
    sink = foreach_batch_kmv(path, "event_type", "user_id", app_id=app_id)
    for i, rows in enumerate(BATCHES):
        sink(_batch(spark, rows), i)
    return path, sink


def test_stream_equals_batch_sketch_and_estimate(spark, tmp_path):
    path, _ = _run(spark, tmp_path)
    got = sorted(
        (r["group_key"], r["h"])
        for r in sinks.read_table(spark, path).collect()
    )
    # batch reference: k smallest distinct hashes of ALL data at once
    want_df = merge_kmv_sketch(
        _batch(spark, []).sparkSession.createDataFrame(
            [], "group_key string, h string"
        ),
        hashes_of(_batch(spark, ALL_ROWS), "event_type", "user_id"),
    )
    want = sorted((r["group_key"], r["h"]) for r in want_df.collect())
    assert got == want
    assert len([1 for g, _ in got if g == "big"]) == KMV_K
    assert len([1 for g, _ in got if g == "small"]) == SMALL_N

    est = {r["group_key"]: r["kmv_estimate"]
           for r in kmv_estimate(spark, path).collect()}
    # small group below k: exact; big group: same estimator as the
    # batch event_kmv_distinct on the same distinct population
    assert est["small"] == float(SMALL_N)
    events_dir = tmp_path / "ev"
    spark.createDataFrame(
        [(i, u, et, None, 1.0) for i, (et, u) in enumerate(ALL_ROWS)],
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    ).write.parquet(str(events_dir / "events.parquet"))
    from sec_xbrl_finwarehouse_spark.plans.events_queries import (
        q_event_kmv_distinct,
    )
    batch_est = {
        r["event_type"]: r["kmv_estimate"]
        for r in q_event_kmv_distinct(spark, str(events_dir)).collect()
    }
    assert est["big"] == batch_est["big"]
    assert abs(est["big"] - BIG_N) / BIG_N < 0.5  # fixed-draw band


def test_merge_is_idempotent_without_watermark(spark, tmp_path):
    path, _ = _run(spark, tmp_path)
    stored = sinks.read_table(spark, path)
    replay = merge_kmv_sketch(
        stored, hashes_of(_batch(spark, BATCHES[1]), "event_type", "user_id")
    )
    assert sorted(map(tuple, replay.collect())) == sorted(
        map(tuple, stored.collect())
    )


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
    path = str(tmp_path / "sketch")
    q = (
        spark.readStream.schema("event_type string, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*/")
        .writeStream.foreachBatch(
            foreach_batch_kmv(path, "event_type", "user_id", app_id="e2e")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within 120 s"
    counts = {
        r["group_key"]: r["n"]
        for r in sinks.read_table(spark, path)
        .groupBy("group_key").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"big": KMV_K, "small": SMALL_N}

"""Streaming histogram maintenance (streaming/histogram_stream.py).

The module's claims, each asserted:

* stream-vs-batch equivalence: quantile estimates from the streamed
  histogram equal the batch ``event_histogram_quantiles`` ``*_est``
  columns on the same events;
* the monoid hazard is REAL: re-merging a batch without the watermark
  double-counts (addition is not idempotent -- the exact opposite of
  the KMV semilattice);
* the watermark prevents it: a fully-committed replay through the sink
  is a metadata no-op;
* end-to-end through a real readStream/foreachBatch pipeline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sec_xbrl_finwarehouse_spark import sinks
from sec_xbrl_finwarehouse_spark.streaming.histogram_stream import (
    bins_of,
    foreach_batch_histogram,
    histogram_quantiles,
    merge_histogram,
)


def _batch(spark, rows):
    return spark.createDataFrame(rows, "event_type string, value double")


BATCHES = [
    [("u", float(i)) for i in range(40)],
    [("u", float(i)) for i in range(40, 80)],
    [("u", float(i)) for i in range(80, 100)] + [("v", 5.0), ("v", 7.0)],
]
ALL_ROWS = [r for b in BATCHES for r in b]


def _run(spark, tmp_path, app_id="hist-v1"):
    path = str(tmp_path / "hist")
    sink = foreach_batch_histogram(path, "event_type", "value",
                                   app_id=app_id)
    for i, rows in enumerate(BATCHES):
        sink(_batch(spark, rows), i)
    return path, sink


def test_stream_estimates_equal_batch_query(spark, tmp_path):
    path, _ = _run(spark, tmp_path)
    got = {r["group_key"]: r
           for r in histogram_quantiles(spark, path).collect()}
    assert got["u"]["n"] == 100 and got["v"]["n"] == 2
    events_dir = tmp_path / "ev"
    spark.createDataFrame(
        [(i, i, et, None, v) for i, (et, v) in enumerate(ALL_ROWS)],
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    ).write.parquet(str(events_dir / "events.parquet"))
    from sec_xbrl_finwarehouse_spark.plans.events_queries import (
        q_event_histogram_quantiles,
    )
    batch = {r["event_type"]: r
             for r in q_event_histogram_quantiles(
                 spark, str(events_dir)).collect()}
    for g in ("u", "v"):
        for tag in ("p50_est", "p95_est", "p99_est"):
            assert got[g][tag] == batch[g][tag], (g, tag)


def test_monoid_double_counts_without_watermark(spark, tmp_path):
    path, _ = _run(spark, tmp_path)
    stored = sinks.read_table(spark, path)
    n0 = stored.agg(F.sum("cnt")).collect()[0][0]
    remerged = merge_histogram(
        stored, bins_of(_batch(spark, BATCHES[1]), "event_type", "value")
    )
    n1 = remerged.agg(F.sum("cnt")).collect()[0][0]
    assert n0 == len(ALL_ROWS)
    assert n1 == n0 + len(BATCHES[1])  # the hazard the watermark guards


def test_fully_committed_replay_is_metadata_noop(spark, tmp_path):
    path, sink = _run(spark, tmp_path)
    v = sinks.current_data_dir(path)
    sink(_batch(spark, BATCHES[1]), 1)  # replay
    assert sinks.current_data_dir(path) == v
    n = sinks.read_table(spark, path).agg(F.sum("cnt")).collect()[0][0]
    assert n == len(ALL_ROWS)


def test_streaming_end_to_end_availablenow(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(BATCHES):
        _batch(spark, rows).coalesce(1).write.parquet(
            str(src / f"b{i}.parquet")
        )
    path = str(tmp_path / "hist")
    q = (
        spark.readStream.schema("event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*/")
        .writeStream.foreachBatch(
            foreach_batch_histogram(path, "event_type", "value",
                                    app_id="e2e")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish within 120 s"
    n = sinks.read_table(spark, path).agg(F.sum("cnt")).collect()[0][0]
    assert n == len(ALL_ROWS)

"""Structured Streaming tests: batch/stream equivalence of the window
and session operators (availableNow over a multi-file parquet source)
and the applyInPandasWithState running-totals operator accumulating
state across micro-batches."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sec_xbrl_finwarehouse_spark.streaming.events_stream import (
    dedup_stream,
    sessionize_stream,
    stream_events,
    user_running_totals,
    windowed_counts,
)


def _ts(minute: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=minute)


def _write_batches(spark, tmp_path, batches):
    """One parquet file per batch -> maxFilesPerTrigger=1 gives one
    micro-batch per file in commit order."""
    src = tmp_path / "stream_src"
    src.mkdir()
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            [(eid, u, et, _ts(m), v) for eid, u, et, m, v in rows],
            "event_id long, user_id long, event_type string, ts timestamp, value double",
        )
        df.coalesce(1).write.parquet(str(src / f"batch_{i}.parquet"))
    return str(src) + "/*/"


def _run_to_memory(spark, df, name, mode):
    q = (
        df.writeStream.format("memory").queryName(name)
        .outputMode(mode).trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


BATCHES = [
    [  # batch 0: two users, first hour
        (1, 1, "view", 0.0, 1.0),
        (2, 1, "click", 10.0, 2.0),
        (3, 2, "view", 20.0, 3.0),
    ],
    [  # batch 1: second hour + a session gap for user 1
        (4, 1, "view", 70.0, 4.0),
        (5, 2, "click", 75.0, 5.0),
        (6, 1, "view", 130.0, 6.0),  # > 30 min after event 4 -> new session
    ],
]


def test_windowed_counts_matches_batch(spark, tmp_path):
    src = _write_batches(spark, tmp_path, BATCHES)
    streamed = _run_to_memory(
        spark, windowed_counts(stream_events(spark, src)), "wc_stream", "complete"
    )
    batch_df = spark.read.parquet(src)
    expected = (
        batch_df.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"),
             F.avg("value").alias("avg_value"))
        .select(F.col("w.start").alias("bucket_start"), "event_type",
                "n_events", "total_value", "avg_value")
    )
    got = {tuple(r) for r in streamed.collect()}
    want = {tuple(r) for r in expected.collect()}
    assert got == want and len(want) > 0


def test_sessionize_stream_matches_batch_gaps(spark, tmp_path):
    src = _write_batches(spark, tmp_path, BATCHES)
    streamed = _run_to_memory(
        spark, sessionize_stream(stream_events(spark, src)), "sess_stream", "complete"
    )
    rows = streamed.collect()
    per_user = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r)
    # user 1: events at 0,10 | 70 | 130 -> 3 sessions (30-min gaps)
    assert len(per_user[1]) == 3
    # user 2: events at 20 | 75 -> 2 sessions
    assert len(per_user[2]) == 2
    s1 = sorted(per_user[1], key=lambda r: r["session_start"])
    assert s1[0]["n_events"] == 2 and s1[0]["total_value"] == 3.0
    # session_window end = last event + gap
    assert s1[0]["session_end"] == _ts(10.0 + 30.0)


def test_dedup_stream_drops_replayed_duplicates(spark, tmp_path):
    """At-least-once replay: the same event_id arriving again (same or
    later micro-batch, within the watermark horizon) is emitted once --
    streaming twin of the D1 natural-key dedup."""
    batches = [
        [
            (1, 1, "view", 0.0, 1.0),
            (1, 1, "view", 0.0, 1.0),   # in-batch duplicate
            (2, 1, "click", 10.0, 2.0),
        ],
        [
            (2, 1, "click", 10.0, 2.0),  # replayed from batch 0
            (3, 2, "view", 20.0, 3.0),
        ],
    ]
    src = _write_batches(spark, tmp_path, batches)
    out = _run_to_memory(
        spark, dedup_stream(stream_events(spark, src)), "dedup_stream", "append"
    )
    ids = sorted(r["event_id"] for r in out.collect())
    assert ids == [1, 2, 3]


def test_user_running_totals_accumulates_across_batches(spark, tmp_path):
    src = _write_batches(spark, tmp_path, BATCHES)
    out = _run_to_memory(
        spark, user_running_totals(stream_events(spark, src)), "totals_stream",
        "update",
    )
    rows = out.collect()
    # update mode emits one row per user per micro-batch it appears in;
    # the LAST emission per user carries the cumulative total.
    last = {}
    for r in rows:
        last[r["user_id"]] = r  # memory sink appends in batch order
    assert last[1]["n_events"] == 4 and last[1]["total_value"] == pytest.approx(13.0)
    assert last[2]["n_events"] == 2 and last[2]["total_value"] == pytest.approx(8.0)
    # user 1 appeared in both batches -> two emissions, monotone totals
    u1 = sorted((r["n_events"] for r in rows if r["user_id"] == 1))
    assert u1 == [2, 4]


def test_stream_stream_band_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream band join over two event streams must
    produce exactly the pairs the equivalent batch join produces (append
    mode; availableNow drains both sides deterministically)."""
    from sec_xbrl_finwarehouse_spark.streaming.events_stream import (
        click_view_stream_join,
    )

    batches = [
        [  # clicks and views interleaved around the 5-min band edge
            (1, 1, "view", 0.0, 1.0),
            (2, 1, "click", 4.0, 1.0),    # view@0 within 5 min -> match
            (3, 1, "view", 10.0, 1.0),    # 6 min after click -> no match
            (4, 2, "view", 0.0, 1.0),
        ],
        [
            (5, 2, "click", 4.5, 1.0),    # matches view@0 for user 2
            (6, 3, "click", 50.0, 1.0),   # no views for user 3
            (7, 1, "view", 8.0, 1.0),     # within 5 min of click@4 -> match
        ],
    ]
    src = _write_batches(spark, tmp_path, batches)
    ev = stream_events(spark, src)
    streamed = _run_to_memory(
        spark,
        click_view_stream_join(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "view"),
        ),
        "ssj_stream", "append",
    )
    got = {(r["click_event_id"], r["view_event_id"]) for r in streamed.collect()}
    assert got == {(2, 1), (5, 4), (2, 7)}


def test_funnel_stream_advances_across_batches(spark, tmp_path):
    """Funnel state must carry across micro-batches: view in batch 0,
    click in batch 1, purchase in batch 2 -> final stage 3; a user whose
    click precedes their view stays at stage 1."""
    from sec_xbrl_finwarehouse_spark.streaming.events_stream import funnel_stream

    batches = [
        [(1, 1, "view", 0.0, 1.0), (2, 2, "click", 0.0, 1.0)],
        [(3, 1, "click", 10.0, 1.0), (4, 2, "view", 10.0, 1.0)],
        [(5, 1, "purchase", 20.0, 1.0)],
    ]
    src = _write_batches(spark, tmp_path, batches)
    out = _run_to_memory(spark, funnel_stream(stream_events(spark, src)),
                         "funnel_stream", "update")
    # update mode emits one row per user per touched batch; last wins
    import pandas as pd
    pdf = out.toPandas()
    final = pdf.groupby("user_id")["stage"].max().to_dict()
    assert final == {1: 3, 2: 1}


def test_enrich_stream_matches_batch(spark, tmp_path):
    """Stream x static-dim enrichment rollup equals the batch plan,
    including unknown-tier events (user missing from the dim)."""
    from sec_xbrl_finwarehouse_spark.streaming.events_stream import enrich_stream

    src = _write_batches(spark, tmp_path, BATCHES)
    dim_users = [r["user_id"] for r in
                 spark.read.parquet(src).select("user_id").distinct().collect()]
    # leave one user out of the dimension -> exercises the 'unknown' path
    dim = spark.createDataFrame(
        [(u, "gold" if u % 2 == 0 else "free") for u in sorted(dim_users)[:-1]],
        "user_id long, tier string",
    )
    streamed = _run_to_memory(
        spark, enrich_stream(stream_events(spark, src), dim), "enrich_stream",
        "complete",
    )
    batch_df = spark.read.parquet(src)
    expected = (
        batch_df.join(F.broadcast(dim), "user_id", "left")
        .withColumn("tier", F.coalesce("tier", F.lit("unknown")))
        .groupBy(F.window("ts", "1 hour").alias("w"), "tier")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("bucket_start"), "tier",
                "n_events", "total_value")
    )
    got = {tuple(r) for r in streamed.collect()}
    want = {tuple(r) for r in expected.collect()}
    assert got == want and len(want) > 0
    assert any(r[1] == "unknown" for r in want)

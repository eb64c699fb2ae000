"""Two-writer OCC stress for the versioned IVF index at 10x size
(r11 verdict #7): optimize and append racing in BOTH directions must
surface ConcurrentWriteError -- never a silent drop or a torn merge --
and the losing writer's retry must land with zero data loss.

The interleavings are forced deterministically (the loser's publish
path is wrapped so the winner commits first), which is the only way to
make a race reproducible; the assertions cover exactly the corruption
classes a real race would cause: lost appended ids, a stale pre-split
cell map carried forward, duplicate keys after retry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sec_xbrl_finwarehouse_spark import sinks
from sec_xbrl_finwarehouse_spark.plans import embedding_queries as eq

SF_DIR = "/root/testdata/sf0.001"
COPIES = 10


@pytest.fixture(scope="module")
def sf10x(spark, tmp_path_factory) -> str:
    """sf0.001 with the embeddings table amplified 10x (id-shifted
    copies; vec_id < N_QUERIES stays a unique query set because the
    shifted copies all land far above it)."""
    out = tmp_path_factory.mktemp("sf10x")
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    amplified = e
    for k in range(1, COPIES):
        amplified = amplified.unionByName(
            e.select(
                (F.col("vec_id") + 1000 * k).alias("vec_id"),
                "embedding",
                "label",
            )
        )
    amplified.write.mode("overwrite").parquet(str(out / "embeddings.parquet"))
    return str(out)


def _build(spark, sf10x, tmp_path) -> tuple[str, str, int]:
    idx = str(tmp_path / "ivf10x")
    eq.build_ivf_index_versioned(spark, sf10x, idx)
    corpus_path = f"{idx}/corpus"
    widths = [
        r["n"]
        for r in sinks.read_table(spark, corpus_path)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    assert sum(widths) >= COPIES * 400  # really 10x, minus the query set
    return idx, corpus_path, max(widths) // 2  # at least one cell splits


def _racer(spark, corpus_path, offset: int):
    return (
        sinks.read_table(spark, corpus_path)
        .select("neighbor_id", "emb")
        .limit(3)
        .select((F.col("neighbor_id") + offset).alias("neighbor_id"), "emb")
        .localCheckpoint(eager=True)
    )


def _id_counts(spark, corpus_path) -> dict[int, int]:
    return {
        r["neighbor_id"]: r["n"]
        for r in sinks.read_table(spark, corpus_path)
        .groupBy("neighbor_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_optimize_loses_to_append_then_retry_lands(
    spark, sf10x, tmp_path, monkeypatch
):
    """Append commits between optimize's snapshot and publish:
    optimize must abort (clean -- no cellmap, no version orphan), the
    append's rows must be current, and the RETRIED optimize must land
    its splits with every id still present exactly once."""
    idx, corpus_path, threshold = _build(spark, sf10x, tmp_path)
    before = _id_counts(spark, corpus_path)
    racer = _racer(spark, corpus_path, 5_000_000)
    racer_ids = {r["neighbor_id"] for r in racer.collect()}

    real_replace = sinks.replace_where
    fired = []

    def racing_replace(*args, **kwargs):
        if not fired:
            fired.append(True)
            eq.append_ivf_index_versioned(spark, idx, racer)
        return real_replace(*args, **kwargs)

    monkeypatch.setattr(sinks, "replace_where", racing_replace)
    with pytest.raises(sinks.ConcurrentWriteError):
        eq.optimize_ivf_index(spark, idx, max_cell_rows=threshold)
    monkeypatch.setattr(sinks, "replace_where", real_replace)

    # the append won: its rows are current, the aborted optimize left
    # no split map and no torn state
    mid = _id_counts(spark, corpus_path)
    assert racer_ids <= set(mid)
    assert eq._ivf_cellmap(corpus_path) == {}
    assert set(mid) == set(before) | racer_ids
    assert all(n == 1 for n in mid.values())

    # retry: the optimize lands on the post-append snapshot
    assert eq.optimize_ivf_index(spark, idx, max_cell_rows=threshold) >= 1
    assert eq._ivf_cellmap(corpus_path)  # splits committed
    after = _id_counts(spark, corpus_path)
    assert after == mid  # same ids, still exactly once each


def test_append_loses_to_optimize_then_retry_lands(
    spark, sf10x, tmp_path, monkeypatch
):
    """Optimize commits between append's snapshot (cell map + anti-join
    side) and its publish: the append must abort rather than carry the
    stale pre-split map forward, and its retry must land split-aware
    -- ids present exactly once, the split layout preserved, and the
    rows stored under the SPLIT storage cells where the quantizer cell
    was re-sharded."""
    idx, corpus_path, threshold = _build(spark, sf10x, tmp_path)
    before = _id_counts(spark, corpus_path)
    racer = _racer(spark, corpus_path, 7_000_000)
    racer_ids = {r["neighbor_id"] for r in racer.collect()}

    real_upsert = sinks.upsert_partitioned
    fired = []

    def racing_upsert(*args, **kwargs):
        if not fired:
            fired.append(True)
            eq.optimize_ivf_index(spark, idx, max_cell_rows=threshold)
        return real_upsert(*args, **kwargs)

    monkeypatch.setattr(sinks, "upsert_partitioned", racing_upsert)
    with pytest.raises(sinks.ConcurrentWriteError):
        eq.append_ivf_index_versioned(spark, idx, racer)
    monkeypatch.setattr(sinks, "upsert_partitioned", real_upsert)

    # the optimize won: split map is current, NO racer row leaked in
    cellmap = eq._ivf_cellmap(corpus_path)
    assert cellmap
    mid = _id_counts(spark, corpus_path)
    assert set(mid) == set(before)
    assert not (racer_ids & set(mid))

    # retry: the append lands against the split layout
    assert eq.append_ivf_index_versioned(spark, idx, racer) >= 1
    after = _id_counts(spark, corpus_path)
    assert set(after) == set(before) | racer_ids
    assert all(n == 1 for n in after.values())
    assert eq._ivf_cellmap(corpus_path) == cellmap  # map carried forward
    # replay the same batch: idempotent by key, split-aware
    eq.append_ivf_index_versioned(spark, idx, racer)
    assert _id_counts(spark, corpus_path) == after

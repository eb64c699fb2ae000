"""Stored IVF index tests: build (partitionBy cell) + probe with
partition pruning, results identical to the single-DAG IVF query."""

from __future__ import annotations

import os

from sec_xbrl_finwarehouse_spark.plans import embedding_queries as eq

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_index_probe_matches_inline_query(spark, tmp_path):
    idx = str(tmp_path / "ivf")
    eq.build_ivf_index(spark, SF_DIR, idx)
    # layout: one directory per coarse cell
    cells = [d for d in os.listdir(f"{idx}/corpus") if d.startswith("cell=")]
    assert len(cells) > 1

    stored = eq.q_emb_ivf_index_probe(spark, SF_DIR, idx)
    inline = eq.q_emb_ivf_ann_topk(spark, SF_DIR)
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, inline.collect())
    )


def test_ivf_probe_prunes_partitions(spark, tmp_path):
    """The stored-corpus scan must carry a runtime pruning filter on the
    cell partition column (dynamic partition pruning from the broadcast
    probe join) -- i.e. only probed cell directories are read."""
    idx = str(tmp_path / "ivf")
    eq.build_ivf_index(spark, SF_DIR, idx)
    df = eq.q_emb_ivf_index_probe(spark, SF_DIR, idx)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan


def test_ivfpq_index_probe_matches_inline_query(spark, tmp_path):
    idx = str(tmp_path / "ivfpq")
    eq.build_ivfpq_index(spark, SF_DIR, idx)
    cells = [d for d in os.listdir(f"{idx}/codes") if d.startswith("cell=")]
    assert len(cells) > 1

    stored = eq.q_emb_ivfpq_index_probe(spark, SF_DIR, idx)
    inline = eq.q_emb_ivf_pq_ann_topk(spark, SF_DIR)
    assert sorted(map(tuple, stored.collect())) == sorted(
        map(tuple, inline.collect())
    )


def test_ivfpq_probe_prunes_partitions(spark, tmp_path):
    """The stored codes scan must carry a runtime pruning filter on the
    cell partition column -- only probed cell directories are read."""
    idx = str(tmp_path / "ivfpq")
    eq.build_ivfpq_index(spark, SF_DIR, idx)
    df = eq.q_emb_ivfpq_index_probe(spark, SF_DIR, idx)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan

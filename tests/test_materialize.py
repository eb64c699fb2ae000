"""Warehouse build driver: all marts materialize, rebuild is an
idempotent merge (same data, created_at preserved)."""

from __future__ import annotations

from sec_xbrl_finwarehouse_spark.materialize import build_all_marts
from sec_xbrl_finwarehouse_spark.sinks import read_table

SF_DIR = "/root/testdata/sf0.001"


def test_build_all_marts_and_idempotent_rebuild(spark, tmp_path):
    out = str(tmp_path / "wh")
    paths = build_all_marts(spark, SF_DIR, out)
    first = {
        m: read_table(spark, p).select("cik", "created_at").collect()
        for m, p in paths.items()
    }
    assert all(len(v) > 0 for v in first.values())

    # rebuild: merge over existing -- data identical, created_at kept
    paths2 = build_all_marts(spark, SF_DIR, out)
    assert paths2 == paths
    for m, p in paths.items():
        again = read_table(spark, p).select("cik", "created_at").collect()
        assert sorted(map(tuple, again)) == sorted(map(tuple, first[m])), m

    stm = read_table(spark, paths["statements_annual"])
    assert stm.count() == 70  # sf0.001: 100 suppliers x 7 years minus gaps
    assert {"revenues", "free_cash_flow", "created_at", "updated_at"} <= set(stm.columns)

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


def test_attach_warehouse_sql_surface(spark, tmp_path):
    """attach_warehouse registers every stored mart as a temp view so
    the warehouse answers plain SQL — the reference's Postgres UX."""
    from sec_xbrl_finwarehouse_spark.materialize import (
        attach_warehouse, build_all_marts,
    )

    out = str(tmp_path / "wh")
    build_all_marts(spark, "/root/testdata/sf0.001", out)
    views = attach_warehouse(spark, out)
    assert views == ["companies", "ratios_annual", "statements_annual"]

    row = spark.sql("""
        SELECT s.cik, s.fiscal_year, s.revenues, r.net_margin
        FROM statements_annual s
        JOIN ratios_annual r USING (cik, fiscal_year)
        JOIN companies c USING (cik)
        ORDER BY s.cik, s.fiscal_year LIMIT 1
    """).collect()
    assert len(row) == 1 and row[0]["cik"] is not None

    # snapshot semantics: the view pins the attach-time version
    n_before = spark.sql("SELECT count(*) n FROM companies").first()["n"]
    assert n_before > 0
    for v in views:
        spark.catalog.dropTempView(v)

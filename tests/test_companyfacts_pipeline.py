"""Golden end-to-end fixture: miniature companyfacts JSON -> flatten ->
statements_annual v3 -> ratios_annual, checked exactly (SURVEY.md §5.3,
fixture requirements from FIXTURES.md §A1)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from sec_xbrl_finwarehouse_spark.plans.ratios import compute_ratios
from sec_xbrl_finwarehouse_spark.plans.statements import build_statements
from sec_xbrl_finwarehouse_spark.sources.companyfacts import (
    dedup_facts,
    derive_filings,
    flatten_facts,
    read_companyfacts_json,
)


def _fact(val, accn, form, filed, start, end, fy=2020, fp="FY"):
    return {"val": val, "accn": accn, "form": form, "filed": filed,
            "start": start, "end": end, "frame": None, "fy": fy, "fp": fp}


@pytest.fixture(scope="module")
def facts_df(spark, tmp_path_factory):
    doc = {
        "entityName": "TestCo",
        "cik": 320193,
        "facts": {
            "us-gaap": {
                # flow metric, two filings for FY2020 -> latest filed wins
                "Revenues": {"units": {"USD": [
                    _fact(100.0, "a1", "10-K", "2021-02-01", "2020-01-01", "2020-12-31"),
                    _fact(110.0, "a2", "10-K", "2021-03-01", "2020-01-01", "2020-12-31"),
                    # quarterly period (90 days) -> excluded by the 330-380
                    # filter in v3 and by fiscal_period != 'FY' in v1/v2
                    _fact(999.0, "a3", "10-K", "2021-04-01", "2020-10-01", "2020-12-30",
                          fp="Q4"),
                    # 10-Q form -> excluded by form filter (v3) / fp (v1/v2)
                    _fact(888.0, "a4", "10-Q", "2021-05-01", "2020-01-01", "2020-12-31",
                          fp="Q1"),
                    # null val -> dropped at ingest
                    _fact(None, "a5", "10-K", "2021-06-01", "2020-01-01", "2020-12-31"),
                    # exact duplicate of the a2 fact (same natural key incl. value+filed)
                    _fact(110.0, "a2", "10-K", "2021-03-01", "2020-01-01", "2020-12-31"),
                ], "EUR": [  # non-USD -> excluded at ingest
                    _fact(777.0, "a6", "10-K", "2021-02-01", "2020-01-01", "2020-12-31"),
                ]}},
                # higher-priority revenue candidate present -> v3 must prefer it
                "RevenueFromContractWithCustomerExcludingAssessedTax": {"units": {"USD": [
                    _fact(105.0, "a2", "10-K", "2021-03-01", "2020-01-01", "2020-12-31"),
                ]}},
                "GrossProfit": {"units": {"USD": [
                    _fact(40.0, "a2", "10-K", "2021-03-01", "2020-01-01", "2020-12-31"),
                ]}},
                "NetIncomeLoss": {"units": {"USD": [
                    _fact(20.0, "a2", "10-K", "2021-03-01", "2020-01-01", "2020-12-31"),
                ]}},
                "NetCashProvidedByUsedInOperatingActivities": {"units": {"USD": [
                    _fact(30.0, "a2", "10-K", "2021-03-01", "2020-01-01", "2020-12-31"),
                ]}},
                # negative capex -> sign fix must flip to +8
                "PaymentsToAcquirePropertyPlantAndEquipment": {"units": {"USD": [
                    _fact(-8.0, "a2", "10-K", "2021-03-01", "2020-01-01", "2020-12-31"),
                ]}},
                # stock facts: start is null
                "Assets": {"units": {"USD": [
                    _fact(200.0, "a2", "10-K", "2021-03-01", None, "2020-12-31"),
                ]}},
                "StockholdersEquity": {"units": {"USD": [
                    _fact(80.0, "a2", "10-K", "2021-03-01", None, "2020-12-31"),
                ]}},
                # non-core tag -> excluded by whitelist
                "SomeObscureTag": {"units": {"USD": [
                    _fact(1.0, "a7", "10-K", "2021-02-01", "2020-01-01", "2020-12-31"),
                ]}},
            },
            # non-us-gaap taxonomy -> excluded
            "ifrs-full": {"Revenues": {"units": {"USD": [
                _fact(555.0, "a8", "10-K", "2021-02-01", "2020-01-01", "2020-12-31"),
            ]}}},
        },
    }
    path = tmp_path_factory.mktemp("docs") / "companyfacts.json"
    path.write_text(json.dumps(doc))
    docs = read_companyfacts_json(spark, str(path))
    return dedup_facts(flatten_facts(docs))


def test_flatten_filters_and_dedup(facts_df):
    rows = facts_df.collect()
    # 5 Revenues survive (null val + EUR + dup dropped) + 7 single-fact tags
    assert len(rows) == 11
    assert all(r["cik"] == "0000320193" for r in rows)
    assert all(r["taxonomy"] == "us-gaap" and r["unit"] == "USD" for r in rows)
    tags = {r["tag"] for r in rows}
    assert "SomeObscureTag" not in tags
    assert facts_df.filter(F.col("value").isNull()).count() == 0


def test_derive_filings_one_row_per_accession(facts_df):
    filings = derive_filings(facts_df)
    accns = sorted(r["accession_no"] for r in filings.collect())
    assert accns == ["a1", "a2", "a3", "a4"]


def test_statements_v3_golden(facts_df):
    stm = build_statements(facts_df, version="v3").collect()
    assert len(stm) == 1
    r = stm[0]
    assert r["cik"] == "0000320193" and r["fiscal_year"] == 2020
    # v3 coalesce prefers RevenueFromContract... (105) over latest Revenues (110)
    assert r["revenues"] == 105.0
    assert r["gross_profit"] == 40.0
    assert r["net_income"] == 20.0
    assert r["total_assets"] == 200.0
    assert r["total_equity"] == 80.0
    assert r["operating_cash_flow"] == 30.0
    assert r["capex"] == 8.0            # sign-fixed from -8
    assert r["free_cash_flow"] == 22.0  # 30 - 8
    assert r["operating_income"] is None
    assert r["total_liabilities"] is None


def test_ratios_golden(facts_df):
    ratios = compute_ratios(build_statements(facts_df, version="v3")).collect()
    r = ratios[0]
    assert r["gross_margin"] == 40.0 / 105.0
    assert r["net_margin"] == 20.0 / 105.0
    assert r["roa"] == 20.0 / 200.0
    assert r["roe"] == 20.0 / 80.0
    assert r["leverage"] == 200.0 / 80.0
    assert r["fcf_margin"] == 22.0 / 105.0
    assert r["asset_turnover"] == 105.0 / 200.0
    assert r["operating_margin"] is None  # operating_income absent


def test_derive_filings_carries_fiscal_year_period(facts_df):
    """fy/fp flow through the flatten into FILINGS_SCHEMA's
    fiscal_year/fiscal_period (ingest_facts.py:62-70)."""
    filings = {r["accession_no"]: r for r in derive_filings(facts_df).collect()}
    assert filings["a2"]["fiscal_year"] == 2020
    assert filings["a2"]["fiscal_period"] == "FY"
    assert all(r["fiscal_year"] is not None for r in filings.values())


def test_statements_v1_v2_from_ingested_filings(facts_df):
    """Composes the INGESTED-data path end-to-end: flatten_facts ->
    derive_filings -> build_statements v1/v2 (the reference's
    build_statements_annual.py / _v2.py pipeline). Broken in r1 because
    flatten dropped fy/fp (ADVICE r1 #1)."""
    filings = derive_filings(facts_df)
    for version in ("v1", "v2"):
        stm = build_statements(facts_df, version=version, filings=filings).collect()
        assert len(stm) == 1, version
        r = stm[0]
        assert r["cik"] == "0000320193" and r["fiscal_year"] == 2020
        # v1 takes the literal Revenues tag; v2's coalesce ALSO lists
        # Revenues first (v2.py:6-9) -> both pick the latest-filed 110,
        # unlike v3 which prefers RevenueFromContract... (105)
        assert r["revenues"] == 110.0, version
        assert r["net_income"] == 20.0
        # v1/v2 do NOT sign-fix capex (reference v1/v2 lack the fix)
        assert r["capex"] == -8.0


def test_reingest_idempotent(facts_df):
    doubled = dedup_facts(facts_df.unionByName(facts_df))
    assert doubled.count() == facts_df.count()

"""Version-mode semantics: v2 vs v3 revenue-candidate order (A2), v1
single-tag revenue, v1/v2 filings join + FY filter + form priority."""

from __future__ import annotations

from pyspark.sql import functions as F

from sec_xbrl_finwarehouse_spark.plans.statements import build_statements


def _facts(spark, rows):
    df = spark.createDataFrame(
        rows,
        "cik string, taxonomy string, tag string, unit string, "
        "period_start string, period_end string, value double, "
        "filing_accession_no string, form string, filed string, frame string",
    )
    return (df.withColumn("period_start", F.to_date("period_start"))
              .withColumn("period_end", F.to_date("period_end"))
              .withColumn("filed", F.to_date("filed")))


def _filings(spark, rows):
    df = spark.createDataFrame(
        rows, "accession_no string, fiscal_year int, fiscal_period string")
    return df


BOTH_CANDIDATES = [
    # Revenues=100 and RevenueFromContract...=200 both present for FY2020
    ("C", "us-gaap", "Revenues", "USD", "2020-01-01", "2020-12-31",
     100.0, "a1", "10-K", "2021-02-01", None),
    ("C", "us-gaap", "RevenueFromContractWithCustomerExcludingAssessedTax", "USD",
     "2020-01-01", "2020-12-31", 200.0, "a1", "10-K", "2021-02-01", None),
]


def test_v3_vs_v2_candidate_order(spark):
    facts = _facts(spark, BOTH_CANDIDATES)
    filings = _filings(spark, [("a1", 2020, "FY")])
    v3 = build_statements(facts, "v3").first()
    v2 = build_statements(facts, "v2", filings=filings).first()
    assert v3["revenues"] == 200.0  # RevenueFromContract... first (v3.py:5-10)
    assert v2["revenues"] == 100.0  # Revenues first (v2.py:5-10)


def test_v1_single_tag_revenue(spark):
    facts = _facts(spark, BOTH_CANDIDATES)
    filings = _filings(spark, [("a1", 2020, "FY")])
    v1 = build_statements(facts, "v1", filings=filings).first()
    assert v1["revenues"] == 100.0  # only the literal Revenues tag (v1.py:5-15)


def test_v1v2_fy_filter_and_form_priority(spark):
    facts = _facts(spark, [
        # FY filing: 10-K older, 10-Q newer -> 10-K wins under W2
        ("C", "us-gaap", "Revenues", "USD", "2020-01-01", "2020-12-31",
         1.0, "k", "10-K", "2021-01-01", None),
        ("C", "us-gaap", "Revenues", "USD", "2020-01-01", "2020-12-31",
         2.0, "q", "10-Q", "2021-06-01", None),
        # Q1 filing -> excluded by fiscal_period='FY'
        ("C", "us-gaap", "Revenues", "USD", "2020-01-01", "2020-03-31",
         3.0, "q1", "10-Q", "2020-05-01", None),
    ])
    filings = _filings(spark, [("k", 2020, "FY"), ("q", 2020, "FY"), ("q1", 2020, "Q1")])
    v2 = build_statements(facts, "v2", filings=filings).collect()
    assert len(v2) == 1 and v2[0]["revenues"] == 1.0


def test_v3_period_boundaries(spark):
    # 329 days -> excluded; 330 -> included; 380 -> included; 381 -> excluded
    facts = _facts(spark, [
        ("C", "us-gaap", "Revenues", "USD", "2020-02-06", "2020-12-31", 1.0, "a", "10-K", "2021-01-01", None),  # 329
        ("D", "us-gaap", "Revenues", "USD", "2020-02-05", "2020-12-31", 2.0, "b", "10-K", "2021-01-01", None),  # 330
        ("E", "us-gaap", "Revenues", "USD", "2019-12-17", "2020-12-31", 3.0, "c", "10-K", "2021-01-01", None),  # 380
        ("F", "us-gaap", "Revenues", "USD", "2019-12-16", "2020-12-31", 4.0, "d", "10-K", "2021-01-01", None),  # 381
    ])
    out = {r["cik"]: r["revenues"] for r in build_statements(facts, "v3").collect()}
    assert out == {"D": 2.0, "E": 3.0}


# r12 OPTIMIZATION: the fused v1/v2 argmax pivot must be row-identical
# to the literal W2 window spelling on an adversarial fixture: NULL
# filed (DESC NULLS LAST), same-day refilings (value DESC tiebreak),
# 10-K-vs-20-F priority beating recency, and a cik with ONLY a
# lower-priority form.
V1V2_ARGMAX_ROWS = [
    # 20-F newer vs 10-K older: priority must win over recency
    ("C", "us-gaap", "Revenues", "USD", "2020-01-01", "2020-12-31",
     1.0, "a", "10-K", "2021-01-01", None),
    ("C", "us-gaap", "Revenues", "USD", "2020-01-01", "2020-12-31",
     2.0, "b", "20-F", "2021-06-01", None),
    # same-day 10-K refilings: value DESC tiebreak
    ("C", "us-gaap", "NetIncomeLoss", "USD", "2020-01-01", "2020-12-31",
     5.0, "c", "10-K", "2021-02-01", None),
    ("C", "us-gaap", "NetIncomeLoss", "USD", "2020-01-01", "2020-12-31",
     7.0, "d", "10-K", "2021-02-01", None),
    # NULL filed vs real filed at equal priority: NULLS LAST
    ("D", "us-gaap", "Revenues", "USD", "2020-01-01", "2020-12-31",
     9.0, "e", "20-F", None, None),
    ("D", "us-gaap", "Revenues", "USD", "2020-01-01", "2020-12-31",
     3.0, "f", "20-F", "2021-01-01", None),
    # only a 20-F anywhere: must still surface
    ("E", "us-gaap", "Assets", "USD", None, "2020-12-31",
     11.0, "g", "20-F", "2021-03-01", None),
]
V1V2_ARGMAX_FILINGS = [
    ("a", 2020, "FY"), ("b", 2020, "FY"), ("c", 2020, "FY"),
    ("d", 2020, "FY"), ("e", 2020, "FY"), ("f", 2020, "FY"),
    ("g", 2020, "FY"),
]


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(
        [tuple(str(r[c]) for c in cols) for r in df.collect()]
    )


def test_v1v2_argmax_matches_window(spark):
    facts = _facts(spark, V1V2_ARGMAX_ROWS)
    filings = _filings(spark, V1V2_ARGMAX_FILINGS)
    for version in ("v1", "v2"):
        fused = build_statements(facts, version, filings=filings,
                                 strategy="argmax")
        window = build_statements(facts, version, filings=filings,
                                  strategy="window")
        assert _sorted_rows(fused) == _sorted_rows(window), version
    # spot semantics: priority beats recency, NULLS LAST, value DESC tie
    out = {r["cik"]: r for r in
           build_statements(facts, "v1", filings=filings).collect()}
    assert out["C"]["revenues"] == 1.0       # 10-K wins over newer 20-F
    assert out["C"]["net_income"] == 7.0     # same-day tie -> max value
    assert out["D"]["revenues"] == 3.0       # real filed beats NULL
    assert out["E"]["total_assets"] == 11.0  # lone 20-F survives

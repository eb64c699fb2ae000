"""S7 serving-shape tests: golden JSON responses for the three endpoints
(reference api.py:19,45-61,107-119)."""

from __future__ import annotations

import pytest

from sec_xbrl_finwarehouse_spark import serving
from sec_xbrl_finwarehouse_spark.plans.api_queries import (
    company_profile,
    company_ratios,
    screener,
)


@pytest.fixture(scope="module")
def companies(spark):
    return spark.createDataFrame(
        [
            {"cik": "0000000001", "ticker": "AAA", "name": "Alpha Co"},
            {"cik": "0000000002", "ticker": "BBB", "name": "Beta Co"},
        ]
    )


@pytest.fixture(scope="module")
def ratios(spark):
    def year(cik, fy, roe, fcf, net):
        return {
            "cik": cik, "fiscal_year": fy, "gross_margin": 0.5,
            "operating_margin": 0.2, "net_margin": net, "roa": 0.1,
            "roe": roe, "leverage": 2.0, "fcf_margin": fcf,
            "asset_turnover": 0.8,
        }

    return spark.createDataFrame(
        [
            year("0000000001", 2020, 0.30, 0.10, 0.12),
            year("0000000001", 2021, 0.25, 0.11, 0.13),
            year("0000000002", 2021, 0.40, None, 0.20),
        ]
    )


def test_company_golden(spark, companies):
    resp = serving.collect_response(
        company_profile(companies, "aaa"), serving.shape_company
    )
    assert resp == {"cik": "0000000001", "ticker": "AAA", "name": "Alpha Co"}


def test_company_404(spark, companies):
    with pytest.raises(serving.NotFound):
        serving.collect_response(
            company_profile(companies, "ZZZ"), serving.shape_company
        )


def test_ratios_golden(spark, companies, ratios):
    resp = serving.collect_response(
        company_ratios(companies, ratios, "aaa"), serving.shape_ratios, "aaa"
    )
    assert resp["ticker"] == "AAA"
    # newest fiscal year first (api.py ORDER BY fiscal_year DESC)
    assert [y["fiscal_year"] for y in resp["years"]] == [2021, 2020]
    y2021 = resp["years"][0]
    assert set(y2021) == {
        "fiscal_year", "gross_margin", "operating_margin", "net_margin",
        "roa", "roe", "leverage", "fcf_margin", "asset_turnover",
    }
    assert y2021["roe"] == 0.25 and y2021["fcf_margin"] == 0.11


def test_screener_golden(spark, companies, ratios):
    resp = serving.collect_response(
        screener(ratios, companies, min_roe=0.2), serving.shape_screener
    )
    assert set(resp) == {"results"}
    # fiscal_year DESC then roe DESC NULLS LAST (api.py:97)
    assert [(r["ticker"], r["fiscal_year"]) for r in resp["results"]] == [
        ("BBB", 2021), ("AAA", 2021), ("AAA", 2020),
    ]
    assert resp["results"][0] == {
        "ticker": "BBB", "name": "Beta Co", "fiscal_year": 2021,
        "roe": 0.40, "fcf_margin": None, "net_margin": 0.20,
    }

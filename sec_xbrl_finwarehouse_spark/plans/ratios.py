"""ratios_annual projection -- 8 NULL-safe ratios over statements_annual.

Mirrors scripts/compute_ratios.py:29-39; every division goes through
``safe_div`` (NULL when numerator NULL or denominator NULL/0,
compute_ratios.py:5-8). Pure narrow projection: no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import safe_div


def _safe_div_sql(a: str, b: str) -> str:
    """SQL spelling of :func:`safe_div` -- identical CASE/NULL semantics."""
    return (f"CASE WHEN {a} IS NULL OR {b} IS NULL OR {b} = 0 THEN NULL"
            f" ELSE {a} / {b} END")


# r12 OPTIMIZATION: one selectExpr call instead of 8 composed safe_div
# Column trees (~0.2 s of driver time per compose; guide §1.2 applied to
# the driver). Same CASE WHEN expression, same rows.
_RATIO_EXPRS = [
    f"{_safe_div_sql(a, b)} AS {name}"
    for name, a, b in [
        ("gross_margin", "gross_profit", "revenues"),
        ("operating_margin", "operating_income", "revenues"),
        ("net_margin", "net_income", "revenues"),
        ("roa", "net_income", "total_assets"),
        ("roe", "net_income", "total_equity"),
        ("leverage", "total_assets", "total_equity"),
        ("fcf_margin", "free_cash_flow", "revenues"),
        ("asset_turnover", "revenues", "total_assets"),
    ]
]


def compute_ratios(statements: DataFrame) -> DataFrame:
    return statements.selectExpr("cik", "fiscal_year", *_RATIO_EXPRS)

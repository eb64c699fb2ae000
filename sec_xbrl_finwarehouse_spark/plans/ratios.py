"""ratios_annual projection -- 8 NULL-safe ratios over statements_annual.

Mirrors scripts/compute_ratios.py:29-39; every division goes through
``safe_div`` (NULL when numerator NULL or denominator NULL/0,
compute_ratios.py:5-8). Pure narrow projection: no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import safe_div


def compute_ratios(statements: DataFrame) -> DataFrame:
    rev = F.col("revenues")
    assets = F.col("total_assets")
    equity = F.col("total_equity")
    ni = F.col("net_income")
    return statements.select(
        "cik",
        "fiscal_year",
        safe_div(F.col("gross_profit"), rev).alias("gross_margin"),
        safe_div(F.col("operating_income"), rev).alias("operating_margin"),
        safe_div(ni, rev).alias("net_margin"),
        safe_div(ni, assets).alias("roa"),
        safe_div(ni, equity).alias("roe"),
        safe_div(assets, equity).alias("leverage"),
        safe_div(F.col("free_cash_flow"), rev).alias("fcf_margin"),
        safe_div(rev, assets).alias("asset_turnover"),
    )

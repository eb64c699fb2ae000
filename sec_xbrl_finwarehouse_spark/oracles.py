"""DuckDB oracle SQL for every query in :mod:`plans.star_queries`.

Each generator returns ANSI SQL runnable by DuckDB over the same parquet
tables (pre-registered views). Shared expression snippets are imported
from the Spark-side modules so the two sides cannot drift; the only
engine-specific rewrites are date_diff argument order and NULLS LAST
spelled explicitly.
"""

from __future__ import annotations

from .plans.star_facts import companies_cte_sql, facts_cte_sql, filings_cte_sql
from .plans.star_queries import (
    COALESCE_CANDS,
    EXISTING_PRED,
    FLOW_PRED,
    PRIORITY_CASE,
    PROFILE_TICKER,
    SCREENER_LIMIT,
    SCREENER_MIN_ROE,
    STOCK_PRED,
    UPSERT_INCOMING_PRED,
)
from .schemas import (
    FLOW_TAGS,
    REVENUE_CANDIDATES_V2,
    REVENUE_CANDIDATES_V3,
    STATEMENT_TAG_COLUMNS,
    STOCK_TAGS,
)


def _in_list(tags) -> str:
    return ", ".join(f"'{t}'" for t in tags)


def window_dedup_latest_sql() -> str:
    return """
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_shipdate
FROM (
  SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_shipdate,
         ROW_NUMBER() OVER (
           PARTITION BY l_orderkey
           ORDER BY l_shipdate DESC NULLS LAST, l_linenumber DESC,
                    l_partkey DESC, l_quantity DESC
         ) AS rn
  FROM lineitem
) WHERE rn = 1
"""


def window_dedup_priority_sql() -> str:
    return f"""
SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice, o_orderdate
FROM (
  SELECT o_custkey, o_orderkey, o_orderstatus, o_totalprice, o_orderdate,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY {PRIORITY_CASE}, o_orderdate DESC NULLS LAST, o_orderkey DESC
         ) AS rn
  FROM orders
) WHERE rn = 1
"""


def pivot_wide_sql() -> str:
    return """
SELECT l_suppkey,
       max(CASE WHEN l_returnflag = 'R' THEN l_quantity END) AS qty_r,
       max(CASE WHEN l_returnflag = 'A' THEN l_quantity END) AS qty_a,
       max(CASE WHEN l_returnflag = 'N' THEN l_quantity END) AS qty_n
FROM (
  SELECT l_suppkey, l_returnflag, l_quantity,
         ROW_NUMBER() OVER (
           PARTITION BY l_suppkey, l_returnflag
           ORDER BY l_shipdate DESC NULLS LAST, l_orderkey DESC,
                    l_linenumber DESC, l_quantity DESC
         ) AS rn
  FROM lineitem
) WHERE rn = 1
GROUP BY l_suppkey
"""


def coalesce_priority_sql() -> str:
    cands = ", ".join(COALESCE_CANDS)
    return f"SELECT o_orderkey, coalesce({cands}) AS picked_value FROM orders"


def flow_stock_union_sql() -> str:
    return f"""
SELECT l_orderkey, l_linenumber, 'flow' AS kind, l_extendedprice AS value
FROM lineitem WHERE {FLOW_PRED}
UNION ALL
SELECT l_orderkey, l_linenumber, 'stock' AS kind, l_quantity * 10 AS value
FROM lineitem WHERE {STOCK_PRED}
"""


def annual_period_filter_sql() -> str:
    return """
SELECT l_orderkey, l_linenumber,
       date_diff('day', o_orderdate, l_shipdate) AS ship_lag_days
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE date_diff('day', o_orderdate, l_shipdate) BETWEEN 60 AND 90
"""


def top_k_orders_sql() -> str:
    return """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC NULLS LAST, o_orderkey ASC
LIMIT 10
"""


def natural_key_dedup_sql() -> str:
    return "SELECT DISTINCT * FROM (SELECT * FROM lineitem UNION ALL SELECT * FROM lineitem)"


def insert_if_absent_sql() -> str:
    return f"""
SELECT * FROM orders WHERE {EXISTING_PRED}
UNION ALL
SELECT * FROM orders WHERE {UPSERT_INCOMING_PRED} AND NOT ({EXISTING_PRED})
"""


def upsert_latest_wins_sql() -> str:
    return f"""
SELECT o_orderkey,
       CASE WHEN {UPSERT_INCOMING_PRED} THEN o_totalprice * 2 ELSE o_totalprice END AS price,
       CASE WHEN {UPSERT_INCOMING_PRED} THEN 'new' ELSE 'old' END AS src
FROM orders
"""


# ---- the full pipeline ----------------------------------------------------

def _statements_body() -> str:
    """CTE chain facts -> flow/stock dedup -> wide -> derived columns,
    mirroring build_statements_annual_v3.py:40-152 exactly."""
    tag_cols = ",\n         ".join(
        f"max(CASE WHEN tag = '{t}' THEN value END) AS \"{t}\""
        for t in tuple(FLOW_TAGS) + tuple(STOCK_TAGS)
    )
    rev = ", ".join(f'"{t}"' for t in REVENUE_CANDIDATES_V3)
    c = {k: f'"{v}"' for k, v in STATEMENT_TAG_COLUMNS.items()}
    capex = c["capex"]
    ocf = c["operating_cash_flow"]
    capex_fixed = f"CASE WHEN {capex} < 0 THEN -{capex} ELSE {capex} END"
    return f"""
flow AS (
  SELECT cik, CAST(year(period_end) AS INT) AS fiscal_year, tag, value,
         filed, filing_accession_no
  FROM facts
  WHERE taxonomy = 'us-gaap' AND unit = 'USD'
    AND tag IN ({_in_list(FLOW_TAGS)})
    AND form IN ('10-K', '20-F')
    AND period_start IS NOT NULL AND period_end IS NOT NULL
    AND date_diff('day', period_start, period_end) BETWEEN 330 AND 380
),
stock AS (
  SELECT cik, CAST(year(period_end) AS INT) AS fiscal_year, tag, value,
         filed, filing_accession_no
  FROM facts
  WHERE taxonomy = 'us-gaap' AND unit = 'USD'
    AND tag IN ({_in_list(STOCK_TAGS)})
    AND form IN ('10-K', '20-F')
    AND period_end IS NOT NULL AND period_start IS NULL
),
dedup AS (
  SELECT cik, fiscal_year, tag, value FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY cik, fiscal_year, tag
      ORDER BY filed DESC NULLS LAST, value DESC
    ) AS rn FROM flow) WHERE rn = 1
  UNION ALL
  SELECT cik, fiscal_year, tag, value FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY cik, fiscal_year, tag
      ORDER BY filed DESC NULLS LAST, value DESC
    ) AS rn FROM stock) WHERE rn = 1
),
wide AS (
  SELECT cik, fiscal_year,
         {tag_cols}
  FROM dedup GROUP BY cik, fiscal_year
),
statements AS (
  SELECT cik, fiscal_year,
         coalesce({rev}) AS revenues,
         {c["gross_profit"]} AS gross_profit,
         {c["operating_income"]} AS operating_income,
         {c["net_income"]} AS net_income,
         {c["total_assets"]} AS total_assets,
         {c["total_liabilities"]} AS total_liabilities,
         {c["total_equity"]} AS total_equity,
         {ocf} AS operating_cash_flow,
         {capex_fixed} AS capex,
         {ocf} - ({capex_fixed}) AS free_cash_flow
  FROM wide
)"""


def statements_annual_sql() -> str:
    return f"{facts_cte_sql()},{_statements_body()}\nSELECT * FROM statements"


def _statements_v1v2_body(version: str) -> str:
    """CTE chain for the v1/v2 path: borrow fiscal_year from the filings
    dimension (J1), keep FY filings only, W2 dedup preferring 10-K then
    latest filed, NO capex sign fix. v2 coalesces its candidate order
    (build_statements_annual_v2.py:5-10); v1 takes the single
    ``Revenues`` tag (build_statements_annual.py:5-15)."""
    tag_cols = ",\n         ".join(
        f"max(CASE WHEN tag = '{t}' THEN value END) AS \"{t}\""
        for t in tuple(FLOW_TAGS) + tuple(STOCK_TAGS)
    )
    if version == "v1":
        rev = '"Revenues"'
    else:
        rev = ", ".join(f'"{t}"' for t in REVENUE_CANDIDATES_V2)
    c = {k: f'"{v}"' for k, v in STATEMENT_TAG_COLUMNS.items()}
    return f"""
joined AS (
  SELECT f.cik, fl.fiscal_year, f.tag, f.value, f.filed, f.form
  FROM facts f JOIN filings fl ON f.filing_accession_no = fl.accession_no
  WHERE fl.fiscal_year IS NOT NULL AND fl.fiscal_period = 'FY'
    AND f.unit = 'USD'
),
dedup AS (
  SELECT cik, fiscal_year, tag, value FROM (
    SELECT *, ROW_NUMBER() OVER (
      PARTITION BY cik, fiscal_year, tag
      ORDER BY CASE WHEN form = '10-K' THEN 0 ELSE 1 END,
               filed DESC NULLS LAST, value DESC
    ) AS rn FROM joined) WHERE rn = 1
),
wide AS (
  SELECT cik, fiscal_year,
         {tag_cols}
  FROM dedup GROUP BY cik, fiscal_year
),
statements AS (
  SELECT cik, fiscal_year,
         coalesce({rev}) AS revenues,
         {c["gross_profit"]} AS gross_profit,
         {c["operating_income"]} AS operating_income,
         {c["net_income"]} AS net_income,
         {c["total_assets"]} AS total_assets,
         {c["total_liabilities"]} AS total_liabilities,
         {c["total_equity"]} AS total_equity,
         {c["operating_cash_flow"]} AS operating_cash_flow,
         {c["capex"]} AS capex,
         {c["operating_cash_flow"]} - {c["capex"]} AS free_cash_flow
  FROM wide
)"""


def statements_annual_v2_sql() -> str:
    return (f"{facts_cte_sql()},\n{filings_cte_sql()},"
            f"{_statements_v1v2_body('v2')}\nSELECT * FROM statements")


def statements_annual_v1_sql() -> str:
    return (f"{facts_cte_sql()},\n{filings_cte_sql()},"
            f"{_statements_v1v2_body('v1')}\nSELECT * FROM statements")


def _safe_div(a: str, b: str) -> str:
    return f"CASE WHEN {a} IS NULL OR {b} IS NULL OR {b} = 0 THEN NULL ELSE {a} / {b} END"


def _ratios_body() -> str:
    return f""",
ratios AS (
  SELECT cik, fiscal_year,
         {_safe_div("gross_profit", "revenues")} AS gross_margin,
         {_safe_div("operating_income", "revenues")} AS operating_margin,
         {_safe_div("net_income", "revenues")} AS net_margin,
         {_safe_div("net_income", "total_assets")} AS roa,
         {_safe_div("net_income", "total_equity")} AS roe,
         {_safe_div("total_assets", "total_equity")} AS leverage,
         {_safe_div("free_cash_flow", "revenues")} AS fcf_margin,
         {_safe_div("revenues", "total_assets")} AS asset_turnover
  FROM statements
)"""


def ratios_annual_sql() -> str:
    return f"{facts_cte_sql()},{_statements_body()}{_ratios_body()}\nSELECT * FROM ratios"


def company_profile_sql() -> str:
    return (f"WITH {companies_cte_sql()} "
            f"SELECT cik, ticker, name FROM companies WHERE ticker = '{PROFILE_TICKER}'")


def ratios_lookup_sql() -> str:
    return f"""{facts_cte_sql()},{_statements_body()}{_ratios_body()},
{companies_cte_sql()}
SELECT fiscal_year, gross_margin, operating_margin, net_margin,
       roa, roe, leverage, fcf_margin, asset_turnover
FROM ratios r JOIN companies c ON c.cik = r.cik
WHERE c.ticker = '{PROFILE_TICKER}'
ORDER BY fiscal_year DESC
LIMIT 10
"""


def screener_sql() -> str:
    return f"""{facts_cte_sql()},{_statements_body()}{_ratios_body()},
{companies_cte_sql()}
SELECT ticker, name, fiscal_year, roe, fcf_margin, net_margin
FROM (
  SELECT c.ticker, c.name, r.fiscal_year, r.roe, r.fcf_margin, r.net_margin, r.cik
  FROM ratios r JOIN companies c ON c.cik = r.cik
  WHERE r.roe >= {SCREENER_MIN_ROE}
  ORDER BY r.fiscal_year DESC, r.roe DESC NULLS LAST, r.cik ASC
  LIMIT {SCREENER_LIMIT}
)
"""


def build_reference_oracles() -> dict[str, str]:
    return {
        "window_dedup_latest": window_dedup_latest_sql(),
        "window_dedup_priority": window_dedup_priority_sql(),
        "pivot_wide": pivot_wide_sql(),
        "coalesce_priority": coalesce_priority_sql(),
        "flow_stock_union": flow_stock_union_sql(),
        "annual_period_filter": annual_period_filter_sql(),
        "top_k_orders": top_k_orders_sql(),
        "natural_key_dedup": natural_key_dedup_sql(),
        "insert_if_absent": insert_if_absent_sql(),
        "upsert_latest_wins": upsert_latest_wins_sql(),
        "statements_annual": statements_annual_sql(),
        "statements_annual_v2": statements_annual_v2_sql(),
        "statements_annual_v1": statements_annual_v1_sql(),
        "ratios_annual": ratios_annual_sql(),
        "company_profile": company_profile_sql(),
        "ratios_lookup": ratios_lookup_sql(),
        "screener": screener_sql(),
    }

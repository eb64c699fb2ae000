"""Adapter: derive a reference-shaped ``facts`` long table from the driver
star schema (TESTDATA.md lineitem), so the full statements/ratios/screener
pipeline (SURVEY.md §3.2-3.3) runs end-to-end on the test data with a
DuckDB oracle.

Mapping (deterministic, engine-agnostic):
  * entity (cik)   <- l_suppkey, zero-padded to 10 like a CIK
  * fiscal_year    <- year(l_shipdate)
  * filed          <- l_shipdate (NULL every 17th order: NULLS LAST check)
  * accession      <- 'ACC-<orderkey>-<linenumber>' (unique tiebreak)
  * form           <- 10-K / 20-F, with 10-Q rows injected (filtered out)
  * taxonomy/unit  <- us-gaap/USD with ifrs-full and EUR noise rows
  * 12 CORE_TAGS   <- arithmetic over lineitem measures; revenue candidates
                      populated disjointly by returnflag/linestatus so the
                      coalesce priority (v3.py:5-10) is exercised; capex
                      emitted negative (sign-fix check, v3.py:136-139);
                      equity zero for every 5th supplier (safe_div check)
  * flow periods   <- Jan 1..Dec 31 (364/365 days, inside 330-380), with
                      quarterly Oct 1..Dec 31 rows injected (filtered out)
  * stock periods  <- period_start NULL, period_end Dec 31

Every snippet below is SQL text valid in BOTH Spark SQL and DuckDB --
the Spark DataFrame builder and the DuckDB oracle generator consume the
same strings, so the two sides cannot drift. All arithmetic is
IEEE-double with identical operand order => bit-identical values in both
engines (no sums are taken before the pivot; the pipeline only *selects*
values).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- shared SQL snippets (Spark SQL == DuckDB dialect subset) -------------

BASE_COLS: dict[str, str] = {
    "cik": "lpad(CAST(l_suppkey AS STRING), 10, '0')",
    "taxonomy": "CASE WHEN l_orderkey % 19 = 0 THEN 'ifrs-full' ELSE 'us-gaap' END",
    "unit": "CASE WHEN l_orderkey % 23 = 0 THEN 'EUR' ELSE 'USD' END",
    "form": ("CASE WHEN l_orderkey % 13 = 0 THEN '10-Q' "
             "WHEN l_suppkey % 2 = 0 THEN '10-K' ELSE '20-F' END"),
    "filed": "CASE WHEN l_orderkey % 17 = 0 THEN CAST(NULL AS DATE) ELSE CAST(l_shipdate AS DATE) END",
    "accn": "concat('ACC-', CAST(l_orderkey AS STRING), '-', CAST(l_linenumber AS STRING))",
    "y": "CAST(year(l_shipdate) AS INT)",
    "quarterly": "(l_orderkey % 10 = 0)",
}

FLOW_PERIOD_START = "CASE WHEN quarterly THEN make_date(y, 10, 1) ELSE make_date(y, 1, 1) END"
STOCK_PERIOD_START = "CAST(NULL AS DATE)"
PERIOD_END = "make_date(y, 12, 31)"


@dataclass(frozen=True)
class FactBranch:
    tag: str
    value_sql: str          # expression over lineitem columns
    where_sql: str | None   # row filter, or None for all rows
    stock: bool             # True => instantaneous (period_start NULL)


FACT_BRANCHES: tuple[FactBranch, ...] = (
    # revenue candidates, populated disjointly so coalesce order matters
    FactBranch("RevenueFromContractWithCustomerExcludingAssessedTax",
               "l_extendedprice * (1 - l_discount)", "l_returnflag = 'N'", False),
    FactBranch("SalesRevenueNet", "l_extendedprice", "l_returnflag = 'R'", False),
    FactBranch("Revenues", "l_extendedprice * (1 + l_tax)", "l_returnflag = 'A'", False),
    FactBranch("TotalRevenues", "l_extendedprice", "l_linestatus = 'O'", False),
    # P&L + cash flow
    FactBranch("GrossProfit", "l_extendedprice - l_quantity * 100", None, False),
    FactBranch("OperatingIncomeLoss", "l_extendedprice * 0.2 - l_quantity", None, False),
    FactBranch("NetIncomeLoss", "l_extendedprice * 0.1", None, False),
    FactBranch("NetCashProvidedByUsedInOperatingActivities",
               "l_extendedprice * 0.15", None, False),
    # negative on purpose: v3 sign fix must flip it
    FactBranch("PaymentsToAcquirePropertyPlantAndEquipment",
               "-(l_quantity * 50.0)", None, False),
    # balance sheet (stock facts)
    FactBranch("Assets", "l_extendedprice * 3.0", None, True),
    FactBranch("Liabilities", "l_extendedprice * 1.5", None, True),
    FactBranch("StockholdersEquity",
               "CASE WHEN l_suppkey % 5 = 0 THEN 0.0 ELSE l_extendedprice * 1.5 END",
               None, True),
)


# --- Spark-side builders ---------------------------------------------------

def synthetic_facts(
    lineitem: DataFrame,
    entity_partitions: int | None = None,
    tags: tuple[str, ...] | None = None,
) -> DataFrame:
    """lineitem -> FACTS_SCHEMA-shaped long table, single scan.

    One parquet scan; each row emits its matching tag branches via
    ``explode(array(<struct per branch>))`` (the reference's S3 flatten
    idiom, ingest_facts.py:39-88, re-targeted). No UDFs, no extra scans.

    ``entity_partitions``: when set, hash-partition the base rows by
    ``cik`` before the explode. Every downstream statements/ratios key
    (cik, fiscal_year[, tag]) is functionally co-partitioned with cik,
    so this ONE exchange satisfies the ClusteredDistribution of every
    later aggregation/window -- the rest of the pipeline runs
    exchange-free. Measured at sf0.1 (fresh plans per run): 1.5s vs
    2.7s for a round-robin repartition of the same width vs 10.8s with
    no repartition (single-row-group parquet scans as one split).
    The same idiom at 100 TB: bucket facts by entity at INGEST and
    every mart rebuild is exchange-free with no runtime repartition
    at all.

    ``tags``: when set, emit only the branches whose tag is in the set
    -- manual computed-column pushdown. Catalyst prunes unused PIVOT
    aggregates fine, but it cannot drop elements of the
    ``explode(array(...))``, so a query that consumes a tag subset
    (e.g. the screener needs 8 of 12) would otherwise still generate,
    filter, and partially aggregate every branch's rows. The DuckDB
    oracle's UNION-ALL spelling gets this pruning from its optimizer
    for free; this parameter is the Spark-side equivalent. Output is
    identical as long as the caller's final projection touches only
    columns derived from ``tags`` (the pivot emits all-NULL columns
    for missing tags, which the pruned projections never read).
    """
    # explicit projection documents what the exchange actually carries;
    # Catalyst's ColumnPruning reaches the same scan/shuffle schema (6
    # measure columns + 8 derived) either way -- verified via ReadSchema.
    #
    # r12 OPTIMIZATION: the whole builder is ONE ``spark.sql`` template
    # (the snippets above were already SQL text) instead of ~60 composed
    # Column objects -- the Column spelling cost ~0.4 s of driver time
    # per compose (py4j round-trips; guide §1.2 applied to the driver),
    # paid by every statements/ratios/screener query. The REPARTITION
    # hint is the SQL spelling of the same cik exchange. Identical rows
    # and plan shape (oracle-exact, tests/test_statements_versions.py).
    branch_inputs = ("l_extendedprice", "l_discount", "l_tax", "l_quantity",
                     "l_returnflag", "l_linestatus", "l_suppkey")
    base_cols = ",\n               ".join(
        f"{sql} AS {name}" for name, sql in BASE_COLS.items()
    )
    hint = (f"/*+ REPARTITION({entity_partitions}, cik) */ "
            if entity_partitions else "")
    branch_structs = ", ".join(
        "struct('{tag}' AS tag, {stock} AS is_stock, CAST({val} AS DOUBLE)"
        " AS value)".format(
            tag=b.tag,
            stock="true" if b.stock else "false",
            val=(f"CASE WHEN {b.where_sql} THEN {b.value_sql} END"
                 if b.where_sql else b.value_sql),
        )
        for b in FACT_BRANCHES
        if tags is None or b.tag in tags
    )
    return lineitem.sparkSession.sql(
        f"""
        WITH base AS (
          SELECT {hint}{", ".join(branch_inputs)},
               {base_cols}
          FROM {{lineitem}}
        ),
        exploded AS (
          SELECT cik, taxonomy, unit, form, filed, accn, y, quarterly, t
          FROM base LATERAL VIEW explode(array({branch_structs})) AS t
          WHERE t.value IS NOT NULL
        )
        SELECT cik, taxonomy, t.tag AS tag, unit,
               CASE WHEN t.is_stock THEN {STOCK_PERIOD_START}
                    ELSE {FLOW_PERIOD_START} END AS period_start,
               {PERIOD_END} AS period_end,
               t.value AS value, accn AS filing_accession_no, form, filed,
               CAST(NULL AS STRING) AS frame
        FROM exploded
        """,
        lineitem=lineitem,
    )


# Filings dimension for the v1/v2 statements path (J1): one row per
# accession; fiscal_period 'Q2' noise exercises the FY filter
# (build_statements_annual.py:28-50 / _v2.py:33-57 borrow fiscal_year
# from filings and keep only FY rows).
FILINGS_PERIOD = "CASE WHEN l_orderkey % 11 = 0 THEN 'Q2' ELSE 'FY' END"


def synthetic_filings(lineitem: DataFrame) -> DataFrame:
    """lineitem -> filings dimension (accession_no, fiscal_year,
    fiscal_period), aligned with ``synthetic_facts``'s accession spelling
    so the v1/v2 join resolves every fact."""
    return lineitem.select(
        F.expr(BASE_COLS["accn"]).alias("accession_no"),
        F.expr(BASE_COLS["y"]).alias("fiscal_year"),
        F.expr(FILINGS_PERIOD).alias("fiscal_period"),
    )


def filings_cte_sql() -> str:
    return (f"filings AS (SELECT accn AS accession_no, y AS fiscal_year,\n"
            f"         {FILINGS_PERIOD} AS fiscal_period FROM base)")


def star_companies(supplier: DataFrame) -> DataFrame:
    """Companies dimension analog from supplier (cik aligned with
    synthetic_facts; ticker = upper(name) like seed_companies.py:18)."""
    return supplier.select(
        F.lpad(F.col("s_suppkey").cast("string"), 10, "0").alias("cik"),
        F.upper(F.col("s_name")).alias("ticker"),
        F.col("s_name").alias("name"),
    )


# --- shared CTE text for the DuckDB oracle --------------------------------

def base_cte_sql() -> str:
    cols = ",\n         ".join(f"{sql} AS {name}" for name, sql in BASE_COLS.items())
    return f"SELECT {cols},\n         lineitem.* FROM lineitem"


def facts_cte_sql() -> str:
    """UNION ALL branch per tag over the base CTE -- semantically identical
    to :func:`synthetic_facts` (DuckDB's optimizer collapses the repeated
    base scans; this text form keeps the oracle plainly readable)."""
    parts = []
    for b in FACT_BRANCHES:
        period_start = STOCK_PERIOD_START if b.stock else FLOW_PERIOD_START
        where = f"\n    WHERE {b.where_sql}" if b.where_sql else ""
        parts.append(
            f"    SELECT cik, taxonomy, '{b.tag}' AS tag, unit,\n"
            f"           {period_start} AS period_start,\n"
            f"           {PERIOD_END} AS period_end,\n"
            f"           CAST({b.value_sql} AS DOUBLE) AS value,\n"
            f"           accn AS filing_accession_no, form, filed,\n"
            f"           CAST(NULL AS STRING) AS frame\n"
            f"    FROM base{where}"
        )
    branches = "\n    UNION ALL\n".join(parts)
    return f"WITH base AS (\n    {base_cte_sql()}\n),\nfacts AS (\n{branches}\n)"


def companies_cte_sql() -> str:
    return ("companies AS (SELECT lpad(CAST(s_suppkey AS STRING), 10, '0') AS cik, "
            "upper(s_name) AS ticker, s_name AS name FROM supplier)")

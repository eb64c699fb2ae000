"""Warehouse build driver: the reference's script sequence as one call.

The reference is operated as ``seed_companies.py`` -> ``ingest_facts.py``
-> ``build_statements_annual_v3.py`` -> ``compute_ratios.py``, each
materializing a mart into Postgres. :func:`build_all_marts` is that
workflow on the Spark engine: derive the facts/companies inputs, build
statements + ratios, and persist every mart through the upsert sink
(S5 + F12 audit columns), so a rebuild is an idempotent merge rather
than a blind overwrite -- running it twice leaves identical data with
``created_at`` preserved from the first run.

Scale notes: each mart write is one PK-keyed merge (sinks.upsert); the
statements/ratios marts share the facts derivation lazily, and because
every stage keys on cik(-prefixed) columns, the whole rebuild reuses one
entity partitioning (see star_facts.synthetic_facts). At 100 TB the mart
paths point at partitioned object-store tables and nothing here changes.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import sinks
from .plans.ratios import compute_ratios
from .plans.star_facts import star_companies, synthetic_facts
from .plans.statements import build_statements
from .session import default_parallelism
from .sources.tables import table_path


def build_all_marts(spark: SparkSession, sf_dir: str, out_dir: str) -> dict[str, str]:
    """Materialize companies, statements_annual, and ratios_annual marts
    under ``out_dir`` via idempotent PK upserts. Returns mart -> path."""
    lineitem = spark.read.parquet(table_path(sf_dir, "lineitem"))
    supplier = spark.read.parquet(table_path(sf_dir, "supplier"))

    companies = star_companies(supplier)
    facts = synthetic_facts(lineitem, entity_partitions=default_parallelism())
    statements = build_statements(facts, version="v3")
    ratios = compute_ratios(statements)

    paths = {
        "companies": f"{out_dir}/companies",
        "statements_annual": f"{out_dir}/statements_annual",
        "ratios_annual": f"{out_dir}/ratios_annual",
    }
    sinks.upsert(spark, paths["companies"], companies, keys=["cik"])
    sinks.upsert(spark, paths["statements_annual"], statements,
                 keys=["cik", "fiscal_year"])
    sinks.upsert(spark, paths["ratios_annual"], ratios,
                 keys=["cik", "fiscal_year"])
    return paths


def materialize_facts_bucketed(
    spark: SparkSession,
    sf_dir: str,
    path: str,
    table_name: str = "facts_bucketed",
    buckets: int | None = None,
) -> str:
    """Ingest-time bucketing: persist the facts long table hash-bucketed
    (and per-bucket sorted) on ``cik``.

    This is the stored-layout form of ``synthetic_facts``'s
    ``entity_partitions`` exchange: pay the entity shuffle ONCE at
    ingest, record it in the catalog, and every later mart rebuild over
    ``spark.table(table_name)`` plans its (cik[, fiscal_year[, tag]])
    aggregations, windows, and self-joins with ZERO exchange -- the
    scan itself reports the hash partitioning. The runtime repartition
    uses the SAME count and hash family as the writer's bucketing, so
    each task holds exactly one bucket's rows and the writer emits one
    file per bucket (avoiding the tasks x buckets small-files blowup
    of bucketing an unaligned frame).

    At 100 TB this replaces the reference's Postgres PK clustering
    (db/schema.sql:30-38): nightly rebuilds read the bucketed facts and
    never shuffle the fact table again.
    """
    n = buckets or default_parallelism()
    facts = synthetic_facts(
        spark.read.parquet(table_path(sf_dir, "lineitem")),
        entity_partitions=n,
    )
    sinks.write_bucketed(facts, table_name, path, ["cik"], buckets=n)
    return table_name


def build_marts_from_facts(
    spark: SparkSession, facts, sf_dir: str, out_dir: str
) -> dict[str, str]:
    """The mart builds of :func:`build_all_marts`, from an
    already-materialized facts frame (e.g. ``spark.table(...)`` over a
    bucketed facts table, making the whole rebuild exchange-free)."""
    supplier = spark.read.parquet(table_path(sf_dir, "supplier"))
    companies = star_companies(supplier)
    statements = build_statements(facts, version="v3")
    ratios = compute_ratios(statements)
    paths = {
        "companies": f"{out_dir}/companies",
        "statements_annual": f"{out_dir}/statements_annual",
        "ratios_annual": f"{out_dir}/ratios_annual",
    }
    sinks.upsert(spark, paths["companies"], companies, keys=["cik"])
    sinks.upsert(spark, paths["statements_annual"], statements,
                 keys=["cik", "fiscal_year"])
    sinks.upsert(spark, paths["ratios_annual"], ratios,
                 keys=["cik", "fiscal_year"])
    return paths

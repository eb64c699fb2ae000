"""Parquet star-schema loaders (driver test data, TESTDATA.md).

Reads are plain ``spark.read.parquet`` so Catalyst predicate pushdown /
column pruning reach the scan. Nothing here collects or caches --
callers decide lifetimes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import STAR_TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def ensure_min_partitions(df: DataFrame, n: int | None = None) -> DataFrame:
    """Repartition only when the scan produced fewer splits than cores.

    The local test parquet is a single row group, so Spark gets ONE input
    partition and every downstream stage serializes onto one core. On a
    real cluster (many files / row groups) the scan is already parallel
    and this is a no-op -- the gate on the observed partition count keeps
    the extra exchange out of plans that don't need it.
    """
    from ..session import default_parallelism

    n = n or default_parallelism()
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def load_star_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = STAR_TABLES
) -> dict[str, DataFrame]:
    return {name: spark.read.parquet(table_path(sf_dir, name)) for name in names}


def register_star_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = STAR_TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view so Spark SQL text also works."""
    dfs = load_star_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs

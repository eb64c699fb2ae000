"""Proof of the bucket-at-ingest claim: statements rebuilt from a facts
table BUCKETED BY cik plans with ZERO shuffle exchanges -- the exact
100 TB story the synthetic_facts/statements docstrings promise (one
partitioning established at ingest, every downstream agg reuses it)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from sec_xbrl_finwarehouse_spark.plans.star_facts import synthetic_facts
from sec_xbrl_finwarehouse_spark.plans.statements import build_statements

SF_DIR = "/root/testdata/sf0.001"


def _n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(
        r"Exchange hashpartitioning|Exchange rangepartitioning"
        r"|Exchange RoundRobinPartitioning", plan))


def test_bucketed_facts_rebuild_is_exchange_free(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    facts = synthetic_facts(li)  # no runtime repartition -- bucketing replaces it

    spark.sql("DROP TABLE IF EXISTS facts_bucketed")
    (facts.write.bucketBy(8, "cik").sortBy("cik")
          .option("path", str(tmp_path / "facts_bucketed"))  # external: files in tmp
          .mode("overwrite").saveAsTable("facts_bucketed"))

    stored = spark.table("facts_bucketed")
    rebuilt = build_statements(stored, version="v3")
    assert _n_exchanges(rebuilt) == 0, "bucketed rebuild must not shuffle"

    # and it computes the same rows as the repartition-based plan
    baseline = build_statements(
        synthetic_facts(li, entity_partitions=8), version="v3")
    got = sorted(map(tuple, rebuilt.collect()))
    want = sorted(map(tuple, baseline.collect()))
    assert got == want and len(got) > 0
    spark.sql("DROP TABLE IF EXISTS facts_bucketed")

"""Bucketed-layout guarantees: co-located joins and aggregations on the
bucket keys plan with ZERO Exchange, and equality filters on the bucket
key prune to a single bucket file. These are plan-shape assertions (the
whole point of bucketing is what DISAPPEARS from the plan) plus a
correctness diff against the plain-shuffle join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sec_xbrl_finwarehouse_spark import sinks

SF_DIR = "/root/testdata/sf0.001"
BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    sinks.write_bucketed(
        orders, "b_orders", str(root / "orders"), ["o_orderkey"], BUCKETS
    )
    sinks.write_bucketed(
        lineitem, "b_lineitem", str(root / "lineitem"), ["l_orderkey"],
        BUCKETS,
    )
    yield spark
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_cobucketed_join_has_no_exchange(bucketed):
    spark = bucketed
    # merge hint: at test SF the orders side is broadcast-sized, which
    # would sidestep the co-located SMJ this test exists to assert; at
    # real scale two fact tables never broadcast and SMJ is the plan.
    joined = (
        spark.table("b_lineitem")
        .join(
            spark.table("b_orders").hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.sum("l_extendedprice").alias("revenue"))
    )
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    # the join itself is exchange-free; the only exchange permitted is
    # the (tiny, post-join) groupBy on the non-bucket column
    join_part = plan.split("SortMergeJoin")[1]
    assert "Exchange" not in join_part


def test_groupby_on_bucket_key_has_no_exchange(bucketed):
    spark = bucketed
    agg = (
        spark.table("b_lineitem")
        .groupBy("l_orderkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
    )
    assert "Exchange" not in _plan(agg)


def test_bucket_pruning_on_equality_filter(bucketed):
    spark = bucketed
    some_key = spark.table("b_orders").select("o_orderkey").first()[0]
    # autoBucketedScan drops the bucketed layout from plans with no
    # exchange to remove — turn it off so the point lookup keeps the
    # bucketed scan and prunes to the single matching bucket file
    key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        pruned = spark.table("b_orders").filter(
            F.col("o_orderkey") == some_key
        )
        assert f"SelectedBucketsCount: 1 out of {BUCKETS}" in _plan(pruned)
    finally:
        spark.conf.set(key, prev)


def test_bucketed_join_matches_shuffle_join(bucketed):
    spark = bucketed
    via_buckets = (
        spark.table("b_lineitem")
        .join(spark.table("b_orders"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
    )
    plain_orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    plain_lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    via_shuffle = (
        plain_lineitem.join(
            plain_orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
    )
    got = {tuple(r) for r in via_buckets.collect()}
    want = {tuple(r) for r in via_shuffle.collect()}
    assert got == want and len(want) > 0


def test_bucketed_facts_make_statements_build_exchange_free(
    spark, tmp_path_factory
):
    """The 100 TB idiom stated in synthetic_facts' docstring, made real:
    facts bucketed by cik at ingest -> the whole statements build
    (dedup groupBys + pivot) plans with ZERO Exchange, and its result
    matches the runtime-repartition build bit-for-bit."""
    from sec_xbrl_finwarehouse_spark.materialize import (
        materialize_facts_bucketed,
    )
    from sec_xbrl_finwarehouse_spark.plans.star_facts import synthetic_facts
    from sec_xbrl_finwarehouse_spark.plans.statements import build_statements

    root = tmp_path_factory.mktemp("bfacts")
    name = materialize_facts_bucketed(
        spark, SF_DIR, str(root / "facts"), table_name="t_facts_b",
        buckets=4,
    )
    try:
        stmts = build_statements(spark.table(name), version="v3")
        assert "Exchange" not in _plan(stmts)

        plain = build_statements(
            synthetic_facts(
                spark.read.parquet(f"{SF_DIR}/lineitem.parquet"),
                entity_partitions=4,
            ),
            version="v3",
        )
        got = {tuple(r) for r in stmts.collect()}
        want = {tuple(r) for r in plain.collect()}
        assert got == want and len(want) > 0
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")

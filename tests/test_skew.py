"""Salted-join operator: result equivalence with the plain join (inner
and left, including unmatched keys), salt spreading of a hot key, and
the plan shape (join keys extended by the salt)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sec_xbrl_finwarehouse_spark.operators.skew import SALT_COL, salted_join


def _sides(spark):
    # hot key 1 carries 5k rows; keys 2/3 a handful; key 99 has no match
    rows = [(1, i) for i in range(5000)] + [(2, 0), (3, 0), (99, 0)]
    large = spark.createDataFrame(rows, "k long, payload long")
    small = spark.createDataFrame(
        [(1, "hot"), (2, "warm"), (3, "warm")], "k long, tag string"
    )
    return large, small


def test_salted_inner_matches_plain(spark):
    large, small = _sides(spark)
    got = salted_join(large, small, ["k"], n_salts=8).collect()
    want = large.join(small, ["k"], "inner").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))


def test_salted_left_keeps_unmatched(spark):
    large, small = _sides(spark)
    got = salted_join(large, small, ["k"], n_salts=8, how="left").collect()
    want = large.join(small, ["k"], "left").collect()
    assert sorted(map(tuple, (tuple(r) for r in got))) == sorted(
        map(tuple, (tuple(r) for r in want))
    )
    assert any(r["k"] == 99 and r["tag"] is None for r in got)


def test_hot_key_spreads_over_salts_even_for_exact_duplicates(spark):
    # EXACT duplicate rows (pre-dedup logs -- the common skew shape): a
    # row-content hash alone would put all of them in ONE bucket; the
    # per-partition row index in the salt must spread them anyway
    dup_rows = [(1, 0)] * 5000
    large = spark.createDataFrame(dup_rows, "k long, payload long")
    salted = large.withColumn(
        SALT_COL,
        F.pmod(
            F.xxhash64(*[F.col(c) for c in large.columns],
                       F.monotonically_increasing_id()),
            F.lit(8),
        ),
    )
    n_buckets = salted.select(SALT_COL).distinct().count()
    assert n_buckets == 8
    # and the join over pure duplicates still matches the plain join
    small = spark.createDataFrame([(1, "hot")], "k long, tag string")
    got = salted_join(large, small, ["k"], n_salts=8).count()
    assert got == 5000


def test_salt_is_a_join_key_in_the_plan(spark):
    large, small = _sides(spark)
    plan = salted_join(large, small, ["k"], n_salts=8)._jdf.queryExecution(
    ).executedPlan().toString()
    assert SALT_COL in plan

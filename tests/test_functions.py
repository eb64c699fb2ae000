"""Unit tests for the scalar expression helpers (SURVEY.md §2.8),
targeting the semantic razor edges: safe_div zero/null, capex sign,
null-propagating subtraction, empty dynamic filter."""

from __future__ import annotations

from pyspark.sql import functions as F

from sec_xbrl_finwarehouse_spark.functions import (
    coalesce_priority,
    dynamic_conjunction,
    positive_outflow,
    safe_div,
    zero_pad_cik,
)


def test_safe_div_null_and_zero(spark):
    df = spark.createDataFrame(
        [(10.0, 2.0), (10.0, 0.0), (10.0, None), (None, 2.0), (None, None)],
        "a double, b double",
    )
    out = [r[0] for r in df.select(safe_div(F.col("a"), F.col("b"))).collect()]
    assert out == [5.0, None, None, None, None]


def test_positive_outflow_sign_fix(spark):
    df = spark.createDataFrame([(-5.0,), (7.0,), (0.0,), (None,)], "x double")
    out = [r[0] for r in df.select(positive_outflow(F.col("x"))).collect()]
    assert out == [5.0, 7.0, 0.0, None]


def test_null_propagating_fcf(spark):
    df = spark.createDataFrame(
        [(10.0, 4.0), (10.0, None), (None, 4.0)], "ocf double, capex double"
    )
    out = [r[0] for r in df.select((F.col("ocf") - F.col("capex")).alias("fcf")).collect()]
    assert out == [6.0, None, None]


def test_coalesce_priority_order(spark):
    df = spark.createDataFrame(
        [(None, 2.0, 3.0), (1.0, 2.0, None), (None, None, None)],
        "c1 double, c2 double, c3 double",
    )
    out = [r[0] for r in df.select(coalesce_priority("c1", "c2", "c3")).collect()]
    assert out == [2.0, 1.0, None]


def test_dynamic_conjunction_empty_means_no_filter(spark):
    df = spark.range(5)
    assert df.filter(dynamic_conjunction([])).count() == 5
    assert df.filter(dynamic_conjunction([F.col("id") > 2, F.col("id") < 4])).count() == 1


def test_zero_pad_cik(spark):
    df = spark.createDataFrame([(320193,)], "cik long")
    assert df.select(zero_pad_cik(F.col("cik"))).first()[0] == "0000320193"

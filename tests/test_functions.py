"""Unit tests for the expression library (formatting, bucketize,
TimeDiffNormal, normalizers, combiners)."""

import math

from pyspark.sql import functions as F

from featuregenerator_spark.functions.bucketize import (
    bucketize_expr,
    time_diff_normal_expr,
)
from featuregenerator_spark.functions.combiners import combine_array
from featuregenerator_spark.functions.formatting import fmt_float_0f
from featuregenerator_spark.functions.normalizers import parse_normalizer
from featuregenerator_spark.oracle import pandas_kernels as oracle


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_fmt_float_0f_half_even(spark):
    rows = (
        spark.createDataFrame(
            [(0.5,), (1.5,), (2.5,), (3.49,), (-0.5,), (123.0,), (1e15,)], "x double"
        )
        .select(fmt_float_0f(F.col("x")).alias("s"))
        .collect()
    )
    assert [r["s"] for r in rows] == ["0", "2", "2", "3", "-0", "123", "1000000000000000"]


def test_bucketize_upper_bound(spark):
    bounds = [0.0, 2.0, 5.0, 9.0]
    vals = [(-1.0,), (0.0,), (2.0,), (3.0,), (6.0,), (9.0,), (10.0,)]
    rows = (
        spark.createDataFrame(vals, "x double")
        .select(bucketize_expr(F.col("x"), bounds).alias("b"))
        .collect()
    )
    got = [r["b"] for r in rows]
    want = [oracle.bucketize(v[0], bounds) for v in vals]
    assert got == want == [0, 1, 2, 2, 3, 4, 4]


def test_time_diff_normal_matches_oracle(spark):
    cases = [(0.0, 3.0), (3.0, 3.0), (59.0, 1e6), (299.0, 1e6), (599.0, 1e6),
             (1799.0, 1e6), (3599.0, 1e6), (21599.0, 1e6), (43199.0, 1e6),
             (43200.0, 1e6), (9000.0, 10000.0), (10000.0, 10000.0)]
    df = spark.createDataFrame(cases, "gap double, now double")
    rows = df.select(
        time_diff_normal_expr(F.col("gap"), F.col("now")).alias("b")
    ).collect()
    for (gap, now), r in zip(cases, rows):
        assert r["b"] == oracle.time_diff_normal(gap, now), (gap, now)


def test_normalizers(spark):
    n = parse_normalizer("method=minmax,min=2.0,max=8.0")
    assert abs(_one(spark, n.expr(F.lit(5.0))) - 0.5) < 1e-9
    n = parse_normalizer("method=zscore,mean=1.0,standard_deviation=2.0")
    assert abs(_one(spark, n.expr(F.lit(5.0))) - 2.0) < 1e-9
    n = parse_normalizer("method=log10,threshold=0,default=-1")
    assert abs(_one(spark, n.expr(F.lit(100.0))) - 2.0) < 1e-9
    assert abs(_one(spark, n.expr(F.lit(-3.0))) - (-1.0)) < 1e-9
    n = parse_normalizer(
        "method=bound_regular,mean=0.0,standard_deviation=1.0,"
        "y_add=0,y_min=10,y_max=1,log=false"
    )
    # min(max(5,1)+0, 10) = 5
    assert abs(_one(spark, n.expr(F.lit(5.0))) - 5.0) < 1e-9


def test_combiners_empty_semantics(spark):
    arr = F.array().cast("array<double>")
    for comb, want in [("sum", 0.0), ("min", 0.0), ("max", 0.0), ("mean", 0.0), ("count", 0.0)]:
        assert _one(spark, combine_array(arr, comb)) == want, comb
    vals = F.array(F.lit(1.0), F.lit(3.0), F.lit(2.0))
    assert _one(spark, combine_array(vals, "sum")) == 6.0
    assert _one(spark, combine_array(vals, "min")) == 1.0
    assert _one(spark, combine_array(vals, "max")) == 3.0
    assert _one(spark, combine_array(vals, "mean")) == 2.0
    assert _one(spark, combine_array(vals, "count")) == 3.0
    # nulls (misses) are skipped
    with_null = F.array(F.lit(1.0), F.lit(None).cast("double"), F.lit(2.0))
    assert _one(spark, combine_array(with_null, "mean")) == 1.5
    assert _one(spark, combine_array(with_null, "count")) == 2.0

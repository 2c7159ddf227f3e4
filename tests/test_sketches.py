"""Theta-sketch distinct counting: accuracy, mergeability, thresholds."""

import pytest

from pyspark.sql import functions as F

from featuregenerator_spark.operators.sketches import (
    theta_distinct,
    theta_threshold,
)


def test_threshold_exactness_and_bounds():
    # 0.25 * 16^8 is exactly 2^30 -> threshold '40000000', eff exact
    assert theta_threshold(0.25) == ("40000000", 0.25)
    assert theta_threshold(0.5) == ("80000000", 0.5)
    # theta=1.0 samples everything: 'g' sorts above every hex char
    thresh, eff = theta_threshold(1.0)
    assert eff == 1.0 and thresh > "ffffffff"
    with pytest.raises(ValueError):
        theta_threshold(0.0)
    with pytest.raises(ValueError):
        theta_threshold(1.5)


def test_accuracy_at_known_distinct_count(spark):
    """300k rows / 20k true distinct keys per group: relative error is
    measured at 0.002-0.008 for theta=0.25; pin a 3% ceiling."""
    df = spark.range(300000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 60000).alias("k"),
    )
    out = theta_distinct(df, "k", ["g"], theta=0.25).collect()
    assert len(out) == 3
    for r in out:
        assert abs(r["est_distinct"] - 20000) / 20000 < 0.03, tuple(r)


def test_theta_one_is_exact(spark):
    df = spark.range(5000).select(
        F.lit("g").alias("g"), (F.col("id") % 137).alias("k")
    )
    (r,) = theta_distinct(df, "k", ["g"], theta=1.0).collect()
    assert r["n_sampled"] == 137
    assert r["est_distinct"] == 137.0


def test_merge_property_disjoint_halves(spark):
    """Sketches merge by adding sampled counts when key spaces are
    disjoint: half A + half B must reproduce the whole-data sketch
    exactly (determinism makes this an equality, not an approximation)."""
    df = spark.range(100000).select(
        F.lit("g").alias("g"), (F.col("id") % 30000).alias("k")
    )
    lo = df.filter(F.col("k") < 15000)
    hi = df.filter(F.col("k") >= 15000)
    (whole,) = theta_distinct(df, "k", ["g"], theta=0.25).collect()
    (a,) = theta_distinct(lo, "k", ["g"], theta=0.25).collect()
    (b,) = theta_distinct(hi, "k", ["g"], theta=0.25).collect()
    assert a["n_sampled"] + b["n_sampled"] == whole["n_sampled"]
    assert a["est_distinct"] + b["est_distinct"] == whole["est_distinct"]


def test_duplicate_rows_do_not_inflate(spark):
    """The estimator counts DISTINCT sampled keys: replicating every row
    10x must not change the sketch."""
    base = spark.range(20000).select(
        F.lit("g").alias("g"), (F.col("id") % 4000).alias("k")
    )
    fat = base.withColumn("dup", F.explode(F.array(*[F.lit(i) for i in range(10)])))
    (r1,) = theta_distinct(base, "k", ["g"], theta=0.25).collect()
    (r2,) = theta_distinct(fat, "k", ["g"], theta=0.25).collect()
    assert (r1["n_sampled"], r1["est_distinct"]) == (
        r2["n_sampled"],
        r2["est_distinct"],
    )


def test_quantile_sketch_accuracy_and_sample_merge(spark):
    """Quantile estimates from the row sample: rank error shrinks as
    1/sqrt(theta*n) — pin p50/p95 within 2% of truth on a uniform
    100k-row group — and the SAMPLE merges: computing the sketch over
    two disjoint row halves unioned equals the whole-data sketch."""
    from featuregenerator_spark.operators.sketches import theta_quantiles

    df = spark.range(100000).select(
        F.lit("g").alias("g"),
        F.col("id").alias("rid"),
        (F.col("id") % 10000).cast("double").alias("v"),
    )
    (r,) = theta_quantiles(df, "v", ["g"], [0.5, 0.95], "rid").collect()
    assert abs(r["q_0_5"] - 5000.0) / 10000 < 0.02, r["q_0_5"]
    assert abs(r["q_0_95"] - 9500.0) / 10000 < 0.02, r["q_0_95"]

    halves = df.filter(F.col("rid") < 50000).unionAll(
        df.filter(F.col("rid") >= 50000)
    )
    (r2,) = theta_quantiles(halves, "v", ["g"], [0.5, 0.95], "rid").collect()
    assert (r["n_sampled"], r["q_0_5"], r["q_0_95"]) == (
        r2["n_sampled"],
        r2["q_0_5"],
        r2["q_0_95"],
    )

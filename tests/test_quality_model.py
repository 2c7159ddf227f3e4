"""Pins for the linear (fastText-shape) quality scorer."""

import math

import pytest
from pyspark.sql import functions as F

from featuregenerator_spark.operators.quality_model import (
    DEMO_BIAS,
    DEMO_WEIGHTS,
    linear_score_columns,
    linear_score_join,
    sigmoid,
)


def test_closed_form_score(spark):
    # "the fast data" -> (0.9 + 0.4 + 0.3)/3 + bias
    df = spark.createDataFrame([(1, "the fast data")], "doc_id long, text string")
    cols = linear_score_columns(F.col("text"), DEMO_WEIGHTS, DEMO_BIAS)
    r = df.select(
        cols["quality_score"].alias("s"), cols["quality_prob"].alias("p")
    ).collect()[0]
    expected = DEMO_BIAS + (0.9 + 0.4 + 0.3) / 3
    assert r["s"] == pytest.approx(expected, abs=1e-12)
    assert r["p"] == pytest.approx(sigmoid(expected), abs=1e-12)


def test_oov_tokens_score_zero(spark):
    df = spark.createDataFrame([(1, "zz yy xx")], "doc_id long, text string")
    cols = linear_score_columns(F.col("text"), DEMO_WEIGHTS, bias=0.25)
    r = df.select(cols["quality_score"].alias("s")).collect()[0]
    assert r["s"] == pytest.approx(0.25, abs=1e-12)


def test_map_literal_equals_broadcast_join(spark):
    # The two physical forms of the same model must agree to float
    # round-off on a corpus hitting vocab, OOV, and repeats.
    rows = [
        (i, " ".join(["the", "slow", f"w{i % 7}", "data", "hash"][: 2 + i % 4]))
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cols = linear_score_columns(F.col("text"), DEMO_WEIGHTS, DEMO_BIAS)
    a = {
        r["doc_id"]: r["p"]
        for r in df.select("doc_id", cols["quality_prob"].alias("p")).collect()
    }
    wdf = spark.createDataFrame(
        sorted(DEMO_WEIGHTS.items()), "token string, weight double"
    )
    b = {
        r["doc_id"]: r["quality_prob"]
        for r in linear_score_join(df, wdf, DEMO_BIAS).collect()
    }
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)


def test_join_form_plan_broadcasts(spark):
    df = spark.createDataFrame([(1, "the a of")], "doc_id long, text string")
    wdf = spark.createDataFrame(
        sorted(DEMO_WEIGHTS.items()), "token string, weight double"
    )
    plan = linear_score_join(df, wdf)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

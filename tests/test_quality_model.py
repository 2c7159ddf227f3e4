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


def test_integer_deci_sum_is_exact_and_order_independent(spark):
    # DEMO_WEIGHTS are deci-quantized, so the literal-map form must take
    # the exact integer-sum path: score == bias + (sum_w10/10)/n computed
    # in Python with integer arithmetic, bit-for-bit, and a permuted
    # token order must give the IDENTICAL double (integer addition is
    # associative; the old float fold was not — that was the r04
    # quality_model_score driver-gate flake).
    from featuregenerator_spark.operators.quality_model import weights_int_scale

    assert weights_int_scale(DEMO_WEIGHTS) == 10
    texts = [
        (1, "the slow hash of a data window join scan value"),
        (2, "slow slow slow fast"),
        (3, "zz the zz the zz"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    rev = spark.createDataFrame(
        [(i, " ".join(reversed(t.split()))) for i, t in texts],
        "doc_id long, text string",
    )
    cols = linear_score_columns(F.col("text"), DEMO_WEIGHTS, DEMO_BIAS)
    got = {r["doc_id"]: r["s"] for r in df.select("doc_id", cols["quality_score"].alias("s")).collect()}
    got_rev = {r["doc_id"]: r["s"] for r in rev.select("doc_id", cols["quality_score"].alias("s")).collect()}
    for i, t in texts:
        toks = t.split()
        w10 = sum(int(round(DEMO_WEIGHTS.get(w, 0.0) * 10)) for w in toks)
        expected = DEMO_BIAS + (w10 / 10.0) / len(toks)
        assert got[i] == expected  # exact, not approx
        assert got_rev[i] == got[i]  # order-independent, bit-for-bit


def test_non_decimal_weights_fall_back_to_float_path(spark):
    from featuregenerator_spark.operators.quality_model import weights_int_scale

    w = {"pi": math.pi, "e": math.e}
    assert weights_int_scale(w) is None
    df = spark.createDataFrame([(1, "pi e zz")], "doc_id long, text string")
    cols = linear_score_columns(F.col("text"), w, bias=0.0)
    r = df.select(cols["quality_score"].alias("s")).collect()[0]
    assert r["s"] == pytest.approx((math.pi + math.e) / 3, abs=1e-12)


def test_join_form_plan_broadcasts(spark):
    df = spark.createDataFrame([(1, "the a of")], "doc_id long, text string")
    wdf = spark.createDataFrame(
        sorted(DEMO_WEIGHTS.items()), "token string, weight double"
    )
    plan = linear_score_join(df, wdf)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

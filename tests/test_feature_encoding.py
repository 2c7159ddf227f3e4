"""Point-in-time target encoding + quantile binning: leakage, chunked
prefix-sum parity, closed forms."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from featuregenerator_spark.operators.feature_encoding import (
    quantile_bins,
    target_encode_pit,
)


def _ev(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, cat string, value double"
    )
    return df.withColumn("ds", F.to_date("ts"))


def _t(i):
    return dt.datetime(2026, 1, 1 + i // 4, 6 + (i % 4) * 3, 0, 0)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (i, _t(i), "ab"[i % 2], float(10 + (i * 7) % 13)) for i in range(24)
    ]
    return _ev(spark, rows)


def _encode(df, **kw):
    return target_encode_pit(
        df, cat_col="cat", target_col="value",
        order_cols=("ts", "event_id"), smoothing=20, **kw
    )


def test_no_temporal_leakage(spark, events):
    """THE invariant: changing any FUTURE row's target must not change
    a prior row's encoding — and the row's own target must not appear
    in its encoding."""
    base = {
        r["event_id"]: r["te"]
        for r in _encode(events, chunk_col="ds").collect()
    }
    # perturb the last 4 rows' targets wildly
    pert = events.withColumn(
        "value",
        F.when(F.col("event_id") >= 20, F.col("value") * 1000.0).otherwise(
            F.col("value")
        ),
    )
    after = {
        r["event_id"]: r["te"] for r in _encode(pert, chunk_col="ds").collect()
    }
    for i in range(20):
        assert after[i] == base[i], f"row {i} leaked from the future"
    # perturbing row 21's own target must not change row 21's encoding
    pert21 = events.withColumn(
        "value",
        F.when(F.col("event_id") == 21, F.lit(9e6)).otherwise(F.col("value")),
    )
    after21 = {
        r["event_id"]: r["te"]
        for r in _encode(pert21, chunk_col="ds").collect()
    }
    assert after21[21] == base[21], "row saw its own target"


def test_chunked_equals_global(spark, events):
    a = sorted(
        (r["event_id"], r["te"])
        for r in _encode(events, chunk_col="ds").collect()
    )
    b = sorted(
        (r["event_id"], r["te"]) for r in _encode(events).collect()
    )
    assert a == b  # exact equality: both paths sum the same exact longs


def test_first_row_null_and_smoothing_pull(spark, events):
    out = {
        r["event_id"]: r["te"]
        for r in _encode(events, chunk_col="ds").collect()
    }
    assert out[0] is None  # no leak-free history exists
    # second row: cat 'b' has no prior rows -> te == global prior mean
    # of the single prior row (smoothing fully dominates)
    first_val = 10.0  # value of event 0: 10 + 0
    assert out[1] == pytest.approx(first_val, abs=1e-9)


def test_closed_form_third_row(spark):
    rows = [
        (0, _t(0), "a", 10.0),
        (1, _t(1), "a", 20.0),
        (2, _t(2), "a", 0.0),
    ]
    out = {
        r["event_id"]: r["te"]
        for r in _encode(_ev(spark, rows), chunk_col="ds").collect()
    }
    # row 2: sum_cat=30, cnt_cat=2, prior=(10+20)/2=15, m=20
    assert out[2] == pytest.approx((30.0 + 20 * 15.0) / 22.0, abs=1e-9)


def test_quantile_bins_edges_inclusive_lower(spark):
    train = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 9)], "event_id long, value double"
    )
    # quartiles of 1..8: q25=2.75, q50=4.5, q75=6.25
    apply_df = spark.createDataFrame(
        [(100, 2.75), (101, 2.76), (102, 4.5), (103, 6.25), (104, 6.26),
         (105, 0.0), (106, 99.0)],
        "event_id long, value double",
    )
    got = {
        r["event_id"]: r["bin"]
        for r in quantile_bins(train, apply_df, "value").collect()
    }
    assert got == {100: 0, 101: 1, 102: 1, 103: 2, 104: 3, 105: 0, 106: 3}


def test_quantile_bins_no_per_edge_join(spark):
    train = spark.createDataFrame(
        [(i, float(i)) for i in range(8)], "event_id long, value double"
    )
    plan = (
        quantile_bins(train, train, "value")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # exactly one broadcast (the one-row edges table), no shuffle join
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "SortMergeJoin" not in plan

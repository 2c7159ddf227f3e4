"""Bucketed range join (plans/interval.py): parity with the naive
BETWEEN join, boundary inclusivity, left join, and explode guards."""

import pytest

from pyspark.sql import functions as F

from featuregenerator_spark.plans.interval import interval_join

IV_DDL = "k string, iv_id long, lo double, hi double"
PT_DDL = "k string, pt_id long, t double"

INTERVALS = [
    ("a", 1, 100.0, 250.0),    # spans several 60s buckets
    ("a", 2, 240.0, 260.0),    # overlaps iv 1 -> points match both
    ("a", 3, 1000.0, 1000.0),  # zero-length (point interval)
    ("b", 4, 0.0, 50.0),       # other key: never matches 'a' points
]
POINTS = [
    ("a", 10, 100.0),   # == lo (inclusive)
    ("a", 11, 250.0),   # == iv1.hi AND inside iv2 -> two matches
    ("a", 12, 255.0),   # inside iv2 only
    ("a", 13, 261.0),   # just outside everything
    ("a", 14, 1000.0),  # matches the zero-length interval
    ("b", 15, 25.0),    # matches iv4 under key b
    ("b", 16, 100.0),   # no match
]


def _naive(spark):
    iv = spark.createDataFrame(INTERVALS, IV_DDL)
    pt = spark.createDataFrame(POINTS, PT_DDL)
    return (
        pt.join(iv, "k")
        .filter((F.col("t") >= F.col("lo")) & (F.col("t") <= F.col("hi")))
        .select("pt_id", "iv_id")
    )


@pytest.mark.parametrize("bucket", [10.0, 60.0, 10000.0])
def test_parity_with_naive_between_join(spark, bucket):
    """The bucketed join must equal the naive key-join + BETWEEN filter
    for buckets smaller than, comparable to, and far larger than the
    intervals."""
    iv = spark.createDataFrame(INTERVALS, IV_DDL)
    pt = spark.createDataFrame(POINTS, PT_DDL)
    got = {
        (r["pt_id"], r["iv_id"])
        for r in interval_join(
            pt, iv, "k", "t", "lo", "hi", bucket_seconds=bucket
        ).collect()
    }
    want = {(r["pt_id"], r["iv_id"]) for r in _naive(spark).collect()}
    assert got == want
    # the fixture exercises a real 1-to-many match
    assert (11, 1) in got and (11, 2) in got


def test_left_join_keeps_unmatched_points(spark):
    iv = spark.createDataFrame(INTERVALS, IV_DDL)
    pt = spark.createDataFrame(POINTS, PT_DDL)
    out = interval_join(
        pt, iv, "k", "t", "lo", "hi", bucket_seconds=60.0, how="left"
    ).collect()
    by_pt = {}
    for r in out:
        by_pt.setdefault(r["pt_id"], []).append(r["iv_id"])
    assert by_pt[13] == [None]
    assert by_pt[16] == [None]
    assert sorted(by_pt[11]) == [1, 2]
    # matched points contribute no null row
    assert None not in by_pt[10]


def test_inverted_interval_raises(spark):
    iv = spark.createDataFrame([("a", 1, 50.0, 10.0)], IV_DDL)
    pt = spark.createDataFrame([("a", 10, 20.0)], PT_DDL)
    out = interval_join(pt, iv, "k", "t", "lo", "hi")
    with pytest.raises(Exception, match="interval_join"):
        out.collect()


def test_oversized_interval_raises(spark):
    iv = spark.createDataFrame([("a", 1, 0.0, 1e9)], IV_DDL)
    pt = spark.createDataFrame([("a", 10, 20.0)], PT_DDL)
    out = interval_join(
        pt, iv, "k", "t", "lo", "hi", bucket_seconds=1.0,
        max_interval_buckets=100,
    )
    with pytest.raises(Exception, match="max_interval_buckets"):
        out.collect()


def test_compound_key(spark):
    iv = spark.createDataFrame(
        [("a", "x", 1, 0.0, 10.0)], "k string, k2 string, iv_id long, lo double, hi double"
    )
    pt = spark.createDataFrame(
        [("a", "x", 10, 5.0), ("a", "y", 11, 5.0)],
        "k string, k2 string, pt_id long, t double",
    )
    got = {
        (r["pt_id"], r["iv_id"])
        for r in interval_join(pt, iv, ["k", "k2"], "t", "lo", "hi").collect()
    }
    assert got == {(10, 1)}


def test_duplicate_rows_keep_sql_join_multiplicity(spark):
    """Duplicate point rows and duplicate interval rows must survive with
    exact SQL-join multiplicity (the old full-row distinct silently
    collapsed them): 2 identical points x 2 identical intervals -> 4
    matched rows, exactly what the naive BETWEEN join emits — for every
    bucket width, including one where the interval spans many buckets."""
    iv = spark.createDataFrame(
        [("a", 1, 100.0, 250.0), ("a", 1, 100.0, 250.0)], IV_DDL
    )
    pt = spark.createDataFrame(
        [("a", 10, 150.0), ("a", 10, 150.0), ("a", 11, 300.0)], PT_DDL
    )
    naive = sorted(
        map(
            tuple,
            pt.join(iv, "k")
            .filter((F.col("t") >= F.col("lo")) & (F.col("t") <= F.col("hi")))
            .select("pt_id", "iv_id")
            .collect(),
        )
    )
    assert naive == [(10, 1)] * 4
    for bucket in (10.0, 60.0, 10000.0):
        got = sorted(
            map(
                tuple,
                interval_join(
                    pt, iv, "k", "t", "lo", "hi", bucket_seconds=bucket
                )
                .select("pt_id", "iv_id")
                .collect(),
            )
        )
        assert got == naive, (bucket, got)
        # and the duplicated unmatched point keeps both copies on a left join
        left = interval_join(
            pt, iv, "k", "t", "lo", "hi", bucket_seconds=bucket, how="left"
        )
        pt2 = spark.createDataFrame(
            [("a", 11, 300.0), ("a", 11, 300.0)], PT_DDL
        )
        left2 = interval_join(
            pt2, iv, "k", "t", "lo", "hi", bucket_seconds=bucket, how="left"
        )
        assert left2.count() == 2

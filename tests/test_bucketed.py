"""Pins for the bucketed (pre-shuffled) table layout.

The scale claims stated in sources/bucketed.py, checked on real plans:
zero Exchange for windows and for co-bucketed sort-merge joins, one
file per bucket, and value parity with the plain-parquet path.
"""

import glob

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from featuregenerator_spark.sources.bucketed import sanitized, stage_bucketed_table

BUCKETS = 4


@pytest.fixture(scope="module")
def plain(spark):
    df = spark.range(0, 2000).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 37).alias("user_id"),
        (F.col("id") * 7.0).alias("ts_sec"),
        (F.col("id") % 11).cast("double").alias("value"),
    )
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def bucketed(spark, plain, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bucketed") / "events")
    return stage_bucketed_table(
        spark, plain, "fg_test_bucketed_events", path, BUCKETS,
        "user_id", ["user_id", "ts_sec", "event_id"],
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _windowed(df):
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-3600, 0)
    )
    return df.select(
        "event_id", (F.count(F.lit(1)).over(w) - 1).alias("prior_cnt")
    )


def test_window_zero_exchange_vs_plain(spark, plain, bucketed):
    assert "Exchange" not in _plan(_windowed(bucketed))
    assert "Exchange" in _plan(_windowed(plain))


def test_window_values_match_plain(spark, plain, bucketed):
    a = sorted(map(tuple, _windowed(bucketed).collect()))
    b = sorted(map(tuple, _windowed(plain).collect()))
    assert a == b


def test_cobucketed_join_zero_exchange(spark, plain, bucketed, tmp_path_factory):
    dim = plain.groupBy("user_id").agg(F.max("value").alias("mx"))
    path = str(tmp_path_factory.mktemp("bucketed") / "dim")
    bdim = stage_bucketed_table(
        spark, dim, "fg_test_bucketed_dim", path, BUCKETS, "user_id", ["user_id"]
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = bucketed.join(bdim, "user_id").select("event_id", "mx")
        plan = _plan(j)
        assert "SortMergeJoin" in plan and "Exchange" not in plan
        assert j.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_one_file_per_bucket(spark, bucketed):
    loc = (
        spark.sql("DESCRIBE FORMATTED fg_test_bucketed_events")
        .filter("col_name = 'Location'")
        .collect()[0]["data_type"]
    )
    files = glob.glob(loc.replace("file:", "") + "/part-*")
    assert len(files) == BUCKETS


def test_restage_is_idempotent_not_stale(spark, plain, tmp_path_factory):
    # restaging with different content must serve the NEW data
    path = str(tmp_path_factory.mktemp("bucketed") / "re")
    t1 = stage_bucketed_table(
        spark, plain.limit(100), "fg_test_bucketed_re", path, BUCKETS,
        "user_id", ["user_id"],
    )
    assert t1.count() == 100
    t2 = stage_bucketed_table(
        spark, plain.limit(250), "fg_test_bucketed_re", path, BUCKETS,
        "user_id", ["user_id"],
    )
    assert t2.count() == 250


def test_rejects_unsafe_identifier(spark, plain):
    with pytest.raises(ValueError):
        stage_bucketed_table(
            spark, plain, "bad; DROP TABLE x", "/tmp/x", 2, "user_id"
        )
    assert sanitized("sf0.01") == "sf0_01"

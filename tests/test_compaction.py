"""Small-file compaction: file-count collapse + value losslessness."""

import glob
import os

from pyspark.sql import functions as F

from featuregenerator_spark.sources.compaction import compact_table


def _parquet_files(base):
    return glob.glob(os.path.join(base, "**", "*.parquet"), recursive=True)


def test_compaction_collapses_files_losslessly(spark, tmp_path):
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ds", F.date_format("ts", "yyyy-MM-dd"))
    )
    frag = str(tmp_path / "frag")
    dst = str(tmp_path / "out")
    # deliberately fragment: 16 writer tasks x one dir per day
    ev.repartition(16).write.partitionBy("ds").parquet(frag)
    n_days = ev.select("ds").distinct().count()
    assert len(_parquet_files(frag)) > 2 * n_days  # genuinely fragmented

    back = compact_table(spark, frag, dst)

    # at test scale every day is far below the advisory size -> AQE
    # coalesces each day to exactly one file
    assert len(_parquet_files(dst)) == n_days
    # value-lossless, both directions (ds comes back as a partition col)
    a = back.select(
        "event_id", "ts", "user_id", "event_type", "value", "props",
        F.col("ds").cast("string").alias("ds"),
    )
    b = ev.select(
        "event_id", "ts", "user_id", "event_type", "value", "props", "ds"
    )
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_compaction_restores_advisory_conf(spark, tmp_path):
    from featuregenerator_spark.sources.compaction import ADVISORY_CONF

    prior = spark.conf.get(ADVISORY_CONF, None)
    df = spark.range(100).withColumn("ds", F.lit("2024-01-01"))
    df.write.parquet(str(tmp_path / "f"))
    compact_table(
        spark, str(tmp_path / "f"), str(tmp_path / "o"),
        partition_cols=(), advisory_bytes=7 * 1024 * 1024,
    )
    assert spark.conf.get(ADVISORY_CONF, None) == prior


def test_compaction_sort_cols_restore_locality(spark, tmp_path):
    """sort_cols must leave each output file internally sorted — the
    property that gives tight per-row-group min/max stats on ts."""
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ds", F.date_format("ts", "yyyy-MM-dd"))
    )
    frag = str(tmp_path / "frag")
    dst = str(tmp_path / "out")
    ev.repartition(8).write.partitionBy("ds").parquet(frag)
    compact_table(spark, frag, dst, sort_cols=("ts",))
    for f in _parquet_files(dst)[:5]:
        ts = [r["ts"] for r in spark.read.parquet(f).select("ts").collect()]
        assert ts == sorted(ts), f


def test_compaction_plan_uses_rebalance(spark, tmp_path):
    """The rewrite must go through RebalancePartitions (AQE split +
    coalesce), not a fixed repartition — that is the property that
    keeps one hot day from serializing the job at scale."""
    df = spark.range(1000).withColumn("ds", (F.col("id") % 3).cast("string"))
    plan = (
        df.hint("rebalance", "ds")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "RebalancePartitions" in plan, plan

"""Readers for the driver testdata star schema + transcript carriers."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    d = sf_dir or DEFAULT_SF_DIR
    return spark.read.parquet(os.path.join(d, f"{name}.parquet"))


def events_as_transcripts(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Map the events table onto the transcript shape (input_hint):
    user_id -> conv_id, per-user event order -> turn_idx, event_type ->
    role, props -> text, event_type -> tool, ts -> ts.

    Used by entry()/bench so the engine's flagship pipeline runs on
    driver-provided data unchanged.
    """
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.col("event_type").alias("tool"),
        F.col("ts"),
        F.col("value"),
    )


def write_partitioned_transcripts(
    df: DataFrame, path: str, files_per_partition: int = 4
) -> None:
    """Write transcripts in the Iceberg-style physical layout used at
    100 TB: hive-partitioned by event date (``ds=YYYY-MM-DD``), so date
    filters prune whole partitions at the metadata level, with a bounded
    file count per partition (hash on conv_id keeps one conversation's
    turns co-located within files of its days).
    """
    (
        df.withColumn("ds", F.date_format("ts", "yyyy-MM-dd"))
        .repartition(files_per_partition, F.col("ds"), F.col("conv_id"))
        .write.mode("overwrite")
        .partitionBy("ds")
        .parquet(path)
    )


def read_transcripts_range(
    spark: SparkSession, path: str, ds_from: str | None = None, ds_to: str | None = None
) -> DataFrame:
    """Read a date range; the ds predicates are partition filters (pruned
    before any file is opened — asserted in tests/test_plans.py)."""
    df = spark.read.parquet(path)
    if ds_from:
        df = df.filter(F.col("ds") >= ds_from)
    if ds_to:
        df = df.filter(F.col("ds") <= ds_to)
    return df

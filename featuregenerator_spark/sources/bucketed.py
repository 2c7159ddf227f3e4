"""Bucketed table layout: pre-shuffled storage that stages then reuse.

The flagship plan already folds all window stages onto exactly ONE
hash(conv_id) Exchange (pinned in tests/test_plans.py). Bucketing
removes even that one: writing a table with
``bucketBy(n, key).sortBy(key, ts, ...)`` persists the shuffle INTO the
layout, so every later job whose windows/joins/aggregations cluster on
the same key starts from a scan that already satisfies
ClusteredDistribution(key) — zero Exchange, and with one file per
bucket the bucket-local sort order satisfies the window's sort
requirement too. At 100 TB this is the difference between re-shuffling
the corpus every nightly feature run and shuffling it ONCE at ingest:
any Spark cluster reading the table gets co-located, pre-sorted
partitions for free, and two tables bucketed on the same key with the
same bucket count sort-merge-join with no Exchange on either side
(snapshot x transcript enrichment joins, the hottest join in the
pipeline).

The writer repartitions by the bucket key INTO bucket-count partitions
before writing: repartition's hash placement and the bucket-id
assignment use the same Murmur3 pmod mapping, so each task holds
exactly one bucket and each bucket lands in exactly ONE file — the
layout under which Spark's bucketed scan preserves the sortBy order
and the downstream Sort becomes a no-op over already-ordered runs
(with many files per bucket Spark keeps the Exchange elimination but
re-sorts locally).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


def stage_bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    path: str,
    buckets: int,
    key: str,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """(Re)write df as a bucketed external table and return its scan.

    Drop-then-overwrite each call: staging is idempotent and never
    serves stale data when the source or the bucket spec changed (the
    cost is one write of the staged slice; production stages at ingest,
    not per query).
    """
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", table):
        raise ValueError(f"unsafe table identifier: {table!r}")
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.repartition(buckets, key)
        .write.format("parquet")
        .option("path", path)
        .mode("overwrite")
        .bucketBy(buckets, key)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)
    return spark.table(table)


def sanitized(name: str) -> str:
    """A filesystem-ish name as a safe SQL identifier fragment."""
    return re.sub(r"[^A-Za-z0-9_]", "_", name)

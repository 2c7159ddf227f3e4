"""Resumability: kill between snapshot commits -> re-run converges
(SURVEY.md §5d; north_rule lineage/resume)."""

import os

import pytest
from pyspark.sql import functions as F

from featuregenerator_spark.plans import lineage


def _mk(spark, key):
    return spark.range(100).select(
        F.lit(key).alias("part"), F.col("id"), (F.col("id") * 2).alias("v")
    )


def test_resume_skips_committed(spark, tmp_path):
    base = str(tmp_path / "out")
    keys = ["p0", "p1", "p2", "p3"]

    # first run "crashes" after two partitions
    done = lineage.run_resumable(spark, keys[:2], lambda k: _mk(spark, k), base)
    assert len(done) == 2
    assert set(lineage.committed_partitions(base)) == {"p0", "p1"}

    # resume: only the remaining two are processed
    done2 = lineage.run_resumable(spark, keys, lambda k: _mk(spark, k), base)
    assert {r.partition_key for r in done2} == {"p2", "p3"}

    df = lineage.read_committed(spark, base)
    assert df.count() == 400
    # manifest carries per-partition row counts
    recs = lineage.committed_partitions(base)
    assert all(r.rows == 100 for r in recs.values())


def test_staging_dirs_not_read_back(spark, tmp_path):
    base = str(tmp_path / "out2")
    lineage.write_snapshot(_mk(spark, "a"), base, "a")
    # simulate a crashed half-write
    os.makedirs(os.path.join(base, "_staging_b_99"), exist_ok=True)
    with open(os.path.join(base, "_staging_b_99", "garbage.parquet"), "w") as f:
        f.write("not parquet")
    df = lineage.read_committed(spark, base)
    assert df.count() == 100

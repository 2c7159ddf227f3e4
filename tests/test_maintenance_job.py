"""Maintenance entry point: compact -> zorder chain, metrics, errors."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from featuregenerator_spark.maintenance_job import main


def _files(path):
    return glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)


def test_maintenance_chain_compact_then_zorder(spark, tmp_path, capsys):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").withColumn(
        "ds", F.date_format("ts", "yyyy-MM-dd")
    )
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ev.repartition(16).write.partitionBy("ds").parquet(src)
    cfg = {
        "ops": [
            {"op": "compact", "partition_cols": ["ds"], "sort_cols": ["ts"]},
            # zorder keys a timestamp column directly (epoch-keyed
            # internally; written data keeps the original column)
            {"op": "zorder", "cols": ["user_id", "ts"], "num_files": 8,
             "bits": 8},
        ]
    }
    cfg_path = str(tmp_path / "m.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    assert main(["--input", src, "--output", out, "--config", cfg_path]) == 0

    lines = [
        json.loads(l)
        for l in capsys.readouterr().out.splitlines()
        if l.startswith("{")
    ]
    assert [l["op"] for l in lines] == ["compact", "zorder"]
    # compaction shrank the file count; metrics recorded it
    assert lines[0]["files_after"] < lines[0]["files_before"]
    # final output only at --output; intermediate under __steps
    assert lines[1]["dst"] == out
    assert lines[0]["dst"].startswith(out + "__steps/")

    back = spark.read.parquet(out)
    assert back.count() == ev.count()
    assert back.select("event_id").exceptAll(ev.select("event_id")).count() == 0


def test_maintenance_rejects_unknown_op(spark, tmp_path):
    df = spark.range(10).withColumn("ds", F.lit("2024-01-01"))
    src = str(tmp_path / "s")
    df.write.parquet(src)
    cfg_path = str(tmp_path / "bad.json")
    with open(cfg_path, "w") as f:
        json.dump({"ops": [{"op": "vacuum"}]}, f)
    with pytest.raises(ValueError, match="unknown maintenance op"):
        main(
            ["--input", src, "--output", str(tmp_path / "o"),
             "--config", cfg_path]
        )


def test_snapshot_table_maintenance_mode(spark, tmp_path, capsys):
    """--snapshot-table mode: rewrite_clustered (z-order), then
    expire_snapshots, then vacuum — each in place on the snapshot
    table, each with a metrics line. The rewrite must improve per-file
    pruning; expire+vacuum must reclaim the pre-rewrite layout's files
    while the current version stays exactly readable."""
    from featuregenerator_spark.sources.snapshots import SnapshotTable

    base = str(tmp_path / "tbl")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "user_id", "value"
    )
    t = SnapshotTable(spark, base, stats_cols=["user_id", "event_id"])
    t.commit_append(ev.repartition(8, "event_id"))
    where = [("user_id", "<=", 10), ("event_id", "<=", 100)]
    assert t.plan_files(where)[1] == []  # hash layout: nothing prunable

    cfg = {
        "stats_cols": ["user_id", "event_id"],
        "snapshot_ops": [
            {"op": "rewrite_clustered", "cols": ["user_id", "event_id"],
             "num_files": 8, "bits": 8},
            {"op": "expire_snapshots", "keep_last": 1},
            # age 0 for the test; production default is 72h (in-flight
            # commit race — see vacuum_orphans)
            {"op": "vacuum", "min_age_hours": 0},
        ],
    }
    cfg_path = str(tmp_path / "s.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    assert main(["--snapshot-table", base, "--config", cfg_path]) == 0

    lines = [
        json.loads(l)
        for l in capsys.readouterr().out.splitlines()
        if l.startswith("{")
    ]
    assert [l["op"] for l in lines] == [
        "rewrite_clustered", "expire_snapshots", "vacuum",
    ]
    assert lines[1]["expired_versions"] == [1]
    assert lines[2]["removed"] >= 1  # the pre-rewrite data dir reclaimed
    t2 = SnapshotTable(spark, base)
    assert t2.versions() == [2]
    assert t2.read().count() == ev.count()
    # the rewritten layout actually prunes
    kept, pruned = t2.plan_files(where)
    assert len(pruned) >= 1, (kept, pruned)

"""Lineage manifests, counters, and resumable snapshot writes.

north_rule: per-partition lineage manifests + metrics; resumable from the
last committed snapshot/checkpoint.

Without Iceberg jars in this image, snapshot commit is emulated with the
same contract Iceberg gives us: write to a staging dir, then atomically
publish by renaming into ``snapshot=N`` and appending one line to a
``_manifests/commits.jsonl`` log. A restart replays the commit log, sees
which input partitions are already committed, and processes only the rest
(idempotent because partition -> snapshot mapping is deterministic).

On a real cluster this module swaps to Iceberg's own snapshot/commit API
unchanged at the call sites (write_snapshot / committed_partitions).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class CommitRecord:
    snapshot_id: int
    partition_key: str
    rows: int
    wall_time_sec: float


def _manifest_dir(base: str) -> str:
    d = os.path.join(base, "_manifests")
    os.makedirs(d, exist_ok=True)
    return d


def committed_partitions(base: str) -> dict[str, CommitRecord]:
    """Replay the commit log -> partition_key -> last committed record."""
    log = os.path.join(base, "_manifests", "commits.jsonl")
    out: dict[str, CommitRecord] = {}
    if not os.path.exists(log):
        return out
    with open(log) as f:
        for line in f:
            if not line.strip():
                continue
            rec = json.loads(line)
            out[rec["partition_key"]] = CommitRecord(
                rec["snapshot_id"], rec["partition_key"], rec["rows"], rec["wall"]
            )
    return out


def write_snapshot(
    df: DataFrame,
    base: str,
    partition_key: str,
    counters: dict[str, int] | None = None,
) -> CommitRecord:
    """Write one input partition's features as an atomic snapshot commit.

    Per-partition row counters are captured with an accumulator-free
    observation (df.observe) so the count costs no extra action.
    """
    from pyspark.sql import Observation

    obs = Observation(f"lineage_{partition_key}")
    observed = df.observe(obs, F.count(F.lit(1)).alias("rows"))
    committed = committed_partitions(base)
    snapshot_id = max((r.snapshot_id for r in committed.values()), default=0) + 1

    staging = os.path.join(base, f"_staging_{partition_key}_{snapshot_id}")
    final = os.path.join(base, f"snapshot={snapshot_id}", f"part={partition_key}")
    t0 = time.time()
    observed.write.mode("overwrite").parquet(staging)
    rows = int(obs.get["rows"])
    os.makedirs(os.path.dirname(final), exist_ok=True)
    os.replace(staging, final)  # atomic publish on POSIX
    rec = CommitRecord(snapshot_id, partition_key, rows, time.time() - t0)

    log = os.path.join(_manifest_dir(base), "commits.jsonl")
    entry = {
        "snapshot_id": rec.snapshot_id,
        "partition_key": rec.partition_key,
        "rows": rec.rows,
        "wall": rec.wall_time_sec,
        "counters": counters or {},
        "committed_at": time.time(),
    }
    with open(log, "a") as f:
        f.write(json.dumps(entry) + "\n")
        f.flush()
        os.fsync(f.fileno())
    return rec


def run_resumable(
    spark: SparkSession,
    partition_keys: list[str],
    make_df,
    base: str,
) -> list[CommitRecord]:
    """Process partitions not yet committed (restart-safe driver loop).

    make_df: partition_key -> DataFrame of that partition's features.
    A killed run resumes from the last committed snapshot: already
    committed keys are skipped, half-written staging dirs are ignored
    (never published, never read back).
    """
    done = committed_partitions(base)
    out: list[CommitRecord] = []
    for key in partition_keys:
        if key in done:
            continue
        out.append(write_snapshot(make_df(key), base, key))
    return out


def read_committed(spark: SparkSession, base: str) -> DataFrame:
    """Read back exactly the committed snapshots (staging dirs excluded)."""
    done = committed_partitions(base)
    paths = [
        os.path.join(base, f"snapshot={r.snapshot_id}", f"part={r.partition_key}")
        for r in done.values()
    ]
    if not paths:
        raise FileNotFoundError(f"no committed snapshots under {base}")
    return spark.read.parquet(*paths)

"""spark-submit entry point: table maintenance (compaction, z-order;
plus in-place snapshot-table maintenance via --snapshot-table —
rewrite_clustered / expire_snapshots / vacuum, the Iceberg trio).

The operational counterpart of job.py / curation_job.py (same
deployment contract — the SAME artifact runs unchanged at any executor
count):

    spark-submit --master <cluster> --py-files fg_spark.zip maintenance_job.py \\
        --input  s3://.../events        (parquet, optionally ds-partitioned)
        --output s3://.../events_v2
        --config maintenance.json       (REQUIRED: the declared op chain)

or locally: ``python -m featuregenerator_spark.maintenance_job --input ...``.

The config is an ordered op chain; each op reads the previous op's
output (starting from ``--input``) and the LAST op writes ``--output``
— intermediate steps land under ``<output>__steps/``, and the final
directory only appears complete (_SUCCESS) when the whole chain ran,
so a killed run is re-run idempotently rather than half-published:

    {"ops": [
      {"op": "compact", "partition_cols": ["ds"], "advisory_mb": 128,
       "sort_cols": ["ts"]},
      {"op": "zorder", "cols": ["user_id", "ts"], "num_files": 64,
       "bits": 16}
    ]}

Each op prints one JSON metrics line (files/bytes before and after,
wall seconds) — the counters a table-maintenance cron needs to alert
on (compaction that stops shrinking file counts is the canary for a
misbehaving upstream writer).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _dir_stats(spark, path: str) -> dict:
    """File/byte counters via the Hadoop FileSystem API, so they are
    truthful for ANY scheme Spark can read (a driver-local glob would
    silently report 0 for s3://... — the listing pattern
    operators/dedup_cluster.py already uses for resume)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return {"files": 0, "bytes": 0}
    it = fs.listFiles(hpath, True)
    files = 0
    size = 0
    while it.hasNext():
        st = it.next()
        if st.getPath().getName().endswith(".parquet"):
            files += 1
            size += st.getLen()
    return {"files": files, "bytes": size}


def _run_op(spark, op: dict, src: str, dst: str) -> None:
    kind = op["op"]
    if kind == "compact":
        from featuregenerator_spark.sources.compaction import compact_table

        compact_table(
            spark,
            src,
            dst,
            partition_cols=tuple(op.get("partition_cols", ["ds"])),
            advisory_bytes=int(op.get("advisory_mb", 128)) * 1024 * 1024,
            sort_cols=tuple(op.get("sort_cols", [])),
        )
    elif kind == "zorder":
        from featuregenerator_spark.sources.zorder import write_zordered

        write_zordered(
            spark.read.parquet(src),
            dst,
            *op["cols"],
            num_files=int(op.get("num_files", 64)),
            bits=int(op.get("bits", 16)),
        )
    else:
        raise ValueError(f"unknown maintenance op: {kind!r}")


def _run_snapshot_maintenance(spark, base: str, cfg: dict) -> None:
    """In-place maintenance on a snapshot table (sources/snapshots.py)
    — the Iceberg maintenance trio as declared ops, each an atomic
    commit or metadata action with one JSON metrics line:

        {"snapshot_ops": [
          {"op": "rewrite_clustered", "cols": ["user_id", "ts"],
           "num_files": 64, "bits": 16},
          {"op": "expire_snapshots", "keep_last": 5},
          {"op": "vacuum"}
        ], "stats_cols": ["user_id", "ts"]}

    rewrite_clustered with one col = plain range clustering; with n
    cols = Z-order (Morton) clustering over them."""
    from pyspark.sql import functions as F

    from featuregenerator_spark.sources.snapshots import SnapshotTable
    from featuregenerator_spark.sources.zorder import zorder_key_columns

    t = SnapshotTable(spark, base, stats_cols=cfg.get("stats_cols"))
    for i, op in enumerate(cfg["snapshot_ops"]):
        kind = op["op"]
        t0 = time.time()
        rec = {"op": kind, "step": i, "table": base}
        if kind == "rewrite_clustered":
            cols = [F.col(c) for c in op["cols"]]
            n_files = int(op.get("num_files", 64))
            if len(cols) == 1:
                key = cols[0]
            else:
                aggs = []
                for c in cols:
                    d = c.cast("double")
                    aggs += [F.min(d), F.max(d)]
                row = t.read().agg(*aggs).collect()[0]
                stats = [
                    (row[2 * j], row[2 * j + 1]) for j in range(len(cols))
                ]
                key = zorder_key_columns(
                    cols, stats, bits=int(op.get("bits", 16))
                )
            v = t.rewrite_clustered(key, n_files)
            rec.update({"committed_version": v, "n_files": n_files})
        elif kind == "expire_snapshots":
            rec["expired_versions"] = t.expire_snapshots(
                int(op["keep_last"])
            )
        elif kind == "vacuum":
            # 72h default: a no-age vacuum racing an in-flight commit
            # (data written, manifest not yet published) would delete
            # its files — Iceberg's remove_orphan_files default is 3d
            age_h = float(op.get("min_age_hours", 72))
            rec["removed"] = len(t.vacuum_orphans(age_h * 3600.0))
            rec["min_age_hours"] = age_h
        else:
            raise ValueError(f"unknown snapshot maintenance op: {kind!r}")
        rec["wall_sec"] = round(time.time() - t0, 3)
        print(json.dumps(rec))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="source dir (dir-chain mode)")
    ap.add_argument("--output", help="destination dir (dir-chain mode)")
    ap.add_argument("--config", required=True, help="maintenance op-chain JSON")
    ap.add_argument(
        "--snapshot-table",
        help="in-place maintenance on a snapshot table; config uses "
        '{"snapshot_ops": [...]} instead of {"ops": [...]}',
    )
    ap.add_argument("--app-name", default="fg-spark-maintenance")
    args = ap.parse_args(argv)

    from featuregenerator_spark.session import get_spark

    spark = get_spark(args.app_name)
    with open(args.config) as f:
        cfg = json.load(f)
    if args.snapshot_table:
        if not cfg.get("snapshot_ops"):
            raise ValueError("config.snapshot_ops is empty — nothing to do")
        _run_snapshot_maintenance(spark, args.snapshot_table, cfg)
        return 0
    if not (args.input and args.output):
        raise ValueError("--input/--output required in dir-chain mode")
    ops = cfg["ops"]
    if not ops:
        raise ValueError("config.ops is empty — nothing to do")

    src = args.input
    for i, op in enumerate(ops):
        last = i == len(ops) - 1
        dst = args.output if last else f"{args.output}__steps/{i:02d}_{op['op']}"
        before = _dir_stats(spark, src)
        t0 = time.time()
        _run_op(spark, op, src, dst)
        after = _dir_stats(spark, dst)
        print(
            json.dumps(
                {
                    "op": op["op"],
                    "step": i,
                    "src": src,
                    "dst": dst,
                    "files_before": before["files"],
                    "files_after": after["files"],
                    "bytes_before": before["bytes"],
                    "bytes_after": after["bytes"],
                    "wall_sec": round(time.time() - t0, 3),
                }
            )
        )
        src = dst
    return 0


if __name__ == "__main__":
    sys.exit(main())

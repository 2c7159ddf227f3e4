"""spark-submit entry point: transcript table -> per-turn feature table.

The deployment contract of the north rule: the SAME artifact runs
unchanged at any executor count —

    spark-submit --master <cluster> --py-files fg_spark.zip job.py \\
        --input  s3://.../transcripts   (parquet/Iceberg, date-partitioned)
        --output s3://.../turn_features
        [--config features.json]       (optional FeatureConfig overlay)
        [--ds-from YYYY-MM-DD --ds-to YYYY-MM-DD]
        [--input-format parquet|snapshot]   (snapshot = Iceberg-protocol
            table from sources/snapshots.py; each day unit's scan prunes
            whole day-files via manifest ds-stats before any footer opens)
        [--output-format lineage|snapshot]  (snapshot = each day unit is
            one atomic snapshot commit; resume skips committed keys)

(job.py is this file, shipped alongside the zip; the submit path is
exercised end-to-end at two parallelism levels in
tests/test_job.py::test_spark_submit_pyfiles_two_parallelism_levels)

or locally: ``python -m featuregenerator_spark.job --input ... --output ...``

Work is split into per-day units committed through plans/lineage.py: each
``ds`` partition is one atomic snapshot commit with row counters, so a
killed run resumes from the last committed day (idempotent; half-written
staging dirs are never published). Runs with no ``ds`` column fall back
to a single unit keyed "all".
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F

from featuregenerator_spark.plans import lineage
from featuregenerator_spark.plans.pipeline import FEATURE_COLUMNS, build_turn_features
from featuregenerator_spark.plans.temporal import with_ts_seconds


def build_features_df(
    spark,
    input_path: str,
    ds: str | None,
    config: dict | None,
    lookback_days: int = 1,
    snapshots_path: str | None = None,
    input_format: str = "parquet",
):
    """Features for one day-unit, point-in-time correct across unit
    boundaries: the scan includes ``lookback_days`` of history (>= the
    longest trailing window, default 24h -> 1 day) so rolling counts and
    gaps at the start of ``ds`` see yesterday's turns, then only ``ds``
    rows are emitted.

    ``gap_seconds`` is horizon-limited by contract: null when the
    previous turn is more than ``lookback_days`` back. A chunked run
    cannot see turns beyond its lookback scan, so the one-shot path nulls
    those gaps too (via build_turn_features(gap_horizon_seconds=...)) —
    both paths agree exactly, including for conversations idle longer
    than the lookback (asserted in tests/test_job.py). ``gap_bucket`` is
    unaffected (beyond-horizon and unknown both bucket to 8). Caveat:
    session numbering is window-relative in chunked runs (a session
    crossing the lookback horizon restarts its index).
    """
    if input_format == "snapshot":
        # Iceberg-protocol transcript table (sources/snapshots.py): the
        # day range rides read(where=...), so manifest ds-stats DROP
        # whole day-files from the plan before any footer opens — the
        # snapshot-table twin of partition pruning; the residual filter
        # keeps the read exact regardless of commit granularity.
        import datetime as _dt

        from featuregenerator_spark.sources.snapshots import SnapshotTable

        t = SnapshotTable(spark, input_path)
        if ds is not None:
            lo = (
                _dt.date.fromisoformat(ds) - _dt.timedelta(days=lookback_days)
            ).isoformat()
            df = t.read(where=[("ds", ">=", lo), ("ds", "<=", ds)])
        else:
            df = t.read()
    else:
        df = spark.read.parquet(input_path)
        if ds is not None and "ds" in df.columns:
            # partition values may be type-inferred (DATE); compare as
            # string. Both bounds are partition filters -> only
            # lookback+1 days scanned.
            lo = F.date_sub(F.lit(ds).cast("date"), lookback_days).cast(
                "string"
            )
            df = df.filter(
                (F.col("ds").cast("string") >= lo)
                & (F.col("ds").cast("string") <= ds)
            )
    snaps = spark.read.parquet(snapshots_path) if snapshots_path else None
    feat = build_turn_features(
        with_ts_seconds(df),
        gap_horizon_seconds=lookback_days * 86400.0,
        # snapshot as-of backfill rides the heavy-hitter router
        # (plans/skew.py:asof_join_auto): mega-conversations take the
        # (conv, time_chunk) skew-parallel form, the rest the standard
        # one-scan-per-key form
        snapshots=snaps,
    )
    cols = list(FEATURE_COLUMNS)
    if snaps is not None:
        cols += ["asof_ts", "feature_state"]
    if config:
        from featuregenerator_spark.spec import compile_spec, parse_config

        for s in parse_config(config):
            feat = feat.withColumn(s.feature_name, compile_spec(s, feat))
            cols.append(s.feature_name)
    if ds is not None and "ds" in feat.columns:
        feat = feat.filter(F.col("ds").cast("string") == ds)
    return feat.select(*cols)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--config", help="FeatureConfig JSON file (extra features)")
    ap.add_argument(
        "--snapshots",
        help="feature-snapshot parquet (conv_id, snap_ts, feature_state) "
        "for the as-of backfill; mega-conversations auto-route to the "
        "skew-parallel chunked join",
    )
    ap.add_argument("--ds-from")
    ap.add_argument("--ds-to")
    ap.add_argument(
        "--input-format",
        choices=["parquet", "snapshot"],
        default="parquet",
        help="'snapshot' reads an Iceberg-protocol snapshot table "
        "(sources/snapshots.py); day units prune via manifest ds-stats",
    )
    ap.add_argument(
        "--output-format",
        choices=["lineage", "snapshot"],
        default="lineage",
        help="'snapshot' commits each day unit as one atomic snapshot "
        "(resume = skip keys already in committed manifests)",
    )
    ap.add_argument(
        "--output-stats-cols",
        default="ds,ts",
        help="comma list of columns to record per-file manifest stats "
        "for in --output-format snapshot (default 'ds,ts': the feature "
        "table always carries ts, so downstream snapshot readers can "
        "file-skip by time range; columns absent from the output are "
        "skipped)",
    )
    ap.add_argument("--app-name", default="fg-spark-job")
    args = ap.parse_args(argv)

    from featuregenerator_spark.session import get_spark

    spark = get_spark(args.app_name)
    config = None
    if args.config:
        with open(args.config) as f:
            config = json.load(f)

    if args.input_format == "snapshot":
        from featuregenerator_spark.sources.snapshots import SnapshotTable

        src = SnapshotTable(spark, args.input).read()
    else:
        src = spark.read.parquet(args.input)
    if "ds" in src.columns:
        days = [
            r["ds"]
            for r in src.select(F.col("ds").cast("string").alias("ds"))
            .distinct()
            .orderBy("ds")
            .collect()
            if (not args.ds_from or r["ds"] >= args.ds_from)
            and (not args.ds_to or r["ds"] <= args.ds_to)
        ]
    else:
        days = None

    keys = days if days is not None else ["all"]

    def make_df(key):
        return build_features_df(
            spark,
            args.input,
            key if days is not None else None,
            config,
            snapshots_path=args.snapshots,
            input_format=args.input_format,
        )

    if args.output_format == "snapshot":
        from featuregenerator_spark.sources.snapshots import (
            SnapshotTable,
            run_resumable_snapshots,
        )

        stats_cols = [
            c for c in args.output_stats_cols.split(",") if c.strip()
        ]
        new_versions = run_resumable_snapshots(
            spark, keys, make_df, args.output, stats_cols=stats_cols or None
        )
        table = SnapshotTable(spark, args.output)
        print(
            json.dumps(
                {
                    "committed_units": len(table.committed_partitions()),
                    "new_units": len(new_versions),
                    "total_rows": table.read().count(),
                    "output": args.output,
                    "output_format": "snapshot",
                    "snapshot_version": table.current_version(),
                }
            )
        )
        return 0

    recs = lineage.run_resumable(spark, keys, make_df, args.output)
    done = lineage.committed_partitions(args.output)
    total = sum(r.rows for r in done.values())
    print(
        json.dumps(
            {
                "committed_units": len(done),
                "new_units": len(recs),
                "total_rows": total,
                "output": args.output,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

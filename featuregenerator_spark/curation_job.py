"""spark-submit entry point: raw document table -> curated table.

The curation counterpart of job.py (same deployment contract: the SAME
artifact runs unchanged at any executor count) —

    spark-submit --master <cluster> --py-files fg_spark.zip curation_job.py \\
        --input  s3://.../documents     (parquet/Iceberg, optionally ds-partitioned)
        --output s3://.../curated
        --config curation.json          (REQUIRED: the declared pipeline)
        [--ds-from YYYY-MM-DD --ds-to YYYY-MM-DD]
        [--repartition N]               (single/few-file inputs: spread the
                                         scan before corpus-level lifts)

or locally: ``python -m featuregenerator_spark.curation_job --input ...``.

The config is the whole program — quality rules, C4 cleaning, PII
scrubbing, language ID, linear model scoring, substring dedup/trim,
derived flags, and row filters, applied in declaration order by
spec.compile_pipeline. Units are per-``ds`` when the input is
date-partitioned (falling back to one "all" unit) and commit through
plans/lineage.py: atomic publish with row counters, so a killed run
resumes from the last committed day.

Scope note: corpus-level lifts (substring_dup / substring_trim) see ONE
unit's documents at a time under ds-chunking — duplicate detection is
within-day. That matches the daily-ingest shape (dedup_incremental is
the cross-day tool); run without ds-chunking for whole-corpus window
counting.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F

from featuregenerator_spark.plans import lineage
from featuregenerator_spark.spec import compile_pipeline


def build_curated_df(
    spark,
    input_path: str,
    ds: str | None,
    config: dict,
    repartition: int | None = None,
):
    """One unit of curation: scan (pruned to ``ds`` when given), optional
    spread for single-file inputs, then the declared pipeline."""
    df = spark.read.parquet(input_path)
    if ds is not None and "ds" in df.columns:
        df = df.filter(F.col("ds").cast("string") == ds)
    if repartition:
        df = df.repartition(repartition)
    return compile_pipeline(config, df)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--config", required=True, help="curation pipeline JSON file")
    ap.add_argument("--ds-from")
    ap.add_argument("--ds-to")
    ap.add_argument("--repartition", type=int)
    ap.add_argument("--app-name", default="fg-spark-curation")
    args = ap.parse_args(argv)

    from featuregenerator_spark.session import get_spark

    spark = get_spark(args.app_name)
    with open(args.config) as f:
        config = json.load(f)

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
        days = ["all"]

    recs = lineage.run_resumable(
        spark,
        days,
        lambda ds: build_curated_df(
            spark,
            args.input,
            None if ds == "all" else ds,
            config,
            repartition=args.repartition,
        ),
        args.output,
    )
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

"""spark-submit job: day-chunked resumable backfill == one-shot run.

The north rule's deployment contract: per-day snapshot commits with
lineage, resumable, and point-in-time correct across unit boundaries
(lookback covers the trailing windows).
"""

from pyspark.sql import functions as F

from featuregenerator_spark import job as jobmod
from featuregenerator_spark.plans import lineage
from featuregenerator_spark.plans.pipeline import FEATURE_COLUMNS, build_turn_features
from featuregenerator_spark.plans.temporal import with_ts_seconds

# session numbering is window-relative in chunked runs (documented in
# build_features_df); every other feature must match the one-shot run
EXACT_COLS = [c for c in FEATURE_COLUMNS if not c.startswith("session")]


def test_day_chunked_backfill_matches_full_run(spark, transcripts, tmp_path):
    from featuregenerator_spark.sources.tables import write_partitioned_transcripts

    inp = str(tmp_path / "inp")
    out = str(tmp_path / "out")
    write_partitioned_transcripts(transcripts, inp)

    days = sorted(
        r["ds"]
        for r in spark.read.parquet(inp)
        .select(F.col("ds").cast("string").alias("ds"))
        .distinct()
        .collect()
    )
    # first run "crashes" after half the days; second run resumes
    half = days[: len(days) // 2]
    lineage.run_resumable(
        spark, half, lambda d: jobmod.build_features_df(spark, inp, d, None), out
    )
    assert set(lineage.committed_partitions(out)) == set(half)
    lineage.run_resumable(
        spark, days, lambda d: jobmod.build_features_df(spark, inp, d, None), out
    )

    got = {
        (r["conv_id"], r["turn_idx"]): tuple(r[c] for c in EXACT_COLS[2:])
        for r in lineage.read_committed(spark, out).select(*EXACT_COLS).collect()
    }
    full = build_turn_features(with_ts_seconds(transcripts)).select(*EXACT_COLS)
    want = {
        (r["conv_id"], r["turn_idx"]): tuple(r[c] for c in EXACT_COLS[2:])
        for r in full.collect()
    }
    assert len(got) == len(want)
    mismatches = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mismatches, list(mismatches.items())[:3]

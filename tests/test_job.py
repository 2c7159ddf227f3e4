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
    # the one-shot reference under the job's contract: gap_seconds is
    # horizon-limited to the lookback window in both paths
    full = build_turn_features(
        with_ts_seconds(transcripts), gap_horizon_seconds=86400.0
    ).select(*EXACT_COLS)
    want = {
        (r["conv_id"], r["turn_idx"]): tuple(r[c] for c in EXACT_COLS[2:])
        for r in full.collect()
    }
    assert len(got) == len(want)
    mismatches = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mismatches, list(mismatches.items())[:3]


def test_chunked_matches_oneshot_for_idle_conversation(spark, tmp_path):
    """A conversation idle for longer than the lookback horizon must get
    the SAME gap features in a day-chunked run (which cannot see the
    pre-horizon turn) and a one-shot run (which can): gap_seconds is
    horizon-limited by contract, gap_bucket hits the top bucket either
    way (regression for the silent chunked != one-shot divergence)."""
    import datetime

    rows = []
    base = datetime.datetime(2026, 3, 1, 9, 0, 0)
    # conv "busy": turns every hour on day 1-3; conv "idle": one turn on
    # day 1, next turn on day 3 (gap ~2 days > 1-day lookback)
    for d in range(3):
        for h in range(3):
            rows.append(("busy", d * 3 + h, "user", "t", None,
                         base + datetime.timedelta(days=d, hours=h)))
    rows.append(("idle", 0, "user", "t", None, base))
    rows.append(("idle", 1, "user", "t", None,
                 base + datetime.timedelta(days=2, hours=1)))
    tr = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    ).withColumn("ds", F.date_format("ts", "yyyy-MM-dd"))

    inp = str(tmp_path / "inp")
    out = str(tmp_path / "out")
    tr.write.partitionBy("ds").parquet(inp)

    days = sorted(r["ds"] for r in tr.select("ds").distinct().collect())
    lineage.run_resumable(
        spark, days, lambda d: jobmod.build_features_df(spark, inp, d, None), out
    )
    got = {
        (r["conv_id"], r["turn_idx"]): (r["gap_seconds"], r["gap_bucket"])
        for r in lineage.read_committed(spark, out).collect()
    }
    oneshot = jobmod.build_features_df(spark, inp, None, None)
    want = {
        (r["conv_id"], r["turn_idx"]): (r["gap_seconds"], r["gap_bucket"])
        for r in oneshot.collect()
    }
    assert got == want
    assert got[("idle", 1)] == (None, 8)   # beyond-horizon gap: null, top bucket
    assert got[("busy", 3)] == (3600.0 * 22, 8)  # in-horizon day-crossing gap kept

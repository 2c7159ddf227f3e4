"""Skew handling: salted two-phase aggregation correctness on a
mega-conversation hot key; window pipeline survives the hot key; the
time-chunked skew-parallel path is feature-for-feature equal to the
standard path."""

import pytest
from pyspark.sql import functions as F

from featuregenerator_spark.plans.partitioning import salted_agg
from featuregenerator_spark.plans.pipeline import FEATURE_COLUMNS, build_turn_features
from featuregenerator_spark.plans.skew import (
    build_turn_features_auto,
    build_turn_features_chunked,
    with_time_chunks,
)
from featuregenerator_spark.plans.temporal import with_ts_seconds
from featuregenerator_spark.sources.transcripts import synth_transcripts


def _sorted_rows(df):
    return [
        tuple(r)
        for r in df.select(*FEATURE_COLUMNS)
        .orderBy("conv_id", "turn_idx")
        .collect()
    ]


def test_salted_agg_equals_plain_groupby(spark):
    tr = synth_transcripts(spark, n_convs=20, max_turns=15, skew_conv_turns=5000)
    tr = tr.withColumn("text_len", F.length("text").cast("double"))
    salted = salted_agg(
        tr,
        "conv_id",
        {
            "n_turns": ("turn_idx", "count"),
            "sum_len": ("text_len", "sum"),
            "max_len": ("text_len", "max"),
            "min_len": ("text_len", "min"),
        },
        n_salts=16,
        salt_cols=("turn_idx",),
    ).withColumn("sum_len", F.round("sum_len", 6))
    plain = tr.groupBy("conv_id").agg(
        F.count("turn_idx").alias("n_turns"),
        F.round(F.sum("text_len"), 6).alias("sum_len"),
        F.max("text_len").alias("max_len"),
        F.min("text_len").alias("min_len"),
    )
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_chunked_features_equal_standard(spark):
    """The chunked path must be feature-for-feature EQUAL to the standard
    path run with gap_horizon_seconds = horizon (the documented chunk-safe
    gap contract), on a table with a mega-conversation spanning many
    chunks, idle gaps, and ordinary conversations."""
    tr = synth_transcripts(spark, n_convs=30, max_turns=20, skew_conv_turns=4000)
    horizon = 86400.0
    want = _sorted_rows(
        build_turn_features(with_ts_seconds(tr), gap_horizon_seconds=horizon)
    )
    got = _sorted_rows(build_turn_features_chunked(tr))
    assert got == want
    # tighter chunks (span == horizon, maximum halo duplication) too
    got_tight = _sorted_rows(
        build_turn_features_chunked(tr, chunk_span_seconds=horizon)
    )
    assert got_tight == want


def test_chunked_spreads_mega_conversation(spark):
    """The hot conversation must actually occupy many (conv, chunk)
    partitions — the whole point of the time-salt."""
    tr = synth_transcripts(spark, n_convs=3, max_turns=10, skew_conv_turns=4000)
    chunks = (
        with_time_chunks(with_ts_seconds(tr), 2 * 86400.0, 86400.0)
        .filter((F.col("conv_id") == "conv_mega") & ~F.col("__halo"))
        .select("__chunk")
        .distinct()
        .count()
    )
    assert chunks >= 4, chunks


def test_chunked_rejects_span_below_horizon(spark):
    tr = synth_transcripts(spark, n_convs=2, max_turns=5)
    with pytest.raises(ValueError, match="chunk_span"):
        with_time_chunks(with_ts_seconds(tr), 3600.0, 86400.0)


def test_auto_router_parity_and_routing(spark):
    """build_turn_features_auto: hot conversations route to the chunked
    path, cold ones to the standard path, union equals the standard
    gap-horizon run over the whole table."""
    tr = synth_transcripts(spark, n_convs=25, max_turns=15, skew_conv_turns=3000)
    want = _sorted_rows(
        build_turn_features(with_ts_seconds(tr), gap_horizon_seconds=86400.0)
    )
    got = _sorted_rows(build_turn_features_auto(tr, hot_turns_threshold=500))
    assert got == want
    # no hot conv -> pure standard path, still identical contract
    cold_only = tr.filter(F.col("conv_id") != "conv_mega")
    want_cold = _sorted_rows(
        build_turn_features(with_ts_seconds(cold_only), gap_horizon_seconds=86400.0)
    )
    got_cold = _sorted_rows(build_turn_features_auto(cold_only, hot_turns_threshold=500))
    assert got_cold == want_cold


def test_asof_join_chunked_matches_window_form(spark):
    """asof_join_chunked must agree EXACTLY with the standard union+window
    as-of join — including strict/tolerance, a mega-key spanning many
    chunks, idle multi-chunk gaps (carry across empty chunks), and a
    small chunk span — without any horizon assumption."""
    from featuregenerator_spark.plans.skew import asof_join_chunked
    from featuregenerator_spark.plans.temporal import asof_join, with_ts_seconds
    from featuregenerator_spark.sources.transcripts import (
        synth_snapshots,
        synth_transcripts,
    )

    tr_raw = synth_transcripts(spark, n_convs=15, max_turns=20, skew_conv_turns=2500)
    tr = with_ts_seconds(tr_raw).select("conv_id", "turn_idx", "ts_sec")
    snaps = synth_snapshots(spark, tr_raw).select(
        "conv_id",
        F.col("snap_ts").cast("double").alias("snap_ts"),
        F.col("feature_state")["turns_seen"].alias("turns_seen"),
    )
    for kwargs in (
        dict(strict=False),
        dict(strict=True),
        dict(strict=True, tolerance=3600.0),
    ):
        for span in (86400.0, 3600.0):
            a = asof_join(
                tr, snaps, on="conv_id", left_ts="ts_sec", right_ts="snap_ts",
                value_cols=["turns_seen"], **kwargs,
            )
            b = asof_join_chunked(
                tr, snaps, on="conv_id", left_ts="ts_sec", right_ts="snap_ts",
                value_cols=["turns_seen"], chunk_span_seconds=span, **kwargs,
            )
            ka = {
                (r["conv_id"], r["turn_idx"]): (r["turns_seen"], r["asof_ts"])
                for r in a.collect()
            }
            kb = {
                (r["conv_id"], r["turn_idx"]): (r["turns_seen"], r["asof_ts"])
                for r in b.collect()
            }
            assert ka == kb, (kwargs, span)


def test_asof_join_chunked_null_ts(spark):
    """Null-ts rows reproduce the standard path: a null-ts right row is a
    '-infinity' snapshot visible to every left row; a null-ts left row
    matches only null-ts rights."""
    from featuregenerator_spark.plans.skew import asof_join_chunked
    from featuregenerator_spark.plans.temporal import asof_join

    left = spark.createDataFrame(
        [("k", 1, 100.0), ("k", 2, None), ("k", 3, 90000.0)],
        "conv_id string, turn_idx int, ts_sec double",
    )
    right = spark.createDataFrame(
        [("k", None, 7.0), ("k", 95.0, 9.0)],
        "conv_id string, snap_ts double, v double",
    )
    args = dict(on="conv_id", left_ts="ts_sec", right_ts="snap_ts", value_cols=["v"])
    ka = {r["turn_idx"]: (r["v"], r["asof_ts"]) for r in asof_join(left, right, **args).collect()}
    kb = {
        r["turn_idx"]: (r["v"], r["asof_ts"])
        for r in asof_join_chunked(left, right, chunk_span_seconds=3600.0, **args).collect()
    }
    assert ka == kb
    assert kb[1] == (9.0, 95.0) and kb[3] == (9.0, 95.0)  # carry across chunks
    assert kb[2] == (7.0, None)  # null-ts left sees only the null-ts right


def test_backfill_chunked_matches_standard(spark):
    """backfill_chunked must equal the standard forward-fill on a skewed
    table with sparse non-null values (multi-chunk carry), at two spans;
    non-time-major order is rejected."""
    from featuregenerator_spark.plans.skew import backfill_chunked
    from featuregenerator_spark.plans.temporal import backfill, with_ts_seconds

    tr = with_ts_seconds(
        synth_transcripts(spark, n_convs=10, max_turns=15, skew_conv_turns=2000)
    ).withColumn(
        "pv", F.when(F.col("role") == "tool", F.length("text").cast("double"))
    )
    order = ("ts_sec", "turn_idx")
    want = {
        (r["conv_id"], r["turn_idx"]): r["pv"]
        for r in backfill(tr, ["pv"], order_by=order).collect()
    }
    for span in (86400.0, 7200.0):
        got = {
            (r["conv_id"], r["turn_idx"]): r["pv"]
            for r in backfill_chunked(
                tr, ["pv"], order_by=order, chunk_span_seconds=span
            ).collect()
        }
        assert got == want, span
    with pytest.raises(ValueError, match="time-major"):
        backfill_chunked(tr, ["pv"], order_by=("turn_idx", "ts_sec"))


def test_pipeline_handles_mega_conversation(spark):
    tr = synth_transcripts(spark, n_convs=5, max_turns=10, skew_conv_turns=20000)
    feat = build_turn_features(with_ts_seconds(tr)).select(*FEATURE_COLUMNS)
    mega = feat.filter(F.col("conv_id") == "conv_mega")
    assert mega.count() == 20000
    # session indices must be monotone and rolling counts bounded by window
    row = mega.orderBy(F.col("turn_idx").desc()).first()
    assert row["session_idx"] >= 1
    assert row["turns_prior_86400s"] >= row["turns_prior_3600s"]


def test_asof_join_auto_routes_and_matches(spark):
    """asof_join_auto must equal the standard as-of join at a threshold
    that sends SOME keys down each branch (verified explicitly), and at
    the extremes (all-cold / all-hot)."""
    from featuregenerator_spark.plans.skew import _hot_keys, asof_join_auto
    from featuregenerator_spark.plans.temporal import asof_join, with_ts_seconds
    from featuregenerator_spark.sources.transcripts import (
        synth_snapshots,
        synth_transcripts,
    )

    tr_raw = synth_transcripts(spark, n_convs=12, max_turns=25, skew_conv_turns=2000)
    tr = with_ts_seconds(tr_raw).select("conv_id", "turn_idx", "ts_sec")
    snaps = synth_snapshots(spark, tr_raw).select(
        "conv_id",
        F.col("snap_ts").cast("double").alias("snap_ts"),
        F.col("feature_state")["turns_seen"].alias("turns_seen"),
    )
    args = dict(
        on="conv_id", left_ts="ts_sec", right_ts="snap_ts",
        value_cols=["turns_seen"], strict=True,
    )
    want = {
        (r["conv_id"], r["turn_idx"]): (r["turns_seen"], r["asof_ts"])
        for r in asof_join(tr, snaps, **args).collect()
    }
    # mid threshold: mega conv is hot, the 25-turn convs are cold
    both = tr.select("conv_id").unionByName(snaps.select("conv_id"))
    n_hot = _hot_keys(both, "conv_id", 100).count()
    n_keys = tr.select("conv_id").distinct().count()
    assert 0 < n_hot < n_keys  # both branches really execute
    for thr in (100, 0, 10**9):  # mid / all-hot / all-cold
        got = {
            (r["conv_id"], r["turn_idx"]): (r["turns_seen"], r["asof_ts"])
            for r in asof_join_auto(
                tr, snaps, hot_rows_threshold=thr,
                chunk_span_seconds=86400.0, **args,
            ).collect()
        }
        assert got == want, thr


def test_backfill_auto_routes_and_matches(spark):
    from featuregenerator_spark.plans.skew import backfill_auto
    from featuregenerator_spark.plans.temporal import backfill, with_ts_seconds

    tr = with_ts_seconds(
        synth_transcripts(spark, n_convs=8, max_turns=15, skew_conv_turns=1500)
    ).withColumn(
        "pv", F.when(F.col("role") == "tool", F.length("text").cast("double"))
    )
    order = ("ts_sec", "turn_idx")
    want = {
        (r["conv_id"], r["turn_idx"]): r["pv"]
        for r in backfill(tr, ["pv"], order_by=order).collect()
    }
    for thr in (100, 0, 10**9):
        got = {
            (r["conv_id"], r["turn_idx"]): r["pv"]
            for r in backfill_auto(
                tr, ["pv"], order_by=order, hot_rows_threshold=thr
            ).collect()
        }
        assert got == want, thr


def test_pipeline_snapshot_join_auto_routed(spark):
    """build_turn_features(snapshots=...) now rides the heavy-hitter
    router: with a threshold that forces the mega-conversation down the
    chunked branch, the feature table equals the default (all-cold) run."""
    from featuregenerator_spark.plans.temporal import with_ts_seconds
    from featuregenerator_spark.sources.transcripts import (
        synth_snapshots,
        synth_transcripts,
    )

    tr = synth_transcripts(spark, n_convs=6, max_turns=12, skew_conv_turns=900)
    snaps = synth_snapshots(spark, tr)
    cols = FEATURE_COLUMNS + ["asof_ts"]

    def rows(thr):
        f = build_turn_features(
            with_ts_seconds(tr), snapshots=snaps, snapshot_hot_threshold=thr
        )
        return {
            (r["conv_id"], r["turn_idx"]): tuple(r[c] for c in cols[2:])
            for r in f.select(*cols).collect()
        }

    assert rows(100) == rows(10**9)

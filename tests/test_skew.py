"""Skew handling: salted two-phase aggregation correctness on a
mega-conversation hot key; window pipeline survives the hot key."""

from pyspark.sql import functions as F

from featuregenerator_spark.plans.partitioning import salted_agg
from featuregenerator_spark.plans.pipeline import FEATURE_COLUMNS, build_turn_features
from featuregenerator_spark.plans.temporal import with_ts_seconds
from featuregenerator_spark.sources.transcripts import synth_transcripts


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


def test_pipeline_handles_mega_conversation(spark):
    tr = synth_transcripts(spark, n_convs=5, max_turns=10, skew_conv_turns=20000)
    feat = build_turn_features(with_ts_seconds(tr)).select(*FEATURE_COLUMNS)
    mega = feat.filter(F.col("conv_id") == "conv_mega")
    assert mega.count() == 20000
    # session indices must be monotone and rolling counts bounded by window
    row = mega.orderBy(F.col("turn_idx").desc()).first()
    assert row["session_idx"] >= 1
    assert row["turns_prior_86400s"] >= row["turns_prior_3600s"]

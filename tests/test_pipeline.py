"""Flagship pipeline: runs, stable schema, deterministic, spec compiler."""

from pyspark.sql import functions as F

from featuregenerator_spark.plans import temporal
from featuregenerator_spark.plans.pipeline import FEATURE_COLUMNS, build_turn_features
from featuregenerator_spark.sources.transcripts import synth_snapshots, synth_transcripts
from featuregenerator_spark.spec import compile_config, parse_config


def test_pipeline_runs_and_schema(spark, transcripts):
    feat = build_turn_features(temporal.with_ts_seconds(transcripts))
    for c in FEATURE_COLUMNS:
        assert c in feat.columns, c
    n = feat.count()
    assert n == transcripts.count()


def test_pipeline_deterministic_across_parallelism(spark, transcripts):
    f1 = build_turn_features(
        temporal.with_ts_seconds(transcripts), num_partitions=2
    ).select(*FEATURE_COLUMNS)
    f2 = build_turn_features(
        temporal.with_ts_seconds(transcripts), num_partitions=7
    ).select(*FEATURE_COLUMNS)
    assert f1.exceptAll(f2).count() == 0
    assert f2.exceptAll(f1).count() == 0


def test_pipeline_with_snapshots(spark, transcripts):
    snaps = synth_snapshots(spark, transcripts)
    feat = build_turn_features(temporal.with_ts_seconds(transcripts), snapshots=snaps)
    assert "feature_state" in feat.columns
    assert feat.count() == transcripts.count()


def test_synth_transcripts_deterministic(spark):
    a = synth_transcripts(spark, n_convs=10, max_turns=10, seed=7)
    b = synth_transcripts(spark, n_convs=10, max_turns=10, seed=7)
    assert a.exceptAll(b).count() == 0
    c = synth_transcripts(spark, n_convs=10, max_turns=10, seed=8)
    assert c.exceptAll(a).count() > 0


def test_spec_compiler(spark, transcripts):
    config = {
        "features": [
            {"feature_type": "id_feature", "feature_name": "role_id",
             "expression": "role"},
            {"feature_type": "raw_feature", "feature_name": "tl_bucket",
             "expression": "text_len",
             "bucketize_boundaries": [0, 50, 100, 200]},
            {"feature_type": "combo_feature", "feature_name": "rc",
             "expressions": ["role", "conv_id"]},
        ]
    }
    df = transcripts.withColumn("text_len", F.length("text").cast("double"))
    out = compile_config(config, df)
    row = out.filter(F.col("role") == "user").select("role_id", "tl_bucket", "rc").first()
    assert row["role_id"] == "role_id_user"
    assert isinstance(row["tl_bucket"], int)
    assert row["rc"].startswith("rc_user_conv_")


def test_spec_validation():
    import pytest

    with pytest.raises(ValueError):
        parse_config({"features": [{"feature_type": "nope", "feature_name": "x"}]})
    with pytest.raises(ValueError):
        parse_config(
            {"features": [{"feature_type": "raw_feature", "feature_name": "x",
                           "bucketize_boundaries": [3, 1, 2]}]}
        )

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


# JSON declaration of the ENTIRE flagship turn-feature program — the
# "declared, not programmed" contract (SURVEY.md §3.1) extended to the
# temporal lifts. Must reproduce build_turn_features byte-for-byte.
FLAGSHIP_JSON = {
    "defaults": {
        "partition_by": "conv_id",
        "order_by": ["ts_sec", "turn_idx"],
        "ts_seconds_column": "ts_sec",
    },
    "features": [
        {"feature_type": "ts_seconds", "feature_name": "ts_sec",
         "ts_column": "ts"},
        {"feature_type": "id_feature", "feature_name": "role_id",
         "expression": "role", "prefix": "role"},
        {"feature_type": "id_feature", "feature_name": "tool_id0",
         "expression": "tool", "prefix": "tool"},
        {"feature_type": "derive", "feature_name": "tool_id",
         "expression": "coalesce(tool_id0, 'tool_none')"},
        {"feature_type": "derive", "feature_name": "text_len",
         "expression": "cast(length(text) as double)"},
        {"feature_type": "derive", "feature_name": "text_len_log",
         "expression": "if(text_len > 0d, log10(text_len), 0d)"},
        {"feature_type": "gap_feature", "feature_name": "gap_seconds",
         "bucket_default": 8},
        {"feature_type": "rolling_count", "feature_name": "turns_prior_3600s",
         "window_seconds": 3600},
        {"feature_type": "rolling_count",
         "feature_name": "tool_calls_prior_3600s",
         "window_seconds": 3600, "filter": "role = 'tool'"},
        {"feature_type": "rolling_count", "feature_name": "turns_prior_86400s",
         "window_seconds": 86400},
        {"feature_type": "rolling_count",
         "feature_name": "tool_calls_prior_86400s",
         "window_seconds": 86400, "filter": "role = 'tool'"},
        {"feature_type": "rolling_agg", "feature_name": "avg_text_len_w0",
         "window_seconds": 3600, "expression": "text_len", "agg": "avg"},
        {"feature_type": "gap_since_match", "feature_name": "since_tool_bucket",
         "filter": "role = 'tool'", "timediff": 86400, "gap": "gap_min",
         "default_value": 0.0},
        {"feature_type": "sessionize", "feature_name": "session_id",
         "gap_seconds": 1800},
        {"feature_type": "asof_join", "feature_name": "feature_state",
         "right_table": "snapshots", "on": "conv_id", "left_ts": "ts_sec",
         "right_ts": "snap_ts", "value_cols": ["feature_state"],
         "strict": True},
    ],
}


def test_flagship_declared_in_pure_json(spark, transcripts):
    from featuregenerator_spark.spec import compile_pipeline

    snaps = synth_snapshots(spark, transcripts)
    # feature_state is a map (set ops reject maps) -> compare its JSON form
    cols = [*FEATURE_COLUMNS, F.to_json("feature_state").alias("fs_json")]
    declared = compile_pipeline(
        FLAGSHIP_JSON, transcripts, tables={"snapshots": snaps}
    ).select(*cols)
    built = build_turn_features(
        temporal.with_ts_seconds(transcripts), snapshots=snaps
    ).select(*cols)
    assert declared.exceptAll(built).count() == 0
    assert built.exceptAll(declared).count() == 0


def test_compile_config_rejects_temporal_entries():
    import pytest

    from featuregenerator_spark.spec import compile_config

    with pytest.raises(ValueError, match="compile_pipeline"):
        compile_config(
            {"features": [{"feature_type": "sessionize",
                           "feature_name": "s", "gap_seconds": 60}]},
            None,
        )


def test_temporal_spec_validation():
    import pytest

    from featuregenerator_spark.spec import parse_config

    # missing required param
    with pytest.raises(ValueError, match="window_seconds"):
        parse_config({"features": [
            {"feature_type": "rolling_count", "feature_name": "x"}]})
    # bad agg
    with pytest.raises(ValueError, match="agg"):
        parse_config({"features": [
            {"feature_type": "rolling_agg", "feature_name": "x",
             "window_seconds": 60, "expression": "v", "agg": "median"}]})
    # bad gap kind
    with pytest.raises(ValueError, match="gap_min or gap_max"):
        parse_config({"features": [
            {"feature_type": "gap_since_match", "feature_name": "x",
             "filter": "a = 1", "timediff": 60, "gap": "nearest"}]})
    # non-positive window
    with pytest.raises(ValueError, match="positive"):
        parse_config({"features": [
            {"feature_type": "sessionize", "feature_name": "x",
             "gap_seconds": 0}]})
    # derive needs an expression
    with pytest.raises(ValueError, match="expression"):
        parse_config({"features": [
            {"feature_type": "derive", "feature_name": "x"}]})


def test_decayed_sum_declared_in_json(spark, transcripts):
    """The decayed_sum spec type compiles to exactly with_decayed_sum,
    for both the count form and an expression-weighted form; validation
    rejects a missing/zero half-life at parse time."""
    import pytest

    from featuregenerator_spark.spec import compile_pipeline, parse_config

    cfg = {
        "defaults": {"partition_by": "conv_id",
                     "order_by": ["turn_idx", "ts"],
                     "ts_seconds_column": "ts_sec"},
        "features": [
            {"feature_type": "ts_seconds", "feature_name": "ts_sec"},
            {"feature_type": "decayed_sum", "feature_name": "dc",
             "half_life_seconds": 1800},
            {"feature_type": "decayed_sum", "feature_name": "dv",
             "half_life_seconds": 1800, "expression": "length(text)",
             "include_current": True},
        ],
    }
    declared = compile_pipeline(cfg, transcripts).select(
        "conv_id", "turn_idx", "dc", "dv"
    )
    base = temporal.with_ts_seconds(transcripts)
    built = temporal.with_decayed_sum(base, 1800.0, "dc")
    built = temporal.with_decayed_sum(
        built, 1800.0, "dv", value=F.length("text").cast("double"),
        include_current=True,
    ).select("conv_id", "turn_idx", "dc", "dv")
    assert declared.exceptAll(built).count() == 0
    assert built.exceptAll(declared).count() == 0

    with pytest.raises(ValueError, match="half_life_seconds"):
        parse_config({"features": [
            {"feature_type": "decayed_sum", "feature_name": "x"}]})
    with pytest.raises(ValueError, match="positive"):
        parse_config({"features": [
            {"feature_type": "decayed_sum", "feature_name": "x",
             "half_life_seconds": 0}]})

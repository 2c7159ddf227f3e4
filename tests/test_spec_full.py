"""Config-driven compilation covers the whole factory surface
(FeatureFunctionCreator parity: every feature_type buildable from JSON)."""

import pytest
from pyspark.sql import functions as F

from featuregenerator_spark.spec import compile_config


def test_full_factory_surface(spark):
    df = spark.createDataFrame(
        [
            (
                "row1",
                ["k1:3", "k2:5"],          # kv map (V1)
                ["k1", "k2", "kx"],        # probe keys
                "catA^i1:7,i2:9",          # user profile
                "catA", "i1",
                ["a", "b", "c"],           # query tokens
                ["b", "c", "d"],           # title tokens
                [(1 << 56) | 100, (3 << 56) | 300],       # kgb query terms
                [(1 << 32) | 100, (3 << 32) | 999],       # kgb item terms
                ["x,y,x", "y,x,z"],        # preclick items
            )
        ],
        "id string, kv array<string>, probe array<string>, user string, "
        "cat string, item string, q array<string>, t array<string>, "
        "kq array<long>, kt array<long>, items array<string>",
    )
    config = {
        "features": [
            {"feature_type": "lookup_feature", "feature_name": "lv1",
             "map": "kv", "key": "probe", "needDiscrete": False,
             "combiner": "sum"},
            {"feature_type": "lookup_feature", "feature_name": "lv1d",
             "map": "kv", "key": "probe", "needDiscrete": True,
             "default_lookup_value": "0"},
            {"feature_type": "match_feature", "feature_name": "mh",
             "user": "user", "category": "cat", "item": "item",
             "match_type": "hit"},
            {"feature_type": "overlap_feature", "feature_name": "ov",
             "query": "q", "title": "t", "method": "common_word"},
            {"feature_type": "kgb_match_semantic", "feature_name": "kgb",
             "query": "kq", "title": "kt", "match": True},
            {"feature_type": "preclick_urb_word_feature", "feature_name": "pw",
             "expression": "items", "delim_item": ","},
        ]
    }
    out = compile_config(config, df).collect()[0]
    assert out["lv1"] == 8.0
    assert out["lv1d"] == ["lv1d_k1_3", "lv1d_k2_5", "lv1d_kx_0"]
    assert out["mh"] == "mh_catA_i1_7"
    assert out["ov"] == 2
    assert out["kgb"] == [f"kgb_{(1 << 56) | 100}"]
    assert out["pw"] == ["pw_x", "pw_y", "pw_z"]


def test_encoded_lookup_roundtrip(spark):
    """offline encode_map -> config-driven V2/V3 probe."""
    from featuregenerator_spark.operators.lookup_encoded import encode_map

    df = spark.createDataFrame(
        [(["a", "b"], [1.0, 2.0], ["a", "b", "z"])],
        "mk array<string>, mv array<double>, probe array<string>",
    ).withColumn("enc", encode_map(F.col("mk"), F.col("mv")))
    config = {
        "features": [
            {"feature_type": "lookup_feature_v2", "feature_name": "v2sum",
             "map": "enc", "key": "probe", "combiner": "sum"},
        ]
    }
    out = compile_config(config, df).collect()[0]
    assert out["v2sum"] == 3.0


def test_spec_lookup_needcombo_and_match_weighting(spark):
    """Config-compiler coverage for needCombo lookups and weighted hit."""
    from pyspark.sql import functions as F

    from featuregenerator_spark.spec import compile_config

    df = spark.createDataFrame(
        [
            (
                10000.0,
                ["a", "a"], [1.0, 1.0], [9990.0, 5000.0],
                ["a"], [1.0], [9900.0],
                "a",
                "seg^x:7",
                "x",
            )
        ],
        "pv double, k1 array<string>, v1 array<double>, t1 array<double>, "
        "k2 array<string>, v2 array<double>, t2 array<double>, probe string, "
        "user string, item string",
    )
    cfg = {
        "features": [
            {
                "feature_type": "lookup_feature", "feature_name": "pc",
                "map_keys": "k1", "map_values": "v1", "value_timestamps": "t1",
                "map2_keys": "k2", "map2_values": "v2", "value2_timestamps": "t2",
                "pvtime": "pv", "key": "probe", "timediff": 3600,
                "needCombo": True,
            },
            {
                "feature_type": "match_feature", "feature_name": "mw",
                "user": "user", "category": "seg", "item": "item",
                "match_type": "hit", "needWeighting": True,
            },
        ]
    }
    row = compile_config(cfg, df).select("pc", "mw").first()
    # history1: only ts 9990 within 3600 of pv -> cnt1=1; history2: cnt2=1
    assert row["pc"] == "pc_1_1"
    assert row["mw"]["key"] == "mw_seg_x" and row["mw"]["weight"] == 7.0


def test_spec_lookup_combo_simple(spark):
    """comboSimple config path: one history count crossed with the
    otherExpression values (FeatureConfig.h:249-254 input layout,
    Impl.h:213-267 kernel); reference camelCase cut names honored."""
    from featuregenerator_spark.spec import compile_config, parse_config

    df = spark.createDataFrame(
        [(10000.0, ["a", "a"], [1.0, 1.0], [9990.0, 9900.0], "a", ["u", "v"])],
        "pv double, k1 array<string>, v1 array<double>, t1 array<double>, "
        "probe string, oth array<string>",
    )
    cfg = {"features": [
        {"feature_type": "lookup_feature", "feature_name": "cs",
         "map_keys": "k1", "map_values": "v1", "value_timestamps": "t1",
         "pvtime": "pv", "key": "probe", "timediff": 3600,
         "needCombo": True, "comboSimple": True, "otherExpression": "oth",
         "countCutThreshold": 1},
    ]}
    row = compile_config(cfg, df).select("cs").first()
    assert row["cs"] == ["cs_1_u", "cs_1_v"]  # cnt 2 clipped to 1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="otherExpression"):
        parse_config({"features": [
            {"feature_type": "lookup_feature", "feature_name": "bad",
             "map_keys": "k1", "map_values": "v1", "value_timestamps": "t1",
             "pvtime": "pv", "key": "probe", "timediff": 3600,
             "needCombo": True, "comboSimple": True},
        ]})
    with _pytest.raises(ValueError, match="map2_keys"):
        parse_config({"features": [
            {"feature_type": "lookup_feature", "feature_name": "bad",
             "map_keys": "k1", "map_values": "v1", "value_timestamps": "t1",
             "pvtime": "pv", "key": "probe", "timediff": 3600,
             "needCombo": True},
        ]})


def test_spec_lookup_optimized_is_optimized_alias(spark):
    """The reference JSON field is "is_optimized" (FeatureConfig.h:221);
    both spellings must hit the same optimized path and validation."""
    import pytest as _pytest

    from featuregenerator_spark.spec import compile_config, parse_config

    df = spark.createDataFrame([([1.0, 2.0, 4.0],)], "vals array<double>")
    cfg = {"features": [
        {"feature_type": "lookup_feature", "feature_name": "opt",
         "map": "vals", "is_optimized": True, "combiner": "sum",
         "needDiscrete": False},
    ]}
    assert compile_config(cfg, df).first()["opt"] == 7.0
    with _pytest.raises(ValueError, match="map"):
        parse_config({"features": [
            {"feature_type": "lookup_feature", "feature_name": "bad",
             "is_optimized": True, "combiner": "sum"},
        ]})


def test_spec_lookup_optimized_values_only(spark):
    from featuregenerator_spark.spec import compile_config

    df = spark.createDataFrame(
        [([1.0, 2.0, 4.0],), ([],)], "vals array<double>"
    )
    cfg = {"features": [
        {"feature_type": "lookup_feature", "feature_name": "opt",
         "key": "vals", "isOptimized": True, "combiner": "sum",
         "needDiscrete": False},
    ]}
    got = [r["opt"] for r in compile_config(cfg, df).collect()]
    assert got == [7.0, 0.0]  # empty input -> sum 0 (Combiner.h:57-84)


def test_spec_lookup_optimized_reference_layout(spark):
    """Reference input layout: the values array travels in the
    map/expression slot (LookupFeatureFunction.cpp:216-224); key unused."""
    from featuregenerator_spark.spec import compile_config

    df = spark.createDataFrame(
        [([1.0, 2.0, 4.0],), ([],)], "vals array<double>"
    )
    cfg = {"features": [
        {"feature_type": "lookup_feature", "feature_name": "opt",
         "map": "vals", "isOptimized": True, "combiner": "sum",
         "needDiscrete": False},
    ]}
    got = [r["opt"] for r in compile_config(cfg, df).collect()]
    assert got == [7.0, 0.0]


def test_spec_lookup_optimized_rejects_weighting(spark):
    from featuregenerator_spark.spec import parse_config

    cfg = {"features": [
        {"feature_type": "lookup_feature", "feature_name": "bad",
         "map": "vals", "isOptimized": True, "needWeighting": True},
    ]}
    with pytest.raises(ValueError, match="exclusive"):
        parse_config(cfg)


def test_spec_lookup_optimized_requires_value_slot(spark):
    """An isOptimized lookup with neither 'map' nor legacy 'key' is a
    config error with a NAMED message, not a KeyError at compile time."""
    from featuregenerator_spark.spec import parse_config

    cfg = {"features": [
        {"feature_type": "lookup_feature", "feature_name": "bad",
         "isOptimized": True, "combiner": "sum"},
    ]}
    with pytest.raises(ValueError, match="input slot"):
        parse_config(cfg)


def test_spec_v3_multi_boundaries_validated_and_vestigial(spark):
    """bucketize_multi_boundaries ("a,b|c,d") mirrors the reference
    exactly: the config parser validates per-dimension sortedness and
    throws on violation (FeatureConfig.h:359-385), but no kernel
    consumes the option (grep: multiBoundaries appears only in the
    config class), so a sorted value is accepted and ignored."""
    from featuregenerator_spark.spec import parse_config

    ok = {"features": [
        {"feature_type": "lookup_feature_v3", "feature_name": "v3",
         "map": "m", "key": "k", "value_dimension": 2,
         "bucketize_multi_boundaries": "0.5,1.5|1,2,3"},
    ]}
    parse_config(ok)  # accepted, ignored

    bad = {"features": [
        {"feature_type": "lookup_feature_v3", "feature_name": "v3",
         "map": "m", "key": "k", "value_dimension": 2,
         "bucketize_multi_boundaries": "2,1|1,2"},
    ]}
    with pytest.raises(ValueError, match="sorted per dimension"):
        parse_config(bad)

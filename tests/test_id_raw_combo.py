"""id_feature / raw_feature / combo_feature golden tests (FIXTURES.md §2.3,
ported from IdFeatureFunctionTest / RawFeatureFunctionTest /
ComboFeatureFunctionTest)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from featuregenerator_spark.operators.combo_feature import (
    combo_feature_multi,
    combo_feature_scalar,
)
from featuregenerator_spark.operators.id_feature import (
    id_feature_multi,
    id_feature_scalar,
)
from featuregenerator_spark.operators.raw_feature import (
    raw_feature_multi,
    raw_feature_scalar,
)
from featuregenerator_spark.functions.normalizers import parse_normalizer


def test_id_feature_scalar(spark):
    df = spark.createDataFrame([("user",), ("assistant",), (None,)], "role string")
    out = df.select(
        id_feature_scalar(F.col("role"), "role", T.StringType()).alias("k")
    ).collect()
    assert [r["k"] for r in out] == ["role_user", "role_assistant", None]


def test_id_feature_multi_prune_invalid(spark):
    df = spark.createDataFrame(
        [([1, 2147483647, 2, 3, 4],)], "vals array<int>"
    )
    out = df.select(
        id_feature_multi(
            F.col("vals"), "fg", T.IntegerType(), prune_to=3, invalid_values=[3]
        ).alias("k")
    ).collect()
    # sentinel INT32_MAX and blacklisted 3 dropped, then pruned to 3
    assert out[0]["k"] == ["fg_1", "fg_2", "fg_4"]


def test_id_feature_float_format(spark):
    df = spark.createDataFrame([([1.5, 2.5, float("nan")],)], "vals array<double>")
    out = df.select(
        id_feature_multi(F.col("vals"), "fg", T.DoubleType()).alias("k")
    ).collect()
    # %.0f half-even: 1.5 -> 2, 2.5 -> 2; NaN skipped
    assert out[0]["k"] == ["fg_2", "fg_2"]


def test_raw_feature_nan_and_norm(spark):
    df = spark.createDataFrame(
        [(float("nan"),), (4.0,), (None,)], "x double"
    )
    n = parse_normalizer("method=minmax,min=0,max=8")
    out = df.select(raw_feature_scalar(F.col("x"), n).alias("v")).collect()
    assert [r["v"] for r in out] == [0.0, 0.5, 0.0]


def test_raw_feature_bucketize(spark):
    df = spark.createDataFrame([(1.0,), (6.0,)], "x double")
    out = df.select(
        raw_feature_scalar(F.col("x"), None, [0, 2, 5, 9]).alias("v")
    ).collect()
    assert [r["v"] for r in out] == [1, 3]


def test_raw_feature_multi_pad(spark):
    df = spark.createDataFrame([([1.0, 2.0],)], "x array<double>")
    out = df.select(
        raw_feature_multi(F.col("x"), value_dimension=4).alias("v")
    ).collect()
    assert out[0]["v"] == [1.0, 2.0, 0.0, 0.0]


def test_combo_scalar(spark):
    df = spark.createDataFrame([("a", "b")], "x string, y string")
    out = df.select(
        combo_feature_scalar([F.col("x"), F.col("y")], "name").alias("k")
    ).collect()
    assert out[0]["k"] == "name_a_b"


def test_combo_multi_cartesian(spark):
    df = spark.createDataFrame(
        [(["x", "y"], ["1"])], "a array<string>, b array<string>"
    )
    out = df.select(
        combo_feature_multi([F.col("a"), F.col("b")], "name").alias("k")
    ).collect()
    assert out[0]["k"] == ["name_x_1", "name_y_1"]


def test_combo_prune(spark):
    df = spark.createDataFrame(
        [(["1", "2", "3"], ["a", "b", "c"])], "a array<string>, b array<string>"
    )
    out = df.select(
        combo_feature_multi(
            [F.col("a"), F.col("b")],
            "c",
            prune_limits=[2, 1],
            prune_right=[False, True],
        ).alias("k")
    ).collect()
    # left keeps first 2 of a, right keeps last 1 of b
    assert out[0]["k"] == ["c_1_c", "c_2_c"]


def test_combo_prune_right_short_array(spark):
    """pruneRight with fewer values than the limit keeps the whole array
    (regression: negative-start slice returned [] for short inputs)."""
    df = spark.createDataFrame(
        [(["1", "2", "3"], ["a"])], "a array<string>, b array<string>"
    )
    out = df.select(
        combo_feature_multi(
            [F.col("a"), F.col("b")],
            "c",
            prune_limits=[5, 3],
            prune_right=[True, True],
        ).alias("k")
    ).collect()
    assert out[0]["k"] == ["c_1_a", "c_2_a", "c_3_a"]

"""Golden tests for the point-in-time lookup kernel (array form).

Vectors ported from fg_lite/feature/test/LookupFeatureFunctionArrayTest.cpp
per FIXTURES.md §2.1-2.2 (order-insensitive for sparse outputs, exact for
dense — FeatureFunctionTestBase.h:159,183).
"""

import pytest
from pyspark.sql import functions as F

from featuregenerator_spark.operators import lookup_array as la
from tests import trace_fixtures as tf


def _df_hist(spark, map_keys, map_values, value_ts, pvtime, probe_rows):
    """One spark row per probe row, same broadcast history on each."""
    rows = [(map_keys, map_values, value_ts, pvtime, pr) for pr in probe_rows]
    kt = "string" if isinstance(map_keys[0], str) else "long"
    vt = "string" if isinstance(map_values[0], str) else "double"
    tt = "string" if isinstance(value_ts[0], str) else "double"
    pt = "string" if isinstance(pvtime, str) else "double"
    prt = "string" if (probe_rows and probe_rows[0] and isinstance(probe_rows[0][0], str)) else "long"
    schema = (
        f"mk array<{kt}>, mv array<{vt}>, vts array<{tt}>, pv {pt}, probe array<{prt}>"
    )
    return spark.createDataFrame(rows, schema)


HIST_KEYS = [5, 4, 4, 3]
HIST_TS = [0.0, 1.0, 2.0, 3.0]


def test_count_timediff(spark):
    # LookupFeatureFunctionArrayTest.cpp:218-227 -> dense [2,1,0]
    df = _df_hist(spark, HIST_KEYS, [1.0, 1.0, 1.0, 1.0], HIST_TS, 3.0, [[4], [3], [5]])
    out = df.select(
        la.lookup_count(
            F.col("mk"), F.col("mv"), F.col("vts"), F.col("pv"), F.col("probe"), 2.0
        ).alias("c")
    ).collect()
    assert [r["c"][0] for r in out] == [2.0, 1.0, 0.0]


def test_count_cut1(spark):
    # :321-330 -> [1,1,0]
    df = _df_hist(spark, HIST_KEYS, [1.0] * 4, HIST_TS, 3.0, [[4], [3], [5]])
    out = df.select(
        la.lookup_count(
            F.col("mk"), F.col("mv"), F.col("vts"), F.col("pv"), F.col("probe"),
            2.0, count_cut_threshold=1,
        ).alias("c")
    ).collect()
    assert [r["c"][0] for r in out] == [1.0, 1.0, 0.0]


def test_count_discrete(spark):
    # :299-308 -> sparse fg_2, fg_1, fg_0 (count rendered as string key)
    from featuregenerator_spark.functions.formatting import fmt_float_0f, with_prefix

    df = _df_hist(spark, HIST_KEYS, [1.0] * 4, HIST_TS, 3.0, [[4], [3], [5]])
    cnt = la.lookup_count(
        F.col("mk"), F.col("mv"), F.col("vts"), F.col("pv"), F.col("probe"), 2.0
    )
    key = with_prefix(fmt_float_0f(F.element_at(cnt, 1)), "fg", True)
    out = df.select(key.alias("k")).collect()
    assert [r["k"] for r in out] == ["fg_2", "fg_1", "fg_0"]


def test_gap_max(spark):
    # :229-238 -> [6,4,0] with pv=10000, ts=[0,1000,7000,9000], diff 86400
    df = _df_hist(
        spark, HIST_KEYS, [1.0] * 4, [0.0, 1000.0, 7000.0, 9000.0], 10000.0,
        [[4], [3], [5]],
    )
    out = df.select(
        la.lookup_gap(
            F.col("mk"), F.col("mv"), F.col("vts"), F.col("pv"), F.col("probe"),
            86400.0, gap="gap_max",
        ).alias("g")
    ).collect()
    assert [r["g"][0] for r in out] == [6.0, 4.0, 0.0]


def test_gap_min(spark):
    # :288-297 -> [1,1,0] with pv=3, diff=4
    df = _df_hist(spark, HIST_KEYS, [1.0] * 4, HIST_TS, 3.0, [[4], [3], [5]])
    out = df.select(
        la.lookup_gap(
            F.col("mk"), F.col("mv"), F.col("vts"), F.col("pv"), F.col("probe"),
            4.0, gap="gap_min",
        ).alias("g")
    ).collect()
    assert [r["g"][0] for r in out] == [1.0, 1.0, 0.0]


def test_none_string_ts(spark):
    # :241-250 -> sparse fg_1 with string timestamps
    df = _df_hist(spark, ["k1"], ["1"], ["1571043000"], "1571043000", [["k1"]])
    out = df.select(
        la.lookup_none_discrete(
            F.col("mk"), F.col("mv"), F.col("vts"), F.col("pv"), F.col("probe"),
            0.0, "fg",
        ).alias("k")
    ).collect()
    assert out[0]["k"] == ["fg_1"]


def test_combo_counts(spark):
    # :252-264 -> fg_2_2, fg_1_1, fg_1_0
    rows = [
        (HIST_KEYS, [1.0] * 4, HIST_TS, [0, 4, 4, 3], [1.0] * 4, HIST_TS, 3.0, pr)
        for pr in ([4], [3], [5])
    ]
    df = spark.createDataFrame(
        rows,
        "mk array<long>, mv array<double>, vts array<double>, "
        "mk2 array<long>, mv2 array<double>, vts2 array<double>, "
        "pv double, probe array<long>",
    )
    out = df.select(
        la.lookup_combo_counts(
            F.col("mk"), F.col("mv"), F.col("vts"),
            F.col("mk2"), F.col("mv2"), F.col("vts2"),
            F.col("pv"), F.col("probe"), 10.0, "fg",
        ).alias("k")
    ).collect()
    assert [r["k"] for r in out] == ["fg_2_2", "fg_1_1", "fg_1_0"]


def test_combo_simple(spark):
    # Impl.h:213-267 — one history count crossed with each `other` value.
    # pv=3, diff=10: all 4 pairs survive; probe [4] -> cnt=2; other=[x,y]
    # -> ["fg_2_x","fg_2_y"]; comboRight=False flips -> ["fg_x_2","fg_y_2"];
    # count2_cut=1 caps how many other values are crossed (maxinc).
    rows = [(HIST_KEYS, [1.0] * 4, HIST_TS, 3.0, [4], ["x", "y"])]
    df = spark.createDataFrame(
        rows,
        "mk array<long>, mv array<double>, vts array<double>, "
        "pv double, probe array<long>, other array<string>",
    )
    args = (F.col("mk"), F.col("mv"), F.col("vts"), F.col("pv"),
            F.col("probe"), F.col("other"))
    out = df.select(
        la.lookup_combo_simple(*args, 10.0, "fg").alias("r"),
        la.lookup_combo_simple(*args, 10.0, "fg", combo_right=False).alias("l"),
        la.lookup_combo_simple(*args, 10.0, "fg", count1_cut=1).alias("c1"),
        la.lookup_combo_simple(*args, 10.0, "fg", count2_cut=1).alias("c2"),
    ).collect()[0]
    assert out["r"] == ["fg_2_x", "fg_2_y"]
    assert out["l"] == ["fg_x_2", "fg_y_2"]
    assert out["c1"] == ["fg_1_x", "fg_1_y"]
    assert out["c2"] == ["fg_2_x"]


def test_combo_simple_empty_window_is_null(spark):
    # Impl.h:227-232 — lookupPairList.empty() shares the error return:
    # the feature is NULL (not "0_x") when no pair survives the window.
    rows = [([5], [1.0], [0.0], 100.0, [5], ["x"])]
    df = spark.createDataFrame(
        rows,
        "mk array<long>, mv array<double>, vts array<double>, "
        "pv double, probe array<long>, other array<string>",
    )
    out = df.select(
        la.lookup_combo_simple(
            F.col("mk"), F.col("mv"), F.col("vts"), F.col("pv"),
            F.col("probe"), F.col("other"), 10.0, "fg",
        ).alias("r")
    ).collect()[0]
    assert out["r"] is None


def test_production_trace_1(spark):
    df = _df_hist(
        spark, tf.TRACE1_KEYS, [1.0] * len(tf.TRACE1_KEYS), tf.TRACE1_TS,
        tf.TRACE1_PV, [[tf.TRACE1_PROBE]],
    )
    out = df.select(
        la.lookup_gap(
            F.col("mk"), F.col("mv"), F.col("vts"), F.col("pv"), F.col("probe"),
            86400.0, gap="gap_min",
        ).alias("g")
    ).collect()
    assert out[0]["g"][0] == tf.TRACE1_EXPECTED


def test_production_trace_2_string_ts(spark):
    df = _df_hist(
        spark, tf.TRACE2_KEYS, [1.0] * len(tf.TRACE2_KEYS), tf.TRACE2_TS,
        tf.TRACE2_PV, [[tf.TRACE2_PROBE]],
    )
    out = df.select(
        la.lookup_gap(
            F.col("mk"), F.col("mv"), F.col("vts"), F.col("pv"), F.col("probe"),
            86400.0, gap="gap_min",
        ).alias("g")
    ).collect()
    assert out[0]["g"][0] == tf.TRACE2_EXPECTED


# --------------------------------------------------------------- no-timediff


def test_discrete_with_default(spark):
    # testIntKeys :156-161 -> fg_, fg_3, fg_1 (map {5:1,4:2,3:3} values as strings)
    df = spark.createDataFrame(
        [([5, 4, 3], ["1", "2", "3"], [k]) for k in (1, 3, 5)],
        "mk array<long>, mv array<string>, probe array<long>",
    )
    out = df.select(
        la.lookup_discrete(
            F.col("mk"), F.col("mv"), F.col("probe"), "fg",
            has_default=True, default_value="",
        ).alias("k")
    ).collect()
    assert [r["k"] for r in out] == [["fg_"], ["fg_3"], ["fg_1"]]


def test_discrete_no_default_multi_probe(spark):
    # testStringKeyIntMapKey :184-189 -> rows [], [fg_1,fg_2], [fg_1]
    df = spark.createDataFrame(
        [
            (["5", "4", "3"], [1, 2, 3], []),
            (["5", "4", "3"], [1, 2, 3], ["5", "0", "4"]),
            (["5", "4", "3"], [1, 2, 3], ["5"]),
        ],
        "mk array<string>, mv array<long>, probe array<string>",
    )
    out = df.select(
        la.lookup_discrete(F.col("mk"), F.col("mv"), F.col("probe"), "fg").alias("k")
    ).collect()
    assert [r["k"] for r in out] == [[], ["fg_1", "fg_2"], ["fg_1"]]


def test_dense_sum(spark):
    # testDenseMultiLookup :198-203 -> [0, 3, 1]
    df = spark.createDataFrame(
        [
            ([5, 4, 3], [1.0, 2.0, 3.0], []),
            ([5, 4, 3], [1.0, 2.0, 3.0], [5, 0, 4]),
            ([5, 4, 3], [1.0, 2.0, 3.0], [5]),
        ],
        "mk array<long>, mv array<double>, probe array<long>",
    )
    out = df.select(
        la.lookup_dense(F.col("mk"), F.col("mv"), F.col("probe")).alias("v")
    ).collect()
    assert [r["v"] for r in out] == [0.0, 3.0, 1.0]


def test_dense_bucketized(spark):
    # testDenseWithBucket :211-216 -> [1, 2, 3] boundaries [0,2,5,9]
    df = spark.createDataFrame(
        [([5, 4, 3], [6.0, 2.0, 3.0], [k]) for k in (1, 3, 5)],
        "mk array<long>, mv array<double>, probe array<long>",
    )
    out = df.select(
        la.lookup_dense(
            F.col("mk"), F.col("mv"), F.col("probe"), boundaries=[0, 2, 5, 9]
        ).alias("v")
    ).collect()
    assert [r["v"] for r in out] == [1, 2, 3]


def test_dense_type_convert(spark):
    # testDenseTypeConvert :205-210 string values -> [0, 3, 1]
    df = spark.createDataFrame(
        [([5, 4, 3], ["1", "2", "3"], pr) for pr in ([1], [3], [5])],
        "mk array<long>, mv array<string>, probe array<long>",
    )
    out = df.select(
        la.lookup_dense(F.col("mk"), F.col("mv"), F.col("probe")).alias("v")
    ).collect()
    assert [r["v"] for r in out] == [0.0, 3.0, 1.0]


def test_last_write_wins_duplicate_keys(spark):
    # CONSTRUCT_MAP overwrites: {4:1, 4:9} -> probe 4 = 9
    df = spark.createDataFrame(
        [([4, 4], [1.0, 9.0], [4])], "mk array<long>, mv array<double>, probe array<long>"
    )
    out = df.select(
        la.lookup_dense(F.col("mk"), F.col("mv"), F.col("probe")).alias("v")
    ).collect()
    assert out[0]["v"] == 9.0

"""match_feature / overlap_feature / kgb / preclick golden tests
(FIXTURES.md §2.4, MatchFeatureFunctionTest.cpp / OverLapFeatureFunctionTest
/ UserMatchInfoTest fixtures)."""

from pyspark.sql import functions as F

from featuregenerator_spark.operators import kgb_match as kgb
from featuregenerator_spark.operators import preclick_urb as pre
from featuregenerator_spark.operators.match_feature import (
    match_cos,
    match_cross,
    match_hit_dense,
    match_hit_sparse,
    match_multihit_sparse,
    parse_user_info,
)
from featuregenerator_spark.operators.overlap_feature import (
    overlap_feature,
    overlap_feature_sparse,
)

USER1 = (
    "ALL^107287172:0.2,36806676:0.3,122572685:5"
    "|50006842^16788816:0.1,10122:0.2,29889:0.3,30068:19"
)
USER2 = "1234^10:0.1,20:0.2,30:0.3 | 2345^10:1,20:2,30:3 | 3456^10:11,20:21,30:31"


def test_parse_user_info(spark):
    df = spark.createDataFrame([(USER2,)], "u string")
    m = df.select(parse_user_info(F.col("u")).alias("m")).collect()[0]["m"]
    assert set(m.keys()) == {"1234", "2345", "3456"}
    assert m["2345"]["20"] == "2"
    assert m["3456"]["30"] == "31"


def test_match_hit(spark):
    # MatchFeatureFunctionTest.cpp:80 — category 50006842, item 16788816 -> 0.1
    df = spark.createDataFrame([(USER1,)], "u string")
    m = parse_user_info(F.col("u"))
    dense = df.select(
        match_hit_dense(m, F.lit("50006842"), F.lit("16788816")).alias("v")
    ).collect()[0]["v"]
    assert abs(dense - 0.1) < 1e-9
    sparse = df.select(
        match_hit_sparse(m, F.lit("50006842"), F.lit("16788816"), "fg").alias("k")
    ).collect()[0]["k"]
    assert sparse == "fg_50006842_16788816_0.1"


def test_match_multihit_wildcards(spark):
    df = spark.createDataFrame([(USER2,)], "u string")
    m = parse_user_info(F.col("u"))
    out = df.select(
        match_multihit_sparse(m, F.lit("2345"), F.lit("ALL"), "fg").alias("k")
    ).collect()[0]["k"]
    assert sorted(out) == ["fg_2345_10_1", "fg_2345_20_2", "fg_2345_30_3"]
    out_all = df.select(
        match_multihit_sparse(m, F.lit("ALL"), F.lit("10"), "fg").alias("k")
    ).collect()[0]["k"]
    assert sorted(out_all) == ["fg_1234_10_0.1", "fg_2345_10_1", "fg_3456_10_11"]


def test_match_cross(spark):
    df = spark.createDataFrame([(USER2,)], "u string")
    m = parse_user_info(F.col("u"))
    out = df.select(
        match_cross(m, F.lit("1234"), F.lit("item9"), "fg").alias("k")
    ).collect()[0]["k"]
    assert sorted(out) == [
        "fg_1234_10_item9",
        "fg_1234_20_item9",
        "fg_1234_30_item9",
    ]


def test_match_cos(spark):
    # user 2345: {10:1,20:2,30:3}; item "10:100,20:200" ->
    # dot = 100*1+200*2 = 500; matched=2 -> int(500/(100*100*2)*100) = int(2.5)=2
    df = spark.createDataFrame([(USER2,)], "u string")
    m = parse_user_info(F.col("u"))
    out = df.select(
        match_cos(m, F.lit("2345"), F.lit("10:100,20:200")).alias("v")
    ).collect()[0]["v"]
    assert out == 2


def test_overlap_methods(spark):
    # FIXTURES §2.4: q=[1,2,3], t=[2,3,4]
    df = spark.createDataFrame(
        [(["1", "2", "3"], ["2", "3", "4"])], "q array<string>, t array<string>"
    )
    got = df.select(
        overlap_feature(F.col("q"), F.col("t"), "common_word").alias("cw"),
        overlap_feature(F.col("q"), F.col("t"), "diff_word").alias("dw"),
        overlap_feature(F.col("q"), F.col("t"), "diff_both").alias("db"),
        overlap_feature(F.col("q"), F.col("t"), "query_common_ratio").alias("qr"),
        overlap_feature(F.col("q"), F.col("t"), "title_common_ratio").alias("tr"),
        overlap_feature(F.col("q"), F.col("t"), "hit_ornot").alias("h"),
        overlap_feature(F.col("q"), F.col("t"), "is_equal").alias("eq"),
    ).collect()[0]
    assert (got["cw"], got["dw"], got["db"]) == (2, 1, 2)
    assert (got["qr"], got["tr"]) == (6, 66)
    assert (got["h"], got["eq"]) == (1, 0)


def test_overlap_contain(spark):
    df = spark.createDataFrame(
        [
            (["2", "3"], ["2", "3", "4"]),
            (["2", "4"], ["2", "3", "4"]),
            (["3", "4"], ["2", "3", "4"]),
        ],
        "q array<string>, t array<string>",
    )
    out = df.select(
        overlap_feature(F.col("q"), F.col("t"), "is_contain").alias("c")
    ).collect()
    assert [r["c"] for r in out] == [1, 0, 1]


def test_overlap_sparse(spark):
    df = spark.createDataFrame(
        [(["1", "2", "3"], ["2", "3", "4"])], "q array<string>, t array<string>"
    )
    out = df.select(
        overlap_feature_sparse(
            F.col("q"), F.col("t"), "common_word_divided", "fg"
        ).alias("k")
    ).collect()[0]["k"]
    assert out == "fg_2_3"


def _term(cls: int, value: int, query: bool) -> int:
    return (cls << 56 | value) if query else (cls << 32 | value)


def test_kgb_match(spark):
    q = [_term(1, 100, True), _term(1, 200, True), _term(3, 300, True)]
    items = [_term(1, 100, False), _term(3, 999, False)]
    df = spark.createDataFrame([(q, items)], "q array<long>, i array<long>")
    matched = df.select(
        kgb.kgb_match_terms(F.col("q"), F.col("i"), "fg").alias("k")
    ).collect()[0]["k"]
    assert matched == [f"fg_{q[0]}"]
    unmatched = df.select(
        kgb.kgb_match_terms(F.col("q"), F.col("i"), "fg", match=False).alias("k")
    ).collect()[0]["k"]
    assert unmatched == [f"fg_{q[1]}", f"fg_{q[2]}"]


def test_kgb_hit_ret(spark):
    brand_hit = [_term(3, 300, True)]
    items_hit = [_term(3, 300, False)]
    items_miss = [_term(3, 999, False)]
    df = spark.createDataFrame(
        [(brand_hit, items_hit), (brand_hit, items_miss), ([_term(1, 1, True)], items_miss)],
        "q array<long>, i array<long>",
    )
    out = df.select(
        kgb.kgb_hit_ret(F.col("q"), F.col("i"), "fg").alias("k")
    ).collect()
    assert [r["k"] for r in out] == ["fg_0", "fg_1", "fg_2"]


def test_preclick_top_words(spark):
    df = spark.createDataFrame(
        [(["a,b,a", "b,a,c"],)], "items array<string>"
    )
    out = df.select(
        pre.top_words(F.col("items"), "fg", delim_item=",").alias("k")
    ).collect()[0]["k"]
    # counts: a=3, b=2, c=1 -> order (count desc, word asc)
    assert out == ["fg_a", "fg_b", "fg_c"]


def test_preclick_match_count(spark):
    df = spark.createDataFrame(
        [(["a,b,a", "b,a,c"], ["a,x"]), (["a,b,a", "b,a,c"], ["z"])],
        "exp array<string>, m array<string>",
    )
    out = df.select(
        pre.match_words(
            F.col("exp"), F.col("m"), "fg", delim_item=",", output_count=True
        ).alias("k")
    ).collect()
    assert [r["k"] for r in out] == ["fg_1", "fg_0"]

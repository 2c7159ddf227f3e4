"""Text-analysis kernels: language-ID, token count, fingerprint, quality."""

import pytest
from pyspark.sql import functions as F

from featuregenerator_spark.operators.text_analysis import (
    FINGERPRINT_MOD,
    lang_id,
    quality_score,
    rolling_fingerprint,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat of the mat and a dog"),
        (1, "der hund und die katze und das haus"),
        (2, "le chat et la maison et les arbres"),
        (3, "xyzzy plugh quux"),
        (4, "the und"),  # tie en=de=1 -> declaration order wins (en)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lang_id(docs):
    got = {
        r["doc_id"]: r["lang"]
        for r in docs.select("doc_id", lang_id(F.col("text")).alias("lang")).collect()
    }
    assert got == {0: "en", 1: "de", 2: "fr", 3: "und", 4: "en"}


def test_token_count_regex(spark):
    df = spark.createDataFrame(
        [("ab12 cd-ef, gh",)], "text string"
    )
    # tokens: ab, 12, cd, -, ef, ",", gh
    assert df.select(token_count(F.col("text")).alias("n")).first()["n"] == 7


def test_rolling_fingerprint_matches_python(docs):
    rows = docs.select("doc_id", "text", rolling_fingerprint(F.col("text")).alias("fp")).collect()
    for r in rows:
        acc = 0
        for t in r["text"].split(" "):
            code = len(t) * 17 + (ord(t[0]) if t else 0)
            acc = (acc * 31 + code) % FINGERPRINT_MOD
        assert r["fp"] == acc, r["text"]


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame([("a bb",), ("bb a",)], "text string")
    fps = [r["fp"] for r in df.select(rolling_fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] != fps[1]


def test_quality_score_bounds_and_ranking(spark):
    df = spark.createDataFrame(
        [(0, "the quick brown fox and a dog of the hill " * 8),
         (1, "!!! ??? ### $$$")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["q"] for r in df.select(
        "doc_id", quality_score(F.col("text")).alias("q")).collect()}
    assert 0.0 <= got[1] < got[0] <= 1.0

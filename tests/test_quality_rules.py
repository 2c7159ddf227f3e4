"""Gopher-style quality/repetition rules: hand-computed fixtures per rule."""

import pytest
from pyspark.sql import functions as F

from featuregenerator_spark.operators.quality_rules import (
    top_ngram_char_fraction,
    with_quality_rules,
)

GOOD = (
    "the cat sat on the mat and we have to be fair that every word "
    "here is made of plain letters so the mean length stays sane and "
    "the document keeps more than fifty words of ordinary prose with "
    "no repetition tricks at all because that would trip a rule\n"
    "a second line keeps the line metrics from being degenerate and "
    "adds a few more honest words to clear the fifty word floor"
)


def _one(df, text):
    out = with_quality_rules(
        df.sparkSession.createDataFrame([(0, text)], "doc_id long, text string")
    )
    return out.collect()[0].asDict()


@pytest.fixture(scope="module")
def base(spark):
    return spark.createDataFrame([(0, "x")], "doc_id long, text string")


def test_word_and_line_counts(base):
    r = _one(base, "aa bb\ncc  dd\n\nee")
    assert r["n_words"] == 5
    assert r["n_lines"] == 3  # empty line dropped
    assert r["mean_word_len"] == 2.0


def test_dup_line_fractions(base):
    # 4 lines, 'dup' twice: dup_line_frac = (4-3)/4; duplicated line
    # chars 3+3 over 3+3+6+4 = 6/16
    r = _one(base, "dup\ndup\nunique\nmore")
    assert r["dup_line_frac"] == pytest.approx(0.25)
    assert r["dup_line_char_frac"] == pytest.approx(6 / 16)


def test_bullet_and_ellipsis_lines(base):
    r = _one(base, "- item one\n* item two\nplain\nwait...\nende…")
    assert r["bullet_line_frac"] == pytest.approx(2 / 5)
    assert r["ellipsis_line_frac"] == pytest.approx(2 / 5)


def test_symbol_ratio_and_alpha_frac(base):
    # 4 words; symbols: 2 '#' + 1 '...' + 1 '…' = 4 -> ratio 1.0
    r = _one(base, "a# b# c... 9…")
    assert r["symbol_word_ratio"] == pytest.approx(1.0)
    assert r["alpha_word_frac"] == pytest.approx(3 / 4)


def test_stopword_hits_case_insensitive(base):
    r = _one(base, "The and THAT xyzzy")
    assert r["stopword_hits"] == 3


def test_empty_text_all_zero_no_null(base):
    r = _one(base, "")
    for k, v in r.items():
        if k in ("doc_id", "text"):
            continue
        assert v is not None and (v == 0 or v == 0.0 or v is False), (k, v)


def test_passes_gopher_good_doc(base):
    r = _one(base, GOOD)
    assert r["n_words"] >= 50
    assert r["passes_gopher"] is True


@pytest.mark.parametrize(
    "mutate, rule",
    [
        (lambda t: "too few words", "min word count"),
        (lambda t: t.replace(" ", " # ")[: len(t)], "symbol ratio"),
        (lambda t: t + ("\nthe same line" * 10), "dup line frac"),
        (
            lambda t: t.replace("\n", "\n- ") + "\n" + "\n".join("- b%d and the of to" % i for i in range(40)),
            "bullet lines",
        ),
        (lambda t: " ".join("9" * 4 for _ in range(60)), "alpha frac / stopwords"),
    ],
)
def test_passes_gopher_rejects(base, mutate, rule):
    assert _one(base, mutate(GOOD))["passes_gopher"] is False, rule


def test_top_ngram_exact(spark):
    # "a b a b a": bigrams (a b)x2, (b a)x2 -> tie broken by gram asc
    # ("a b"); chars = 5 letters + 4 spaces = 9; frac = 2*3/9
    df = spark.createDataFrame([(0, "a b a b a")], "doc_id long, text string")
    r = top_ngram_char_fraction(df, 2).collect()[0]
    assert r["top_2gram"] == "a b"
    assert r["top_2gram_count"] == 2
    assert r["top_2gram_char_frac"] == pytest.approx(6 / 9)


def test_top_ngram_short_doc_zero(spark):
    df = spark.createDataFrame(
        [(0, "solo"), (1, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in top_ngram_char_fraction(df, 2).collect()}
    for i in (0, 1):
        assert rows[i]["top_2gram"] == ""
        assert rows[i]["top_2gram_count"] == 0
        assert rows[i]["top_2gram_char_frac"] == 0.0


def test_top_trigram(spark):
    df = spark.createDataFrame(
        [(0, "x y z x y z x")], "doc_id long, text string"
    )
    r = top_ngram_char_fraction(df, 3).collect()[0]
    # trigrams: "x y z"x2, "y z x"x2, "z x y"x1 -> tie: "x y z"
    assert r["top_3gram"] == "x y z"
    assert r["top_3gram_count"] == 2
    # chars = 7 letters + 6 spaces = 13; covered = 2*5
    assert r["top_3gram_char_frac"] == pytest.approx(10 / 13)


def test_whitespace_normalization(base):
    # runs of spaces / leading space produce no empty words
    r = _one(base, "  a   bb  ")
    assert r["n_words"] == 2
    assert r["mean_word_len"] == pytest.approx(1.5)

"""Pins for exact paragraph-level dedup (the MassiveText middle pass)."""

import pytest

from featuregenerator_spark.operators.paragraph_dedup import (
    dedup_paragraphs,
    split_paragraphs,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta\nshared footer\ngamma"),
            (2, "shared footer\ndelta"),          # footer dups doc 1
            (3, "shared footer"),                 # becomes empty
            (4, "epsilon\n\nzeta"),               # empty paragraph dropped
            (5, "twin\ntwin"),                    # within-doc dup
        ],
        "doc_id long, text string",
    )


def test_split_skips_empties(spark, corpus):
    rows = split_paragraphs(corpus.filter("doc_id = 4")).collect()
    assert [(r["idx"], r["para"]) for r in sorted(rows)] == [
        (0, "epsilon"),
        (1, "zeta"),
    ]


def test_first_occurrence_survives(spark, corpus):
    out = {r["doc_id"]: r for r in dedup_paragraphs(corpus).collect()}
    assert out[1]["clean_text"] == "alpha beta\nshared footer\ngamma"
    assert out[1]["n_dup_paragraphs"] == 0
    assert out[2]["clean_text"] == "delta"
    assert out[2]["n_dup_paragraphs"] == 1
    assert out[2]["dup_para_frac"] == pytest.approx(0.5)


def test_fully_duplicated_doc_empties(spark, corpus):
    out = {r["doc_id"]: r for r in dedup_paragraphs(corpus).collect()}
    assert out[3]["clean_text"] == ""
    assert out[3]["n_paragraphs"] == 1
    assert out[3]["n_dup_paragraphs"] == 1
    assert out[3]["dup_para_frac"] == pytest.approx(1.0)


def test_within_doc_dup(spark, corpus):
    out = {r["doc_id"]: r for r in dedup_paragraphs(corpus).collect()}
    assert out[5]["clean_text"] == "twin"
    assert out[5]["n_dup_paragraphs"] == 1


def test_order_restored_and_counts(spark, corpus):
    out = {r["doc_id"]: r for r in dedup_paragraphs(corpus).collect()}
    assert out[4]["clean_text"] == "epsilon\nzeta"
    assert out[4]["n_paragraphs"] == 2
    assert out[4]["n_dup_paragraphs"] == 0
    assert out[4]["dup_para_frac"] == 0.0


def test_no_python_udf_in_plan(spark, corpus):
    plan = dedup_paragraphs(corpus)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_regex_metachar_separator_is_literal(spark):
    df = spark.createDataFrame(
        [(1, "aa|shared|bb"), (2, "shared|cc")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           dedup_paragraphs(df, sep="|").collect()}
    assert out[1]["clean_text"] == "aa|shared|bb"
    assert out[2]["clean_text"] == "cc"
    assert out[2]["n_dup_paragraphs"] == 1

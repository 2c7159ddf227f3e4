"""Pins for the relational bigram-LM perplexity filter (CCNet stage)."""

import math

import pytest
from pyspark.sql import functions as F

from featuregenerator_spark.operators.lm_perplexity import (
    perplexity_filter,
    score_log_perplexity,
    train_bigram_lm,
)


@pytest.fixture(scope="module")
def tiny(spark):
    # train split (even ids): "a b a" and "a b" -> counts are hand-small.
    return spark.createDataFrame(
        [
            (0, "a b a"),
            (2, "a b"),
            (1, "a b"),      # scored only: seen bigram
            (3, "c a"),      # scored only: unseen context c
            (5, "x"),        # < 2 tokens -> no bigrams
        ],
        "doc_id long, text string",
    )


def test_closed_form_hand_counts(spark, tiny):
    # Train tokens: a b a a b -> C(a)=3, C(b)=2, V=2.
    # Bigrams: (a,b)x2, (b,a)x1.
    out = {
        r["doc_id"]: r
        for r in perplexity_filter(tiny, keep_logppl=1.0).collect()
    }
    # doc 1 "a b": -ln((2+1)/(3+2)) = ln(5/3)
    assert out[1]["lm_logppl"] == pytest.approx(round(math.log(5 / 3), 4))
    assert out[1]["n_bigrams"] == 1
    # doc 3 "c a": C(c)=0, C(c,a)=0 -> -ln(1/(0+2)) = ln 2
    assert out[3]["lm_logppl"] == pytest.approx(round(math.log(2), 4))
    # doc 0 "a b a": bigrams (a,b),(b,a); C(b,a)=1 -> p=(1+1)/(2+2)=1/2
    exp0 = (math.log(5 / 3) + math.log(2)) / 2
    assert out[0]["lm_logppl"] == pytest.approx(round(exp0, 4))


def test_short_doc_contract(spark, tiny):
    out = {r["doc_id"]: r for r in perplexity_filter(tiny).collect()}
    r = out[5]
    assert r["n_bigrams"] == 0
    assert r["lm_logppl"] is None
    assert r["ppl_bucket"] is None
    assert r["keep"] == 0


def test_keep_threshold_and_buckets(spark, tiny):
    # a bound below every score keeps nothing
    out = perplexity_filter(tiny, keep_logppl=0.4).collect()
    assert all(r["keep"] == 0 for r in out)
    out2 = {r["doc_id"]: r for r in perplexity_filter(tiny, keep_logppl=0.7).collect()}
    assert out2[1]["keep"] == 1 and out2[3]["keep"] == 1
    # buckets: 4 scoreable docs ranked by rounded lp, percent_rank
    # tertiles. lp order: doc1=doc2 (0.5108) < doc0 (0.602) < doc3
    # (0.6931); ranks 1,1,3,4 -> pr 0,0,2/3,1.
    assert out2[1]["ppl_bucket"] == "head"
    assert out2[2]["ppl_bucket"] == "head"
    assert out2[0]["ppl_bucket"] == "middle"  # pr == 2/3 exactly
    assert out2[3]["ppl_bucket"] == "tail"


def test_tie_rank_determinism(spark):
    # identical docs get identical rounded lp -> identical bucket, and
    # repeated runs agree (the rounding-before-rank contract).
    rows = [(i, "a b c a b") for i in range(6)] + [(10, "z z q w p")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["ppl_bucket"] for r in perplexity_filter(df).collect()}
    b = {r["doc_id"]: r["ppl_bucket"] for r in perplexity_filter(df).collect()}
    assert a == b
    assert len({a[i] for i in range(6)}) == 1


def test_no_python_udf_in_plan(spark, tiny):
    plan = perplexity_filter(tiny)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repetitive_text_scores_lower(spark):
    # a doc made of the corpus's dominant bigram scores lower ppl than
    # an OOV-heavy doc under the same LM.
    rows = [(i, "the cat sat on the mat and the cat ran") for i in range(0, 8, 2)]
    rows += [(1, "the cat sat on the mat"), (3, "zz qq ww ee rr tt")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["lm_logppl"] for r in perplexity_filter(df).collect()}
    assert out[1] < out[3]

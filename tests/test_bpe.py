"""Relational BPE training: greedy non-overlap, argmax tie-break,
frequency weighting, multi-round composition."""

import pytest

from featuregenerator_spark.operators.bpe import (
    bpe_token_counts,
    bpe_train_tokenize,
)


def _docs(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text string")


def _tok(spark, texts, rounds):
    return {
        r["w"]: (r["wc"], r["toks"])
        for r in bpe_train_tokenize(_docs(spark, texts), rounds=rounds).collect()
    }


def test_single_round_picks_weighted_argmax(spark):
    # 'ab' x3 plus 'cd' x2: pair (a,b) count 3 beats (c,d) count 2
    out = _tok(spark, ["ab ab", "ab cd cd"], rounds=1)
    assert out["ab"] == (3, ["ab"])
    assert out["cd"] == (2, ["c", "d"])


def test_greedy_left_to_right_on_runs(spark):
    # only word: 'aaaa' -> merge (a,a) applies NON-overlapping,
    # left-to-right: ['aa','aa'], never 3 overlapping matches
    out = _tok(spark, ["aaaa"], rounds=1)
    assert out["aaaa"] == (1, ["aa", "aa"])
    # odd run: 'aaaaa' -> ['aa','aa','a']
    out = _tok(spark, ["aaaaa"], rounds=1)
    assert out["aaaaa"][1] == ["aa", "aa", "a"]


def test_tie_breaks_lexicographic(spark):
    # 'ba' and 'ab' each appear once: counts tie at 1; (a,b) < (b,a)
    out = _tok(spark, ["ab ba"], rounds=1)
    assert out["ab"][1] == ["ab"]
    assert out["ba"][1] == ["b", "a"]


def test_rounds_compose_into_longer_tokens(spark):
    # 'abab' x2: round1 merges (a,b) -> [ab, ab]; round2's top pair is
    # (ab, ab) -> [abab]
    out = _tok(spark, ["abab abab"], rounds=2)
    assert out["abab"] == (2, ["abab"])


def test_merge_applies_across_all_words(spark):
    # merge learned on frequent word applies inside rarer words too
    out = _tok(spark, ["ab ab ab xaby"], rounds=1)
    assert out["xaby"][1] == ["x", "ab", "y"]


def test_short_words_survive(spark):
    out = _tok(spark, ["a a ab"], rounds=1)
    # single-char word has no pairs; stays a 1-token word
    assert out["a"] == (2, ["a"])


def test_token_counts_apply_learned_vocab(spark):
    docs = spark.createDataFrame(
        [(0, "ab ab cd"), (1, "ab x")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_token_counts(docs, rounds=1).collect()
    }
    # round 1 merges (a,b): doc0 = ab(1) + ab(1) + cd(2) = 4;
    # doc1 = ab(1) + x(1) = 2
    assert got == {0: 4, 1: 2}

"""Closed-form pins for the exact substring-duplicate coverage operator.

Every expectation below is hand-derivable from the window definition
(k-token sliding windows, duplicated = content occurs >= 2 times
corpus-wide, coverage = interval union of duplicated [start, start+k)).
"""

import pytest
from pyspark.sql import functions as F

from featuregenerator_spark.operators.substring_dedup import (
    substring_dup_coverage,
    trim_dup_spans,
    window_hashes,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_cross_doc_duplicate_and_interval_merge(spark):
    # Docs 1 and 2 share the 10-token prefix -> with k=4, duplicated
    # window starts 0..6 in both; the union [0,4)+[1,5)+...+[6,10) merges
    # to one interval of 10 tokens. Doc 1 has 12 tokens total, doc 2 has
    # 10; doc 3 shares nothing.
    shared = "a b c d e f g h i j"
    rows = [
        (1, shared + " x y"),
        (2, shared),
        (3, "p q r s t u v w k l"),
    ]
    out = _by_id(substring_dup_coverage(_docs(spark, rows), k=4))
    assert out[1] == {
        "doc_id": 1,
        "n_tokens": 12,
        "dup_windows": 7,
        "covered_tokens": 10,
        "dup_token_frac": round(10 / 12, 4),
    }
    assert out[2]["dup_windows"] == 7
    assert out[2]["covered_tokens"] == 10
    assert out[2]["dup_token_frac"] == 1.0
    assert out[3] == {
        "doc_id": 3,
        "n_tokens": 10,
        "dup_windows": 0,
        "covered_tokens": 0,
        "dup_token_frac": 0.0,
    }


def test_within_doc_repetition_counts(spark):
    # One doc, nobody else: "a b c d" repeated twice with a separator.
    # k=4 windows: starts 0..5 over 9 tokens; the window "a b c d"
    # occurs at starts 0 and 5 -> duplicated; intervals [0,4) and [5,9)
    # do NOT merge (gap at token 4) -> covered 8 of 9.
    rows = [(1, "a b c d z a b c d")]
    out = _by_id(substring_dup_coverage(_docs(spark, rows), k=4))
    assert out[1]["dup_windows"] == 2
    assert out[1]["covered_tokens"] == 8
    assert out[1]["dup_token_frac"] == round(8 / 9, 4)


def test_adjacent_intervals_touching_merge(spark):
    # Duplicated windows at starts 0 and 4 with k=4: [0,4) and [4,8)
    # touch exactly (start == prev_end) and must merge into [0,8).
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d z z z e f g h"),
    ]
    out = _by_id(substring_dup_coverage(_docs(spark, rows), k=4))
    # doc 1 windows: "a b c d"(0) dup with doc2 start 0; "e f g h"(4)
    # dup with doc2 start 7; starts 1-3 unique.
    assert out[1]["dup_windows"] == 2
    assert out[1]["covered_tokens"] == 8
    assert out[1]["dup_token_frac"] == 1.0


def test_short_docs_emit_no_windows(spark):
    rows = [(1, "a b c"), (2, "a b c")]  # 3 tokens < k=4
    wins = window_hashes(_docs(spark, rows), k=4)
    assert wins.count() == 0
    out = _by_id(substring_dup_coverage(_docs(spark, rows), k=4))
    assert out[1]["dup_windows"] == 0
    assert out[1]["dup_token_frac"] == 0.0
    assert out[1]["n_tokens"] == 3


def test_min_occurrences_threshold(spark):
    # The same window in exactly 2 docs: dup at threshold 2, clean at 3.
    rows = [
        (1, "a b c d w1 w2 w3 w4"),
        (2, "a b c d v1 v2 v3 v4"),
    ]
    docs = _docs(spark, rows)
    at2 = _by_id(substring_dup_coverage(docs, k=4, min_occurrences=2))
    at3 = _by_id(substring_dup_coverage(docs, k=4, min_occurrences=3))
    assert at2[1]["dup_windows"] == 1 and at2[2]["dup_windows"] == 1
    assert at3[1]["dup_windows"] == 0 and at3[2]["dup_windows"] == 0


def test_trim_keeps_canonical_occurrence(spark):
    # Window "a b c d" occurs in docs 1, 2 and twice in doc 4. Canonical
    # = (1, 0): doc 1 keeps everything (its other windows are unique);
    # doc 2 (an exact subset of doc 1's prefix) is trimmed to empty;
    # doc 4 loses both copies, keeping only the separator token.
    rows = [
        (1, "a b c d e f g h i j x y"),
        (2, "a b c d e f g h i j"),
        (3, "p q r s t u v w k l"),
        (4, "a b c d z a b c d"),
    ]
    out = _by_id(trim_dup_spans(_docs(spark, rows), k=4))
    assert out[1]["text_clean"] == "a b c d e f g h i j x y"
    assert out[1]["n_removed_tokens"] == 0
    assert out[2]["text_clean"] == ""
    assert out[2]["n_removed_tokens"] == 10
    assert out[3]["text_clean"] == "p q r s t u v w k l"
    assert out[4]["text_clean"] == "z"
    assert out[4]["n_removed_tokens"] == 8


def test_trim_within_doc_keeps_first_copy(spark):
    # Alone in the corpus, a self-repeating doc keeps its FIRST copy:
    # canonical for "a b c d" is (1, 0), so only [5, 9) is cut.
    rows = [(1, "a b c d z a b c d")]
    out = _by_id(trim_dup_spans(_docs(spark, rows), k=4))
    assert out[1]["text_clean"] == "a b c d z"
    assert out[1]["n_removed_tokens"] == 4
    assert out[1]["n_tokens"] == 9


def test_trim_removed_counts_match_coverage_of_noncanonical(spark):
    # n_tokens - n_removed == len(split(text_clean)) for every doc
    # (the interval arithmetic and the indexed-lambda rebuild agree).
    rows = [
        (i, " ".join(f"w{(i * 5 + j) % 9}" for j in range(25)))
        for i in range(30)
    ]
    out = trim_dup_spans(_docs(spark, rows), k=5)
    bad = out.filter(
        F.size(F.split("text_clean", " "))
        - F.when(F.col("text_clean") == "", 1).otherwise(0)
        != F.col("n_tokens") - F.col("n_removed_tokens")
    )
    assert bad.count() == 0


def test_hash_grouping_equals_string_grouping(spark):
    # The operator groups xxhash64(window); regroup the same corpus on
    # the window STRINGS and compare per-doc dup-window counts — the
    # collision-freeness claim the DuckDB gate also proves, pinned
    # in-repo on a corpus with heavy repetition.
    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 11}" for j in range(30)))
        for i in range(40)
    ]
    docs = _docs(spark, rows)
    k = 5
    out = _by_id(substring_dup_coverage(docs, k=k))

    toks = F.split("text", " ")
    starts = F.sequence(F.lit(0), F.size(toks) - k)
    strings = docs.select(
        "doc_id",
        F.explode(
            F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
        ).alias("sh"),
    )
    dup = strings.groupBy("sh").count().filter("count >= 2").select("sh")
    expected = {
        r["doc_id"]: r["n"]
        for r in strings.join(dup, "sh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for doc_id, row in out.items():
        assert row["dup_windows"] == expected.get(doc_id, 0)

"""Incremental (batch-vs-corpus) near-dup dedup: the daily-ingest shape.

The exact form (q_dedup_incremental) is DuckDB-oracle-checked by the
driver gate; these tests pin what the gate cannot see — the LSH scale
path's relationship to the exact form, and the batch/corpus membership
invariant that makes the join asymmetric (no corpus x corpus pairing).
"""

import pytest

SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def entry():
    import __spark_entry__ as m

    return m


def test_lsh_all_matches_precision_one_recall_bound(spark, entry):
    """Every LSH-sourced match is a true exact match with the identical
    jaccard (precision 1 — candidates are exact-verified in-query), and
    banding (16 hashes / 4 bands at threshold 0.8) keeps all-pair recall
    high (measured 0.9719 at sf0.01)."""
    exact = {
        (r.doc_id, r.match_id, r.jaccard)
        for r in entry._incremental_matches(spark, SF01, via_lsh=False).collect()
    }
    lsh = {
        (r.doc_id, r.match_id, r.jaccard)
        for r in entry._incremental_matches(spark, SF01, via_lsh=True).collect()
    }
    assert lsh <= exact, f"false positives: {sorted(lsh - exact)[:5]}"
    assert len(exact) > 1000  # the corpus genuinely exercises the path
    assert len(lsh & exact) / len(exact) >= 0.95


def test_lsh_best_match_identical_to_exact(spark, entry):
    """The per-doc dedup DECISION survives banding even where individual
    pairs drop: best-match rows are identical to the exact form at
    sf0.01 (a near-dup cluster offers many >= 0.8 matches; banding
    recall failures hit threshold-edge pairs, not the argmax)."""
    qs = entry.queries()
    exact = {
        (r.doc_id, r.match_id, r.jaccard)
        for r in qs["dedup_incremental"](spark, SF01).collect()
    }
    lsh = {
        (r.doc_id, r.match_id, r.jaccard)
        for r in qs["dedup_incremental_lsh"](spark, SF01).collect()
    }
    assert exact and exact == lsh


def test_batch_corpus_membership(spark, entry):
    """Asymmetry invariant: decisions are FOR batch docs (doc_id % 10
    == 0) and point AT corpus docs — the join never pairs corpus x
    corpus (that is what keeps daily ingest linear in batch size)."""
    qs = entry.queries()
    for name in ("dedup_incremental", "dedup_incremental_lsh"):
        rows = qs[name](spark, SF01).collect()
        assert rows
        assert all(r.doc_id % 10 == 0 and r.match_id % 10 != 0 for r in rows)
        assert all(0.8 <= r.jaccard <= 1.0 for r in rows)

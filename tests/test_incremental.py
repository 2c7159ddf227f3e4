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


def test_cc_incremental_equals_full(spark, entry):
    """The contracted-graph incremental CC reproduces from-scratch CC
    over the union edge set exactly at sf0.01 (also proven by the DuckDB
    gate, whose oracle SQL is shared verbatim between the two queries)."""
    qs = entry.queries()
    full = {
        (r.doc_id, r.component)
        for r in qs["dedup_connected_components"](spark, SF01).collect()
    }
    inc = {
        (r.doc_id, r.component)
        for r in qs["dedup_cc_incremental"](spark, SF01).collect()
    }
    assert full and inc == full


def test_cc_incremental_bridge_and_untouched(spark):
    """Micro-graph exercising every composition path: a batch node
    bridging two existing components (merge + relabel), an untouched
    existing component (label kept), and a batch-only chain (emitted
    directly)."""
    from featuregenerator_spark.operators.dedup_cluster import (
        connected_components,
        connected_components_incremental,
    )

    old = spark.createDataFrame([(1, 2), (5, 6), (7, 8)], ["doc_a", "doc_b"])
    new = spark.createDataFrame([(0, 2), (0, 5), (3, 9)], ["doc_a", "doc_b"])
    inc = {
        (r.node, r.comp)
        for r in connected_components_incremental(old, new).collect()
    }
    full = {
        (r.node, r.comp)
        for r in connected_components(old.unionByName(new)).collect()
    }
    assert inc == full
    assert inc == {
        (0, 0), (1, 0), (2, 0), (5, 0), (6, 0),  # bridged merge -> min id 0
        (7, 7), (8, 7),                          # untouched component
        (3, 3), (9, 3),                          # batch-only chain
    }


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


def test_cc_incremental_lsh_identical_to_full_lsh_cc(spark, entry):
    """The fully-scaled composition (corpus-internal LSH edges as the
    stored-label stand-in + batch-vs-corpus band equijoin + batch-internal
    LSH edges, merged by the contracted-graph CC) must label IDENTICALLY
    to the from-scratch LSH clustering (q_dedup_cc_lsh): the three edge
    legs partition the full LSH edge set exactly, and the incremental
    merge is provably equal to CC on the union."""
    full = {
        (r.doc_id, r.component)
        for r in entry.q_dedup_cc_lsh(spark, SF01).collect()
    }
    inc = {
        (r.doc_id, r.component)
        for r in entry.q_dedup_cc_incremental_lsh(spark, SF01).collect()
    }
    assert inc == full


def test_cc_incremental_lsh_parity_with_exact_incremental(spark, entry):
    """Mirror of the dedup_cc_lsh-vs-exact pins, for the incremental
    composition: every node present in both labelings carries the SAME
    component, and node coverage is >= 99% (shortfall = banding recall
    at the 0.8 threshold)."""
    exact = {
        r.doc_id: r.component
        for r in entry.q_dedup_cc_incremental(spark, SF01).collect()
    }
    lsh = {
        r.doc_id: r.component
        for r in entry.q_dedup_cc_incremental_lsh(spark, SF01).collect()
    }
    common = set(exact) & set(lsh)
    assert len(lsh) >= 0.99 * len(exact)
    assert all(exact[d] == lsh[d] for d in common)

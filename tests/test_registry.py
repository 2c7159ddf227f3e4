"""Driver-contract registry pins (no Spark session needed).

The grading driver consumes queries() in insertion order (first 50
slots get CORRECTNESS rows) and joins oracle_sql() by key. These pins
keep the contract from drifting: a new query that forgets its oracle
entry, or an oracle entry whose key typos away from its query, fails
here before the driver ever runs.
"""

import __spark_entry__ as m

# Approximate / hash-dependent by design — each carries recall /
# exact-parity / pinned-equivalence tests instead of a DuckDB oracle.
# Growing this set is a deliberate act: add the name here AND the
# compensating pin, never just omit an oracle.
ROWS_ONLY = {
    "ann_ivf_top10",
    "ann_lsh_top10",
    # PCA-shortlist ANN can miss by design; recall + brute-identity pins
    # live in tests/test_pca.py
    "ann_pca_top10",
    "dedup_cc_incremental_lsh",
    "dedup_cc_lsh",
    "dedup_incremental_lsh",
    # image decode is not SQL-expressible; banded==brute parity + planted
    # recall/precision pins live in tests/test_image_phash.py
    "image_phash_neardup",
    "minhash_lsh_candidates",
    # iterative k-means blocking; edge-recall >= 0.95 + global-CC decision
    # parity pins live in tests/test_invariants.py
    "semdedup_prune",
    "simhash",
    "simhash_neardup",
}


def test_every_query_has_oracle_or_is_allowlisted():
    qs, osql = m.queries(), m.oracle_sql()
    assert set(osql) <= set(qs), sorted(set(osql) - set(qs))
    assert set(qs) - set(osql) == ROWS_ONLY


def test_driver_window_holds_the_streaming_pin():
    # streaming_snapshot_parity is pinned at slot 50 (the window edge):
    # it exercises the full readStream path and must stay driver-checked.
    names = list(m.queries())
    assert len(names) >= 50
    assert names[49] == "streaming_snapshot_parity"


def test_oracle_sql_is_nonempty_text():
    for name, sql in m.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), name

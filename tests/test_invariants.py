"""North-rule invariants: exact per-turn text equality under stable turn
ordering, and ANN LSH recall vs the brute-force baseline."""

from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.001"


def test_pipeline_preserves_text_exactly(spark, transcripts):
    """The flagship pipeline must never alter, drop, or duplicate a turn:
    (conv_id, turn_idx) -> text is exactly the input mapping, and the
    stable sort order (conv_id, turn_idx) reproduces the input sequence."""
    from featuregenerator_spark.plans.pipeline import build_turn_features
    from featuregenerator_spark.plans.temporal import with_ts_seconds

    out = build_turn_features(with_ts_seconds(transcripts))
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in out.select("conv_id", "turn_idx", "text").collect()
    }
    want = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in transcripts.select("conv_id", "turn_idx", "text").collect()
    }
    assert got == want
    assert out.count() == transcripts.count()  # no dup/drop through windows

    # stable ordering: sorting features by (conv_id, turn_idx) yields the
    # same text sequence as sorting the input
    got_seq = [
        r["text"]
        for r in out.orderBy("conv_id", "turn_idx").select("text").collect()
    ]
    want_seq = [
        r["text"]
        for r in transcripts.orderBy("conv_id", "turn_idx").select("text").collect()
    ]
    assert got_seq == want_seq


def test_ann_lsh_recall_vs_brute_force(spark):
    """The LSH scale path must find most of the true top-10 (sign-bit LSH
    with Hamming-1 probing; approximate by design, so the driver records
    rows-only — recall is pinned here instead)."""
    import __spark_entry__ as m

    qs = m.queries()
    brute = {r["vec_id"] for r in qs["ann_cosine_top10"](spark, SF001).collect()}
    lsh = {r["vec_id"] for r in qs["ann_lsh_top10"](spark, SF001).collect()}
    assert len(brute) == 10
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.5, (recall, sorted(brute), sorted(lsh))


def test_ann_ivf_recall_vs_brute_force(spark):
    """The IVF scale path (nprobe=10 of 16 clusters) must find most of
    the true top-10. The synth embeddings are near-uniform (no cluster
    structure), which is IVF's worst case — recall there is ~nprobe/K
    plus query-locality; deterministic build, so the measured value is
    stable. Approximate by design -> driver records rows-only; the
    recall floor is pinned here instead."""
    import __spark_entry__ as m

    qs = m.queries()
    brute = {r["vec_id"] for r in qs["ann_cosine_top10"](spark, SF001).collect()}
    ivf = {r["vec_id"] for r in qs["ann_ivf_top10"](spark, SF001).collect()}
    assert len(brute) == 10
    recall = len(brute & ivf) / len(brute)
    assert recall >= 0.5, (recall, sorted(brute), sorted(ivf))


def test_simhash_hamming_correlates_with_jaccard(spark):
    """SimHash near-dup pairs (low Hamming) must have far higher token
    Jaccard than random same-lang pairs — the property that makes simhash
    a valid dedup blocking key."""
    import __spark_entry__ as m

    sf = "/root/testdata/sf0.01"
    qs = m.queries()
    near = qs["simhash_neardup"](spark, sf).filter(F.col("hamming") <= 3)
    docs = spark.read.parquet(sf + "/documents.parquet").select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    jac = (
        near.join(docs.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("toks", "ta"), "doc_a")
        .join(docs.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("toks", "tb"), "doc_b")
        .select(
            (
                F.size(F.array_intersect("ta", "tb"))
                / F.size(F.array_union("ta", "tb"))
            ).alias("j")
        )
    )
    rows = jac.collect()
    assert rows, "no near pairs found at hamming<=3"
    mean_near = sum(r["j"] for r in rows) / len(rows)
    assert mean_near > 0.55, mean_near  # random same-vocab pairs sit ~0.4


def test_connected_components_chain_and_clusters(spark):
    """Min-label propagation: a chain A-B-C is ONE cluster even though
    A~C was never an edge (near-dup non-transitivity), disjoint pairs
    stay separate, and dedup_clusters reports min-id canonicals."""
    from featuregenerator_spark.operators.dedup_cluster import (
        connected_components,
        dedup_clusters,
    )

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "doc_a long, doc_b long",
    )
    comp = {
        r["node"]: r["comp"]
        for r in connected_components(edges, "doc_a", "doc_b").collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}

    clusters = {
        r["component"]: (r["canonical_id"], r["cluster_size"])
        for r in dedup_clusters(edges, "doc_a", "doc_b").collect()
    }
    assert clusters == {1: (1, 4), 10: (10, 2), 20: (20, 2)}


def test_connected_components_long_chain_converges(spark):
    """A 63-node chain converges within a logarithmic round budget: plain
    one-hop min propagation needs 62 rounds, the pointer-jumping form ~7.
    (Round-2 regression: max_iter=20 exited silently with wrong labels on
    a 31-node chain.)"""
    from featuregenerator_spark.operators.dedup_cluster import connected_components

    n = 63
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_a long, doc_b long"
    )
    comp = {
        r["node"]: r["comp"]
        for r in connected_components(edges, "doc_a", "doc_b", max_iter=10).collect()
    }
    assert comp == {i: 0 for i in range(n + 1)}


def test_connected_components_nonconvergence_raises(spark):
    """Exhausting max_iter with labels still moving must raise, never
    return partial labels silently."""
    import pytest

    from featuregenerator_spark.operators.dedup_cluster import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, "doc_a", "doc_b", max_iter=2)


def test_connected_components_kill_and_resume(spark, tmp_path):
    """Per-round persisted labels make the iteration resumable: a job
    killed mid-iteration (simulated by an exhausted round budget with
    on_nonconverged='ignore') leaves committed round tables; a fresh call
    with the same resume_dir continues from the newest complete round and
    reaches the same fixed point as an uninterrupted run."""
    from featuregenerator_spark.operators.dedup_cluster import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(50)] + [(100, 101)],
        "doc_a long, doc_b long",
    )
    want = {
        r["node"]: r["comp"]
        for r in connected_components(edges, "doc_a", "doc_b").collect()
    }

    rdir = str(tmp_path / "cc_resume")
    # "killed" first attempt: only 2 rounds of budget, partial labels land
    # in round_0000/round_0001 with _SUCCESS markers
    partial = connected_components(
        edges, "doc_a", "doc_b", max_iter=2, resume_dir=rdir,
        on_nonconverged="ignore",
    )
    assert partial.count() > 0
    import os

    committed = sorted(d for d in os.listdir(rdir) if d.startswith("round_"))
    assert committed == ["round_0000", "round_0001"]

    # resumed attempt: picks up after round_0001 and converges
    got = {
        r["node"]: r["comp"]
        for r in connected_components(
            edges, "doc_a", "doc_b", resume_dir=rdir
        ).collect()
    }
    assert got == want
    assert len(sorted(d for d in os.listdir(rdir) if d.startswith("round_"))) > 2


def test_dedup_cc_lsh_parity_with_exact_cc(spark):
    """The scale-path dedup clustering (LSH candidate edges -> CC) must
    agree with the exact-edge CC at cluster level: every node present in
    both gets the SAME component label, and node coverage is >= 99%
    (the shortfall is LSH banding recall on pairs sitting exactly at the
    0.8 Jaccard threshold — measured 322/324 at sf0.01)."""
    import __spark_entry__ as m

    sf = "/root/testdata/sf0.01"
    exact = {
        (r["doc_id"], r["component"])
        for r in m.q_dedup_connected_components(spark, sf).collect()
    }
    lsh = {
        (r["doc_id"], r["component"])
        for r in m.q_dedup_cc_lsh(spark, sf).collect()
    }
    ne, nl = dict(exact), dict(lsh)
    common = set(ne) & set(nl)
    assert len(nl) >= 0.99 * len(ne), (len(nl), len(ne))
    mismatches = [n for n in common if ne[n] != nl[n]]
    assert mismatches == [], mismatches[:10]


def _brute_cosine_edges(threshold=0.3):
    import duckdb
    import numpy as np

    rows = duckdb.sql(
        "select vec_id, embedding from "
        "read_parquet('/root/testdata/sf0.01/embeddings.parquet') "
        "order by vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    x = np.array([r[1] for r in rows], dtype=float)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    s = xn @ xn.T
    iu = np.triu_indices(len(ids), 1)
    mask = np.round(s[iu], 4) >= threshold
    return ids, {
        (int(a), int(b)) for a, b in zip(ids[iu[0][mask]], ids[iu[1][mask]])
    }


def test_semdedup_edge_recall_and_precision(spark):
    """SemDeDup's IVF multi-assignment blocking (K=8, nassign=3) must
    recover >= 95% of the UNBLOCKED brute-force cosine edge set on the
    driver embeddings (measured 0.9576 — a deliberately hard fixture:
    within-cluster cohesion is only cos 0.3-0.5; single-assignment
    blocking measures 0.23-0.32 here), and every emitted edge must be a
    true edge (exact cosine is computed in-query -> precision 1 by
    construction, asserted anyway)."""
    from featuregenerator_spark.operators.semdedup import semdedup_edges

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    _, brute = _brute_cosine_edges()
    found = {
        (r["vec_a"], r["vec_b"])
        for r in semdedup_edges(emb, dim=64).collect()
    }
    assert not (found - brute), sorted(found - brute)[:10]
    recall = len(found & brute) / len(brute)
    assert recall >= 0.95, (recall, len(found), len(brute))


def test_semdedup_decisions_vs_global_cc(spark):
    """semdedup()'s keep/prune decisions must agree with the decisions
    computed from the UNBLOCKED edge set (global CC + keep-min) for
    >= 99% of vectors (measured 497/500; the shortfall is duplicate
    pairs straddling cell boundaries that multi-assignment still
    misses), and exactly one representative must be kept per discovered
    component."""
    from featuregenerator_spark.operators.dedup_cluster import (
        connected_components,
    )
    from featuregenerator_spark.operators.semdedup import semdedup

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    ids, brute = _brute_cosine_edges()
    ge = spark.createDataFrame(
        sorted(brute), "vec_a long, vec_b long"
    )
    gc = {
        r["node"]: r["comp"]
        for r in connected_components(ge, "vec_a", "vec_b").collect()
    }
    dec = {
        r["vec_id"]: (r["rep_id"], r["keep"])
        for r in semdedup(emb, dim=64).collect()
    }
    assert set(dec) == set(int(i) for i in ids)
    agree = sum(1 for v in dec if dec[v][0] == gc.get(v, v))
    assert agree >= 0.99 * len(dec), (agree, len(dec))
    # structural invariants: keep == (rep_id == self); one keeper per rep
    for v, (rep, keep) in dec.items():
        assert keep == (1 if rep == v else 0), (v, rep, keep)
    reps = {rep for rep, _ in dec.values()}
    keepers = {v for v, (_, k) in dec.items() if k == 1}
    assert keepers == reps


def test_minhash_verify_hash_jaccard_equals_token_jaccard(spark):
    """The LSH verify step computes exact Jaccard on xxhash64(token)
    arrays (fixed-width longs, ~2x cheaper per pair than string
    intersects). Absent a vocabulary hash collision (~V^2/2^64) that is
    IDENTICAL to string-token Jaccard — asserted pair-by-pair on every
    emitted candidate at sf0.001."""
    import __spark_entry__ as m

    pairs = m.q_minhash_lsh_candidates(spark, SF001).collect()
    assert pairs  # the corpus plants near-dup clusters; must find some
    docs = {
        r["doc_id"]: set(r["text"].split(" "))
        for r in spark.read.parquet(f"{SF001}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    for r in pairs:
        ta, tb = docs[r["doc_a"]], docs[r["doc_b"]]
        want = round(len(ta & tb) / len(ta | tb), 4)
        assert r["jaccard"] == want, (r["doc_a"], r["doc_b"], r["jaccard"], want)


def test_minhash_lsh_dropped_bucket_metric(spark):
    """Capped LSH runs are auditable: the observed metric reports how
    many band buckets the cap dropped — 0 at the default cap on the test
    corpus, >0 under an artificially tiny cap."""
    from pyspark.sql import Observation

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    obs_default = Observation()
    m.q_minhash_lsh_candidates(spark, sf, observation=obs_default).count()
    got = obs_default.get
    assert got["dropped_buckets"] == 0 and got["total_buckets"] > 0, got

    obs_tiny = Observation()
    m.q_minhash_lsh_candidates(
        spark, sf, bucket_cap=2, observation=obs_tiny
    ).count()
    tiny = obs_tiny.get
    assert tiny["dropped_buckets"] > 0, tiny
    assert tiny["total_buckets"] == got["total_buckets"]


def test_ann_lsh_config_sized_no_stats_action(spark):
    """With n/dim supplied from config/table stats, the LSH ANN query
    plans with ZERO driver-side actions and matches the
    stats-action-sized result exactly."""
    import __spark_entry__ as m

    sf = "/root/testdata/sf0.01"
    emb = spark.read.parquet(sf + "/embeddings.parquet")
    n = emb.count()
    dim = len(emb.limit(1).collect()[0]["embedding"])

    # every spark.read.parquet costs one schema/footer metadata job in
    # Spark 4, so a config-sized plan build runs exactly that ONE job,
    # while the stats-sized fallback adds a second (the count/dim scan)
    tracker = spark.sparkContext.statusTracker()

    def jobs():
        return len(tracker.getJobIdsForGroup(None) or [])

    j0 = jobs()
    df = m.q_ann_lsh_top10(spark, sf, n=n, dim=dim)  # plan only
    assert jobs() - j0 == 1, "config-sized build must not run a stats action"
    j1 = jobs()
    m.q_ann_lsh_top10(spark, sf)
    assert jobs() - j1 > 1, "stats-sized build runs metadata + stats jobs"

    got = [(r["vec_id"], r["cos_sim"]) for r in df.collect()]
    want = [
        (r["vec_id"], r["cos_sim"])
        for r in m.q_ann_lsh_top10(spark, sf).collect()
    ]
    assert got == want and len(got) == 10


def test_connected_components_resume_after_convergence(spark, tmp_path):
    """A resume over a run that already converged — even one that
    converged exactly at its round budget — returns the persisted fixed
    point instead of raising 'did not converge': convergence is recorded
    as a _CONVERGED_NNNN marker next to the round dirs."""
    from featuregenerator_spark.operators.dedup_cluster import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    rdir = str(tmp_path / "cc_conv")
    first = connected_components(edges, "doc_a", "doc_b", resume_dir=rdir)
    want = {r["node"]: r["comp"] for r in first.collect()}
    import os

    n_rounds = len([d for d in os.listdir(rdir) if d.startswith("round_")])
    assert any(f.startswith("_CONVERGED_") for f in os.listdir(rdir))
    # budget equal to rounds already used: without the marker this would
    # start at round == max_iter, never iterate, and spuriously raise
    got = {
        r["node"]: r["comp"]
        for r in connected_components(
            edges, "doc_a", "doc_b", max_iter=n_rounds, resume_dir=rdir
        ).collect()
    }
    assert got == want


def test_dedup_keep_best_policy(spark):
    # winner = longest doc, ties to smallest id; singletons survive
    from featuregenerator_spark.operators.dedup_cluster import (
        connected_components,
    )
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 0.9), (7, 8, 0.95)],
        "doc_a long, doc_b long, jaccard double",
    )
    docs = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 90), (7, 10), (8, 10), (9, 99)],
        "doc_id long, n_chars long",
    )
    comp = connected_components(edges, "doc_a", "doc_b").select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )
    j = docs.join(comp, "doc_id", "left")
    winners = (
        j.filter(F.col("component").isNotNull())
        .groupBy("component")
        .agg(
            F.max_by(
                "doc_id",
                F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("nd")),
            ).alias("keep_id")
        )
    )
    out = {
        r["doc_id"]: r["kept"]
        for r in j.join(winners, "component", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("doc_id") == F.col("keep_id"), F.lit(True))
            .cast("int")
            .alias("kept"),
        )
        .collect()
    }
    # cluster {1,2,3}: 2 and 3 tie at 90 chars -> smaller id 2 wins
    assert out == {1: 0, 2: 1, 3: 0, 7: 1, 8: 0, 9: 1}

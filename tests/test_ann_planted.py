"""Planted-neighbor recall for the ANN scale paths.

The sf* embeddings are near-uniform random — ANN's worst case, where
the recall pins in test_invariants.py are floors (>= 0.5). Real corpora
have cluster structure, which is exactly what LSH buckets and IVF
partitions exploit; here we plant 8 well-separated spherical clusters
and require the driver's OWN query functions (pointed at a planted
`embeddings.parquet` staged in the sf-dir layout) to recover the
brute-force top-10 almost exactly. Also covers ivf_build's K=sqrt(n)
auto-sizing (the production sizing promised by the operator docstring).
"""

import os

import numpy as np
import pandas as pd
import pytest

DIM = 64
N_CLUSTERS = 8
PER_CLUSTER = 40
N = N_CLUSTERS * PER_CLUSTER


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """sf-dir-shaped directory whose embeddings.parquet holds 8 planted
    unit-vector clusters (noise sigma 0.05 around well-separated random
    unit centers); vec_id 0 — every ANN query's probe vector — sits in
    cluster 0, so its true top-10 are cluster-0 members."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=(N_CLUSTERS, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(N_CLUSTERS):
        for _ in range(PER_CLUSTER):
            v = base[c] + 0.05 * rng.normal(size=DIM)
            v /= np.linalg.norm(v)
            rows.append((vid, v.astype("float32").tolist(), c))
            vid += 1
    d = tmp_path_factory.mktemp("planted_sf")
    pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).to_parquet(
        os.path.join(str(d), "embeddings.parquet")
    )
    return str(d)


def _top10(qfn, spark, sf_dir):
    return {r["vec_id"] for r in qfn(spark, sf_dir).collect()}


def test_lsh_recall_on_planted_clusters(spark, planted_dir):
    import __spark_entry__ as m

    brute = _top10(m.q_ann_cosine_top10, spark, planted_dir)
    assert len(brute) == 10
    lsh = _top10(m.q_ann_lsh_top10, spark, planted_dir)
    recall = len(brute & lsh) / 10
    assert recall >= 0.8, (recall, sorted(brute), sorted(lsh))


def test_ivf_recall_on_planted_clusters(spark, planted_dir):
    import __spark_entry__ as m

    brute = _top10(m.q_ann_cosine_top10, spark, planted_dir)
    ivf = _top10(m.q_ann_ivf_top10, spark, planted_dir)
    recall = len(brute & ivf) / 10
    assert recall >= 0.9, (recall, sorted(brute), sorted(ivf))


def test_ivf_auto_k_sqrt_n(spark, planted_dir):
    """n_centroids=None sizes K = clamp(round(sqrt(n)), 16, 4096) with n
    supplied action-free from config; every vector lands in exactly one
    cluster and cluster ids are dense in [0, K)."""
    from featuregenerator_spark.operators.ann_ivf import ivf_build

    emb = spark.read.parquet(os.path.join(planted_dir, "embeddings.parquet"))
    k = round(N ** 0.5)  # sqrt(320) ~ 18, above the floor of 16
    # refine_iters=0 keeps exactly the K seeds -> pins the sizing rule
    _, seeds = ivf_build(emb, dim=DIM, n_centroids=None, n=N, refine_iters=0)
    assert seeds.count() == k
    # refine carries empty clusters' previous centroids forward, so the
    # codebook keeps EXACTLY K dense ids and every vector lands in one
    assigned, centroids = ivf_build(emb, dim=DIM, n_centroids=None, n=N)
    cids = {r["cluster_id"] for r in centroids.select("cluster_id").collect()}
    assert cids == set(range(k))
    assert assigned.count() == N
    assert assigned.filter(assigned.cluster_id.isNull()).count() == 0


def test_ivf_k_invariant_under_empty_clusters(spark):
    """Duplicate vectors force empty clusters: seeds drawn from the data
    are always nearest to themselves, so only identical seed vectors can
    starve a cluster (the tie-break sends every copy to the lowest
    cluster id). With 2 distinct vectors duplicated 20x and K=4, at
    least 2 clusters receive zero vectors in the first refine pass; K
    must not shrink (previous centroid carried forward) and the
    per-iteration Observation must report the carry-forward count."""
    from pyspark.sql import Observation

    from featuregenerator_spark.operators.ann_ivf import ivf_build

    dim = 8
    e1 = [1.0] + [0.0] * (dim - 1)
    e2 = [0.0, 1.0] + [0.0] * (dim - 2)
    rows = [(i, e1 if i % 2 == 0 else e2) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    k = 4
    obs = [Observation(f"ivf_empties_{i}") for i in range(3)]
    assigned, centroids = ivf_build(
        emb, dim=dim, n_centroids=k, refine_iters=3, observations=obs
    )
    crows = centroids.collect()  # materializes build + observations
    assert len(crows) == k
    assert {r["cluster_id"] for r in crows} == set(range(k))
    # no null/NaN centroids from the carry-forward path
    assert all(
        all(v == v for v in r["centroid"]) and len(r["centroid"]) == dim
        for r in crows
    )
    empties = [o.get["empty_clusters"] for o in obs]
    # 4 seeds over 2 distinct vectors -> >= 2 duplicate seeds go empty
    assert empties[0] >= 2, empties
    # and assignment still covers every vector with a valid id
    got = assigned.groupBy("cluster_id").count().collect()
    assert sum(r["count"] for r in got) == 40
    assert all(0 <= r["cluster_id"] < k for r in got)

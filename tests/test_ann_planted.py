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
    # with refine, a seed cluster can empty out (means exist only for
    # non-empty clusters) but ids stay within [0, K) and every vector
    # still lands in exactly one surviving cluster
    assigned, centroids = ivf_build(emb, dim=DIM, n_centroids=None, n=N)
    cids = {r["cluster_id"] for r in centroids.select("cluster_id").collect()}
    assert cids and cids <= set(range(k))
    assert assigned.count() == N
    assert assigned.filter(assigned.cluster_id.isNull()).count() == 0

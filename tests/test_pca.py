"""Distributed PCA: Gram-pass math, eigen stage, projection."""

import numpy as np
import pytest

from featuregenerator_spark.operators.pca import (
    covariance,
    pca_fit,
    pca_project,
)

SF = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def local_x(emb):
    rows = emb.select("embedding").collect()
    return np.asarray([np.asarray(r["embedding"], dtype=np.float64) for r in rows])


def test_covariance_matches_numpy_and_partitioning_invariant(spark, emb, local_x):
    cov, mu = covariance(emb.repartition(7), "embedding", DIM)
    want_mu = local_x.mean(axis=0)
    want_cov = (local_x.T @ local_x) / len(local_x) - np.outer(want_mu, want_mu)
    assert np.allclose(mu, want_mu, atol=1e-10)
    assert np.allclose(cov, want_cov, atol=1e-10)
    cov2, mu2 = covariance(emb.repartition(2), "embedding", DIM)
    assert np.allclose(cov, cov2, atol=1e-10)  # order-independent to fp noise
    assert np.allclose(mu, mu2, atol=1e-12)


def test_pca_fit_properties_and_numpy_parity(emb, local_x):
    k = 8
    mu, comps, ev = pca_fit(emb, "embedding", DIM, k)
    # orthonormal rows, eigenvalues descending and positive
    assert np.allclose(comps @ comps.T, np.eye(k), atol=1e-8)
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(k - 1))
    assert ev[0] > 0
    # sign pin: each component's largest-|coord| entry is positive
    for row in comps:
        assert row[np.abs(row).argmax()] > 0
    # parity vs a purely local PCA, sign-invariant by the same pin
    c = local_x - local_x.mean(axis=0)
    vals, vecs = np.linalg.eigh((c.T @ c) / len(c))
    order = np.argsort(vals)[::-1][:k]
    want = vecs[:, order].T
    for i in range(k):
        j = int(np.abs(want[i]).argmax())
        if want[i, j] < 0:
            want[i] = -want[i]
    assert np.allclose(ev, vals[order], atol=1e-8)
    assert np.allclose(comps, want, atol=1e-6)


def test_pca_project_variance_is_eigenvalue(emb, local_x):
    k = 4
    mu, comps, ev = pca_fit(emb, "embedding", DIM, k)
    out = pca_project(emb, "embedding", mu, comps, out="proj")
    assert out.columns == emb.columns + ["proj"]
    p = np.asarray(
        [np.asarray(r["proj"]) for r in out.select("proj").collect()]
    )
    assert p.shape == (len(local_x), k)
    # the projected dimensions carry exactly the eigenvalue variances
    # and are mutually uncorrelated
    pc = p - p.mean(axis=0)
    pcov = (pc.T @ pc) / len(pc)
    assert np.allclose(np.diag(pcov), ev, atol=1e-8)
    off = pcov - np.diag(np.diag(pcov))
    assert np.abs(off).max() < 1e-8


def test_ann_pca_top10_recall_vs_brute(spark):
    """The PCA-shortlist ANN must recover >=0.9 of the brute-force
    top-10; at the tested SFs the shortlist of 100 at k=32 recovers it exactly."""
    import __spark_entry__ as m

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        brute = [r["vec_id"] for r in m.queries()["ann_cosine_top10"](spark, sf).collect()]
        pca = [r["vec_id"] for r in m.queries()["ann_pca_top10"](spark, sf).collect()]
        hits = len(set(brute) & set(pca))
        assert hits >= 9, (sf, brute, pca)
        assert pca == brute, (sf, pca, brute)  # exact at these SFs

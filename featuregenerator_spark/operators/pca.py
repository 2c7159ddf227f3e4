"""Distributed PCA over an embedding column.

The 100 TB shape: the only thing that crosses the wire is one
(d*d + d + 1)-float partial per Arrow batch — each batch contributes
its Gram matrix ``X^T X``, its column sum, and its row count, computed
as one vectorized numpy matmul inside ``mapInPandas`` (no per-row
Python, no d^2-wide codegen select, no explode amplification). The
driver sums the partials (a few KB each), forms the population
covariance ``E[xx^T] - mu mu^T``, and takes the top-k eigenvectors of
the d x d matrix locally — the same distribute-the-Gram /
solve-tiny-on-driver split every large-scale PCA uses (and the same
trade the IVF trainer in this repo makes for its centroid refine).

Projection back over the table is one broadcast (mean, components)
pair and one batched matmul per Arrow batch.

Sign convention: each eigenvector is flipped so its
largest-|coordinate| entry is positive — eigenvectors are only defined
up to sign, and pinning it makes fits reproducible across partitionings
and library versions.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_partials(df: DataFrame, col: str, dim: int) -> tuple[int, np.ndarray, np.ndarray]:
    """One distributed pass: returns (n, sum_x[d], gram[d, d])."""
    out_schema = "n long, s array<double>, g array<double>"

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[col]]
            ).reshape(len(pdf), dim)
            yield pd.DataFrame(
                {
                    "n": [len(pdf)],
                    "s": [x.sum(axis=0)],
                    "g": [(x.T @ x).ravel()],
                }
            )

    rows = df.select(col).mapInPandas(part, out_schema).collect()
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]) for r in rows], axis=0).reshape(dim, dim)
    return n, s, g


def covariance(df: DataFrame, col: str, dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Population covariance + mean from one Gram pass."""
    n, s, g = gram_partials(df, col, dim)
    mu = s / n
    cov = g / n - np.outer(mu, mu)
    return cov, mu


def pca_fit(df: DataFrame, col: str, dim: int, k: int):
    """Top-k principal components: (mean[d], components[k, d],
    explained_variance[k]), eigenvalues descending, sign-pinned."""
    cov, mu = covariance(df, col, dim)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T  # (k, d)
    for i in range(comps.shape[0]):  # sign pin: largest-|coord| positive
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mu, comps, vals[order]


def pca_project(
    df: DataFrame, col: str, mu: np.ndarray, comps: np.ndarray, out: str = "proj"
) -> DataFrame:
    """Append the k-dim projection: one broadcast matmul per batch."""
    from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

    mu_l = mu.tolist()
    comps_l = comps.tolist()
    out_schema = StructType(
        list(df.schema.fields) + [StructField(out, ArrayType(DoubleType()))]
    )

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = np.asarray(mu_l)
        c = np.asarray(comps_l)  # (k, d)
        for pdf in batches:
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[col]]
            ).reshape(len(pdf), len(m))
            p = (x - m) @ c.T  # (n, k)
            pdf = pdf.copy()
            pdf[out] = list(p)
            yield pdf

    return df.mapInPandas(part, out_schema)

"""SemDeDup: semantic deduplication over embedding columns.

The composition Abbas et al. 2023 ("SemDeDup") run over web-scale
corpora: cluster the embedding space with k-means, compute exact
pairwise cosine only WITHIN clusters, and keep one representative per
connected group of semantic duplicates. The cluster blocking turns the
O(n^2) global pair scan into sum-of-squares over cells — with
K ~ sqrt(n) cells that is ~n^1.5 candidate pairs, and each cell's scan
is an independent task (the paper shards cells across GPUs; here cells
shard across executors via the cell equijoin).

Two deliberate deviations from a naive port, both load-bearing:

- **Multi-assignment blocking.** Each vector is indexed into its
  ``nassign`` nearest cells, not just the argmax cell. Single-assignment
  k-means chops duplicate pairs that straddle a cell boundary — measured
  on the driver testdata (10 planted label clusters, within-cluster
  cosine only 0.3-0.5, a deliberately hard low-cohesion case) edge
  recall is 0.23-0.32 at nassign=1 and 0.96 at K=8/nassign=3. Candidate
  volume grows ~nassign^2; at n=500 that exceeds the brute-force pair
  count (measured honestly in tools/bench notes) — the blocking wins
  asymptotically, not at toy scale, exactly like MinHash-LSH vs the
  exact Jaccard pair scan (tools/bench_crossover.py).
- **Connected-component representatives.** The paper keeps one point
  per (cluster, epsilon-ball); near-dup relations are not transitive, so
  we close them with the same pointer-jumping CC every other dedup
  family here uses (operators/dedup_cluster.py) and keep the minimum id
  per component — deterministic, resumable, and consistent with
  dedup_exact / dedup_cc_lsh semantics.

Everything is deterministic (IVF seeds are xxhash64 top-K; no RNG), so
runs are resumable and decisions carry exact lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featuregenerator_spark.operators.ann_ivf import (
    _centroid_row,
    _dot,
    ivf_build,
)
from featuregenerator_spark.operators.dedup_cluster import connected_components


def assign_cells(
    emb: DataFrame,
    centroids: DataFrame,
    nassign: int = 3,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, __nvec, cell): each vector exploded into its ``nassign``
    nearest cells by centroid cosine (unit vectors: dot == cosine). The
    centroid table rides ONE broadcast row of structs; top-nassign is an
    array_sort + slice higher-order expression, so assignment is a
    map-only stage — no shuffle, no window."""
    cells = F.transform(
        F.col("__cents"),
        lambda c: F.struct(
            _dot(F.col("__nvec"), c["centroid"]).alias("sim"),
            c["cluster_id"].alias("cid"),
        ),
    )
    top = F.slice(F.reverse(F.array_sort(cells)), 1, nassign)
    return (
        emb.crossJoin(F.broadcast(_centroid_row(centroids)))
        .select(
            id_col,
            "__nvec",
            F.explode(F.transform(top, lambda s: s["cid"])).alias("cell"),
        )
    )


def semdedup_edges(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.3,
    n_centroids: int = 8,
    nassign: int = 3,
    refine_iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Within-cell exact-cosine near-dup edges (vec_a < vec_b, cos_sim).

    Pairs that share several cells are deduplicated AFTER the threshold
    filter (distinct on the narrow edge triple), so the wide __nvec
    arrays never ride through an aggregation."""
    assigned, centroids = ivf_build(
        emb,
        dim=dim,
        n_centroids=n_centroids,
        refine_iters=refine_iters,
        vec_col=vec_col,
        id_col=id_col,
    )
    cells = assign_cells(
        assigned.select(id_col, "__nvec"), centroids, nassign, id_col
    )
    a = cells.alias("a")
    b = cells.alias("b")
    pairs = a.join(
        b,
        (F.col("a.cell") == F.col("b.cell"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    cos = _dot(F.col("a.__nvec"), F.col("b.__nvec"))
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            F.round(cos, 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )


def semdedup(
    emb: DataFrame,
    dim: int,
    threshold: float = 0.3,
    n_centroids: int = 8,
    nassign: int = 3,
    refine_iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-vector keep/prune decisions: (id, rep_id, keep).

    ``rep_id`` is the minimum id in the vector's semantic-duplicate
    component (itself when the vector has no near-duplicates); ``keep``
    is 1 exactly for the representative."""
    edges = semdedup_edges(
        emb, dim, threshold, n_centroids, nassign, refine_iters,
        vec_col, id_col,
    )
    comp = connected_components(edges, "vec_a", "vec_b")
    return (
        emb.select(id_col)
        .join(comp.withColumnRenamed("node", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("comp", F.col(id_col)).alias("rep_id"),
            (F.coalesce("comp", F.col(id_col)) == F.col(id_col))
            .cast("int")
            .alias("keep"),
        )
    )

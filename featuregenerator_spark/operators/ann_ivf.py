"""IVF (inverted-file) approximate nearest neighbor over embedding columns.

The third leg of the similarity-search story (brute-force cosine = the
oracle baseline, SRP-LSH = hash-bucketed scale path, IVF = partition-
pruned scale path): pick K coarse centroids, optionally refine them with
k-means iterations, assign every vector to its nearest centroid, and at
query time search only the ``nprobe`` clusters whose centroids are
nearest the query. At 100 TB the assignment is a narrow broadcast map
(no shuffle), the refine step is one map-side-combined groupBy of K*dim
doubles per executor, and the probe prunes the scan to nprobe/K of the
table — the cluster_id column is the natural partition key for the
candidate file layout.

Everything stays JVM-side: dots/norms are ``zip_with``/``aggregate``
higher-order functions, the argmax over centroids is ``array_max`` on
(sim, id) structs (Spark orders structs lexicographically), and the
centroid table rides a broadcast as one array-of-structs row. No RNG:
centroid seeds are the K smallest xxhash64(id) rows, so builds are
deterministic and resumable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda s, v: s + v,
    )


def _norm(c: Column) -> Column:
    return F.sqrt(_dot(c, c))


def _normalize(c: Column) -> Column:
    n = _norm(c)
    return F.transform(c, lambda v: v.cast("double") / n)


def _centroid_row(centroids: DataFrame) -> DataFrame:
    """Collapse (cluster_id, centroid) rows into ONE broadcastable row
    holding an array of (cluster_id, centroid) structs."""
    return centroids.agg(
        F.array_sort(
            F.collect_list(F.struct("cluster_id", "centroid"))
        ).alias("__cents")
    )


def _assign_expr(vec: Column) -> Column:
    """cluster_id of the nearest centroid in __cents (unit vectors:
    dot == cosine; array_max picks the lexicographically largest
    (sim, -cluster_id) struct => highest sim, lowest id on ties)."""
    sims = F.transform(
        F.col("__cents"),
        lambda c: F.struct(
            _dot(vec, c["centroid"]).alias("sim"),
            (-c["cluster_id"]).alias("neg_cid"),
        ),
    )
    return -F.array_max(sims)["neg_cid"]


def ivf_build(
    emb: DataFrame,
    dim: int,
    n_centroids: int | None = 16,
    refine_iters: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n: int | None = None,
    observations=None,
) -> tuple[DataFrame, DataFrame]:
    """-> (assigned, centroids): ``assigned`` = input + unit-normalized
    ``__nvec`` + ``cluster_id``; ``centroids`` = (cluster_id, centroid)
    with unit centroids.

    ``n_centroids=None`` auto-sizes K to ~sqrt(n) (clamped to
    [16, 4096]) — the standard IVF sizing: probe cost is
    nprobe/K of the table plus K centroid dots, and K = sqrt(n)
    balances the two at ~nprobe*sqrt(n) candidate rows. ``n`` comes
    from pipeline config / table statistics; if omitted, ONE count
    action sizes it (production passes it to keep the build
    action-free, same contract as q_ann_lsh_top10's n/dim args).

    Seeds are the ``n_centroids`` rows with smallest xxhash64(id) — a
    deterministic uniform sample picked by a distributed top-K (no
    driver-side data). Each refine iteration recomputes centroids as the
    normalized per-cluster mean (k-means on the unit sphere = spherical
    k-means) with one map-side-combined aggregation of dim doubles.

    A cluster that receives ZERO vectors in a refine iteration keeps its
    previous centroid (left join from the prior centroid table), so K is
    invariant across refine_iters — at production K=4096 a silently
    shrinking codebook would skew probe pruning with no signal. Pass
    ``observations`` (a list of pyspark ``Observation``, one per refine
    iteration; a shorter list audits the first iterations) to audit: each
    reports ``empty_clusters`` (that iteration's carry-forward count) and
    materializes with whatever action consumes the build."""
    if n_centroids is None:
        if n is None:
            n = emb.count()
        n_centroids = int(max(16, min(4096, round(n ** 0.5))))
    base = emb.withColumn("__nvec", _normalize(F.col(vec_col)))
    seeds = (
        base.select(id_col, "__nvec")
        .orderBy(F.xxhash64(F.col(id_col), F.lit(42)))
        .limit(n_centroids)
    )
    # The unpartitioned window (WindowExec warns) runs AFTER the
    # distributed top-K limit, i.e. over exactly n_centroids (~16) rows
    # at any table size — numbering a handful of seeds, not the data.
    centroids = seeds.select(
        (
            F.row_number().over(
                Window.orderBy(F.xxhash64(F.col(id_col), F.lit(42)))
            )
            - 1
        ).alias("cluster_id"),
        F.col("__nvec").alias("centroid"),
    )
    for it in range(max(refine_iters, 0)):
        assigned = base.crossJoin(
            F.broadcast(_centroid_row(centroids))
        ).withColumn("cluster_id", _assign_expr(F.col("__nvec")))
        means = assigned.groupBy("cluster_id").agg(
            F.array(
                *[F.avg(F.col("__nvec")[i]) for i in range(dim)]
            ).alias("__mean")
        )
        # Empty clusters (no rows in `means`) carry their previous
        # centroid forward — K never shrinks across iterations.
        merged = centroids.join(means, "cluster_id", "left")
        if observations is not None and it < len(observations):
            merged = merged.observe(
                observations[it],
                F.sum(
                    F.when(F.col("__mean").isNull(), 1).otherwise(0)
                ).alias("empty_clusters"),
            )
        centroids = merged.select(
            "cluster_id",
            F.when(
                F.col("__mean").isNotNull(), _normalize(F.col("__mean"))
            )
            .otherwise(F.col("centroid"))
            .alias("centroid"),
        )
    assigned = base.crossJoin(
        F.broadcast(_centroid_row(centroids))
    ).withColumn("cluster_id", _assign_expr(F.col("__nvec"))).drop("__cents")
    return assigned, centroids


def ivf_topk(
    assigned: DataFrame,
    centroids: DataFrame,
    query: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Search the ``nprobe`` clusters nearest the (single-row) ``query``
    (column ``qe``): exact cosine within probed clusters, top-k by
    (cosine desc, id). Returns (id_col, cos_sim)."""
    probe = (
        query.crossJoin(F.broadcast(_centroid_row(centroids)))
        .select(
            F.col("qe"),
            F.slice(
                F.reverse(
                    F.array_sort(
                        F.transform(
                            F.col("__cents"),
                            lambda c: F.struct(
                                _dot(_normalize(F.col("qe")), c["centroid"]).alias("sim"),
                                c["cluster_id"].alias("cid"),
                            ),
                        )
                    )
                ),
                1,
                nprobe,
            ).alias("__probe"),
        )
        .withColumn(
            "__probe_cids", F.transform(F.col("__probe"), lambda s: s["cid"])
        )
        .drop("__probe")
    )
    cand = assigned.crossJoin(F.broadcast(probe)).filter(
        F.array_contains(F.col("__probe_cids"), F.col("cluster_id"))
    )
    cos = _dot(F.col(vec_col), F.col("qe")) / (
        _norm(F.col(vec_col)) * _norm(F.col("qe"))
    )
    return (
        cand.select(F.col(id_col), cos.alias("c"))
        .orderBy(F.col("c").desc(), id_col)
        .limit(k)
        .select(id_col, F.round("c", 3).alias("cos_sim"))
    )

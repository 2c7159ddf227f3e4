"""Distributed k-means (Lloyd iterations) with bit-reproducible integer
arithmetic — embedding clustering for mixture construction, SemDeDup-style
blocking, and corpus cartography.

The classic reproducibility failure of distributed k-means is float
summation order: centroid updates average doubles, partitions fold in
nondeterministic order, and run-to-run (or engine-to-engine) centroids
drift by an ulp — which flips knife-edge assignments and cascades through
later iterations. This implementation removes floats from the recurrence
entirely:

- embeddings QUANTIZE once to integer milli-units
  (``round(v * 1000)`` as long) — exact, order-free;
- distances are exact long sums of squared integer differences
  (order-independent by construction);
- centroid updates are ``round(exact-long-sum / count)`` back to longs —
  ONE deterministic IEEE division + half-away-from-zero round per
  dimension, identical in every engine;
- assignment ties break by cluster id via ``min(struct(dist, cid))``.

So the whole algorithm is a deterministic function of the input: the
same exact longs fall out of Spark and the unrolled-CTE SQL oracle, and
run-to-run at any parallelism. The quantization changes which of two
near-equidistant centroids wins vs an fp64 k-means — by at most the
quantization radius, ~1e-3 per dim — but it is OUR declared contract
(same spirit as the zero-RNG md5 sampling draws in sampling.py: give up
an ulp of "exactness" nobody can reproduce anyway, gain bit-level
lineage).

Scale shape: assignment is a broadcast nested-loop over k centroid rows
(n*k fold evaluations inside whole-stage codegen, the k-means lower
bound); the update is ONE posexplode + map-side-combined groupBy per
iteration, shuffling k*d long rows — the quantized vector rides through
the argmin aggregation, so the update needs NO join back to the input
(plan-pinned: zero SortMergeJoins). No driver-side collect anywhere —
centroids stay a DataFrame and re-broadcast each iteration. Iterations
unroll into one lazy plan (iters is small by contract; for iters > ~5,
checkpoint between rounds like dedup_cluster.py does).

The reference has no clustering operator (fg_lite is a per-row kernel
library); this follows the SemDeDup blocking need (operators/semdedup.py
uses an inlined spherical variant) lifted to a first-class reusable op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1000  # milli-unit quantization: exact for unit-norm embeddings


def quantize(vec, scale: int = SCALE):
    """float array -> exact long milli-units. round(v*scale) can never
    tie: a tie needs v == (2k+1)/(2*scale) exactly, and for scale=1000
    that denominator has factor 125 — not a dyadic rational, so no
    binary float equals it."""
    return F.transform(
        vec, lambda v: F.round(v.cast("double") * scale, 0).cast("long")
    )


def _sqdist(a, b):
    """Exact long squared-L2 between two quantized arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = SCALE,
) -> DataFrame:
    """Lloyd k-means over an embedding column; returns the final
    assignment (id_col, cluster int, dist_sq long in quantized units).

    Init is deterministic: cluster c's seed is the row with
    ``id_col == c`` (ids 0..k-1 must exist — callers with sparse ids
    should pass a ranked id). A cluster that loses all members simply
    drops out of later iterations (both engines drop it identically).
    """
    q = emb.select(
        F.col(id_col), quantize(F.col(vec_col), scale).alias("qv")
    )
    cent = q.filter(F.col(id_col) < k).select(
        F.col(id_col).cast("int").alias("cid"), F.col("qv").alias("cv")
    )

    assign = None
    for it in range(iters):
        pairs = q.crossJoin(F.broadcast(cent))
        scored = pairs.select(
            F.col(id_col),
            "cid",
            "qv",
            _sqdist(F.col("qv"), F.col("cv")).alias("d"),
        )
        # min(struct) folds (dist, cid) lexicographically: nearest
        # centroid, ties to the smallest cluster id — exact on longs.
        # qv rides through the argmin via first(): every one of the k
        # copies per id is the SAME array (one q row crossed with k
        # centroids), so first() is value-deterministic — and the
        # update step below then needs NO join back to q (which would
        # be a corpus x corpus SortMergeJoin + two Exchanges per
        # iteration).
        assign = (
            scored.groupBy(id_col)
            .agg(
                F.min(F.struct("d", "cid")).alias("m"),
                F.first("qv").alias("qv"),
            )
            .select(
                F.col(id_col),
                F.col("m.cid").alias("cluster"),
                F.col("m.d").alias("dist_sq"),
                "qv",
            )
        )
        if it < iters - 1:
            ex = assign.select(
                "cluster", F.posexplode("qv").alias("pos", "val")
            )
            dims = ex.groupBy("cluster", "pos").agg(
                F.round(
                    F.sum("val").cast("double") / F.count(F.lit(1)), 0
                )
                .cast("long")
                .alias("cval")
            )
            cent = dims.groupBy("cluster").agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cval"))),
                    lambda s: s["cval"],
                ).alias("cv")
            ).select(F.col("cluster").alias("cid"), "cv")
    return assign.select(id_col, "cluster", "dist_sq")

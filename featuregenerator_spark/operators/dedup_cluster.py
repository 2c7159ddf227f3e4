"""Near-dup clustering: pair edges -> connected components -> canonical doc.

The pairwise near-dup queries (exact Jaccard, MinHash-LSH, SimHash) emit
EDGES; a production dedup pipeline needs the transitive closure — one
canonical document per duplicate *cluster* — because near-duplication is
not transitive (A~B, B~C does not imply A~C, yet all three are one
cluster for dedup purposes).

Connected components run as iterative min-label propagation over the
edge list (the standard large-graph formulation — e.g. Hash-to-Min /
"CC in MapReduce" family): every node repeatedly adopts the smallest
component id among itself and its neighbors until a fixed point. Each
round is two hash joins + one aggregation, all shuffle-partitioned on
node id; rounds converge in O(log(diameter)) for the short-chain
clusters dedup produces. DataFrames are localCheckpointed per round to
cut the growing lineage (iterative algorithms would otherwise replan
from the source every round).

At 100 TB the same loop runs unchanged: edges are (long, long) pairs —
a tiny fraction of corpus bytes — and every stage is a key-partitioned
join, so the only scale knob is shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Edge list -> (node, component) with component = min node id
    reachable through the undirected edge set.

    Fixed-point iteration with an early-exit convergence check (count of
    changed labels per round — one action per round, the driver only sees
    the counter, never the data).
    """
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    sym = sym.distinct()

    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
    )

    for i in range(max_iter):
        # candidate labels flowing across edges this round
        neighbor_min = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("ncomp"), F.col("comp"))
                ).alias("comp"),
                (F.col("ncomp") < F.col("comp")).alias("changed"),
            )
        )
        if checkpoint_every and (i % checkpoint_every == 0):
            new_labels = new_labels.localCheckpoint(eager=False)
        changed = new_labels.filter(F.col("changed")).limit(1).count()
        labels = new_labels.drop("changed")
        if changed == 0:
            break
    return labels


def dedup_clusters(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(component, canonical_id=min doc, cluster_size) per near-dup
    cluster — the keep-one-drop-rest decision table for dedup."""
    comp = connected_components(edges, src, dst, max_iter)
    return comp.groupBy(F.col("comp").alias("component")).agg(
        F.min("node").alias("canonical_id"),
        F.count(F.lit(1)).cast("long").alias("cluster_size"),
    )

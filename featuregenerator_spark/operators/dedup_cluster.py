"""Near-dup clustering: pair edges -> connected components -> canonical doc.

The pairwise near-dup queries (exact Jaccard, MinHash-LSH, SimHash) emit
EDGES; a production dedup pipeline needs the transitive closure — one
canonical document per duplicate *cluster* — because near-duplication is
not transitive (A~B, B~C does not imply A~C, yet all three are one
cluster for dedup purposes).

Connected components run as iterative min-label propagation with a
POINTER-JUMPING step per round (label <- label of its label, the path-
halving move of the "CC in MapReduce" / Hash-to-Min family): plain
neighbor-min propagation moves a label one hop per round (O(diameter)
rounds — a 31-node chain needs 30), while the jump lets the adopted
label itself be an already-compressed one, so the covered distance
roughly doubles per round and the loop converges in O(log diameter)
rounds. Each round is three hash joins + one aggregation, all
shuffle-partitioned on node id.

Fault tolerance at 100 TB:
- lineage is truncated per round via RELIABLE ``checkpoint()`` (written
  to ``spark.sparkContext.setCheckpointDir`` — HDFS/object store on a
  cluster; ``session.get_spark`` sets it), not ``localCheckpoint`` whose
  blocks live on executors and die with them mid-iteration;
- with ``resume_dir`` set, every round's labels are persisted as a
  parquet table instead; a restarted job finds the newest complete
  round and continues from it (kill-and-resume pinned in
  tests/test_plans.py).

The loop refuses to return silently-wrong labels: if the fixed point is
not reached within ``max_iter`` rounds it raises (``on_nonconverged=
"raise"``, default) — callers that checkpoint partial progress for a
resume pass ``"ignore"``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hadoop_fs(spark, uri: str):
    """(jvm, FileSystem, Path) for any Hadoop-supported URI — resume_dir
    may be HDFS / object store on a cluster, so listing must go through
    the Hadoop FileSystem API, not driver-local os.listdir."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(uri)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, path


def _latest_complete_round(
    spark, resume_dir: str
) -> tuple[int, DataFrame | None, bool]:
    """Newest round under resume_dir with a _SUCCESS marker (committed
    atomically by the parquet writer), or (-1, None, False). The third
    element is True when that round also carries a _CONVERGED_NNNN marker,
    i.e. the prior run finished — its labels are already the fixed point."""
    jvm, fs, root = _hadoop_fs(spark, resume_dir)
    if not fs.exists(root):
        return -1, None, False
    rounds = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if (
            st.isDirectory()
            and name.startswith("round_")
            and fs.exists(jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS"))
        ):
            rounds.append(int(name.split("_")[-1]))
    if not rounds:
        return -1, None, False
    last = max(rounds)
    converged = fs.exists(
        jvm.org.apache.hadoop.fs.Path(root, f"_CONVERGED_{last:04d}")
    )
    return last, spark.read.parquet(f"{resume_dir}/round_{last:04d}"), converged


def _mark_converged(spark, resume_dir: str, round_idx: int) -> None:
    """Touch an empty _CONVERGED_NNNN marker next to the round dirs so a
    resumed job returns the persisted fixed point immediately instead of
    burning a verification round (or spuriously raising when the prior run
    converged exactly at its round budget)."""
    jvm, fs, root = _hadoop_fs(spark, resume_dir)
    fs.create(
        jvm.org.apache.hadoop.fs.Path(root, f"_CONVERGED_{round_idx:04d}"), True
    ).close()


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
    resume_dir: str | None = None,
    on_nonconverged: str = "raise",
) -> DataFrame:
    """Edge list -> (node, comp) with comp = min node id reachable through
    the undirected edge set.

    Fixed-point iteration (neighbor-min + pointer jump) with an early-exit
    convergence check: one count action per round, and the driver only
    ever sees the 0/1 changed signal, never data. ``max_iter=25`` covers
    diameters up to ~2^25 given the O(log d) jump — far beyond any real
    near-dup graph; hitting it means something is wrong, so the default
    is to raise rather than return partial labels.
    """
    if on_nonconverged not in ("raise", "ignore"):
        raise ValueError(f"on_nonconverged must be raise|ignore: {on_nonconverged}")
    spark = edges.sparkSession
    sym = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    sym = sym.distinct()

    start_round = 0
    labels = None
    if resume_dir:
        last, resumed, already_converged = _latest_complete_round(spark, resume_dir)
        if resumed is not None:
            if already_converged:
                # prior run reached the fixed point (possibly exactly at its
                # round budget) — nothing left to iterate
                return resumed.select("node", "comp")
            start_round, labels = last + 1, resumed.select("node", "comp")
    if labels is None:
        labels = (
            sym.select(F.col("u").alias("node"))
            .distinct()
            .withColumn("comp", F.col("node"))
        )

    changed = -1
    for i in range(start_round, max_iter):
        # 1) neighbor-min: smallest label among my neighbors this round
        neighbor_min = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("comp").alias("ncomp"))
        )
        stepped = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.col("comp").alias("pcomp"),
            F.least(F.col("comp"), F.coalesce("ncomp", "comp")).alias("comp"),
        )
        # 2) pointer jump: adopt my (new) label's OWN label from the start
        #    of the round — labels only decrease and always stay inside the
        #    component, so this is safe and halves remaining chain length.
        jump = labels.select(
            F.col("node").alias("comp"), F.col("comp").alias("jcomp")
        )
        new_labels = stepped.join(jump, "comp", "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce("jcomp", "comp")).alias("comp"),
            (
                F.least(F.col("comp"), F.coalesce("jcomp", "comp"))
                < F.col("pcomp")
            ).alias("changed"),
        )
        if resume_dir:
            # per-round persisted labels: checkpoint + resume token in one
            path = f"{resume_dir}/round_{i:04d}"
            new_labels.write.mode("overwrite").parquet(path)
            new_labels = spark.read.parquet(path)
        elif spark.sparkContext.getCheckpointDir():
            # reliable checkpoint: survives executor loss mid-iteration
            # (localCheckpoint blocks die with their executor)
            new_labels = new_labels.checkpoint(eager=False)
        else:
            new_labels = new_labels.localCheckpoint(eager=False)
        changed = new_labels.filter(F.col("changed")).limit(1).count()
        labels = new_labels.drop("changed")
        if changed == 0:
            if resume_dir:
                _mark_converged(spark, resume_dir, i)
            break
    if changed != 0 and on_nonconverged == "raise":
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(labels still changing); the graph is larger/denser than the "
            "iteration budget — raise max_iter or pass on_nonconverged="
            "'ignore' with a resume_dir to continue across jobs"
        )
    return labels


def connected_components_incremental(
    old_edges: DataFrame,
    new_edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """Merge a batch's edges into an already-clustered corpus without
    re-clustering the corpus: contract every existing component to its
    label, run CC on the SMALL contracted delta graph (batch nodes +
    touched component labels), and compose the label maps.

    EXACTLY equal to ``connected_components(old_edges UNION new_edges)``
    (pinned in tests/test_incremental.py): contracting a connected
    subgraph preserves connectivity, and since an existing label is the
    minimum id of its component (label <= every member), the second
    pass's min-label over {labels} U {batch ids} is the global minimum
    of each merged component. At 100 TB the first CC stands in for the
    STORED label table of the previous run — the per-batch cost is then
    only the contracted-graph CC, whose size is the number of
    batch-touched components + batch nodes, not the corpus.
    """
    old_cc = connected_components(old_edges, src, dst, max_iter)
    e = new_edges.select(F.col(src).alias("eu"), F.col(dst).alias("ev"))
    # endpoints with an existing label contract to it; endpoints unseen
    # by the old graph (batch docs, or corpus docs whose only edges are
    # new) stay themselves
    e = (
        e.join(
            old_cc.select(F.col("node").alias("eu"), F.col("comp").alias("cu")),
            "eu",
            "left",
        )
        .join(
            old_cc.select(F.col("node").alias("ev"), F.col("comp").alias("cv")),
            "ev",
            "left",
        )
        .select(
            F.coalesce("cu", "eu").alias("u2"), F.coalesce("cv", "ev").alias("v2")
        )
        .filter(F.col("u2") != F.col("v2"))
    )
    merged = connected_components(e, "u2", "v2", max_iter)
    # compose: corpus nodes follow their label's new assignment (or keep
    # it if the component gained no batch member)...
    old_final = old_cc.join(
        merged.select(F.col("node").alias("comp"), F.col("comp").alias("mcomp")),
        "comp",
        "left",
    ).select("node", F.coalesce("mcomp", "comp").alias("comp"))
    # ...while contracted-graph nodes that are NOT existing labels (batch
    # docs + old-graph-unseen corpus docs) are emitted directly. Labels
    # are themselves corpus nodes, so the anti-join removes exactly the
    # rows old_final already covers.
    direct = merged.join(
        old_cc.select(F.col("comp").alias("node")).distinct(), "node", "left_anti"
    )
    return old_final.unionByName(direct)


def dedup_clusters(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(component, canonical_id=min doc, cluster_size) per near-dup
    cluster — the keep-one-drop-rest decision table for dedup."""
    comp = connected_components(edges, src, dst, max_iter)
    return comp.groupBy(F.col("comp").alias("component")).agg(
        F.min("node").alias("canonical_id"),
        F.count(F.lit(1)).cast("long").alias("cluster_size"),
    )

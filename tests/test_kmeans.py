"""Integer-quantized Lloyd k-means: closed form, determinism, planted
cluster recovery, empty-cluster drop."""

import pytest
from pyspark.sql import functions as F

from featuregenerator_spark.operators.kmeans import kmeans_assign, quantize


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )


def test_kmeans_closed_form_one_dim_ish(spark):
    # two tight groups on a 2-d line; seeds are rows 0 and 1
    rows = [
        (0, [0.0, 0.0]),
        (1, [1.0, 1.0]),
        (2, [0.1, 0.0]),
        (3, [0.9, 1.0]),
        (4, [0.0, 0.1]),
        (5, [1.0, 0.9]),
    ]
    out = {
        r["vec_id"]: (r["cluster"], r["dist_sq"])
        for r in kmeans_assign(_mk(spark, rows), k=2, iters=2).collect()
    }
    assert {v: c for v, (c, _) in out.items()} == {
        0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1
    }
    # iter-1 centroid of cluster 0 = round(mean([0,100,0]), [0,0,100])
    # = (33, 33); row 0 dist = 33^2+33^2 = 2178
    assert out[0][1] == 33 * 33 + 33 * 33


def test_kmeans_deterministic_across_partitioning(spark):
    rows = [
        (i, [float((i * 37 + d * 11) % 100) / 100.0 for d in range(8)])
        for i in range(60)
    ]
    df = _mk(spark, rows)
    a = sorted(
        (r["vec_id"], r["cluster"], r["dist_sq"])
        for r in kmeans_assign(df.repartition(13), k=4, iters=3).collect()
    )
    b = sorted(
        (r["vec_id"], r["cluster"], r["dist_sq"])
        for r in kmeans_assign(df.coalesce(1), k=4, iters=3).collect()
    )
    assert a == b


def test_kmeans_planted_clusters_recovered(spark):
    # 3 planted centers far apart; every point within 0.05 of its center
    centers = [[0.0] * 4, [1.0] * 4, [-1.0] * 4]
    rows = []
    vid = 0
    # seeds first: one per cluster so init lands inside each blob
    for c in centers:
        rows.append((vid, [x + 0.01 for x in c]))
        vid += 1
    for j in range(30):
        c = centers[j % 3]
        rows.append((vid, [x + ((j * 7) % 5 - 2) / 100.0 for x in c]))
        vid += 1
    out = kmeans_assign(_mk(spark, rows), k=3, iters=2).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"])
    # the 3 blobs = vec_ids congruent to seed's center mod 3 (after seeds)
    assert len(by_cluster) == 3
    for members in by_cluster.values():
        blobs = {(v - 3) % 3 if v >= 3 else v for v in members}
        assert len(blobs) == 1  # no blob is split or merged


def test_kmeans_empty_cluster_drops(spark):
    # seed 1 is a duplicate of seed 0 -> after iter 1 every point is
    # nearer cluster 0 (tie at seed -> min cid wins) and cluster 1
    # vanishes from the update; iteration 2 must not resurrect it.
    rows = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),
        (2, [0.2, 0.0]),
        (3, [0.0, 0.2]),
    ]
    out = kmeans_assign(_mk(spark, rows), k=2, iters=2).collect()
    assert {r["cluster"] for r in out} == {0}


def test_kmeans_centroids_broadcast_not_shuffled(spark):
    """Assignment must be a broadcast nested-loop over the k centroid
    rows — the big embeddings side must never shuffle for the pairing
    (its only Exchanges are the update-side groupBys)."""
    rows = [
        (i, [float((i * 13 + d) % 7) for d in range(4)]) for i in range(40)
    ]
    plan = (
        kmeans_assign(_mk(spark, rows), k=4, iters=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quantize_is_exact_longs(spark):
    df = spark.createDataFrame(
        [(0, [0.123, -0.9995, 1.0])], "vec_id long, embedding array<float>"
    )
    got = df.select(quantize(F.col("embedding")).alias("q")).first()["q"]
    # float32(0.123) = 0.12300000339.. -> 123; float32(-0.9995) =
    # -0.9994999766.. -> *1000 = -999.49997 -> rounds to -999 (no tie:
    # (2k+1)/2000 is not dyadic, so no float lands exactly on .5);
    # 1.0 exact -> 1000
    assert got == [123, -999, 1000]

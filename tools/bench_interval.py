"""Empirical naive-vs-bucketed range-join scaling shape.

plans/interval.py claims the naive key-equijoin + BETWEEN filter blows
up as O(points x intervals) per key while the bucketed form touches
only bucket-local pairs. This tool MEASURES that shape instead of
arguing it: deterministic synthetic workloads with a FIXED number of
keys and growing rows per key (the regime where per-key pair count is
the whole story), timing both formulations at each size and checking
they return identical match counts.

Workload (pure Column expressions, no driver-side data): K keys; per
key, P points uniform over a day (86400 s, id-arithmetic positions, no
RNG) and V intervals of ~600 s each starting every 86400/V seconds, so
each point lands in 1-2 intervals regardless of scale. The bucketed
leg uses bucket_seconds=600 (matched to interval length — the module's
sizing guidance).

Usage: python tools/bench_interval.py [--sizes 200,400,800]
       (per-key point counts; intervals scale as points/4)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

K = 40  # distinct keys — fixed, so growth is all within-key


def synth(spark, points_per_key: int):
    n_iv = max(4, points_per_key // 4)
    pts = spark.range(K * points_per_key).select(
        (F.col("id") % K).cast("string").alias("k"),
        F.col("id").alias("pt_id"),
        # deterministic low-discrepancy positions in [0, 86400)
        (F.pmod(F.col("id") * 2654435761, F.lit(86400 * 1000)) / 1000.0
         ).alias("t"),
    )
    step = 86400.0 / n_iv
    ivs = spark.range(K * n_iv).select(
        (F.col("id") % K).cast("string").alias("k"),
        F.col("id").alias("iv_id"),
        ((F.col("id") / K).cast("long") * step).alias("lo"),
        ((F.col("id") / K).cast("long") * step + 600.0).alias("hi"),
    )
    return pts, ivs


def naive(pts, ivs):
    return (
        pts.join(ivs, "k")
        .filter((F.col("t") >= F.col("lo")) & (F.col("t") <= F.col("hi")))
        .select("pt_id", "iv_id")
    )


def main():
    sizes = [200, 400, 800]
    for i, a in enumerate(sys.argv):
        if a == "--sizes":
            sizes = [int(x) for x in sys.argv[i + 1].split(",")]

    from featuregenerator_spark.plans.interval import interval_join
    from featuregenerator_spark.session import get_spark

    spark = get_spark("bench-interval", cores=16, shuffle_partitions=64)
    for p in sizes:
        pts, ivs = synth(spark, p)
        pts.cache().count()
        ivs.cache().count()
        legs = {}
        counts = {}
        for name, df in (
            ("naive", naive(pts, ivs)),
            ("bucketed", interval_join(
                pts, ivs, "k", "t", "lo", "hi", bucket_seconds=600.0
            )),
        ):
            df.count()  # warm
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                counts[name] = df.count()
                best = min(best, time.time() - t0)
            legs[name] = round(best, 3)
        pts.unpersist()
        ivs.unpersist()
        assert counts["naive"] == counts["bucketed"], counts
        print(
            json.dumps(
                {
                    "points_per_key": p,
                    "keys": K,
                    "intervals_per_key": max(4, p // 4),
                    "matches": counts["naive"],
                    "wall_naive_s": legs["naive"],
                    "wall_bucketed_s": legs["bucketed"],
                    "speedup": round(legs["naive"] / legs["bucketed"], 2)
                    if legs["bucketed"] > 0
                    else None,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

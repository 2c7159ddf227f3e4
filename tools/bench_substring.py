"""Scaling-shape measurement for the ExactSubstr substring-dedup pass.

Every stage of substring_dup_coverage / trim_dup_spans is linear in
total window count (explode -> map-side-combined groupBy(hash) -> hash
equi-join back -> per-doc sweep over only the duplicated windows), so
wall clock should grow ~linearly with corpus size — unlike the
quadratic pair scans this repo deliberately keeps as oracle baselines.
This tool MEASURES that shape instead of arguing it: deterministic
synthetic corpora at increasing doc counts (the bench_crossover
generator — docs j % 17 == 1 are ~0.9-Jaccard near-dups of j-1, which
share long exact token runs between perturbations, exactly what a
k-token window pass detects), one JSON line per size.

Usage: python tools/bench_substring.py [--sizes 10000,50000,200000] [--k 8]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.bench_crossover import synth_docs  # noqa: E402


def main() -> None:
    sizes = [10_000, 50_000, 200_000]
    k = 8
    for i, a in enumerate(sys.argv):
        if a == "--sizes":
            sizes = [int(x) for x in sys.argv[i + 1].split(",")]
        if a == "--k":
            k = int(sys.argv[i + 1])

    from featuregenerator_spark.operators.substring_dedup import (
        substring_dup_coverage,
        trim_dup_spans,
    )
    from featuregenerator_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "fg-substring-scale",
        cores=cores,
        shuffle_partitions=4 * cores,
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )

    def timed(df) -> float:
        # noop SINK, not count(): count() lets Catalyst prune every
        # computed column and even eliminate the final left join (the
        # aggregate side is provably unique per key), timing ~nothing.
        # The noop writer materializes every output column.
        def _noop():
            df.write.format("noop").mode("overwrite").save()

        _noop()  # JIT warm
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            _noop()
            best = min(best, time.time() - t0)
        return best

    prev_wall = prev_n = None
    for n in sizes:
        path = f"/tmp/fg_crossover_n{n}"  # shared cache with bench_crossover
        if not os.path.exists(os.path.join(path, "documents.parquet", "_SUCCESS")):
            synth_docs(spark, n).repartition(64).write.mode("overwrite").parquet(
                os.path.join(path, "documents.parquet")
            )
        docs = (
            spark.read.parquet(os.path.join(path, "documents.parquet"))
            .select("doc_id", "text")
            .repartition(cores * 4, "doc_id")
        )
        cov = substring_dup_coverage(docs, k=k)
        t_cov = timed(cov)
        n_dup_docs = cov.filter(F.col("dup_windows") > 0).count()
        t_trim = timed(trim_dup_spans(docs, k=k))
        rec = {
            "metric": "substring_dedup_scaling",
            "n_docs": n,
            "k": k,
            "coverage_sec": round(t_cov, 2),
            "trim_sec": round(t_trim, 2),
            "dup_docs": n_dup_docs,
        }
        if prev_wall is not None:
            # wall growth vs corpus growth: ~1.0 = linear, >>1 = superlinear
            rec["wall_growth_vs_size_growth"] = round(
                (t_cov / prev_wall) / (n / prev_n), 2
            )
        prev_wall, prev_n = t_cov, n
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()

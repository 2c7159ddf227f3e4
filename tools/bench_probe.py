"""Replica of the reference's ONLY perf artifact, on the Spark engine.

Reference workload (fg_lite/feature/test/BenchMarkTest.cpp:14,39-47,
142-160): build a 10,000-entry map<u64,float>, then probe it 10 x 10,000
times. Best hand-tuned C++ figure ~100k probes / 185 ms ~= 540k probes/s
on one AVX-512 core.

Spark-native equivalent: the encoded map is a MapType column (SURVEY.md
§4.3 — the byte codecs are physical-only and not ported); probes are
`element_at` inside whole-stage codegen. We measure probes/s at 1 core
(apples-to-apples single-core) and at all cores (the scale path the
reference cannot take), on a 100x larger probe set so timing is stable.

Usage: python tools/bench_probe.py  ->  one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

MAP_ENTRIES = 10_000
PROBES = 10_000_000  # 100x the reference's 100k total, for stable timing


def run(cores: int, probes: int = PROBES) -> dict:
    from featuregenerator_spark.session import get_spark

    spark = get_spark(
        f"probe-bench-{cores}", cores=cores, shuffle_partitions=cores,
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )
    # The reference probes one shared 10k-entry map. The Spark-native form
    # of "probe a shared map" is a broadcast hash join against the 10k-row
    # key/value table (SURVEY.md §2.2 row()==1 broadcast); per-probe cost
    # is one hash-table lookup inside whole-stage codegen. (The MapType
    # element_at path — lookup_encoded — is for per-row maps carried in
    # data; a single shared map would be copied per row there.)
    dim = spark.range(MAP_ENTRIES).select(
        F.col("id").alias("k"), (F.col("id").cast("double") / 7.0).alias("v")
    )
    probe_rows = spark.range(probes, numPartitions=cores * 4).select(
        F.pmod(F.col("id") * 31, F.lit(MAP_ENTRIES * 2)).alias("k")
        # ~half miss, like a real workload
    )
    df = (
        probe_rows.join(F.broadcast(dim), "k", "left")
        .groupBy((F.col("k") % 64).alias("g"))
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    )

    def one() -> float:
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    one()  # JIT warm
    sec = min(one(), one())
    spark.stop()
    return {
        "cores": cores,
        "probes": probes,
        "sec": round(sec, 3),
        "probes_per_sec": round(probes / sec),
    }


def main() -> None:
    r1 = run(1)
    # 10x the probes at full parallelism so wall time dominates the fixed
    # per-stage overhead
    rn = run(int(os.environ.get("SPARK_GRAFT_CPUS", "32")), probes=PROBES * 10)
    print(
        json.dumps(
            {
                "metric": "map_probe_throughput",
                "workload": f"{MAP_ENTRIES}-entry map, {PROBES} probes (ref: BenchMarkTest.cpp x100)",
                "reference_best_cpp_probes_per_sec_per_core": 540_000,
                "single_core": r1,
                "all_cores": rn,
            }
        )
    )


if __name__ == "__main__":
    main()

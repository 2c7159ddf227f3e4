"""Empirical exact-vs-LSH crossover for near-dup detection.

BASELINE.md documents that the exact same-lang pair scan
(q_neardup_token_jaccard) beats MinHash-LSH (q_minhash_lsh_candidates)
at sf0.1's 5k docs, and that the ordering flips as the corpus grows
because the exact leg's pair count is quadratic while the LSH leg is
linear in corpus size (banding) plus the true-candidate count. This
tool MEASURES that flip instead of arguing it: it stages deterministic
synthetic corpora at increasing doc counts and times both queries on
each, printing one JSON line per size.

Corpus shape (pure Column expressions, fully deterministic, no
driver-side data): doc j with j % 17 == 1 is a planted near-dup of doc
j-1 — same base token sequence with ~5%% of positions perturbed
(Jaccard ~0.9); everything else is unrelated (50k-word vocabulary, so
random token overlap is far below the 0.8 threshold). Token count per
doc varies 50-149. This keeps both legs' true-pair verification cost
small and identical, isolating exactly the asymmetric scan cost the
crossover claim is about. LSH banding recall on a 0.9-Jaccard pair with
16 hashes / 4 bands is ~0.986, so pair counts may differ by ~1%% —
reported alongside the walls.

Usage: python tools/bench_crossover.py [--sizes 5000,25000,100000]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

VOCAB = 50_000


def synth_docs(spark, n_docs: int):
    """(doc_id, text, lang, source, n_chars) with planted near-dup pairs
    (j-1, j) for j %% 17 == 1 at ~0.9 Jaccard."""
    df = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    is_dup = F.col("doc_id") % 17 == 1
    base = F.when(is_dup, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    length = (50 + F.pmod(F.xxhash64(base, F.lit("len")), F.lit(100))).cast("int")
    # token k of the BASE sequence; the dup copy perturbs ~5% of positions
    # to doc-unique tokens (prefix "p" cannot collide with vocab tokens)
    toks = F.transform(
        F.sequence(F.lit(0), length - 1),
        lambda k: F.when(
            is_dup & (F.pmod(F.xxhash64(F.col("doc_id"), k, F.lit("pert")), F.lit(20)) == 0),
            F.concat(F.lit("p"), F.col("doc_id").cast("string"), F.lit("_"), k.cast("string")),
        ).otherwise(
            F.concat(F.lit("w"), F.pmod(F.xxhash64(base, k), F.lit(VOCAB)).cast("string"))
        ),
    )
    text = F.array_join(toks, " ")
    return df.select(
        "doc_id",
        text.alias("text"),
        F.concat(F.lit("l"), F.pmod(base, F.lit(3)).cast("string")).alias("lang"),
        F.lit("synth").alias("source"),
        F.length(text).cast("long").alias("n_chars"),
    )


def main() -> None:
    sizes = [5_000, 25_000, 100_000]
    for i, a in enumerate(sys.argv):
        if a == "--sizes":
            sizes = [int(x) for x in sys.argv[i + 1].split(",")]

    from featuregenerator_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark(
        "fg-crossover",
        cores=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        shuffle_partitions=4 * int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
        extra_conf={"spark.local.dir": "/dev/shm/spark-local"},
    )

    def timed(df) -> tuple[float, int]:
        # count() forces full evaluation; first call JIT-warms, report min
        # of two warmed runs like bench.py
        df.count()
        best, rows = float("inf"), 0
        for _ in range(2):
            t0 = time.time()
            rows = df.count()
            best = min(best, time.time() - t0)
        return best, rows

    for n in sizes:
        path = f"/tmp/fg_crossover_n{n}"
        if not os.path.exists(os.path.join(path, "documents.parquet", "_SUCCESS")):
            synth_docs(spark, n).repartition(64).write.mode("overwrite").parquet(
                os.path.join(path, "documents.parquet")
            )
        t_exact, n_exact = timed(entry.q_neardup_token_jaccard(spark, path))
        t_lsh, n_lsh = timed(entry.q_minhash_lsh_candidates(spark, path))
        print(
            json.dumps(
                {
                    "metric": "neardup_exact_vs_lsh_wall",
                    "n_docs": n,
                    "exact_sec": round(t_exact, 2),
                    "lsh_sec": round(t_lsh, 2),
                    "exact_pairs": n_exact,
                    "lsh_pairs": n_lsh,
                    "lsh_speedup": round(t_exact / t_lsh, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Exact substring-duplicate coverage (ExactSubstr-style dedup pass).

The substring-granularity member of the dedup family (exact-hash /
MinHash / SimHash / n-gram-Jaccard cover the *document* granularity):
find every k-token window whose exact content occurs more than once in
the corpus — across documents OR repeated within one — and report, per
document, how much of it is duplicated text. This is the relational
form of the suffix-array pass in Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better" (public paper; they use
50-token windows at web scale — `k` here is a parameter because the
test corpus has ~50-token documents in total).

Shape, chosen for 100-TB scale:

1. tokenize -> one explode to (doc_id, start, xxhash64(window)) rows.
   Grouping key is the 8-byte hash, never the window string — the
   shuffle moves fixed-width longs. (The DuckDB oracle groups the
   window STRINGS; the gate proving equality is the collision
   argument, same as the token/shingle Jaccard queries.)
2. duplicated-window detection = groupBy(hash).count(): Catalyst does
   map-side partial aggregation, so the shuffle carries one row per
   DISTINCT window per partition, not one per occurrence. The join
   back is hash-equi on the duplicated subset only; AQE picks
   broadcast when (as in any non-pathological corpus) duplicated
   windows are a small fraction of all windows.
3. per-doc coverage = classic interval-union sweep as WINDOW functions
   (running max of interval end -> group id by cumulative sum -> one
   groupBy): O(dup windows) rows, all whole-stage codegen. The sweep
   partitions by doc_id but only over *duplicated* windows, so a
   pathological mega-document serializes only its duplicated-window
   list; the chunked prefix-carry machinery in plans/skew.py is the
   escape hatch if that list itself is huge.

No per-row Python anywhere; every step is an exact DuckDB-expressible
relational op, so the whole operator is driver-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Windows whose exact token content occurs >= this many times in the
# corpus count as duplicated (2 == "appears more than once", the paper's
# definition; raise it to only strike high-multiplicity boilerplate).
MIN_OCCURRENCES = 2


def window_hashes(
    df: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per k-token sliding window: (id, start, h).

    ``start`` is the 0-based token offset; ``h`` is xxhash64 of the
    space-joined window. Documents shorter than k tokens emit no rows.
    Tokenization is a plain single-space split (the corpus contract
    everywhere else in this engine); swap ``_toks`` for the regex split
    in quality_rules if the input has irregular whitespace.
    """
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # sequence(0, n-k) DESCENDS when n < k (Spark generates step -1);
    # guard with an empty array instead.
    starts = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    hashes = F.transform(
        starts,
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, k))),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(hashes).alias("start", "h"),
    )


def substring_dup_coverage(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_occurrences: int = MIN_OCCURRENCES,
) -> DataFrame:
    """Per-document duplicated-substring coverage.

    Returns one row per input document:

    - ``n_tokens``     — token count (single-space split)
    - ``dup_windows``  — its k-token windows whose content occurs
                         >= min_occurrences times corpus-wide
    - ``covered_tokens`` — tokens under >= 1 duplicated window
                         (interval union of [start, start+k))
    - ``dup_token_frac`` — covered_tokens / n_tokens, rounded 4dp

    A downstream pass drops or trims documents above a threshold frac;
    this operator deliberately reports rather than filters so the same
    output drives either policy (drop-doc vs cut-span).
    """
    wins = window_hashes(df, k, text_col=text_col, id_col=id_col)

    dup_h = (
        wins.groupBy("h")
        .count()
        .filter(F.col("count") >= min_occurrences)
        .select("h")
    )
    dup_wins = wins.join(dup_h, "h").select(id_col, "start")

    # Interval-union sweep over [start, start+k) per document.
    w_doc = Window.partitionBy(id_col).orderBy("start")
    prev_end = F.max(F.col("start") + k).over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    grouped = dup_wins.withColumn(
        "new_grp",
        F.when(F.col("start") > F.coalesce(prev_end, F.lit(-1)) - 1, 1).otherwise(0),
    ).withColumn(
        "g",
        F.sum("new_grp").over(
            w_doc.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    cov = (
        grouped.groupBy(id_col, "g")
        .agg(
            F.count("*").alias("cnt"),
            F.min("start").alias("mn"),
            (F.max("start") + k).alias("mx"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("dup_windows"),
            F.sum(F.col("mx") - F.col("mn")).alias("covered"),
        )
    )

    base = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).cast("long").alias("n_tokens"),
    )
    out = base.join(cov, id_col, "left")
    covered = F.coalesce(F.col("covered"), F.lit(0)).cast("long")
    return out.select(
        id_col,
        "n_tokens",
        F.coalesce(F.col("dup_windows"), F.lit(0)).cast("long").alias("dup_windows"),
        covered.alias("covered_tokens"),
        F.round(covered.cast("double") / F.col("n_tokens"), 4).alias(
            "dup_token_frac"
        ),
    )

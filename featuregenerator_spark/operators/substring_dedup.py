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


def merged_intervals(
    occurrences: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """Union the [start, start+k) intervals per document.

    Input: (id, start) rows. Output: one row per merged interval group
    with ``cnt`` (windows merged), ``mn``/``mx`` (token span). Classic
    sweep: running max of interval end -> a new group wherever the next
    start clears it -> cumulative-sum group ids. Partitions only over
    the rows given (callers pass *duplicated* windows, a small subset),
    all whole-stage codegen.
    """
    w_doc = Window.partitionBy(id_col).orderBy("start")
    prev_end = F.max(F.col("start") + k).over(
        w_doc.rowsBetween(Window.unboundedPreceding, -1)
    )
    grouped = occurrences.withColumn(
        "new_grp",
        F.when(F.col("start") > F.coalesce(prev_end, F.lit(-1)) - 1, 1).otherwise(0),
    ).withColumn(
        "g",
        F.sum("new_grp").over(w_doc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return grouped.groupBy(id_col, "g").agg(
        F.count("*").alias("cnt"),
        F.min("start").alias("mn"),
        (F.max("start") + k).alias("mx"),
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

    cov = (
        merged_intervals(dup_wins, k, id_col=id_col)
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


def trim_dup_spans(
    df: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_occurrences: int = MIN_OCCURRENCES,
) -> DataFrame:
    """Cut duplicated spans, keeping each duplicated window's canonical
    occurrence (the remediation half; ``substring_dup_coverage`` is the
    report).

    Semantics: for every k-token window occurring >= min_occurrences
    times corpus-wide, the lexicographically-first occurrence by
    (id, start) is CANONICAL and stays; every other occurrence is a cut
    interval [start, start+k). Cut intervals are unioned per document
    and the covered tokens removed. One copy of each duplicated k-gram
    therefore survives — except where a canonical window is itself
    overlapped by a different window's non-canonical occurrence, the
    same boundary caveat as the suffix-array original.

    Scale notes: canonical selection is ``min(struct(id, start))``
    inside the SAME groupBy(hash) aggregate that counts occurrences —
    map-side combinable, so a boilerplate window occurring 10^9 times
    costs one partial row per partition, never a row_number over a hot
    hash partition. The rebuild is a per-row indexed-lambda filter over
    the token array against the doc's merged cut list (collect_list of
    few merged intervals) — no Python, no second pass over text.

    Output: (id, n_tokens, n_removed_tokens, text_clean) — text_clean
    is the surviving tokens re-joined with single spaces.
    """
    wins = window_hashes(df, k, text_col=text_col, id_col=id_col)

    dup_h = (
        wins.groupBy("h")
        .agg(
            F.count("*").alias("occ"),
            F.min(F.struct(F.col(id_col), F.col("start"))).alias("canon"),
        )
        .filter(F.col("occ") >= min_occurrences)
        .select("h", "canon")
    )
    cuts = (
        wins.join(dup_h, "h")
        .filter(
            ~(
                (F.col("canon")[id_col] == F.col(id_col))
                & (F.col("canon")["start"] == F.col("start"))
            )
        )
        .select(id_col, "start")
    )
    cut_list = (
        merged_intervals(cuts, k, id_col=id_col)
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct(F.col("mn"), F.col("mx"))).alias("cuts"),
            F.sum(F.col("mx") - F.col("mn")).alias("removed"),
        )
    )

    toks = F.split(F.col(text_col), " ")
    out = df.select(id_col, text_col).join(cut_list, id_col, "left")
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.coalesce(F.col("cuts"), F.array().cast("array<struct<mn:int,mx:int>>")),
            lambda c: (i >= c["mn"]) & (i < c["mx"]),
        ),
    )
    return out.select(
        id_col,
        F.size(toks).cast("long").alias("n_tokens"),
        F.coalesce(F.col("removed"), F.lit(0)).cast("long").alias(
            "n_removed_tokens"
        ),
        F.concat_ws(" ", kept).alias("text_clean"),
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 / Llama n-gram overlap rule):
    flag every corpus document sharing at least one k-token window with
    the held-out benchmark set — training on such documents inflates
    eval scores, so curation drops or audits them.

    Shape: the benchmark's DISTINCT window hashes form a small table
    (benchmarks are thousands of documents, not billions) that
    broadcast-semi-joins against the corpus's window stream — the
    corpus is touched once, map-side, with no corpus-sized shuffle.
    Returns one row per corpus doc: ``n_hit_windows`` (distinct
    contaminated windows), ``first_hit_start`` (earliest token offset,
    for audit snippets), ``contaminated`` 0/1."""
    ch = window_hashes(corpus, k, text_col=text_col, id_col=id_col)
    bh = (
        window_hashes(benchmark, k, text_col=text_col, id_col=id_col)
        .select("h")
        .distinct()
    )
    hits = (
        ch.join(F.broadcast(bh), "h")
        .groupBy(id_col)
        .agg(
            F.countDistinct("h").alias("n_hit_windows"),
            F.min("start").alias("first_hit_start"),
        )
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_hit_windows", F.lit(0)).alias("n_hit_windows"),
            F.col("first_hit_start"),
            (F.col("n_hit_windows").isNotNull()).cast("int").alias("contaminated"),
        )
    )

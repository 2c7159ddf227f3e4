"""BM25 retrieval over a document corpus — the search side of the
curation battery.

Every large-corpus pipeline needs corpus search: quality triage ("show
me the top documents for this probe query"), decontamination forensics
(rank corpus docs against a benchmark prompt), and mixture debugging.
This module scores documents with Okapi BM25 (the Lucene ``+1``-free
log form with the 0.5 smoothing, k1 = 1.2, b = 0.75 — public
convention, Robertson & Zaragoza 2009) entirely relationally:

1. tokenize once (split on space — the corpus is pre-normalized by the
   text_normalize stage) and explode; FILTER TO QUERY TERMS IMMEDIATELY
   so the exploded stream is query-vocabulary-sized, not
   corpus-token-sized — at 100 TB this is the difference between a
   full-corpus shuffle and a near-free one (the filter sits in the same
   whole-stage-codegen pass as the explode);
2. tf per (doc, query-term) via map-side-combined groupBy;
3. df per query term over the distinct doc-term rows
   (|query|-sized output; AQE broadcasts it back);
4. doc length and its corpus average ride broadcast one-row cross
   joins — never a driver collect;
5. per-term contribution = idf(df) * tf*(k1+1) /
   (tf + k1*(1 - b + b*dl/avgdl)), QUANTIZED to integer micro-units
   (round(c * 1e6) as long) BEFORE the per-doc sum — long sums are
   exact and order-independent, so the aggregation can never flip a
   rounding boundary between engines (the quality_model_score lesson:
   double sums fold in engine-dependent order; integer sums don't);
6. score = micro-sum / 1e6; top-k by (score DESC, doc_id ASC) — the
   id tiebreak makes the ranking deterministic across engines.

Each per-term contribution double is computed from the same exact
integer (tf, df, N) and exact-sum (dl totals) inputs with the same
IEEE ops in both engines — the same single-expression parity argument
as tfidf_top_terms (text_analysis.py); the 1e-6 quantization (error
<= 5e-7 per term, 3 decimal places below the 1e-4 output rounding)
then makes the cross-term SUM bit-reproducible by construction.

The reference has no retrieval operator (fg_lite is a per-row feature
kernel library); this lifts its "declare a feature over a column" style
(SURVEY.md §3.1) to corpus-level search, like the rest of the
text-analysis battery.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

K1 = 1.2
B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under Okapi BM25.

    Returns (id_col, bm25 = exact micro-sum / 1e6, rank 1..k).
    Duplicate query terms are deduplicated (bag semantics with binary
    query weights — the standard Okapi form).
    """
    qarr = F.array(*[F.lit(t) for t in sorted(set(query_terms))])

    toks = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("toks")
    )
    # doc length = total tokens (computed BEFORE the query-term filter)
    lens = toks.select(id_col, F.size("toks").alias("dl"))
    # corpus stats ride one broadcast row: N docs + average doc length.
    # avgdl = exact-long-sum / count (ONE deterministic double division),
    # not avg(double) — double-sum fold order is engine-dependent.
    stats = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )

    # dl rides the hit stream (computed BEFORE the explode, carried on
    # each query-hit row) instead of joining the lens table back on
    # doc_id — that join would be a corpus x corpus SortMergeJoin with
    # its own Exchange; carrying the value costs one long on a
    # query-vocabulary-sized stream. It is functionally dependent on
    # the doc id, so adding it to the grouping keys changes nothing.
    hits = toks.select(
        F.col(id_col),
        F.size("toks").alias("dl"),
        F.explode("toks").alias("term"),
    ).filter(F.array_contains(qarr, F.col("term")))
    tf = hits.groupBy(id_col, "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    tf_part = (F.col("tf") * (K1 + 1.0)) / (
        F.col("tf")
        + K1 * (1.0 - B + B * F.col("dl").cast("double") / F.col("avgdl"))
    )
    contrib_micro = F.round(idf * tf_part * 1e6, 0).cast("long")
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.sum(contrib_micro).alias("micro"))
    )
    # global top-k via orderBy().limit(k): Spark plans this as
    # TakeOrderedAndProject — each partition keeps its local top-k and
    # only k rows per partition reach the driver-side merge; a global
    # row_number() window would instead sort EVERYTHING through one
    # partition. rank is then a window over the k surviving rows only.
    topk = scored.orderBy(
        F.col("micro").desc(), F.col(id_col).asc()
    ).limit(k)
    ranked = topk.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.col("micro").desc(), F.col(id_col).asc())
        ),
    )
    # no output rounding: micro is an exact integer, so micro/1e6 is the
    # SAME IEEE division in both engines (bit-identical). Rounding it to
    # 4 decimals would MANUFACTURE ties at the 5th decimal (integer
    # micro-units have exactly 6), where Spark's BigDecimal-HALF_UP-on-
    # shortest-repr and other engines' binary rounding can disagree.
    return ranked.select(
        id_col,
        (F.col("micro") / 1e6).alias("bm25"),
        "rank",
    )

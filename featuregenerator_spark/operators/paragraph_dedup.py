"""Exact paragraph-level dedup — the MassiveText/Gopher middle granularity.

The dedup family here spans three granularities: whole documents
(exact hash / MinHash / SimHash / Jaccard), k-token substrings
(operators/substring_dedup.py, the Lee et al. 2022 ExactSubstr pass),
and — this module — PARAGRAPHS: the "remove duplicated paragraphs
across the corpus, keep the first occurrence" pass of the MassiveText
recipe (Rae et al. 2021, "Scaling Language Models: ... Gopher",
public paper), which strikes boilerplate (headers, footers, license
blocks) that repeats verbatim across millions of pages without being
long enough to make whole documents near-duplicates.

Shape, chosen for 100-TB scale:

1. One explode to (doc_id, idx, paragraph); the grouping key is
   xxhash64(paragraph) — fixed-width longs through the shuffle (the
   DuckDB oracle groups the paragraph STRINGS; the gate proving
   equality is the usual collision argument).
2. Canonical selection is an AGGREGATE, not a window:
   groupBy(hash).agg(min(struct(doc_id, idx)), count). min(struct)
   partial-aggregates map-side, so a boilerplate paragraph repeated
   across millions of documents — the hot key this pass exists to
   find — never materializes a sorted per-key partition the way a
   row_number window would; the shuffle carries one row per distinct
   paragraph per partition.
3. Join back hash-equi; a paragraph occurrence survives iff it IS the
   corpus-wide first (doc_id, idx). AQE broadcasts the (distinct,
   duplicated-only) side when small.
4. Per-doc rebuild: one groupBy(doc) collecting only kept paragraphs,
   array_sort on (idx, paragraph) structs restoring document order
   deterministically, then a left join to the doc spine so fully-
   duplicated documents keep a row with empty clean text.

No per-row Python anywhere; every step has an exact DuckDB mirror.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """(id, idx, para) per non-empty paragraph; idx is 0-based document
    position (kept so the rebuild restores original order)."""
    import re

    # F.split takes a Java regex while the rebuild (concat_ws) and the
    # oracle treat the separator literally — escape it so a '|' or '.'
    # separator splits on the character, not on a regex
    paras = F.filter(
        F.split(F.col(text_col), re.escape(sep)), lambda p: p != F.lit("")
    )
    return df.select(
        F.col(id_col), F.posexplode(paras).alias("idx", "para")
    )


def dedup_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """(id, n_paragraphs, n_dup_paragraphs, dup_para_frac, clean_text).

    A paragraph occurrence is removed when the same paragraph text
    occurs anywhere earlier in the corpus under the total order
    (doc_id, idx); the corpus-wide first occurrence always survives.
    """
    paras = split_paragraphs(df, text_col, id_col, sep).withColumn(
        "ph", F.xxhash64("para")
    )
    first = paras.groupBy("ph").agg(
        F.min(F.struct(F.col(id_col), F.col("idx"))).alias("first_occ")
    )
    flagged = paras.join(first, "ph").withColumn(
        "kept",
        F.struct(F.col(id_col), F.col("idx")) == F.col("first_occ"),
    )
    per_doc = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_paragraphs"),
        F.sum((~F.col("kept")).cast("long")).alias("n_dup_paragraphs"),
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("kept"), F.struct(F.col("idx"), F.col("para"))
                        )
                    )
                ),
                lambda s: s["para"],
            ),
        ).alias("clean_text"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_paragraphs"), F.lit(0)).alias("n_paragraphs"),
            F.coalesce(F.col("n_dup_paragraphs"), F.lit(0)).alias(
                "n_dup_paragraphs"
            ),
            F.round(
                F.coalesce(
                    F.col("n_dup_paragraphs") / F.col("n_paragraphs"), F.lit(0.0)
                ),
                4,
            ).alias("dup_para_frac"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )

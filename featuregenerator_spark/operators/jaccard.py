"""Shared token-hash Jaccard building blocks for the dedup family.

The batch incremental dedup (driver queries) and the streaming ingest
dedup compute the SAME decision; the pieces that define that decision
live here ONCE so parity is by construction, not by parallel
maintenance: the `streaming_dedup_parity` gate (oracle = the batch
query's SQL verbatim) would otherwise only catch a divergence after
the fact.

* ``hashed_token_cols`` — per-doc distinct-token xxhash64 arrays: each
  token string is hashed ONCE; every MinHash permutation and every
  exact-Jaccard verification downstream derives from the 8-byte hash
  (fixed-width rehash ~10x cheaper than re-hashing strings, and
  hash-array Jaccard == string-token Jaccard absent a ~V^2/2^64
  vocabulary collision — DuckDB-gate-proven on the exact queries).
* ``best_match`` — one dedup decision per doc: highest (rounded)
  jaccard, ties to the smallest corpus id. A map-side-partial max_by,
  no sort — and, being an aggregate, legal in streaming complete mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hashed_token_cols(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, lang, th, n) from a documents table (works on streams too —
    pure Column exprs)."""
    return df.select(
        id_col,
        "lang",
        F.transform(
            F.array_distinct(F.split(text_col, " ")), lambda t: F.xxhash64(t)
        ).alias("th"),
    ).withColumn("n", F.size("th"))


def best_match(matches: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, match_id, jaccard): per-doc best match from a (id, match_id,
    jaccard) candidate table — highest jaccard, ties to the smallest
    match_id (deterministic; map-side-partial max_by, no sort)."""
    return (
        matches.groupBy(id_col)
        .agg(
            F.max_by(
                F.struct("match_id", "jaccard"),
                F.struct(F.col("jaccard"), (-F.col("match_id")).alias("nm")),
            ).alias("m")
        )
        .select(
            id_col,
            F.col("m.match_id").alias("match_id"),
            F.col("m.jaccard").alias("jaccard"),
        )
    )

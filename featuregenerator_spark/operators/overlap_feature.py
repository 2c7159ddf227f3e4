"""overlap_feature — set/sequence relations between two token arrays.

Reference semantics (``fg_lite/feature/OverLapFeatureEvaluator.h:39-388``,
method table ``fg_lite/feature/FeatureConfig.h:628-657``): given query
tokens q and title tokens t —

  is_equal            q == t (exact sequence)                -> 0/1
  is_contain          q appears in t as a contiguous run     -> 0/1
  common_word         |multiset hits of q in t| (per-q-token membership)
  diff_word           |q tokens not in t|
  diff_both           |q not in t| + |t not in q|
  match_words         multiset hit count
  query_common_ratio  floor(10 * common / |q|)
  title_common_ratio  floor(100 * common / |t|)
  hit_ornot           common > 0
  *_divided sparse variants emit joined token strings.

Dense counts clip at ``cutThreshold`` when configured.

Spark mapping: array_intersect / array_except / size / exists — all codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _common_count(q: Column, t: Column) -> Column:
    """#q tokens (with multiplicity) present in t (Evaluator.h:343-368)."""
    return F.size(F.filter(q, lambda x: F.array_contains(t, x)))


def overlap_feature(q: Column, t: Column, method: str) -> Column:
    """Compute one overlap method over two array<string> columns -> numeric."""
    if method == "is_equal":
        return (q == t).cast("int")
    if method == "is_contain":
        # contiguous-subsequence containment at some offset (Evaluator.h:274-307)
        nq, nt = F.size(q), F.size(t)
        offsets = F.sequence(F.lit(0), F.greatest(nt - nq, F.lit(-1)))
        hit = F.exists(
            offsets,
            lambda off: F.forall(
                F.sequence(F.lit(0), nq - 1),
                lambda i: F.try_element_at(t, off + i + 1) == F.try_element_at(q, i + 1),
            ),
        )
        return (hit & (nq > 0) & (nq <= nt)).cast("int")
    if method in ("common_word", "match_words"):
        return _common_count(q, t)
    if method == "diff_word":
        return F.size(F.filter(q, lambda x: ~F.array_contains(t, x)))
    if method == "diff_both":
        return F.size(F.filter(q, lambda x: ~F.array_contains(t, x))) + F.size(
            F.filter(t, lambda x: ~F.array_contains(q, x))
        )
    if method == "query_common_ratio":
        return F.when(
            F.size(q) > 0, F.floor(F.lit(10) * _common_count(q, t) / F.size(q))
        ).otherwise(F.lit(0)).cast("long")
    if method == "title_common_ratio":
        return F.when(
            F.size(t) > 0, F.floor(F.lit(100) * _common_count(q, t) / F.size(t))
        ).otherwise(F.lit(0)).cast("long")
    if method == "hit_ornot":
        return (_common_count(q, t) > 0).cast("int")
    raise ValueError(f"unknown overlap method: {method}")


def overlap_feature_sparse(
    q: Column, t: Column, method: str, feature_name: str, need_prefix: bool = True
) -> Column:
    """*_divided sparse variants: emit the participating tokens joined by
    '_' as one feature key (Evaluator.h:103-272)."""
    if method == "common_word_divided":
        toks = F.filter(q, lambda x: F.array_contains(t, x))
    elif method == "diff_word_divided":
        toks = F.filter(q, lambda x: ~F.array_contains(t, x))
    elif method == "match_words_divided":
        toks = F.filter(q, lambda x: F.array_contains(t, x))
    else:
        raise ValueError(f"unknown sparse overlap method: {method}")
    key = F.array_join(toks, "_")
    if need_prefix:
        key = F.concat(F.lit(feature_name + "_"), key)
    return key


def overlap_dense_clipped(q: Column, t: Column, method: str, cut_threshold: int) -> Column:
    v = overlap_feature(q, t, method)
    if cut_threshold > 0:
        return F.least(v, F.lit(cut_threshold))
    return v

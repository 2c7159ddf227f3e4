"""kgb_match_semantic — packed-uint64 term matching.

Reference semantics (``fg_lite/feature/KgbMatchSemanticFeatureFunction.h``):

Terms are packed uint64s. Item terms carry their class in the high 32 bits
(``GetTermIndex = t >> 32``, valid classes 0..3, ``CLASS_MAX_SIZE=4``) and
the value in the low 32 (``GetTermValue``). Query terms carry the class in
the top byte (``get_term_cls = t >> 56``, .h:64-66) and the value in the
low 32 bits. A query term *hits* iff its low-32 value appears among the
item terms of its class (.h:171-184).

Outputs (MultiSparse string keys, prefix applied):
  - match / unmatch mode: each matched (or unmatched) query term as its
    full uint64 decimal text;
  - ``as_bytes``: per-class term lists concatenated (no separator inside a
    class — the ',' is commented out in FgLiteBytes::Append, .h:28-45) and
    joined with ';' between classes, skipping the leading separator while
    the accumulator is still empty;
  - ``need_hit_ret``: 3-state hit code on the brand class (3):
    0 = brand matched, 1 = brand unmatched-nonempty, 2 = neither
    (.h:186-215); optional combo with an other-id column (order per
    ``combo_right``).

Spark mapping: bit ops (shiftrightunsigned / bitwiseAND) + array_contains
over per-class filtered arrays — all codegen, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CLASS_MAX_SIZE = 4
CLASS_BRAND = 3
_LOW32 = 0xFFFFFFFF


def _qcls(t: Column) -> Column:
    return F.shiftrightunsigned(t, 56)


def _icls(t: Column) -> Column:
    return F.shiftrightunsigned(t, 32)


def _val(t: Column) -> Column:
    return t.bitwiseAND(F.lit(_LOW32))


def _hit(q: Column, item_terms: Column) -> Column:
    """does query term q hit the item term list (class + low-32 match)?"""
    return F.exists(
        item_terms,
        lambda it: (_icls(it) == _qcls(q)) & (_val(it) == _val(q)),
    )


def kgb_match_terms(
    q_terms: Column,
    item_terms: Column,
    feature_name: str,
    match: bool = True,
    need_prefix: bool = True,
) -> Column:
    """matched (or unmatched) query terms as decimal strings.

    q_terms/item_terms: array<long>. Returns array<string>.
    """
    valid_items = F.filter(item_terms, lambda it: _icls(it) <= CLASS_MAX_SIZE)
    pred = (lambda q: _hit(q, valid_items)) if match else (
        lambda q: ~_hit(q, valid_items)
    )
    sel = F.filter(q_terms, pred)
    out = F.transform(sel, lambda t: t.cast("string"))
    if need_prefix:
        out = F.transform(out, lambda s: F.concat(F.lit(feature_name + "_"), s))
    return out


def kgb_match_bytes(
    q_terms: Column,
    item_terms: Column,
    feature_name: str,
    match: bool = True,
    need_prefix: bool = True,
) -> Column:
    """as_bytes mode: per-class concatenation joined by ';' -> one string.

    Classes iterate 0..3; within a class, term decimal texts concatenate
    with no separator; a ';' precedes every class segment once the
    accumulator is non-empty (including empty later segments).
    """
    valid_items = F.filter(item_terms, lambda it: _icls(it) <= CLASS_MAX_SIZE)
    pred = (lambda q: _hit(q, valid_items)) if match else (
        lambda q: ~_hit(q, valid_items)
    )
    def class_filter(c: int):
        # single-arg closure: a 2-arg lambda (`lambda q, c=cls`) would make
        # F.filter pass the ELEMENT INDEX as the second argument,
        # silently replacing the class constant
        return lambda q: (_qcls(q) == c) & pred(q)

    acc = F.lit("")
    for cls in range(CLASS_MAX_SIZE):
        seg = F.array_join(
            F.transform(
                F.filter(q_terms, class_filter(cls)),
                lambda t: t.cast("string"),
            ),
            "",
        )
        acc = F.when(acc == "", seg).otherwise(F.concat(acc, F.lit(";"), seg))
    if need_prefix:
        acc = F.concat(F.lit(feature_name + "_"), acc)
    return acc


def kgb_hit_ret(
    q_terms: Column,
    item_terms: Column,
    feature_name: str,
    need_prefix: bool = True,
    other_ids: Column | None = None,
    combo_right: bool = True,
) -> Column:
    """need_hit_ret: brand-class 3-state code, optionally comboed with
    other ids. Returns string (no combo) or array<string> (combo)."""
    valid_items = F.filter(item_terms, lambda it: _icls(it) <= CLASS_MAX_SIZE)
    brand_q = F.filter(q_terms, lambda q: _qcls(q) == CLASS_BRAND)
    n_match = F.size(F.filter(brand_q, lambda q: _hit(q, valid_items)))
    n_unmatch = F.size(brand_q) - n_match
    code = (
        F.when(n_match != 0, F.lit(0))
        .when(n_unmatch != 0, F.lit(1))
        .otherwise(F.lit(2))
        .cast("string")
    )
    prefix = feature_name + "_" if need_prefix else ""
    if other_ids is None:
        return F.concat(F.lit(prefix), code)
    if combo_right:
        return F.transform(
            other_ids,
            lambda o: F.concat(F.lit(prefix), code, F.lit("_"), o.cast("string")),
        )
    return F.transform(
        other_ids,
        lambda o: F.concat(F.lit(prefix), o.cast("string"), F.lit("_"), code),
    )

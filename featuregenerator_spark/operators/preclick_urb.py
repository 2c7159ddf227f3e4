"""preclick_urb_word — user-realtime-behavior word statistics.

Reference semantics (``fg_lite/feature/PreclickUrbWordFeatureFunction.h``):

Top-words mode (.h:49-129): take the first 10 items
(``PRECLICK_ITEM_NUM``), optionally base64-decode, split each on
``delim_item``; when ``delim_kv`` is configured each element must be
``k<delim_kv>v`` and the *value* part is kept; build a word -> count map;
keep words with count > 0 sorted by (count desc, word asc — numeric word
order when ``uint64_expression``); emit the top 20 (``PRECLICK_WORD_NUM``)
words as feature keys.

Match mode (.h:130-283): the expression side (row()==1 — broadcast) yields
either a raw string set (``raw_expression``) or the ordered top words;
per item row, intersect with the item's match-word set; emit the hit words
(capped at 20) or just the hit count (``output_count``).

Spark mapping: slice/split/flatten + a distinct-count sort expressed with
array_sort over (neg-count, key) structs — pure array expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PRECLICK_ITEM_NUM = 10
PRECLICK_WORD_NUM = 20
MATCHED_WORD_NUM = 20


def _words(items: Column, delim_item: str, delim_kv: str | None, need_decode: bool) -> Column:
    """array<string> items -> flattened word array (first 10 items)."""
    sliced = F.slice(items, 1, PRECLICK_ITEM_NUM)
    if need_decode:
        sliced = F.transform(sliced, lambda s: F.unbase64(s).cast("string"))
    per_item = F.transform(sliced, lambda s: F.split(s, delim_item))
    flat = F.filter(F.flatten(per_item), lambda w: w != "")
    if delim_kv:
        flat = F.transform(
            flat, lambda w: F.split_part(w, F.lit(delim_kv), F.lit(2))
        )
    return flat


def top_words(
    items: Column,
    feature_name: str,
    need_prefix: bool = True,
    delim_item: str = ",",
    delim_kv: str | None = None,
    need_decode: bool = False,
    uint64_keys: bool = False,
) -> Column:
    """word-count top-20 by (count desc, key asc) -> array<string> keys."""
    ws = _words(items, delim_item, delim_kv, need_decode)
    distinct = F.array_distinct(ws)
    key_col = (lambda w: w.cast("long")) if uint64_keys else (lambda w: w)
    ranked = F.array_sort(
        F.transform(
            distinct,
            lambda w: F.struct(
                (-F.size(F.filter(ws, lambda x: x == w))).alias("neg"),
                key_col(w).alias("k"),
                w.alias("w"),
            ),
        )
    )
    top = F.transform(F.slice(ranked, 1, PRECLICK_WORD_NUM), lambda s: s["w"])
    if need_prefix:
        top = F.transform(top, lambda w: F.concat(F.lit(feature_name + "_"), w))
    return top


def match_words(
    expr_items: Column,
    match_items: Column,
    feature_name: str,
    need_prefix: bool = True,
    delim_item: str = ",",
    delim_kv: str | None = None,
    need_decode: bool = False,
    raw_expression: bool = False,
    output_count: bool = False,
    uint64_keys: bool = False,
) -> Column:
    """need_match mode: expression top-words (or raw set) x item words.

    Returns array<string> hit keys, or a single count string when
    output_count.
    """
    if raw_expression:
        exp = F.array_distinct(F.slice(expr_items, 1, PRECLICK_ITEM_NUM))
    else:
        exp = top_words(
            expr_items,
            feature_name,
            need_prefix=False,
            delim_item=delim_item,
            delim_kv=delim_kv,
            need_decode=need_decode,
            uint64_keys=uint64_keys,
        )
    mset = _words(match_items, delim_item, delim_kv, need_decode)
    hits = F.filter(exp, lambda w: F.array_contains(mset, w))
    if not raw_expression:
        hits = F.slice(hits, 1, MATCHED_WORD_NUM)
    if output_count:
        out = F.size(hits).cast("string")
        if need_prefix:
            out = F.concat(F.lit(feature_name + "_"), out)
        return out
    if need_prefix:
        hits = F.transform(hits, lambda w: F.concat(F.lit(feature_name + "_"), w))
    return hits

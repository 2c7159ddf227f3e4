"""lookup_feature, array form — THE point-in-time kernel.

Reference semantics (``fg_lite/feature/LookupFeatureFunctionArray.cpp:41-229``
dispatch; kernels ``LookupFeatureFunctionArrayImpl.h:48-503``):

The per-row inputs are a behavior history as three parallel arrays
(``map_keys``, ``map_values``, ``value_timestamps``), the current event time
``pvtime``, and probe ``keys``.

With ``timediff >= 0`` (point-in-time path, Impl.h:107-128):
  1. keep only history pairs with ``pvtime - event_ts <= timediff``
     (never the future — the host guarantees ts <= pvtime upstream);
  2. per probe key over the surviving pairs:
     - combiner ``none``     -> emit every matching value, or the default
       string when no match (Impl.h:271-296);
     - combiner ``count``    -> number of matches summed over probe keys,
       clipped at ``count_cut_threshold`` when > 0 (Impl.h:321-361,424-426);
     - ``gap_min``/``gap_max`` -> min/max of ``pvtime - event_ts`` over
       matches (init: gap_min=timediff, gap_max=0, Impl.h:309-318), encoded
       by TimeDiffNormal into ordinal 0-8; default value when no match;
  3. ``need_discrete`` renders the numeric result as a (prefixed) string key.

Without timediff (Impl.h:437-503): build a last-write-wins dict from the
pair arrays; discrete -> per probe key emit value or default (only if
``has_default``); dense -> combiner-fold the probed values (misses skipped,
empty -> 0), optional upper_bound bucketize.

Spark mapping: everything is ``arrays_zip`` + ``F.filter`` + ``F.aggregate``
— one pass per row inside whole-stage codegen; no shuffle, no Python.
The *pipeline-level* lift of the same semantics over a transcripts table
(rolling windows / as-of join) lives in ``plans/temporal.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from featuregenerator_spark.functions.bucketize import (
    bucketize_expr,
    time_diff_normal_expr,
)
from featuregenerator_spark.functions.combiners import combine_array
from featuregenerator_spark.functions.formatting import fmt_float_0f, with_prefix


def _canon(c: Column) -> Column:
    """Canonical string form of a key for cross-type equality.

    The reference converts the map key to the probe key's type (anyconvert);
    numeric text like "5" must equal int 5. We compare canonical strings:
    integral numerics render without a fractional part.
    """
    d = c.cast("string").try_cast("double")
    return F.when(
        d.isNotNull() & (d == F.floor(d)), d.cast("long").cast("string")
    ).otherwise(c.cast("string"))


def _surviving_pairs(
    map_keys: Column,
    map_values: Column,
    value_ts: Column,
    pvtime: Column,
    timediff: float,
) -> Column:
    """zip history arrays, keep pairs inside the time window.

    Returns array<struct<k:string, v:..., ts:double>> with canonical keys.
    """
    zipped = F.arrays_zip(
        F.transform(map_keys, _canon).alias("k"),
        map_values.alias("v"),
        F.transform(value_ts, lambda t: t.cast("double")).alias("ts"),
    )
    now = pvtime.cast("double")
    return F.filter(zipped, lambda p: (now - p["ts"]) <= F.lit(float(timediff)))


def _matches(pairs: Column, key: Column) -> Column:
    kc = _canon(key)
    return F.filter(pairs, lambda p: p["k"] == kc)


def lookup_count(
    map_keys: Column,
    map_values: Column,
    value_ts: Column,
    pvtime: Column,
    keys: Column,
    timediff: float,
    count_cut_threshold: int = -1,
) -> Column:
    """count combiner: per probe key -> #matching pairs in window, clipped.

    keys: array<any>; returns array<double> aligned to the probe keys.
    """
    pairs = _surviving_pairs(map_keys, map_values, value_ts, pvtime, timediff)
    cnt = F.transform(keys, lambda k: F.size(_matches(pairs, k)).cast("double"))
    if count_cut_threshold > 0:
        cnt = F.transform(cnt, lambda c: F.least(c, F.lit(float(count_cut_threshold))))
    return cnt


def lookup_gap(
    map_keys: Column,
    map_values: Column,
    value_ts: Column,
    pvtime: Column,
    keys: Column,
    timediff: float,
    gap: str = "gap_min",
    default_value: float = 0.0,
) -> Column:
    """gap_min / gap_max combiner -> TimeDiffNormal ordinal per probe key.

    Init values per reference: gap_min starts at timediff, gap_max at 0
    (Impl.h:309-318); when no pair matches, the (numeric) default is used
    instead of the encoded bucket (Impl.h:346-356).
    Returns array<double> aligned to the probe keys.
    """
    pairs = _surviving_pairs(map_keys, map_values, value_ts, pvtime, timediff)
    now = pvtime.cast("double")
    init = float(timediff) if gap == "gap_min" else 0.0

    def per_key(k: Column) -> Column:
        hits = _matches(pairs, k)
        gaps = F.transform(hits, lambda p: now - p["ts"])
        best = F.array_min(gaps) if gap == "gap_min" else F.array_max(gaps)
        folded = (
            F.least(best, F.lit(init)) if gap == "gap_min" else F.greatest(best, F.lit(init))
        )
        return F.when(
            F.size(hits) > 0,
            time_diff_normal_expr(folded, now).cast("double"),
        ).otherwise(F.lit(float(default_value)))

    return F.transform(keys, per_key)


def lookup_none_discrete(
    map_keys: Column,
    map_values: Column,
    value_ts: Column,
    pvtime: Column,
    keys: Column,
    timediff: float,
    feature_name: str,
    need_prefix: bool = True,
    default_value: str = "",
    values_are_float: bool = False,
) -> Column:
    """combiner none (timediff path): per probe key emit every matching
    value as a string key, or the default when no match (Impl.h:271-296).

    Returns array<string> (MultiSparse), flattened across probe keys.
    """
    pairs = _surviving_pairs(map_keys, map_values, value_ts, pvtime, timediff)

    def fmt(v: Column) -> Column:
        return fmt_float_0f(v) if values_are_float else v.cast("string")

    def per_key(k: Column) -> Column:
        hits = _matches(pairs, k)
        return F.when(
            F.size(hits) > 0, F.transform(hits, lambda p: fmt(p["v"]))
        ).otherwise(F.array(F.lit(default_value)))

    flat = F.flatten(F.transform(keys, per_key))
    return F.transform(flat, lambda s: with_prefix(s, feature_name, need_prefix))


def lookup_combo_counts(
    map_keys: Column,
    map_values: Column,
    value_ts: Column,
    map2_keys: Column,
    map2_values: Column,
    value2_ts: Column,
    pvtime: Column,
    keys: Column,
    timediff: float,
    feature_name: str,
    need_prefix: bool = True,
    combo_right: bool = True,
    count1_cut: int = -1,
    count2_cut: int = -1,
) -> Column:
    """needCombo path: two histories' counts concatenated ``cnt1_cnt2``
    (order flipped when not combo_right) -> SingleSparse string
    (Impl.h:155-212).
    """
    p1 = _surviving_pairs(map_keys, map_values, value_ts, pvtime, timediff)
    p2 = _surviving_pairs(map2_keys, map2_values, value2_ts, pvtime, timediff)

    def total(pairs: Column) -> Column:
        per = F.transform(keys, lambda k: F.size(_matches(pairs, k)))
        return F.aggregate(per, F.lit(0), lambda a, c: a + c)

    c1, c2 = total(p1), total(p2)
    if count1_cut > 0:
        c1 = F.least(c1, F.lit(count1_cut))
    if count2_cut > 0:
        c2 = F.least(c2, F.lit(count2_cut))
    first, second = (c1, c2) if combo_right else (c2, c1)
    key = F.concat_ws("_", first.cast("string"), second.cast("string"))
    return with_prefix(key, feature_name, need_prefix)


def lookup_combo_simple(
    map_keys: Column,
    map_values: Column,
    value_ts: Column,
    pvtime: Column,
    keys: Column,
    other: Column,
    timediff: float,
    feature_name: str,
    need_prefix: bool = True,
    combo_right: bool = True,
    count1_cut: int = -1,
    count2_cut: int = -1,
    other_is_float: bool = False,
) -> Column:
    """needCombo + comboSimple path: ONE history's windowed match count
    crossed with the ``other`` column's values — per other value emit
    ``prefix_cnt_other`` (flipped when not combo_right) as MultiSparse
    (Impl.h:213-267). count1_cut clips the count; count2_cut caps how
    many other values are crossed (``maxinc``), not their magnitude.

    When no history pair survives the window the reference bails out with
    a null feature (``lookupPairList.empty()`` shares the unsupported-
    combiner error return, Impl.h:227-232) — so we emit NULL, not
    ``0_other`` combos.
    """
    pairs = _surviving_pairs(map_keys, map_values, value_ts, pvtime, timediff)
    per = F.transform(keys, lambda k: F.size(_matches(pairs, k)))
    cnt = F.aggregate(per, F.lit(0), lambda a, c: a + c)
    if count1_cut > 0:
        cnt = F.least(cnt, F.lit(count1_cut))
    vals = F.slice(other, 1, count2_cut) if count2_cut > 0 else other

    def fmt(v: Column) -> Column:
        return fmt_float_0f(v) if other_is_float else v.cast("string")

    def one(v: Column) -> Column:
        first, second = (
            (cnt.cast("string"), fmt(v)) if combo_right else (fmt(v), cnt.cast("string"))
        )
        return with_prefix(
            F.concat_ws("_", first, second), feature_name, need_prefix
        )

    return F.when(F.size(pairs) > 0, F.transform(vals, one))


# ---------------------------------------------------------------- no-timediff


def _lww_map(map_keys: Column, map_values: Column) -> Column:
    """last-write-wins dict from parallel arrays (CONSTRUCT_MAP,
    Impl.h:437-444). Requires spark.sql.mapKeyDedupPolicy=LAST_WIN."""
    return F.map_from_arrays(F.transform(map_keys, _canon), map_values)


def lookup_discrete(
    map_keys: Column,
    map_values: Column,
    keys: Column,
    feature_name: str,
    need_prefix: bool = True,
    has_default: bool = False,
    default_value: str = "",
    values_are_float: bool = False,
) -> Column:
    """no-timediff discrete: per probe key emit dict value; miss -> default
    if has_default else skipped (Impl.h:446-476). Returns array<string>."""
    m = _lww_map(map_keys, map_values)

    def fmt(v: Column) -> Column:
        return fmt_float_0f(v) if values_are_float else v.cast("string")

    probed = F.transform(keys, lambda k: fmt(F.try_element_at(m, _canon(k))))
    if has_default:
        probed = F.transform(probed, lambda v: F.coalesce(v, F.lit(default_value)))
    else:
        probed = F.filter(probed, lambda v: v.isNotNull())
    return F.transform(probed, lambda s: with_prefix(s, feature_name, need_prefix))


def lookup_dense(
    map_keys: Column,
    map_values: Column,
    keys: Column,
    combiner: str = "sum",
    boundaries: Sequence[float] | None = None,
) -> Column:
    """no-timediff dense: combiner-fold probed values (misses skipped,
    empty -> 0), optional upper_bound bucketize -> SingleInteger."""
    m = _lww_map(map_keys, map_values)
    probed = F.transform(keys, lambda k: F.try_element_at(m, _canon(k)).cast("double"))
    combined = combine_array(probed, combiner)
    if boundaries:
        return bucketize_expr(combined, boundaries)
    return combined

"""match_feature — user-profile x item matching.

Reference semantics (``fg_lite/feature/MatchFeatureFunction.cpp:85-241``,
``fg_lite/feature/UserMatchInfo.cpp:21-114``,
``fg_lite/feature/MatchFunctionImpl.cpp``):

The user profile is one string ``cat1^k1:v1,k2:v2|cat2^k3:v3`` parsed into
category -> key -> value. Wildcard ``"ALL"`` on the category side iterates
all categories; on the item side it iterates all keys of the category.
Match types (``MatchFunction::create``, MatchFunction.cpp:19-65):

  hit       single lookup; sparse key ``prefix_cat_item_value``
            (MatchFunctionImpl.cpp:33-51); dense = numeric value normalized
  multihit  all wildcard matches; key = prefix[_cat][_item]_value with
            show_category/show_item flags (MatchFunctionImpl.cpp:105-141)
  cross     user keys of a category x item value:
            ``prefix_cat_key_item`` (MatchFunctionImpl.cpp:203-228)
  cos       integer dot product of item "k:v" list vs user dict, scaled
            ``int(dot / (100*100*matched) * 100)`` (truncated toward zero,
            MatchFunctionImpl.cpp:306-321)

At pipeline level the user side has one row per request — a *broadcast
join* onto item rows (FeatureFunction.cpp:17-32 row()==1 broadcast).

Spark mapping: parse once into map<string,map<string,string>> with
split/str_to_map; probes are element_at chains; wildcards expand with
map_entries + transform; everything stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WILDCARD = "ALL"


def parse_user_info(user: Column) -> Column:
    """``cat^k:v,k:v|cat2^...`` -> map<string, map<string,string>>.

    Tokens are trimmed at every level (StringTokenizer TOKEN_TRIM) and empty
    chunks ignored.
    """
    cats = F.filter(
        F.transform(F.split(user, r"\|"), lambda c: F.trim(c)),
        lambda c: (c != "") & c.contains("^"),
    )
    entries = F.transform(
        cats,
        lambda c: F.struct(
            F.trim(F.split_part(c, F.lit("^"), F.lit(1))).alias("key"),
            _parse_kv(F.split_part(c, F.lit("^"), F.lit(2))).alias("value"),
        ),
    )
    return F.map_from_entries(entries)


def _parse_kv(kvs: Column) -> Column:
    """``k1:v1,k2:v2`` -> map<string,string> with per-token trim."""
    pairs = F.filter(
        F.transform(F.split(kvs, ","), lambda p: F.trim(p)),
        lambda p: p.contains(":"),
    )
    return F.map_from_entries(
        F.transform(
            pairs,
            lambda p: F.struct(
                F.trim(F.split_part(p, F.lit(":"), F.lit(1))).alias("key"),
                F.trim(F.split_part(p, F.lit(":"), F.lit(2))).alias("value"),
            ),
        )
    )


def _categories(user_map: Column, category: Column) -> Column:
    """array of (cat, kvmap) entries selected by category (ALL -> all)."""
    return F.when(
        category == WILDCARD, F.map_entries(user_map)
    ).otherwise(
        F.filter(F.map_entries(user_map), lambda e: e["key"] == category)
    )


def match_hit_sparse(
    user_map: Column, category: Column, item: Column, feature_name: str
) -> Column:
    """hit, sparse: ``prefix_cat_item_value`` for the first matching
    category (reference probes the found/first category only)."""
    cats = _categories(user_map, category)
    first = F.try_element_at(cats, F.lit(1))
    val = F.try_element_at(first["value"], item)
    return F.when(
        val.isNotNull(),
        F.concat_ws("_", F.lit(feature_name), first["key"], item, val),
    )


def match_hit_dense(user_map: Column, category: Column, item: Column) -> Column:
    """hit, dense: matched value as double (null when no match)."""
    cats = _categories(user_map, category)
    first = F.try_element_at(cats, F.lit(1))
    return F.try_element_at(first["value"], item).cast("double")


def match_multihit_sparse(
    user_map: Column,
    category: Column,
    item: Column,
    feature_name: str,
    show_category: bool = True,
    show_item: bool = True,
) -> Column:
    """multihit, sparse: all (cat, item, value) matches with wildcard
    expansion -> array<string> keys prefix[_cat][_item]_value."""
    cats = _categories(user_map, category)

    def per_cat(e: Column) -> Column:
        kvs = F.when(
            item == WILDCARD, F.map_entries(e["value"])
        ).otherwise(
            F.filter(F.map_entries(e["value"]), lambda kv: kv["key"] == item)
        )

        def mk(kv: Column) -> Column:
            parts = [F.lit(feature_name)]
            if show_category:
                parts.append(e["key"])
            if show_item:
                parts.append(kv["key"])
            parts.append(kv["value"])
            return F.concat_ws("_", *parts)

        return F.transform(kvs, mk)

    return F.flatten(F.transform(cats, per_cat))


def match_cross(
    user_map: Column, category: Column, item: Column, feature_name: str
) -> Column:
    """cross: user keys of the category x the item value ->
    array<string> ``prefix_cat_key_item``."""
    cats = _categories(user_map, category)
    return F.flatten(
        F.transform(
            cats,
            lambda e: F.transform(
                F.map_keys(e["value"]),
                lambda k: F.concat_ws("_", F.lit(feature_name), e["key"], k, item),
            ),
        )
    )


def match_hit_weighting(
    user_map: Column, category: Column, item: Column, feature_name: str
) -> Column:
    """hit with needWeighting: struct(key='prefix_cat_item', weight=value)
    (MatchFunctionImpl.cpp:53-75 — key omits the value, weight carries it).
    Null when no match."""
    cats = _categories(user_map, category)
    first = F.try_element_at(cats, F.lit(1))
    val = F.try_element_at(first["value"], item)
    return F.when(
        val.isNotNull(),
        F.struct(
            F.concat_ws("_", F.lit(feature_name), first["key"], item).alias("key"),
            val.cast("double").alias("weight"),
        ),
    )


def match_cos(user_map: Column, category: Column, item_kvs: Column) -> Column:
    """cos: item ``k1:v1,k2:v2`` (int values) dot user values of category,
    scaled int(dot / (100*100*matched) * 100), truncation toward zero.

    Misses contribute value 0 and don't count as matched. Null when the
    category is absent or the item string is empty/invalid.
    """
    cats = _categories(user_map, category)
    first = F.try_element_at(cats, F.lit(1))
    kvmap = first["value"]
    item_map = _parse_kv(item_kvs)
    entries = F.map_entries(item_map)
    matched = F.size(
        F.filter(entries, lambda e: F.try_element_at(kvmap, e["key"]).isNotNull())
    )
    dot = F.aggregate(
        entries,
        F.lit(0).cast("long"),
        lambda acc, e: acc
        + e["value"].cast("long")
        * F.coalesce(F.try_element_at(kvmap, e["key"]).cast("long"), F.lit(0)),
    )
    scaled = (dot.cast("float") / (100 * 100 * matched) * 100).cast("long")
    return F.when((matched > 0) & kvmap.isNotNull(), scaled).otherwise(
        F.when(kvmap.isNotNull() & (F.size(entries) > 0), F.lit(0))
    )

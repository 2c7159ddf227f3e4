"""lookup_feature (V1) — probe a per-row dict encoded as "k:v" strings.

Reference semantics (``fg_lite/feature/LookupFeatureFunction.cpp:13-460``):
the ``map`` input is an array of ``"key:value"`` strings (split on the
first ':', LookupFeatureFunction.cpp:359-369); the ``key`` input supplies
one-or-more probe keys per row. Discrete output emits ``key_value`` string
keys; dense output combines the probed numeric values per the combiner,
then normalizes / bucketizes. ``needWeighting`` emits (key, weight) pairs.
A ``row()==1`` side broadcasts across the document batch — at pipeline
level that's a broadcast join (plans/pipeline.py).

Spark mapping: ``str_to_map(array_join(map_col))`` -> MapType column, then
``element_at`` probes; combine via functions.combiners.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from featuregenerator_spark.functions.bucketize import bucketize_expr
from featuregenerator_spark.functions.combiners import combine_array
from featuregenerator_spark.functions.normalizers import Normalizer, normalize_expr
from featuregenerator_spark.functions.formatting import with_prefix


def kv_array_to_map(map_col: Column) -> Column:
    """array<"k:v" string> -> map<string,string> (last-write-wins)."""
    return F.str_to_map(F.array_join(map_col, ","), F.lit(","), F.lit(":"))


def lookup_v1_discrete(
    map_col: Column,
    keys: Column,
    feature_name: str,
    need_prefix: bool = True,
    has_default: bool = False,
    default_value: str = "",
) -> Column:
    """discrete: per probe key emit ``<key>_<value>`` feature strings.

    Misses: default when has_default else skipped. Returns array<string>.
    """
    m = kv_array_to_map(map_col)
    probed = F.transform(
        keys,
        lambda k: F.when(
            F.try_element_at(m, k.cast("string")).isNotNull(),
            F.concat_ws("_", k.cast("string"), F.try_element_at(m, k.cast("string"))),
        ).otherwise(
            F.concat_ws("_", k.cast("string"), F.lit(default_value))
            if has_default
            else F.lit(None).cast("string")
        ),
    )
    probed = F.filter(probed, lambda v: v.isNotNull())
    return F.transform(probed, lambda s: with_prefix(s, feature_name, need_prefix))


def lookup_v1_dense(
    map_col: Column,
    keys: Column,
    combiner: str = "sum",
    normalizer: Normalizer | None = None,
    boundaries: Sequence[float] | None = None,
    default_value: float | None = None,
) -> Column:
    """dense: combine probed numeric values; optional normalize/bucketize."""
    m = kv_array_to_map(map_col)
    probed = F.transform(
        keys, lambda k: F.try_element_at(m, k.cast("string")).cast("double")
    )
    if default_value is not None:
        probed = F.transform(
            probed, lambda v: F.coalesce(v, F.lit(float(default_value)))
        )
    combined = combine_array(probed, combiner)
    if normalizer is not None:
        combined = normalize_expr(combined, normalizer)
    if boundaries:
        return bucketize_expr(combined, boundaries)
    return combined


def lookup_v1_weighting(
    map_col: Column,
    keys: Column,
    feature_name: str,
    need_prefix: bool = True,
) -> Column:
    """needWeighting: (key, weight) pairs for matched probes.

    Returns array<struct<key:string, weight:double>>.
    """
    m = kv_array_to_map(map_col)
    hits = F.filter(keys, lambda k: F.try_element_at(m, k.cast("string")).isNotNull())
    return F.transform(
        hits,
        lambda k: F.struct(
            with_prefix(k.cast("string"), feature_name, need_prefix).alias("key"),
            F.try_element_at(m, k.cast("string")).cast("double").alias("weight"),
        ),
    )


def lookup_v1_optimized(
    values: Column,
    combiner: str = "sum",
    normalizer=None,
    boundaries=None,
) -> Column:
    """isOptimized path (LookupFeatureFunction.cpp:216-245,378-401): the
    host already joined — the input is the values array itself; no probe,
    just combine -> normalize -> bucketize (same machinery as the dense
    probe path)."""
    from featuregenerator_spark.functions.bucketize import bucketize_expr
    from featuregenerator_spark.functions.combiners import combine_array
    from featuregenerator_spark.functions.normalizers import normalize_expr

    v = combine_array(F.transform(values, lambda x: x.cast("double")), combiner)
    if normalizer is not None:
        v = normalize_expr(v, normalizer)
    if boundaries:
        return bucketize_expr(v, boundaries)
    return v

"""raw_feature — numeric passthrough with normalize / bucketize.

Reference semantics (``fg_lite/feature/RawFeatureFunction.cpp:9-146``):
cast to float; NaN -> 0; apply normalizer; if ``bucketize_boundaries``
emit the upper_bound bucket index (integer) else the float; multi-value
rows keep per-value results (padded to ``value_dimension`` with 0 when
configured).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from featuregenerator_spark.functions.bucketize import bucketize_expr
from featuregenerator_spark.functions.normalizers import Normalizer, normalize_expr


def _clean(x: Column) -> Column:
    d = x.cast("double")
    return F.when(d.isNull() | F.isnan(d), F.lit(0.0)).otherwise(d)


def raw_feature_scalar(
    col: Column,
    normalizer: Normalizer | None = None,
    boundaries: Sequence[float] | None = None,
) -> Column:
    """scalar numeric -> SingleDense (double) or SingleInteger (bucket)."""
    v = _clean(col)
    if normalizer is not None:
        v = normalize_expr(v, normalizer)
    if boundaries:
        return bucketize_expr(v, boundaries)
    return v


def raw_feature_multi(
    col: Column,
    normalizer: Normalizer | None = None,
    boundaries: Sequence[float] | None = None,
    value_dimension: int | None = None,
) -> Column:
    """array<numeric> -> MultiDense (array<double>) / MultiInteger.

    value_dimension pads/truncates each row to a fixed width with 0.0
    (RawFeatureFunction.cpp pads short rows).
    """
    arr = F.transform(col, _clean)
    if value_dimension:
        idx = F.sequence(F.lit(0), F.lit(value_dimension - 1))
        arr = F.transform(
            idx, lambda i: F.coalesce(F.try_element_at(arr, i + 1), F.lit(0.0))
        )
    if normalizer is not None:
        arr = F.transform(arr, lambda v: normalize_expr(v, normalizer))
    if boundaries:
        return F.transform(arr, lambda v: bucketize_expr(v, boundaries))
    return arr

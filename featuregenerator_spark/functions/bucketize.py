"""Exact bucketize (upper_bound) and the TimeDiffNormal recency encoder.

- ``bucketize_expr``: index = ``std::upper_bound(boundaries, value)`` =
  number of boundaries ``<= value`` (right-continuous), per
  ``fg_lite/feature/Normalizer.h:112-117``. Spark ML's Bucketizer is NOT
  identical at boundary points, so this is a plain expression.

- ``time_diff_normal_expr``: the 9-bucket ordinal recency code of
  ``fg_lite/feature/LookupFeatureFunctionArrayImpl.h:15-46``, including the
  quirky first branch: if ``now - gap <= 1e-4`` the code is 0 regardless of
  magnitude (this fires when the matching event sits at/near epoch 0, and
  tests depend on it).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def bucketize_expr(value: Column, boundaries: Sequence[float]) -> Column:
    """upper_bound bucket index as LongType: count of boundaries <= value.

    Boundaries are few (config-supplied), so an unrolled sum of indicator
    expressions stays inside whole-stage codegen — no array allocation.
    """
    if not boundaries:
        return F.lit(0).cast("long")
    acc: Column | None = None
    for b in boundaries:
        ind = F.when(F.lit(float(b)) <= value, F.lit(1)).otherwise(F.lit(0))
        acc = ind if acc is None else acc + ind
    return acc.cast("long")


def default_bucketize_expr(boundaries: Sequence[float]) -> Column:
    """Whole-row default fill: the bucket of value 0 — what the reference
    emits for an entire batch when a feature can't be computed
    (``maybeDefaultBucketize``, FeatureFunction.cpp:38-50)."""
    return bucketize_expr(F.lit(0.0), boundaries)


_MIN = 60.0
_HOUR = 3600.0


def time_diff_normal_expr(gap: Column, now: Column) -> Column:
    """Ordinal bucket 0-8 of a time gap (seconds), TimeDiffNormal law.

    gap≈now -> 0; <=60s -> 1; <5m -> 2; <10m -> 3; <30m -> 4; <1h -> 5;
    <6h -> 6; <12h -> 7; >=12h -> 8.
    """
    g = gap.cast("double")
    return (
        F.when(now.cast("double") - g <= F.lit(0.0001), F.lit(0))
        .when(g <= F.lit(_MIN), F.lit(1))
        .when(g < F.lit(_MIN * 5), F.lit(2))
        .when(g < F.lit(_MIN * 10), F.lit(3))
        .when(g < F.lit(_MIN * 30), F.lit(4))
        .when(g < F.lit(_HOUR), F.lit(5))
        .when(g < F.lit(_HOUR * 6), F.lit(6))
        .when(g < F.lit(_HOUR * 12), F.lit(7))
        .otherwise(F.lit(8))
        .cast("int")
    )

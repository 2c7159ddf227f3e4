"""combo_feature — cartesian product of N columns' values within a row.

Reference semantics (``fg_lite/feature/ComboFeatureFunction.cpp:43-192``):
values joined by ``'_'`` (FEATURE_SEPARATOR, FeatureFunction.h:11), prefix
applies once at the front; per-input prune window keeps the first
``pruneLimit`` values from the left or the last from the right
(``pruneRight``); optional sorted de-dup (``needSort``).

Spark mapping: scalar fast path = one ``concat_ws``; array case = nested
``F.transform`` + ``F.flatten`` per added column (stays in codegen).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _pruned(arr: Column, limit: int | None, from_right: bool) -> Column:
    if not limit:
        return arr
    if from_right:
        # slice with a negative start beyond the array length yields [],
        # but pruneRight on a short input must keep the whole array
        return F.when(F.size(arr) > limit, F.slice(arr, -limit, limit)).otherwise(arr)
    return F.slice(arr, 1, limit)


def combo_feature_scalar(
    cols: list[Column], feature_name: str, need_prefix: bool = True
) -> Column:
    """All-scalar fast path: prefix_v1_v2_..._vN as one concat_ws."""
    parts = [c.cast("string") for c in cols]
    joined = F.concat_ws("_", *parts)
    if need_prefix:
        return F.concat(F.lit(feature_name + "_"), joined)
    return joined


def combo_feature_multi(
    cols: list[Column],
    feature_name: str,
    need_prefix: bool = True,
    prune_limits: list[int | None] | None = None,
    prune_right: list[bool] | None = None,
    need_sort: bool = False,
) -> Column:
    """array<string> columns -> array<string> cartesian concat keys.

    Each input is an array column (wrap scalars with F.array(...) upstream).
    Builds the product left-to-right: acc x next -> flatten.
    """
    n = len(cols)
    prune_limits = prune_limits or [None] * n
    prune_right = prune_right or [False] * n

    acc = F.transform(
        _pruned(cols[0], prune_limits[0], prune_right[0]),
        lambda v: v.cast("string"),
    )
    for i in range(1, n):
        nxt = _pruned(cols[i], prune_limits[i], prune_right[i])
        acc = F.flatten(
            F.transform(
                acc,
                lambda a: F.transform(
                    nxt, lambda b: F.concat_ws("_", a, b.cast("string"))
                ),
            )
        )
    if need_sort:
        acc = F.array_sort(F.array_distinct(acc))
    if need_prefix:
        acc = F.transform(acc, lambda v: F.concat(F.lit(feature_name + "_"), v))
    return acc

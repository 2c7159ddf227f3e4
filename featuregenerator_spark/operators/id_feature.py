"""id_feature — discretize a raw column into string feature keys.

Reference semantics (``fg_lite/feature/IdFeatureFunction.cpp:22-83``):
for each row, for each value of the (possibly multi-valued) input column:
skip invalid values (type sentinel / NaN / per-feature ``invalid_values``
blacklist), format as text, prefix with ``feature_name + '_'`` when
``need_prefix``, keep at most ``prune_to`` values.

Spark mapping: pure array expressions — ``F.slice(F.transform(F.filter))``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from featuregenerator_spark.functions.formatting import (
    drop_invalid,
    fmt_feature,
    with_prefix,
)

_DEFAULT_PRUNE_TO = 5000  # IdFeatureFunction.h: prune cap default


def id_feature_multi(
    col: Column,
    feature_name: str,
    element_type: T.DataType,
    need_prefix: bool = True,
    prune_to: int = _DEFAULT_PRUNE_TO,
    invalid_values: list | None = None,
) -> Column:
    """array<any> column -> array<string> feature keys (MultiSparse)."""
    kept = drop_invalid(col, element_type, invalid_values)
    pruned = F.slice(kept, 1, prune_to)
    return F.transform(
        pruned,
        lambda v: with_prefix(fmt_feature(v, element_type), feature_name, need_prefix),
    )


def id_feature_scalar(
    col: Column,
    feature_name: str,
    element_type: T.DataType,
    need_prefix: bool = True,
    invalid_values: list | None = None,
) -> Column:
    """scalar column -> string feature key (null when invalid/skipped)."""
    arr = id_feature_multi(
        F.array(col), feature_name, element_type, need_prefix, 1, invalid_values
    )
    return F.try_element_at(arr, F.lit(1))

"""Array combiners: mean/avg, sum (default), min, max, count, none.

Scalar fold semantics from ``fg_lite/feature/Combiner.h:43-90``:
empty input => min/max/sum = 0, mean = 0 (guarded by count), count = 0.
``gap_min``/``gap_max`` live in the timediff kernel (operators/lookup_array)
because they need the event timestamps, not just values.

All of these fold a *Spark array column* with ``F.aggregate`` — executed in
the JVM, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

COMBINERS = ("sum", "mean", "avg", "min", "max", "count", "none")


def combine_array(arr: Column, combiner: str = "sum") -> Column:
    """Fold array<numeric> -> double with reference empty-input semantics.

    Nulls inside the array are dropped first (a miss contributes nothing,
    mirroring skipped lookup misses).
    """
    vals = F.filter(arr, lambda v: v.isNotNull())
    n = F.size(vals)
    if combiner == "count":
        return F.when(vals.isNull(), F.lit(0.0)).otherwise(n.cast("double"))
    total = F.aggregate(
        vals, F.lit(0.0), lambda acc, v: acc + v.cast("double")
    )
    if combiner in ("mean", "avg"):
        return F.when(n > 0, total / n).otherwise(F.lit(0.0))
    if combiner == "min":
        return F.coalesce(F.array_min(vals).cast("double"), F.lit(0.0))
    if combiner == "max":
        return F.coalesce(F.array_max(vals).cast("double"), F.lit(0.0))
    # default: sum (unknown combiner strings fold to SUM in the reference)
    return F.coalesce(total, F.lit(0.0))

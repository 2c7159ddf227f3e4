"""Range join: match point rows into interval rows (point-in-interval).

Spark has no native range-join operator: the naive formulation
``points JOIN intervals ON key AND ts BETWEEN lo AND hi`` plans as a
sort-merge/broadcast join on the key alone with the BETWEEN as a
post-join filter — O(points x intervals) pairs per key, which is the
same per-key blowup the skew family exists to kill. The standard scale
fix is TIME BUCKETING: explode each interval into the fixed-width
buckets it covers, bucket the points once, and equijoin on
(key, bucket) — the join then touches only pairs already within one
bucket width of each other, and Catalyst shuffles both sides by the
compound key like any equijoin. Cost: intervals duplicate by
ceil(len/bucket)+1 rows (bounded by ``max_interval_buckets`` — a loud
error beats a silent 10^6-row explode when an interval is malformed);
points never duplicate; exact containment filters after the equijoin.
No dedup pass is needed: each point row lands in exactly ONE bucket
(floor of its own ts), and an interval's exploded buckets are distinct,
so a (point-row, interval-row) pair can meet in at most one bucket —
the join already has plain SQL-join multiplicity, and duplicate rows in
either input are preserved exactly as the naive BETWEEN join would
preserve them.

Pick ``bucket_seconds`` near the typical interval length: much smaller
multiplies the interval explode; much larger lets each bucket pair
distant rows again (degenerating toward the naive join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: float = 3600.0,
    max_interval_buckets: int = 10_000,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row (same ``on`` key) with
    ``start_ts <= point_ts <= end_ts`` (inclusive both ends — the SQL
    BETWEEN contract).

    ``how='inner'`` keeps matched pairs; ``'left'`` also keeps points
    matching no interval (interval columns null). Column sets must be
    disjoint apart from the join key(s)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner or left: {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    b = float(bucket_seconds)

    lo_b = F.floor(F.col(start_ts) / b).cast("long")
    hi_b = F.floor(F.col(end_ts) / b).cast("long")
    n_b = hi_b - lo_b + 1
    guard = F.assert_true(
        (F.col(end_ts) >= F.col(start_ts))
        & (n_b <= F.lit(max_interval_buckets)),
        F.lit(
            "interval_join: interval inverted or covers more than "
            "max_interval_buckets buckets — raise bucket_seconds or fix "
            "the interval data"
        ),
    )
    iv = intervals.withColumn(
        "__bucket",
        F.explode(F.when(guard.isNull(), F.sequence(lo_b, hi_b))),
    )
    pt = points.withColumn(
        "__bucket", F.floor(F.col(point_ts) / b).cast("long")
    )
    cond = (
        (F.col(point_ts) >= F.col(start_ts))
        & (F.col(point_ts) <= F.col(end_ts))
    )
    # no distinct: the point's single bucket meets each exploded interval
    # row at most once, so this already has exact SQL-join multiplicity
    # (a full-row distinct here would silently collapse genuinely
    # duplicated input rows — and cost a shuffle)
    matched = (
        pt.join(iv, keys + ["__bucket"], "inner")
        .filter(cond)
        .drop("__bucket")
    )
    if how == "inner":
        return matched
    # left: anti-join the matched point ids back against all points.
    # Re-derive the unmatched rows from `points` itself so no interval
    # column survives with a phantom value.
    pcols = points.columns
    unmatched = points.join(matched.select(pcols).distinct(), pcols, "left_anti")
    for c in matched.columns:
        if c not in pcols:
            unmatched = unmatched.withColumn(
                c, F.lit(None).cast(dict(matched.dtypes)[c])
            )
    return matched.unionByName(unmatched)

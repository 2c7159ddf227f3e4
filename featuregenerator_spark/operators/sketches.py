"""Distinct-count sketching via deterministic hash-threshold sampling.

A fixed-threshold theta sketch (the KMV/theta family with theta chosen
up front): a key enters the sample iff its uniform md5 draw falls below
``theta``, the sample's distinct count is exact, and the estimate is
``n_sampled / theta``. Standard error is ~1/sqrt(theta * D).

Why this form instead of HLL (Spark's approx_count_distinct) or a
classic k-minimum-values sketch:

- **The filter is map-side and relational.** ``WHERE draw < theta``
  prunes before ANY shuffle, so the distinct aggregation moves a theta
  fraction of the keys — the scale win is shuffle volume, which is the
  actual bottleneck of count-distinct at 100 TB. A fixed-k KMV needs a
  bounded per-group heap, which in pure DataFrame ops degenerates to an
  unbounded collect_set; the fixed-threshold form never holds more than
  one row per sampled key.
- **Deterministic and engine-portable.** The draw is the first 8 hex
  chars of md5(salt || key) compared lexicographically against an
  8-hex-char threshold — the same rule as the mixture resampler
  (operators/sampling.py), identical in Spark and DuckDB, so the sketch
  itself is oracle-checkable exactly (no seed, no RNG, resumable).
- **Mergeable.** Samples union and the estimator is linear, so
  partial sketches from partitions/days merge by plain aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "theta:"


def theta_threshold(theta: float) -> tuple[str, float]:
    """theta -> (8-hex-char threshold, the EXACT sampled fraction).

    The draw space is 16^8 equiprobable strings; the effective theta is
    the rational scaled/16^8, which the estimator must use verbatim so
    Spark and the SQL oracle divide by the same number."""
    if not 0.0 < theta <= 1.0:
        raise ValueError(f"theta must be in (0, 1]: {theta}")
    scaled = int(round(theta * 16**8))
    scaled = max(1, min(scaled, 16**8))
    if scaled == 16**8:
        return "g0000000", 1.0  # > every hex draw: sample everything
    return format(scaled, "08x"), scaled / 16**8


def _draw(key: Column) -> Column:
    return F.substring(
        F.md5(F.encode(F.concat(F.lit(_SALT), key.cast("string")), "UTF-8")),
        1,
        8,
    )


def theta_quantiles(
    df: DataFrame,
    value: str,
    group_cols: list[str],
    probs: list[float],
    row_key: str,
    theta: float = 0.25,
) -> DataFrame:
    """Per-group quantile estimates from the deterministic hash sample.

    Rows whose ``row_key`` draw falls below theta form the sample (the
    SAMPLE is the mergeable object: a union of per-partition/per-day
    samples is exactly the sample of the union, so sketches compose
    across ingest batches); quantiles are computed exactly over the
    sample with linear interpolation — Spark ``percentile`` and DuckDB
    ``quantile_cont`` agree bit-for-bit, so the estimate itself is
    engine-portable. The full-data exact quantile needs a per-group sort
    of EVERY row; the sample cuts that sort (and the shuffle feeding it)
    to ~theta of the data for a ~1/sqrt(theta*n) relative rank error.

    Returns group_cols + ``n_sampled`` + one ``q_<prob>`` column per
    requested probability."""
    thresh, _ = theta_threshold(theta)
    sampled = df.filter(_draw(F.col(row_key)) < F.lit(thresh))
    aggs = [F.count(F.lit(1)).alias("n_sampled")] + [
        F.percentile(value, F.lit(p)).alias(f"q_{str(p).replace('.', '_')}")
        for p in probs
    ]
    return sampled.groupBy(*group_cols).agg(*aggs)


def theta_distinct(
    df: DataFrame,
    key: str,
    group_cols: list[str],
    theta: float = 0.25,
) -> DataFrame:
    """Per-group estimated distinct ``key`` count.

    Returns group_cols + ``n_sampled`` (exact distinct keys below the
    threshold) + ``est_distinct`` (n_sampled / effective theta, rounded
    to 6). The threshold filter sits before the distinct shuffle, so
    the plan moves ~theta of the key space."""
    thresh, eff = theta_threshold(theta)
    sampled = df.filter(_draw(F.col(key)) < F.lit(thresh))
    return (
        sampled.groupBy(*group_cols)
        .agg(F.countDistinct(key).alias("n_sampled"))
        .select(
            *group_cols,
            "n_sampled",
            F.round(F.col("n_sampled") / F.lit(eff), 6).alias("est_distinct"),
        )
    )

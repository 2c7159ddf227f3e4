"""Partitioning & skew strategy.

north_rule: partition by ``hash(conv_id)`` with salted repartitioning for
skewed mega-conversations; range-sort by (conv_id, turn_idx, ts) within
partitions so as-of semantics never read future turns.

Skew mitigation is layered:

  1. conversation-LEVEL aggregates (counts, session stats) use salted
     two-phase aggregation (``salted_agg``) so one hot conv_id spreads
     over ``n_salts`` reducers before the final merge;
  2. turn-level range windows keep O(1) frame state (rangeBetween), so a
     mega-conversation costs linear time, not linear *memory*;
  3. AQE skew-join splitting is enabled in session.py for the join paths;
  4. the windows themselves ARE salted for mega-conversations — but by
     TIME, not randomly: every flagship window feature reads a bounded
     history horizon, so ``plans/skew.py`` re-partitions hot
     conversations on (conv_id, time_chunk) with a halo copy of the
     previous horizon, feature-for-feature equal to the serial path
     (its one prefix feature, session_idx, is restored by a tiny
     second-pass offset join).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from featuregenerator_spark.plans.temporal import CONV, TS_SEC, TURN


def repartition_for_windows(
    df: DataFrame,
    num_partitions: int | None = None,
    conv: str = CONV,
    order_by: Sequence[str] = (TURN, TS_SEC),
) -> DataFrame:
    """hash(conv_id) repartition + in-partition sort.

    Subsequent windows partitioned by conv_id reuse this exchange (no
    second shuffle) and skip the sort when ordering matches.
    """
    parts = (
        df.repartition(num_partitions, F.col(conv))
        if num_partitions
        else df.repartition(F.col(conv))
    )
    return parts.sortWithinPartitions(conv, *order_by)


def with_salt(df: DataFrame, n_salts: int, cols: Sequence[str] = (TURN,)) -> DataFrame:
    """Deterministic salt 0..n_salts-1 from non-key columns (stable across
    retries — NOT rand(), which breaks task re-execution idempotency)."""
    return df.withColumn("__salt", F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(n_salts)))


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_cols: Sequence[str] = (TURN,),
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    aggs: out_name -> (input_col, fn) with fn in sum|count|min|max.
    Phase 1 aggregates on (key, salt); phase 2 merges partials on key.
    count merges by summing partial counts.
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    partial_exprs = []
    final_exprs = []
    for out, (col, fn) in aggs.items():
        part = f"__p_{out}"
        if fn == "count":
            partial_exprs.append(F.count(col).alias(part))
        else:
            partial_exprs.append(getattr(F, fn)(col).alias(part))
        final_exprs.append(getattr(F, merge_fn[fn])(part).alias(out))
    salted = with_salt(df, n_salts, salt_cols)
    partial = salted.groupBy(key, "__salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Capture .explain output for plan assertions in tests/bench."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )

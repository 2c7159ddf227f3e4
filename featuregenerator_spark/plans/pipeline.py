"""FeaturePipeline — the flagship turn-feature program.

Composes the temporal lifts + kernels into one declarative DataFrame
program over a transcripts table (the north-star workload):

  1. repartition by hash(conv_id), sort (conv_id, turn_idx, ts);
  2. turn-level scalar kernels (id_feature on role/tool, raw_feature on
     text length) — pure projections;
  3. temporal features: gap-to-previous-turn + TimeDiffNormal bucket,
     rolling counts over trailing windows (1h / 24h), time-since-last
     tool call (gap_min lift), sessionization;
  4. optional as-of join to the latest prior feature snapshot (backfill).

Everything is one Catalyst plan: a single shuffle on conv_id feeds every
window stage (same partitioning reused), the snapshot as-of join adds one
more shuffle of the (small) snapshot side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featuregenerator_spark.operators.id_feature import id_feature_scalar
from featuregenerator_spark.plans import temporal
from featuregenerator_spark.plans.partitioning import repartition_for_windows

from pyspark.sql import types as T


def _turn_feature_stages(
    df: DataFrame,
    conv,
    order_by,
    rolling_windows: tuple[float, ...],
    tool_gap_timediff: float,
    gap_horizon_seconds: float | None,
) -> DataFrame:
    """Every per-turn feature stage EXCEPT sessionization, parameterized
    by the window partition key — ``conv_id`` on the standard path,
    ``(conv_id, time_chunk)`` on the skew-parallel path (plans/skew.py).
    All stages read at most max(rolling_windows, tool_gap_timediff)
    seconds of history, which is what makes the chunked evaluation exact.
    """
    # --- scalar kernels (id_feature / raw_feature semantics) -------------
    df = df.withColumn(
        "role_id", id_feature_scalar(F.col("role"), "role", T.StringType())
    )
    df = df.withColumn(
        "tool_id",
        F.coalesce(
            id_feature_scalar(F.col("tool"), "tool", T.StringType()),
            F.lit("tool_none"),
        ),
    )
    df = df.withColumn("text_len", F.length("text").cast("double"))
    df = df.withColumn(
        "text_len_log", F.when(F.col("text_len") > 0, F.log10("text_len")).otherwise(0.0)
    )

    # --- temporal lifts ---------------------------------------------------
    df = temporal.with_gap(df, conv=conv, order_by=order_by)
    df = df.withColumn("gap_bucket", F.coalesce(F.col("gap_bucket"), F.lit(8)))
    if gap_horizon_seconds is not None:
        df = df.withColumn(
            "gap_seconds",
            F.when(
                F.col("gap_seconds") <= float(gap_horizon_seconds),
                F.col("gap_seconds"),
            ),
        )
    for w_s in rolling_windows:
        tag = f"{int(w_s)}s"
        df = temporal.with_rolling_count(
            df, w_s, f"turns_prior_{tag}", conv=conv, include_current=False
        )
        df = temporal.with_rolling_count(
            df,
            w_s,
            f"tool_calls_prior_{tag}",
            conv=conv,
            predicate=F.col("role") == "tool",
            include_current=False,
        )
    df = temporal.with_rolling_agg(
        df, rolling_windows[0], F.col("text_len"), "avg", "avg_text_len_w0", conv=conv
    )
    df = temporal.with_gap_since_match(
        df,
        F.col("role") == "tool",
        tool_gap_timediff,
        "since_tool_bucket",
        gap="gap_min",
        default_value=0.0,
        conv=conv,
    )
    return df


def build_turn_features(
    transcripts: DataFrame,
    rolling_windows: tuple[float, ...] = (3600.0, 86400.0),
    session_gap: float = 1800.0,
    tool_gap_timediff: float = 86400.0,
    snapshots: DataFrame | None = None,
    num_partitions: int | None = None,
    gap_horizon_seconds: float | None = None,
    snapshot_hot_threshold: int = 1_000_000,
) -> DataFrame:
    """transcripts -> per-turn feature DataFrame (the flagship query).

    gap_horizon_seconds: when set, ``gap_seconds`` is defined as
    horizon-limited — null whenever the previous turn is further back
    than the horizon. This is the contract that makes day-chunked runs
    (which scan only ``lookback`` days of history) byte-identical to
    one-shot runs for idle conversations; ``gap_bucket`` is unaffected
    because any gap beyond 43200s buckets to 8, the same value the
    null -> 8 coalesce yields (hence the >= 43200 requirement).
    """
    if gap_horizon_seconds is not None and gap_horizon_seconds < 43200:
        raise ValueError("gap_horizon_seconds must be >= 43200 (TimeDiffNormal top bucket)")
    df = temporal.with_ts_seconds(transcripts)
    # sort order chosen to match the window stages below (one shared sort)
    df = repartition_for_windows(
        df, num_partitions, order_by=(temporal.TS_SEC, temporal.TURN)
    )

    # One sort serves every window stage: ordering (ts_sec, turn_idx) is
    # the as-of order (time first, stable turn tiebreak); the range-frame
    # windows need only the (conv_id, ts_sec) prefix of it, so Catalyst
    # plans a single Sort after the single conv_id Exchange instead of
    # re-sorting between row-frame and range-frame stages. On well-formed
    # transcripts (ts non-decreasing per conv) this is identical to
    # (turn_idx, ts) ordering; under dirty timestamps it is the ordering
    # that keeps point-in-time semantics (never read the future).
    order_by = (temporal.TS_SEC, temporal.TURN)
    df = _turn_feature_stages(
        df, temporal.CONV, order_by, rolling_windows, tool_gap_timediff,
        gap_horizon_seconds,
    )
    df = temporal.sessionize(df, session_gap, order_by=order_by)

    # --- as-of snapshot backfill -----------------------------------------
    if snapshots is not None:
        # heavy-hitter-routed: a mega-conversation's snapshot join would
        # otherwise run as ONE linear-scan task (the as-of window is
        # partitioned by conv_id); keys above snapshot_hot_threshold rows
        # take the (conv, time_chunk) skew-parallel form instead
        # (plans/skew.py:asof_join_auto — exact, gate-proven)
        from featuregenerator_spark.plans.skew import asof_join_auto

        df = asof_join_auto(
            df,
            snapshots,
            on="conv_id",
            left_ts="ts_sec",
            right_ts="snap_ts",
            value_cols=["feature_state"],
            strict=True,
            hot_rows_threshold=snapshot_hot_threshold,
        )
    return df


FEATURE_COLUMNS = [
    "conv_id",
    "turn_idx",
    "ts",
    "role_id",
    "tool_id",
    "text_len",
    "text_len_log",
    "gap_seconds",
    "gap_bucket",
    "turns_prior_3600s",
    "tool_calls_prior_3600s",
    "turns_prior_86400s",
    "tool_calls_prior_86400s",
    "avg_text_len_w0",
    "since_tool_bucket",
    "session_idx",
    "session_id",
]

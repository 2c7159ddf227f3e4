"""Time-chunked window evaluation for skewed mega-conversations.

Window functions partitioned by ``conv_id`` place a whole conversation
in ONE task: a conversation holding 10% of all turns serializes 10% of
the stage no matter how many executors exist (Amdahl) — the remaining
skew in the flagship bench (`skew_slowdown_ratio` ~2 at a 10%-hot key).

Every flagship window feature reads a BOUNDED time horizon of history:
rolling counts/aggs over <= 86400 s range frames, gap-since-match with
``timediff``, and — under the pipeline's documented
``gap_horizon_seconds`` contract — the gap/session-boundary features
too. So a mega-conversation can be split into TIME CHUNKS of
``chunk_span >= horizon`` seconds and each chunk evaluated
independently, provided it also sees a read-only HALO copy of the
previous ``horizon`` seconds of rows (each row is duplicated into at
most one later chunk). This is the north rule's "salted repartitioning
for skewed mega-conversations": the window partition key becomes
``(conv_id, chunk)`` — a deterministic time-salt — and the hot
conversation spreads over ``time_range / chunk_span`` tasks.

The one prefix-dependent feature (``session_idx``: a cumulative count
of session boundaries from the conversation start) is restored with a
second, TINY aggregation pass: per-chunk boundary totals (one row per
(conv, chunk)) -> exclusive prefix sum per conversation over the chunk
sequence -> broadcast-joined back onto the turns. Total extra cost is
one narrow shuffle of #chunks rows.

Exactness (pinned in tests/test_skew.py and by the driver's DuckDB
oracle on the ``*_chunked`` queries, which reuse the standard queries'
oracle SQL verbatim):

- range frames ``[t - w, t]`` with ``w <= horizon``: a body row at
  ``t >= chunk_start`` needs history back to ``t - w >= chunk_start -
  horizon`` — exactly what the halo guarantees;
- ``lag``-based gap/session boundaries: if the true previous row is
  inside the halo it IS the in-partition lag; if it is older than
  ``horizon``, the in-partition lag is null and the true gap exceeds
  ``horizon`` — the ``gap_horizon_seconds`` contract (gap -> null,
  bucket -> 8, session boundary -> 1) makes both paths emit the same
  value, which is why the chunked builder runs the stages with
  ``gap_horizon_seconds = horizon`` and is defined as equal to
  ``build_turn_features(..., gap_horizon_seconds=horizon)``;
- gap-since-match: the anchor (latest prior matching turn) only
  matters within ``timediff <= horizon`` of the current row — any
  match the halo cannot see yields the default on both paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from featuregenerator_spark.plans import temporal
from featuregenerator_spark.plans.pipeline import _turn_feature_stages

CHUNK = "__chunk"
HALO = "__halo"


def with_time_chunks(
    df: DataFrame,
    chunk_span: float,
    horizon: float,
    ts_sec: str = temporal.TS_SEC,
) -> DataFrame:
    """Assign each row its time chunk and add halo copies.

    Body rows get ``__chunk = floor(ts / chunk_span)``, ``__halo =
    false``. Rows within ``horizon`` of the next chunk boundary are
    additionally emitted into the NEXT chunk with ``__halo = true`` —
    read-only history for that chunk's windows, dropped from the output.
    ``chunk_span >= horizon`` keeps the duplication factor <= 2 (default
    span of 2x horizon -> 1.5x worst case); both are pure projections,
    no window needed to chunk.
    """
    if chunk_span < horizon:
        raise ValueError(
            f"chunk_span ({chunk_span}) must be >= horizon ({horizon}): "
            "a row may only halo into the immediately following chunk"
        )
    chunk = F.floor(F.col(ts_sec) / F.lit(float(chunk_span))).cast("long")
    # ONE scan: explode each row into its 1-or-2 (chunk, halo) assignments
    # instead of unioning a body subtree with a filtered halo subtree
    # (which would read the source twice — 2x scan cost at 100 TB).
    in_halo_band = (
        F.col(ts_sec)
        >= (chunk + 1).cast("double") * F.lit(float(chunk_span)) - F.lit(float(horizon))
    )
    body_a = F.struct(chunk.alias("c"), F.lit(False).alias("h"))
    halo_a = F.struct((chunk + 1).alias("c"), F.lit(True).alias("h"))
    assigns = F.when(in_halo_band, F.array(body_a, halo_a)).otherwise(
        F.array(body_a)
    )
    df = df.withColumn("__a", F.explode(assigns))
    return (
        df.withColumn(CHUNK, F.col("__a.c"))
        .withColumn(HALO, F.col("__a.h"))
        .drop("__a")
    )


def sessionize_chunked(
    df: DataFrame,
    gap_seconds: float,
    conv: str = temporal.CONV,
    ts_sec: str = temporal.TS_SEC,
    order_by=(temporal.TURN, temporal.TS_SEC),
    out: str = "session_id",
) -> DataFrame:
    """Two-pass sessionization over (conv, chunk) partitions.

    Pass 1 (wide, parallel): per-chunk boundary flags — the in-partition
    lag sees the true previous row via the halo, or is null when the
    true gap exceeds the horizon (> gap_seconds either way -> boundary).
    Local cumulative boundary count runs over BODY rows only (halo rows
    contribute 0; they are counted by their own chunk).

    Pass 2 (tiny): per-(conv, chunk) boundary totals -> exclusive prefix
    per conv -> broadcast join back; session_idx = local + offset.

    Input must carry CHUNK/HALO (from :func:`with_time_chunks`); halo
    rows are dropped from the output.
    """
    key = [conv, CHUNK]
    w = Window.partitionBy(*key).orderBy(*order_by)
    gap = F.col(ts_sec) - F.lag(ts_sec).over(w)
    boundary = F.when(
        (gap.isNull() | (gap > gap_seconds)) & ~F.col(HALO), 1
    ).otherwise(0)
    df = df.withColumn("__b", boundary)
    local = F.sum("__b").over(w.rowsBetween(Window.unboundedPreceding, 0))
    df = df.withColumn("__local", local).filter(~F.col(HALO))

    totals = df.groupBy(conv, CHUNK).agg(F.sum("__b").alias("__bt"))
    w_conv = (
        Window.partitionBy(conv)
        .orderBy(CHUNK)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        conv,
        CHUNK,
        F.coalesce(F.sum("__bt").over(w_conv), F.lit(0)).alias("__off"),
    )
    df = df.join(F.broadcast(offsets), key)
    idx = (F.col("__local") + F.col("__off")).cast("long")
    return (
        df.withColumn("session_idx", idx)
        .withColumn(out, F.concat_ws("#", F.col(conv), idx.cast("string")))
        .drop("__b", "__local", "__off")
    )


def asof_join_chunked(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols,
    strict: bool = False,
    tolerance: float | None = None,
    chunk_span_seconds: float = 86400.0,
) -> DataFrame:
    """Skew-parallel as-of join: same semantics as
    :func:`temporal.asof_join` but the one key-partitioned linear scan —
    which serializes a mega-key — becomes (key, time_chunk) partitions
    plus a per-key prefix pass over per-chunk summaries (the classic
    two-level scan). Unlike the windowed features this needs NO horizon:
    the carry is exact for ANY chunk span, so the span is purely a
    load-balancing knob.

    Pass 1 (wide): within (key, chunk) ordered by (ts, side), windowed
    last(ignorenulls) fills each left row from rights in its own chunk;
    one max_by per value column summarizes the chunk's last non-null
    right value (per-column independent — exactly the standard path's
    per-column last(ignorenulls) semantics).
    Pass 2 (tiny, one row per (key, chunk)): last(ignorenulls) over the
    chunk sequence yields the carry from all earlier chunks; broadcast-
    joined back, each left row takes coalesce(local, carry).
    """
    from featuregenerator_spark.plans.temporal import _asof_project, _asof_union

    unioned, lcols, left_rank = _asof_union(
        left, right, on, left_ts, right_ts, value_cols, strict
    )
    span = float(chunk_span_seconds)
    # null-ts rows sort first in the standard path ("-infinity"); the
    # sentinel chunk reproduces that: it precedes every real chunk, so a
    # null-ts right row carries into all of them.
    chunk = F.coalesce(
        F.floor(F.col("__t") / F.lit(span)).cast("long"), F.lit(-(2**62))
    )
    df = unioned.withColumn(CHUNK, chunk)

    w = (
        Window.partitionBy(on, CHUNK)
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    locals_ = {c: F.last(f"__r_{c}", ignorenulls=True).over(w) for c in value_cols}
    local_rt = F.last("__rt", ignorenulls=True).over(w)

    def _chunk_last(col: str):
        # last non-null value of `col` in the chunk by (ts, side) order;
        # ties between right rows at one ts are arbitrary in the standard
        # path too (its window sort is tie-arbitrary)
        return F.max_by(
            F.col(col), F.when(F.col(col).isNotNull(), F.struct("__t", "__side"))
        )

    summaries = df.groupBy(on, CHUNK).agg(
        _chunk_last("__rt").alias("__s_rt"),
        *[_chunk_last(f"__r_{c}").alias(f"__s_{c}") for c in value_cols],
    )
    w_chunks = (
        Window.partitionBy(on)
        .orderBy(CHUNK)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summaries.select(
        on,
        CHUNK,
        F.last("__s_rt", ignorenulls=True).over(w_chunks).alias("__c_rt"),
        *[
            F.last(f"__s_{c}", ignorenulls=True).over(w_chunks).alias(f"__c_{c}")
            for c in value_cols
        ],
    )

    filled = df.select(
        *[F.col(c) for c in lcols if c != on],
        F.col(on),
        CHUNK,
        F.col("__t"),
        F.col("__side"),
        local_rt.alias("__l_rt"),
        *[locals_[c].alias(f"__l_{c}") for c in value_cols],
    ).filter(F.col("__side") == left_rank)
    # no broadcast hint: carry is one row per (key, chunk) — tiny for the
    # routed-hot subset this is built for, and AQE broadcasts it while it
    # fits; beyond that the sort-merge join reuses filled's (key, chunk)
    # hash partitioning, so only the carry side shuffles.
    out = (
        filled.join(carry, [on, CHUNK])
        .select(
            *[F.col(c) for c in lcols],
            F.col("__t"),
            F.coalesce("__l_rt", "__c_rt").alias("__asof_ts"),
            *[
                F.coalesce(f"__l_{c}", f"__c_{c}").alias(c)
                for c in value_cols
            ],
        )
    )
    return _asof_project(out, lcols, value_cols, tolerance)


def backfill_chunked(
    df: DataFrame,
    cols,
    conv: str = temporal.CONV,
    ts_sec: str = temporal.TS_SEC,
    order_by=(temporal.TS_SEC, temporal.TURN),
    chunk_span_seconds: float = 86400.0,
) -> DataFrame:
    """Skew-parallel forward-fill: same semantics as
    :func:`temporal.backfill` via per-chunk local fill + per-key prefix
    carry (same two-level scan as :func:`asof_join_chunked`; exact for
    any span). Requires a TIME-MAJOR fill order (first order key is the
    timestamp) so time chunks are prefix-aligned with the fill order —
    same-ts ties always land in one chunk, so tiebreak keys are safe.
    """
    if order_by[0] not in (ts_sec, temporal.TS):
        raise ValueError(
            "backfill_chunked needs a time-major order (first order key "
            f"must be the timestamp; got {order_by[0]!r})"
        )
    span = float(chunk_span_seconds)
    chunk = F.coalesce(
        F.floor(F.col(ts_sec) / F.lit(span)).cast("long"), F.lit(-(2**62))
    )
    df = df.withColumn(CHUNK, chunk)
    w = (
        Window.partitionBy(conv, CHUNK)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    summaries = df.groupBy(conv, CHUNK).agg(
        *[
            F.max_by(
                F.col(c), F.when(F.col(c).isNotNull(), F.struct(*order_by))
            ).alias(f"__s_{c}")
            for c in cols
        ]
    )
    w_chunks = (
        Window.partitionBy(conv)
        .orderBy(CHUNK)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = summaries.select(
        conv,
        CHUNK,
        *[
            F.last(f"__s_{c}", ignorenulls=True).over(w_chunks).alias(f"__c_{c}")
            for c in cols
        ],
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    out = out.join(carry, [conv, CHUNK])
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"__c_{c}")))
    return out.drop(CHUNK, *[f"__c_{c}" for c in cols])


def build_turn_features_chunked(
    transcripts: DataFrame,
    rolling_windows: tuple[float, ...] = (3600.0, 86400.0),
    session_gap: float = 1800.0,
    tool_gap_timediff: float = 86400.0,
    chunk_span_seconds: float | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Skew-parallel flagship: feature-for-feature equal to
    ``build_turn_features(..., gap_horizon_seconds=horizon)`` where
    ``horizon = max(rolling_windows, tool_gap_timediff, session_gap,
    43200)``, but windows partition on (conv_id, time_chunk) so one
    mega-conversation spreads across the cluster instead of one task.
    """
    horizon = max(*rolling_windows, tool_gap_timediff, session_gap, 43200.0)
    span = float(chunk_span_seconds) if chunk_span_seconds else 2.0 * horizon
    df = temporal.with_ts_seconds(transcripts)
    df = with_time_chunks(df, span, horizon)
    key = [temporal.CONV, CHUNK]
    parts = (
        df.repartition(num_partitions, *key)
        if num_partitions
        else df.repartition(*key)
    )
    order_by = (temporal.TS_SEC, temporal.TURN)
    df = parts.sortWithinPartitions(*key, *order_by)
    df = _turn_feature_stages(
        df, key, order_by, rolling_windows, tool_gap_timediff,
        gap_horizon_seconds=horizon,
    )
    df = sessionize_chunked(df, session_gap, order_by=order_by)
    return df.drop(CHUNK, HALO)


def _hot_keys(df: DataFrame, key, hot_rows_threshold: int) -> DataFrame:
    """Keys with more rows than the threshold — one map-side-partial
    count, the result stays distributed (joined back broadcast-semi/anti,
    never collected)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > int(hot_rows_threshold))
        .select(key)
    )


def asof_join_auto(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols,
    strict: bool = False,
    tolerance: float | None = None,
    hot_rows_threshold: int = 1_000_000,
    chunk_span_seconds: float = 86400.0,
) -> DataFrame:
    """Heavy-hitter-routed as-of join: keys whose combined (left + right)
    row count exceeds ``hot_rows_threshold`` take the skew-parallel
    chunked path (:func:`asof_join_chunked`), everything else the
    standard one-linear-scan-per-key path (:func:`temporal.asof_join`);
    the two results union. As-of semantics are strictly per-key, so
    splitting the key space is exact — pinned by the driver's
    ``asof_snapshot_auto`` query, whose DuckDB oracle is the standard
    as-of query's SQL verbatim at a threshold that exercises BOTH
    branches.

    The default threshold (1M rows in one key's scan) marks the point
    where a single task's linear scan — tens of seconds — dominates a
    stage; below it the serial form is cheaper (no summary/carry pass).
    """
    hot = _hot_keys(
        left.select(F.col(on)).unionByName(right.select(F.col(on))),
        on,
        hot_rows_threshold,
    )
    cold = temporal.asof_join(
        left.join(F.broadcast(hot), on, "left_anti"),
        right.join(F.broadcast(hot), on, "left_anti"),
        on,
        left_ts,
        right_ts,
        value_cols,
        strict,
        tolerance,
    )
    hot_res = asof_join_chunked(
        left.join(F.broadcast(hot), on, "left_semi"),
        right.join(F.broadcast(hot), on, "left_semi"),
        on,
        left_ts,
        right_ts,
        value_cols,
        strict,
        tolerance,
        chunk_span_seconds,
    )
    return cold.unionByName(hot_res)


def backfill_auto(
    df: DataFrame,
    cols,
    conv: str = temporal.CONV,
    ts_sec: str = temporal.TS_SEC,
    order_by=(temporal.TS_SEC, temporal.TURN),
    hot_rows_threshold: int = 1_000_000,
    chunk_span_seconds: float = 86400.0,
) -> DataFrame:
    """Heavy-hitter-routed forward-fill: hot keys go through
    :func:`backfill_chunked`, cold keys through :func:`temporal.backfill`
    (both with the same time-major order, which the chunked form
    requires); exact by per-key decomposition. Driver-pinned via
    ``backfill_purchase_auto`` (oracle SQL = the standard backfill
    query's text verbatim)."""
    hot = _hot_keys(df, conv, hot_rows_threshold)
    cold = temporal.backfill(
        df.join(F.broadcast(hot), conv, "left_anti"),
        cols,
        conv=conv,
        order_by=order_by,
    )
    hot_res = backfill_chunked(
        df.join(F.broadcast(hot), conv, "left_semi"),
        cols,
        conv=conv,
        ts_sec=ts_sec,
        order_by=order_by,
        chunk_span_seconds=chunk_span_seconds,
    )
    return cold.unionByName(hot_res)


def build_turn_features_auto(
    transcripts: DataFrame,
    hot_turns_threshold: int = 1_000_000,
    rolling_windows: tuple[float, ...] = (3600.0, 86400.0),
    session_gap: float = 1800.0,
    tool_gap_timediff: float = 86400.0,
    chunk_span_seconds: float | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Route conversations by size: heavy hitters (more turns than
    ``hot_turns_threshold``) take the chunked path, everything else the
    standard single-partition-per-conv path; results union to one
    DataFrame. Detection is one map-side-partial count per conv_id; the
    hot set is joined back (broadcast semi/anti), never collected.

    Both branches run with ``gap_horizon_seconds = horizon`` so the
    union is feature-for-feature uniform (the documented chunk-safe gap
    contract).
    """
    from featuregenerator_spark.plans.pipeline import (
        FEATURE_COLUMNS,
        build_turn_features,
    )

    horizon = max(*rolling_windows, tool_gap_timediff, session_gap, 43200.0)
    hot = (
        transcripts.groupBy(temporal.CONV)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > hot_turns_threshold)
        .select(temporal.CONV)
    )
    cold_t = transcripts.join(F.broadcast(hot), temporal.CONV, "left_anti")
    hot_t = transcripts.join(F.broadcast(hot), temporal.CONV, "left_semi")
    cold = build_turn_features(
        cold_t,
        rolling_windows=rolling_windows,
        session_gap=session_gap,
        tool_gap_timediff=tool_gap_timediff,
        num_partitions=num_partitions,
        gap_horizon_seconds=horizon,
    ).select(*FEATURE_COLUMNS)
    hot_f = build_turn_features_chunked(
        hot_t,
        rolling_windows=rolling_windows,
        session_gap=session_gap,
        tool_gap_timediff=tool_gap_timediff,
        chunk_span_seconds=chunk_span_seconds,
        num_partitions=num_partitions,
    ).select(*FEATURE_COLUMNS)
    return cold.unionByName(hot_f)

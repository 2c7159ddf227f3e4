"""Temporal operators over transcript tables — the point-in-time core.

These are the *pipeline lifts* of the reference's timediff lookup kernel
(``fg_lite/feature/LookupFeatureFunctionArrayImpl.h:48-503``; SURVEY.md
§3.2): instead of probing per-row history arrays, we sort within
``hash(conv_id)`` partitions by ``(conv_id, turn_idx, ts)`` and use range
windows / windowed last() — never referencing rows with ``ts > pv_ts``
(zero temporal leakage by construction of the frame bounds).

All functions take and return DataFrames; all expressions are built-ins
(window functions run in the JVM with linear state for range frames).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from featuregenerator_spark.functions.bucketize import time_diff_normal_expr

CONV = "conv_id"
TS = "ts"
TURN = "turn_idx"
TS_SEC = "ts_sec"


def with_ts_seconds(df: DataFrame, ts_col: str = TS, out: str = TS_SEC) -> DataFrame:
    """Add epoch-seconds double column (range windows need numeric order).

    Handles both TIMESTAMP and TIMESTAMP_NTZ inputs (the latter can't cast
    straight to double); with the session TZ pinned to UTC both yield the
    same epoch value.
    """
    return df.withColumn(
        out, F.col(ts_col).cast("timestamp").cast("double")
    )


def _parts(conv: str | Sequence[str]) -> list[str]:
    """Window partition key: a conversation (str) or a composite such as
    (conv_id, time_chunk) for the skew-parallel path (plans/skew.py)."""
    return [conv] if isinstance(conv, str) else list(conv)


def _order_window(conv: str | Sequence[str], order_cols: Sequence[str]):
    return Window.partitionBy(*_parts(conv)).orderBy(*order_cols)


def with_lag_lead(
    df: DataFrame,
    cols: Sequence[str],
    conv: str = CONV,
    order_by: Sequence[str] = (TURN, TS_SEC),
    offsets: Sequence[int] = (1,),
) -> DataFrame:
    """lag/lead features for the given columns (adjacent-turn features)."""
    w = _order_window(conv, order_by)
    for c in cols:
        for k in offsets:
            df = df.withColumn(f"{c}_lag{k}", F.lag(c, k).over(w))
            df = df.withColumn(f"{c}_lead{k}", F.lead(c, k).over(w))
    return df


def with_gap(
    df: DataFrame,
    conv: str = CONV,
    ts_sec: str = TS_SEC,
    order_by: Sequence[str] = (TURN, TS_SEC),
    bucketize: bool = True,
) -> DataFrame:
    """Seconds since previous turn + TimeDiffNormal recency bucket.

    ``gap_seconds`` is null on the first turn of a conversation (the
    reference emits the default value there; callers coalesce).
    """
    w = _order_window(conv, order_by)
    df = df.withColumn("gap_seconds", F.col(ts_sec) - F.lag(ts_sec).over(w))
    if bucketize:
        df = df.withColumn(
            "gap_bucket",
            F.when(
                F.col("gap_seconds").isNotNull(),
                time_diff_normal_expr(F.col("gap_seconds"), F.col(ts_sec)),
            ),
        )
    return df


def with_rolling_count(
    df: DataFrame,
    window_seconds: float,
    out: str,
    conv: str = CONV,
    ts_sec: str = TS_SEC,
    predicate: Column | None = None,
    include_current: bool = False,
    count_cut_threshold: int = -1,
) -> DataFrame:
    """Rolling count of (matching) turns within the trailing time window.

    Kernel parity: ``combiner2=count`` with ``timediff=window_seconds`` —
    #events with ``pv_ts - ts <= timediff`` matching the predicate,
    clipped at count_cut_threshold (Impl.h:321-361). ``include_current``
    False = strictly prior turns (no self-count, zero leakage), done by
    subtracting the current row's own indicator — keeps the O(1)-state
    range frame instead of an off-by-one frame bound.
    """
    ind = (
        F.when(predicate, F.lit(1)).otherwise(F.lit(0))
        if predicate is not None
        else F.lit(1)
    )
    w = (
        Window.partitionBy(*_parts(conv))
        .orderBy(F.col(ts_sec))
        .rangeBetween(-int(window_seconds), 0)
    )
    cnt = F.sum(ind).over(w)
    if not include_current:
        cnt = cnt - ind
    if count_cut_threshold > 0:
        cnt = F.least(cnt, F.lit(count_cut_threshold))
    return df.withColumn(out, cnt.cast("double"))


def with_rolling_agg(
    df: DataFrame,
    window_seconds: float,
    value: Column,
    agg: str,
    out: str,
    conv: str = CONV,
    ts_sec: str = TS_SEC,
    include_current: bool = True,
) -> DataFrame:
    """Rolling sum/min/max/avg of a value expression over the time window.

    Maps the reference combiners (Combiner.h:43-90) onto range frames.
    include_current=False must exclude exactly the current row — a
    ``rangeBetween(-Δ, -1)`` bound on a seconds-valued order key would
    wrongly exclude every row within 1 *second*, not just self, for
    sub-second timestamps. Instead: sum/avg subtract the current row's own
    contribution from the [−Δ, 0] frame (exact, keeps O(1) range-frame
    state); min/max combine a strictly-earlier µs-resolution range frame
    with a per-tie-group pass so peers sharing the current row's exact
    timestamp ARE included (pv_ts - ts = 0 is inside any timediff window,
    Combiner.h; only the row itself is excluded — same contract as the
    sum/avg path).
    """
    if include_current:
        w = (
            Window.partitionBy(*_parts(conv))
            .orderBy(F.col(ts_sec))
            .rangeBetween(-int(window_seconds), 0)
        )
        fn = {"sum": F.sum, "min": F.min, "max": F.max, "avg": F.avg, "mean": F.avg}[agg]
        return df.withColumn(out, fn(value).over(w))
    if agg in ("sum", "avg", "mean"):
        w = (
            Window.partitionBy(*_parts(conv))
            .orderBy(F.col(ts_sec))
            .rangeBetween(-int(window_seconds), 0)
        )
        s = F.sum(value).over(w) - F.coalesce(value, F.lit(0.0))
        if agg == "sum":
            return df.withColumn(out, s)
        n = F.count(value).over(w) - F.when(value.isNotNull(), 1).otherwise(0)
        return df.withColumn(out, F.when(n > 0, s / n))
    # min/max: no algebraic self-exclusion. Two window passes over the
    # same hash(conv) partitioning (one Exchange):
    #   1) extreme over rows at strictly earlier µs timestamps
    #      (rangeBetween -Δµs..-1 on an integer-µs order key);
    #   2) extreme over the current row's exact-timestamp TIE GROUP
    #      excluding self: the group's extreme unless the current row is
    #      its unique extreme, in which case the second extreme.
    # least/greatest (null-skipping) merges the two.
    fn = {"min": F.min, "max": F.max}[agg]
    df = df.withColumn("__us", (F.col(ts_sec) * 1_000_000).cast("long"))
    w_us = (
        Window.partitionBy(*_parts(conv))
        .orderBy(F.col("__us"))
        .rangeBetween(-int(window_seconds) * 1_000_000, -1)
    )
    w_tie = Window.partitionBy(*_parts(conv), "__us")
    df = df.withColumn("__mg", fn(value).over(w_tie))
    is_ext = value == F.col("__mg")
    cnt_ext = F.sum(F.when(is_ext, 1).otherwise(0)).over(w_tie)
    second = fn(F.when(~is_ext, value)).over(w_tie)
    tie_excl = F.when(value.isNull() | ~is_ext, F.col("__mg")).otherwise(
        F.when(cnt_ext > 1, F.col("__mg")).otherwise(second)
    )
    earlier = fn(value).over(w_us)
    merged = (
        F.least(earlier, tie_excl) if agg == "min" else F.greatest(earlier, tie_excl)
    )
    return df.withColumn(out, merged).drop("__us", "__mg")


def with_decayed_sum(
    df: DataFrame,
    half_life_seconds: float,
    out: str,
    value: Column | None = None,
    conv: str = CONV,
    ts_sec: str = TS_SEC,
    include_current: bool = False,
) -> DataFrame:
    """Exponentially time-decayed running sum (EWMA-style feature):
    ``sum_j value_j * 2^(-(t_i - t_j)/half_life)`` over turns at or
    before t_i — the decayed activity counter every feature store keeps
    (recency-weighted counts/sums with no window-edge cliff). ``value``
    None counts turns (value 1 each).

    The recurrence factors into a PURE range-frame window —
    ``exp(-lam*t_i) * sum(exp(lam*t_j) * x_j)`` with timestamps anchored
    to the partition's min — so it runs in the same single
    hash(conv)-Exchange + sort as every other window feature (no pandas
    state, no second shuffle; the anchor min() is an unordered window
    over the same partitioning). Numerical contract: the anchored
    exponent ``lam*(t_max - t_min)`` must stay under ~700 per partition
    or exp() overflows — asserted per row (loud, not inf). That bounds
    one partition's time span to ~1000 half-lives, far beyond any
    useful decay horizon; longer spans chunk by time exactly like
    plans/skew.py windows.

    ``include_current=False`` (the leakage-safe default) subtracts the
    current row's own term (decay factor exactly 1); rows tied on the
    exact timestamp remain included, matching with_rolling_count's
    tied-peer contract."""
    import math

    lam = math.log(2.0) / float(half_life_seconds)
    x = value if value is not None else F.lit(1.0)
    anchor = F.min(F.col(ts_sec)).over(Window.partitionBy(*_parts(conv)))
    rel = F.col(ts_sec) - anchor
    guard = F.assert_true(
        lam * rel <= F.lit(700.0),
        F.lit("decayed_sum: partition time span exceeds ~1000 half-lives"),
    )
    grown = F.exp(F.lit(lam) * rel) * x
    w = (
        Window.partitionBy(*_parts(conv))
        .orderBy(F.col(ts_sec))
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    s = F.exp(-F.lit(lam) * rel) * F.sum(grown).over(w)
    if not include_current:
        s = s - F.coalesce(x, F.lit(0.0))
    return df.withColumn(out, F.when(guard.isNull(), s))


def with_gap_since_match(
    df: DataFrame,
    predicate: Column,
    timediff: float,
    out: str,
    gap: str = "gap_min",
    default_value: float = 0.0,
    conv: str = CONV,
    ts_sec: str = TS_SEC,
) -> DataFrame:
    """gap_min/gap_max lift: TimeDiffNormal bucket of time since the most
    (gap_min) / least (gap_max) recent *prior* matching turn inside the
    window, default when none (Impl.h:303-433 incl. init values).
    """
    now = F.col(ts_sec)
    init = float(timediff) if gap == "gap_min" else 0.0
    ind = F.when(predicate, F.lit(1)).otherwise(F.lit(0))
    w_prior = (
        Window.partitionBy(*_parts(conv))
        .orderBy(F.col(ts_sec))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_range = (
        Window.partitionBy(*_parts(conv))
        .orderBy(F.col(ts_sec))
        .rangeBetween(-int(timediff), 0)
    )
    # any strictly-prior matching turn inside [now - timediff, now]?
    n_prior_in_window = F.sum(ind).over(w_range) - ind
    if gap == "gap_min":
        # most recent prior match overall == most recent in-window match
        # whenever it lies inside the window (later matches would be even
        # more recent), so the unbounded-preceding max suffices.
        anchor = F.max(F.when(predicate, F.col(ts_sec))).over(w_prior)
        g = now - anchor
        folded = F.least(g, F.lit(init))
    else:
        # oldest in-window match; the range frame may include the current
        # row's own match, but n_prior_in_window gates existence and a
        # self-only match is masked by it (min over {now} never wins when
        # a prior match exists, since prior ts <= now).
        anchor = F.min(F.when(predicate, F.col(ts_sec))).over(w_range)
        g = now - anchor
        folded = F.greatest(g, F.lit(init))
    in_window = (n_prior_in_window > 0) & anchor.isNotNull() & (
        g <= F.lit(float(timediff))
    )
    bucket = time_diff_normal_expr(folded, now).cast("double")
    return df.withColumn(
        out, F.when(in_window, bucket).otherwise(F.lit(float(default_value)))
    )


def sessionize(
    df: DataFrame,
    gap_seconds: float,
    conv: str = CONV,
    ts_sec: str = TS_SEC,
    order_by: Sequence[str] = (TURN, TS_SEC),
    out: str = "session_id",
) -> DataFrame:
    """Gap-based session assignment: a new session starts when the gap to
    the previous turn exceeds ``gap_seconds`` (cumulative-sum of boundary
    flags over the conversation window — north_rule sessionization).
    """
    w = _order_window(conv, order_by)
    gap = F.col(ts_sec) - F.lag(ts_sec).over(w)
    boundary = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    idx = F.sum(boundary).over(
        _order_window(conv, order_by).rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn("session_idx", idx.cast("long")).withColumn(
        out, F.concat_ws("#", F.col(conv), idx.cast("string"))
    )


def _asof_union(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    strict: bool,
):
    """Shared as-of scaffolding: tag both sides and union them so ONE
    key-partitioned pass can fill latest-prior values. Returns
    (unioned, lcols, left_rank)."""
    lcols = left.columns
    # side ordering at equal ts: right first (0) so `<=` sees it; strict
    # puts right after left (left sees only strictly earlier rows).
    right_rank, left_rank = (1, 0) if strict else (0, 1)

    r = right.select(
        F.col(on).alias(on),
        F.col(right_ts).cast("double").alias("__t"),
        F.lit(right_rank).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    ).withColumn("__rt", F.col("__t"))

    l = left.select(
        *lcols,
        F.col(left_ts).cast("double").alias("__t"),
        F.lit(left_rank).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in value_cols],
    ).withColumn("__rt", F.lit(None).cast("double"))

    return l.unionByName(r, allowMissingColumns=True), lcols, left_rank


def _asof_project(out, lcols, value_cols, tolerance):
    """Shared as-of output projection incl. the tolerance mask."""
    if tolerance is not None:
        within = (F.col("__t") - F.col("__asof_ts")) <= float(tolerance)
        return out.select(
            *[c for c in lcols],
            *[
                F.when(within, F.col(c)).alias(c) if c in value_cols else F.col(c)
                for c in value_cols
            ],
            F.when(within, F.col("__asof_ts")).alias("asof_ts"),
        )
    return out.select(*lcols, *value_cols, F.col("__asof_ts").alias("asof_ts"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    strict: bool = False,
    tolerance: float | None = None,
) -> DataFrame:
    """Sort-merge as-of join: each left row gets the latest right row with
    ``right_ts <= left_ts`` (or ``<`` when strict) per key.

    Implemented as union + windowed last(ignorenulls) — one shuffle on the
    key, linear scan per partition, no per-group materialization (safe for
    mega-keys, unlike per-group merge_asof). This is the backfill /
    feature-snapshot join of the north rule. For a key so hot that even
    the linear scan serializes, see plans/skew.py:asof_join_chunked.

    tolerance: max allowed ``left_ts - right_ts`` (like merge_asof
    tolerance / the kernel's timediff); matches outside it become null.
    """
    unioned, lcols, left_rank = _asof_union(
        left, right, on, left_ts, right_ts, value_cols, strict
    )
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t"), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *[F.col(c) for c in lcols if c not in (on,)],
        F.col(on),
        F.col("__t"),
        F.col("__side"),
        F.last("__rt", ignorenulls=True).over(w).alias("__asof_ts"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    out = filled.filter(F.col("__side") == left_rank)
    return _asof_project(out, lcols, value_cols, tolerance)


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    strict: bool = False,
    tolerance: float | None = None,
) -> DataFrame:
    """Alternative as-of join: co-partitioned ``applyInPandas`` running
    ``pandas.merge_asof`` per key group (Arrow-vectorized, no per-row
    Python — SURVEY.md §4.1 "plan for both").

    Same semantics as :func:`asof_join`. Trade-off: the union+window form
    stays entirely in Catalyst with O(1) window state (preferred for
    mega-keys); this form materializes one key group per pandas call, but
    runs the probe at C speed and is the natural host for per-group logic
    that SQL can't express. Used as a cross-check and an escape hatch.
    """
    import pandas as pd

    from pyspark.sql import types as T

    lcols = list(left.columns)
    out_fields = [left.schema[c] for c in lcols] + [
        T.StructField(c, right.schema[c].dataType) for c in value_cols
    ] + [T.StructField("asof_ts", T.DoubleType())]
    out_schema = T.StructType(out_fields)

    l = left.withColumn("__lt", F.col(left_ts).cast("double"))
    r = right.select(
        F.col(on),
        F.col(right_ts).cast("double").alias("__rt"),
        *[F.col(c) for c in value_cols],
    )
    # tag and union so ONE grouping covers both sides (co-partitioned by
    # the key; no join before the groupBy)
    lu = l.withColumn("__is_left", F.lit(True))
    ru = r.withColumn("__is_left", F.lit(False))
    unioned = lu.unionByName(ru, allowMissingColumns=True)

    allow_exact = not strict

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        lg = pdf[pdf["__is_left"]]
        rg = (
            pdf[~pdf["__is_left"]][["__rt", *value_cols]]
            .dropna(subset=["__rt"])
            .sort_values("__rt", kind="mergesort")
        )
        if len(lg) == 0:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        # merge_asof raises on null merge keys: left rows with a null ts
        # are emitted with null match columns (same as the window form)
        null_mask = lg["__lt"].isna()
        lnull = lg[null_mask][[*lcols]].copy()
        for c in value_cols:
            lnull[c] = None
        lnull["asof_ts"] = None
        lg = lg[~null_mask].sort_values("__lt", kind="mergesort")
        if len(lg) == 0:
            return lnull[[*lcols, *value_cols, "asof_ts"]]
        merged = pd.merge_asof(
            lg[[*lcols, "__lt"]],
            rg.rename(columns={"__rt": "__mt"}),
            left_on="__lt",
            right_on="__mt",
            direction="backward",
            allow_exact_matches=allow_exact,
            tolerance=tolerance,
        )
        merged["asof_ts"] = merged["__mt"]
        merged = merged[[*lcols, *value_cols, "asof_ts"]]
        if len(lnull):
            merged = pd.concat([merged, lnull], ignore_index=True)
        return merged

    return unioned.groupBy(on).applyInPandas(
        lambda pdf: merge(pdf), schema=out_schema
    )


def backfill(
    df: DataFrame,
    cols: Sequence[str],
    conv: str = CONV,
    order_by: Sequence[str] = (TURN, TS_SEC),
) -> DataFrame:
    """Forward-fill nulls from the latest prior non-null within the
    conversation (snapshot backfill; never reads the future)."""
    w = _order_window(conv, order_by).rowsBetween(Window.unboundedPreceding, 0)
    for c in cols:
        df = df.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return df


def history_arrays(
    df: DataFrame,
    key_col: str,
    value_col: str,
    conv: str = CONV,
    ts_sec: str = TS_SEC,
    order_by: Sequence[str] = (TURN, TS_SEC),
    max_history: int | None = None,
) -> DataFrame:
    """Materialize per-turn behavior-history arrays of all *prior* turns:
    (hist_keys, hist_values, hist_ts) — the exact input shape of the
    reference's array lookup kernel. Bridges table <-> kernel forms so the
    in-row kernels (operators/lookup_array.py) run unchanged per turn.

    O(n^2) per conversation by nature — bounded by ``max_history`` (keep
    the most recent K) for production; unbounded only in tests. The bound
    is lossless for downstream kernels as long as no conversation has
    more than K turns inside the kernel's timediff window (kernels only
    read history with ``pv_ts - ts <= timediff``).
    """
    w = _order_window(conv, order_by).rowsBetween(
        Window.unboundedPreceding if not max_history else -int(max_history), -1
    )
    hist_k = F.collect_list(key_col).over(w)
    hist_v = F.collect_list(F.col(value_col).cast("double")).over(w)
    hist_t = F.collect_list(F.col(ts_sec)).over(w)
    return (
        df.withColumn("hist_keys", hist_k)
        .withColumn("hist_values", hist_v)
        .withColumn("hist_ts", hist_t)
    )

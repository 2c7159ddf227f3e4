"""Pipeline-level temporal semantics vs the pandas oracle + leakage tests.

north_rule invariants verified here:
  - rolling counts / sessionization / as-of match a row-at-a-time oracle
    at every (conv_id, turn_idx, ts);
  - ZERO temporal leakage: recomputing on a prefix of each conversation
    (future rows deleted) leaves every surviving feature unchanged.
"""

import math

import pytest

from pyspark.sql import functions as F

from featuregenerator_spark.oracle import pandas_kernels as oracle
from featuregenerator_spark.plans import temporal
from featuregenerator_spark.plans.pipeline import FEATURE_COLUMNS, build_turn_features
from featuregenerator_spark.sources.transcripts import synth_snapshots


def _rows_by_conv(df, cols):
    data = {}
    for r in df.select("conv_id", *cols).collect():
        data.setdefault(r["conv_id"], []).append(r.asDict())
    for v in data.values():
        v.sort(key=lambda x: (x["turn_idx"]))
    return data


def test_rolling_count_matches_oracle(spark, transcripts):
    df = temporal.with_ts_seconds(transcripts)
    df = temporal.with_rolling_count(df, 3600.0, "c1h", include_current=False)
    got = _rows_by_conv(df, ["turn_idx", "ts_sec", "c1h"])
    for conv, rows in got.items():
        want = oracle.rolling_count_per_user(rows, 3600.0, include_current=False)
        have = [r["c1h"] for r in rows]
        assert have == want, conv


def test_rolling_count_predicate(spark, transcripts):
    df = temporal.with_ts_seconds(transcripts)
    df = temporal.with_rolling_count(
        df, 7200.0, "tool2h", predicate=F.col("role") == "tool", include_current=False
    )
    got = _rows_by_conv(df, ["turn_idx", "ts_sec", "role", "tool2h"])
    for conv, rows in got.items():
        want = oracle.rolling_count_per_user(
            rows, 7200.0, pred=lambda r: r["role"] == "tool", include_current=False
        )
        assert [r["tool2h"] for r in rows] == want, conv


def test_sessionize_matches_oracle(spark, transcripts):
    df = temporal.with_ts_seconds(transcripts)
    df = temporal.sessionize(df, 1800.0)
    got = _rows_by_conv(df, ["turn_idx", "ts_sec", "session_idx"])
    for conv, rows in got.items():
        want = oracle.sessionize_rows([r["ts_sec"] for r in rows], 1800.0)
        assert [r["session_idx"] for r in rows] == want, conv


def test_gap_features(spark, transcripts):
    df = temporal.with_ts_seconds(transcripts)
    df = temporal.with_gap(df)
    got = _rows_by_conv(df, ["turn_idx", "ts_sec", "gap_seconds", "gap_bucket"])
    for conv, rows in got.items():
        prev = None
        for r in rows:
            if prev is None:
                assert r["gap_seconds"] is None
            else:
                g = r["ts_sec"] - prev
                assert abs(r["gap_seconds"] - g) < 1e-6
                assert r["gap_bucket"] == oracle.time_diff_normal(g, r["ts_sec"])
            prev = r["ts_sec"]


def test_asof_join_matches_oracle(spark, transcripts):
    snaps = synth_snapshots(spark, transcripts, every_n_turns=7)
    df = temporal.with_ts_seconds(transcripts)
    joined = temporal.asof_join(
        df, snaps, on="conv_id", left_ts="ts_sec", right_ts="snap_ts",
        value_cols=["feature_state"], strict=True,
    )
    snap_rows = {}
    for r in snaps.collect():
        snap_rows.setdefault(r["conv_id"], []).append(
            (r["snap_ts"].timestamp(), dict(r["feature_state"]))
        )
    for r in joined.collect():
        want = oracle.asof_values(
            r["ts"].timestamp(), snap_rows.get(r["conv_id"], []), strict=True
        )
        got = dict(r["feature_state"]) if r["feature_state"] is not None else None
        assert got == want, (r["conv_id"], r["turn_idx"])


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [("a", 100.0), ("a", 200.0)], "conv_id string, t double"
    )
    right = spark.createDataFrame(
        [("a", 90.0, 1.0), ("a", 10.0, 2.0)], "conv_id string, rt double, v double"
    )
    out = temporal.asof_join(
        left, right, on="conv_id", left_ts="t", right_ts="rt",
        value_cols=["v"], tolerance=50.0,
    )
    got = {r["t"]: r["v"] for r in out.collect()}
    assert got[100.0] == 1.0   # 100-90=10 <= 50
    assert got[200.0] is None  # 200-90=110 > 50


def test_zero_leakage(spark, transcripts):
    """Deleting future turns must not change features of surviving turns."""
    full = build_turn_features(temporal.with_ts_seconds(transcripts)).select(
        *FEATURE_COLUMNS
    )
    cutoff = 10
    prefix = transcripts.filter(F.col("turn_idx") < cutoff)
    pref_feat = build_turn_features(temporal.with_ts_seconds(prefix)).select(
        *FEATURE_COLUMNS
    )
    full_prefix = full.filter(F.col("turn_idx") < cutoff)
    # symmetric difference must be empty
    diff1 = full_prefix.exceptAll(pref_feat)
    diff2 = pref_feat.exceptAll(full_prefix)
    assert diff1.count() == 0 and diff2.count() == 0


def test_backfill(spark):
    df = spark.createDataFrame(
        [("a", 0, 1.0), ("a", 1, None), ("a", 2, None), ("a", 3, 5.0), ("a", 4, None)],
        "conv_id string, turn_idx int, x double",
    )
    df = df.withColumn("ts_sec", F.col("turn_idx").cast("double"))
    out = temporal.backfill(df, ["x"])
    got = {r["turn_idx"]: r["x"] for r in out.collect()}
    assert got == {0: 1.0, 1: 1.0, 2: 1.0, 3: 5.0, 4: 5.0}


def test_asof_join_pandas_matches_window_form(spark, transcripts):
    """The merge_asof (applyInPandas) variant must agree exactly with the
    union+window formulation, with and without strict/tolerance."""
    from pyspark.sql import functions as F

    from featuregenerator_spark.plans.temporal import (
        asof_join,
        asof_join_pandas,
        with_ts_seconds,
    )
    from featuregenerator_spark.sources.transcripts import synth_snapshots

    tr = with_ts_seconds(transcripts).select("conv_id", "turn_idx", "ts_sec")
    snaps = synth_snapshots(spark, transcripts).select(
        "conv_id",
        F.col("snap_ts").cast("double").alias("snap_ts"),
        F.col("feature_state")["turns_seen"].alias("turns_seen"),
    )
    for kwargs in (
        dict(strict=False),
        dict(strict=True),
        dict(strict=True, tolerance=3600.0),
    ):
        a = asof_join(
            tr, snaps, on="conv_id", left_ts="ts_sec", right_ts="snap_ts",
            value_cols=["turns_seen"], **kwargs,
        )
        b = asof_join_pandas(
            tr, snaps, on="conv_id", left_ts="ts_sec", right_ts="snap_ts",
            value_cols=["turns_seen"], **kwargs,
        )
        ka = {
            (r["conv_id"], r["turn_idx"]): (r["turns_seen"], r["asof_ts"])
            for r in a.collect()
        }
        kb = {
            (r["conv_id"], r["turn_idx"]): (r["turns_seen"], r["asof_ts"])
            for r in b.collect()
        }
        assert ka == kb, kwargs


def test_rolling_agg_exclude_current_subsecond(spark):
    """include_current=False must exclude exactly the current row, even
    when neighbors sit < 1 s apart (a range frame ending at -1 on a
    seconds order key would wrongly drop the 0.2s-ago row too)."""
    from featuregenerator_spark.plans import temporal

    rows = [
        ("c", 0, 100.0, 10.0),
        ("c", 1, 100.2, 20.0),   # 0.2 s later
        ("c", 2, 100.5, 30.0),
        ("c", 3, 200.0, 40.0),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts_sec double, v double")
    for agg, want in {
        "sum": {0: 0.0, 1: 10.0, 2: 30.0, 3: 60.0},
        "avg": {0: None, 1: 10.0, 2: 15.0, 3: 20.0},
        "min": {0: None, 1: 10.0, 2: 10.0, 3: 10.0},
        "max": {0: None, 1: 10.0, 2: 20.0, 3: 30.0},
    }.items():
        out = temporal.with_rolling_agg(
            df, 3600.0, F.col("v"), agg, "o", include_current=False
        )
        got = {r["turn_idx"]: r["o"] for r in out.collect()}
        for k, w in want.items():
            if w is None:
                assert got[k] is None, (agg, k, got[k])
            else:
                assert got[k] == pytest.approx(w), (agg, k, got[k])


def test_history_arrays_bounded_short_groups(spark):
    """max_history larger than the group must keep the full history (a
    negative-start slice would empty it) and equal the unbounded form."""
    from featuregenerator_spark.plans import temporal

    rows = [("c", i, 100.0 + i, float(i), "k") for i in range(5)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts_sec double, v double, k string"
    )
    unb = temporal.history_arrays(df, "k", "v", order_by=("turn_idx",))
    bnd = temporal.history_arrays(df, "k", "v", order_by=("turn_idx",), max_history=256)
    u = {r["turn_idx"]: r["hist_ts"] for r in unb.collect()}
    b = {r["turn_idx"]: r["hist_ts"] for r in bnd.collect()}
    assert u == b
    assert len(b[4]) == 4  # all 4 prior turns retained

    tight = temporal.history_arrays(df, "k", "v", order_by=("turn_idx",), max_history=2)
    t = {r["turn_idx"]: r["hist_ts"] for r in tight.collect()}
    assert t[4] == u[4][-2:]  # most recent 2 prior rows kept


def test_asof_join_pandas_null_left_ts(spark):
    """Left rows with a null as-of timestamp must come through with null
    match columns (merge_asof would raise on null merge keys), matching
    the union+window form's null handling."""
    from featuregenerator_spark.plans import temporal

    left = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, None), ("a", 3, 30.0)],
        "k string, id int, lt double",
    )
    right = spark.createDataFrame(
        [("a", 5.0, 100.0), ("a", 25.0, 200.0)], "k string, rt double, v double"
    )
    out = temporal.asof_join_pandas(
        left, right, on="k", left_ts="lt", right_ts="rt", value_cols=["v"]
    )
    got = {r["id"]: (r["v"], r["asof_ts"]) for r in out.collect()}
    assert got[1] == (100.0, 5.0)
    assert got[2] == (None, None)
    assert got[3] == (200.0, 25.0)

    win = temporal.asof_join(
        left, right, on="k", left_ts="lt", right_ts="rt", value_cols=["v"]
    )
    wgot = {r["id"]: (r["v"], r["asof_ts"]) for r in win.collect()}
    assert got == wgot


def test_rolling_agg_exclusive_tied_timestamps(spark):
    """include_current=False on tied timestamps: peers sharing the exact
    timestamp are IN the window (pv_ts - ts = 0 <= timediff) for min/max
    just like the sum/avg self-subtraction path; only the row itself is
    excluded. (Round-2 regression: the -1 µs frame bound dropped ALL
    tied peers, giving min=NULL where sum saw the peer.)"""
    import pytest

    from featuregenerator_spark.plans import temporal

    rows = [
        ("c", 0, 100.0, 5.0),
        ("c", 1, 100.0, 7.0),    # exact tie with turn 0
        ("c", 2, 100.0, 5.0),    # duplicate-extreme tie
        ("c", 3, 200.0, 1.0),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts_sec double, v double"
    )
    want = {
        "min": {0: 5.0, 1: 5.0, 2: 5.0, 3: 5.0},
        "max": {0: 7.0, 1: 5.0, 2: 7.0, 3: 7.0},
        "sum": {0: 12.0, 1: 10.0, 2: 12.0, 3: 17.0},
        "avg": {0: 6.0, 1: 5.0, 2: 6.0, 3: 17.0 / 3.0},
    }
    for agg, per_turn in want.items():
        out = temporal.with_rolling_agg(
            df, 3600.0, F.col("v"), agg, "o", include_current=False
        )
        got = {r["turn_idx"]: r["o"] for r in out.collect()}
        for k, w in per_turn.items():
            assert got[k] == pytest.approx(w), (agg, k, got[k])

    # single row: nothing else in window -> null for min/max
    one = spark.createDataFrame(
        [("c", 0, 50.0, 9.0)], "conv_id string, turn_idx int, ts_sec double, v double"
    )
    for agg in ("min", "max"):
        out = temporal.with_rolling_agg(
            one, 3600.0, F.col("v"), agg, "o", include_current=False
        )
        assert out.collect()[0]["o"] is None


def test_decayed_sum_matches_direct_computation(spark, transcripts):
    """with_decayed_sum's factored window form must equal the direct
    O(n^2) definition sum_j x_j * 2^(-(t_i-t_j)/HL) over strictly-prior
    turns, at every (conv_id, turn_idx)."""
    hl = 1800.0
    df = temporal.with_ts_seconds(transcripts)
    out = temporal.with_decayed_sum(df, hl, "dc")
    rows = _rows_by_conv(out, ["turn_idx", "ts_sec", "dc"])
    for conv, turns in rows.items():
        for i, r in enumerate(turns):
            want = sum(
                2.0 ** (-(r["ts_sec"] - p["ts_sec"]) / hl)
                for p in turns
                if p["ts_sec"] <= r["ts_sec"] and p is not r
            )
            assert r["dc"] == pytest.approx(want, abs=1e-9), (conv, i)


def test_decayed_sum_include_current_and_value(spark):
    """include_current adds exactly the current row's own value (decay
    1); a value column weights each term."""
    df = spark.createDataFrame(
        [("c", 0, 0.0, 2.0), ("c", 1, 1800.0, 4.0), ("c", 2, 3600.0, 8.0)],
        "conv_id string, turn_idx int, ts_sec double, v double",
    )
    excl = temporal.with_decayed_sum(df, 1800.0, "d", value=F.col("v"))
    incl = temporal.with_decayed_sum(
        df, 1800.0, "d", value=F.col("v"), include_current=True
    )
    ge = {r["turn_idx"]: r["d"] for r in excl.collect()}
    gi = {r["turn_idx"]: r["d"] for r in incl.collect()}
    assert ge[0] == pytest.approx(0.0)
    assert ge[1] == pytest.approx(2.0 * 0.5)        # one half-life back
    assert ge[2] == pytest.approx(2.0 * 0.25 + 4.0 * 0.5)
    for k in (0, 1, 2):
        assert gi[k] == pytest.approx(ge[k] + {0: 2.0, 1: 4.0, 2: 8.0}[k])


def test_decayed_sum_overflow_guard_raises(spark):
    """A partition spanning more than ~1000 half-lives must fail loudly
    (assert_true), not return inf."""
    df = spark.createDataFrame(
        [("c", 0, 0.0), ("c", 1, 2000.0 * 3600.0)],
        "conv_id string, turn_idx int, ts_sec double",
    )
    out = temporal.with_decayed_sum(df, 3600.0, "d")
    with pytest.raises(Exception, match="half-lives"):
        out.collect()

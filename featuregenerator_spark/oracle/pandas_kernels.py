"""Pure-pandas/numpy reference implementations (test oracle only).

Independent re-derivations of the reference kernel semantics, written
row-at-a-time on purpose (clarity over speed) so Spark results can be
checked with numpy.allclose at every (conv_id, turn_idx, ts).
Never imported by engine code.
"""

from __future__ import annotations

import math


def time_diff_normal(gap: float, now: float) -> int:
    if now - gap <= 0.0001:
        return 0
    if gap <= 60.0:
        return 1
    if gap < 300.0:
        return 2
    if gap < 600.0:
        return 3
    if gap < 1800.0:
        return 4
    if gap < 3600.0:
        return 5
    if gap < 21600.0:
        return 6
    if gap < 43200.0:
        return 7
    return 8


def bucketize(value: float, boundaries: list[float]) -> int:
    """upper_bound: count of boundaries <= value."""
    return sum(1 for b in boundaries if b <= value)


def lookup_count(
    map_keys, map_values, value_ts, pvtime, keys, timediff, cut=-1
):
    pairs = [
        (str_canon(k), v, float(t))
        for k, v, t in zip(map_keys, map_values, value_ts)
        if float(pvtime) - float(t) <= timediff
    ]
    out = []
    for key in keys:
        c = sum(1 for k, _, _ in pairs if k == str_canon(key))
        if cut > 0:
            c = min(c, cut)
        out.append(float(c))
    return out


def lookup_gap(
    map_keys, map_values, value_ts, pvtime, keys, timediff,
    gap="gap_min", default=0.0,
):
    now = float(pvtime)
    pairs = [
        (str_canon(k), float(t))
        for k, t in zip(map_keys, value_ts)
        if now - float(t) <= timediff
    ]
    out = []
    for key in keys:
        gaps = [now - t for k, t in pairs if k == str_canon(key)]
        if not gaps:
            out.append(float(default))
            continue
        if gap == "gap_min":
            v = min(timediff, min(gaps))
        else:
            v = max(0.0, max(gaps))
        out.append(float(time_diff_normal(v, now)))
    return out


def lookup_none_discrete(
    map_keys, map_values, value_ts, pvtime, keys, timediff,
    prefix="", default="",
):
    now = float(pvtime)
    pairs = [
        (str_canon(k), v)
        for k, v, t in zip(map_keys, map_values, value_ts)
        if now - float(t) <= timediff
    ]
    out = []
    for key in keys:
        hits = [v for k, v in pairs if k == str_canon(key)]
        if hits:
            out.extend(prefix + fmt_value(v) for v in hits)
        else:
            out.append(prefix + default)
    return out


def lookup_dense(map_keys, map_values, keys, combiner="sum", boundaries=None):
    m = {}
    for k, v in zip(map_keys, map_values):
        m[str_canon(k)] = float(v)  # last-write-wins
    vals = [m[str_canon(k)] for k in keys if str_canon(k) in m]
    if combiner == "count":
        out = float(len(vals))
    elif combiner in ("mean", "avg"):
        out = sum(vals) / len(vals) if vals else 0.0
    elif combiner == "min":
        out = min(vals) if vals else 0.0
    elif combiner == "max":
        out = max(vals) if vals else 0.0
    else:
        out = sum(vals)
    if boundaries:
        return float(bucketize(out, boundaries))
    return out


def str_canon(v) -> str:
    """Canonical key text: integral numerics without fraction."""
    if isinstance(v, (int,)):
        return str(v)
    if isinstance(v, float):
        return str(int(v)) if v == int(v) else repr(v)
    s = str(v)
    try:
        f = float(s)
        if f == int(f):
            return str(int(f))
    except (ValueError, OverflowError):
        pass
    return s


def fmt_value(v) -> str:
    """%.0f for floats (half-even), plain text otherwise."""
    if isinstance(v, float):
        return "%.0f" % v
    return str(v)


# ------------------------------------------------------- pipeline oracles


def rolling_count_per_user(rows, window_s, pred=lambda r: True, include_current=False):
    """rows: list of dicts sorted by ts per key; returns list of counts
    aligned to rows. O(n^2), oracle only."""
    out = []
    for i, r in enumerate(rows):
        now = r["ts_sec"]
        c = 0
        for j, p in enumerate(rows):
            if j == i and not include_current:
                continue
            # range-frame semantics: ts peers (equal ts) are all in-frame
            if p["ts_sec"] <= now and now - p["ts_sec"] <= window_s and pred(p):
                c += 1
        out.append(float(c))
    return out


def sessionize_rows(ts_list, gap_s):
    """session index per row (1-based cumulative boundary count)."""
    out = []
    idx = 0
    prev = None
    for t in ts_list:
        if prev is None or t - prev > gap_s:
            idx += 1
        out.append(idx)
        prev = t
    return out


def asof_values(left_ts, right_rows, strict=False, tolerance=None):
    """latest right (ts, value) with ts <= left_ts (< when strict)."""
    best = None
    for ts, v in right_rows:
        ok = ts < left_ts if strict else ts <= left_ts
        if ok and (best is None or ts >= best[0]):
            best = (ts, v)
    if best is None:
        return None
    if tolerance is not None and left_ts - best[0] > tolerance:
        return None
    return best[1]

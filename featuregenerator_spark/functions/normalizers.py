"""Normalizers: minmax / zscore / log10 / bound_regular.

Semantics from ``fg_lite/feature/Normalizer.h:22-74`` and the description
parser ``fg_lite/feature/Normalizer.cpp:22-158`` — a comma-separated
``k=v`` string, e.g. ``"method=minmax,min=2.0,max=8.0"``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Normalizer:
    method: str = "raw"  # raw | minmax | zscore | log10 | bound_regular
    params: dict[str, float] = field(default_factory=dict)
    log: bool = False

    def expr(self, x: Column) -> Column:
        return normalize_expr(x, self)


def parse_normalizer(description: str | None) -> Normalizer:
    """Parse ``"method=zscore,mean=1.0,standard_deviation=2.0"`` style."""
    if not description:
        return Normalizer()
    params: dict[str, float] = {}
    method = "raw"
    log = False
    for part in description.split(","):
        part = part.strip()
        if not part:
            continue
        k, _, v = part.partition("=")
        k, v = k.strip(), v.strip()
        if k == "method":
            method = v
        elif k == "log":
            log = v.lower() in ("true", "1", "yes")
        else:
            params[k] = float(v)
    return Normalizer(method=method, params=params, log=log)


def normalize_expr(x: Column, n: Normalizer) -> Column:
    """Build the normalization Column expression (pure arithmetic)."""
    p = n.params
    if n.method == "minmax":
        lo, hi = p.get("min", 0.0), p.get("max", 1.0)
        return (x - F.lit(lo)) / F.lit(hi - lo)
    if n.method == "zscore":
        mean = p.get("mean", 0.0)
        sd = p.get("standard_deviation", 1.0)
        return (x - F.lit(mean)) / F.lit(sd)
    if n.method == "log10":
        thr = p.get("threshold", 0.0)
        dflt = p.get("default", p.get("default_value", 0.0))
        return F.when(x > F.lit(thr), F.log10(x)).otherwise(F.lit(dflt))
    if n.method == "bound_regular":
        # min(max(x, y_max) + y_add, y_min) -> optional ln -> (v - mean)/sd
        mean = p.get("mean", 0.0)
        sd = p.get("standard_deviation", 1.0)
        y_add = p.get("y_add", 0.0)
        y_min = p.get("y_min", 0.0)
        y_max = p.get("y_max", 0.0)
        bounded = F.least(
            F.greatest(x, F.lit(y_max)) + F.lit(y_add), F.lit(y_min)
        )
        v = F.log(bounded) if n.log else bounded
        return (v - F.lit(mean)) / F.lit(sd)
    return x

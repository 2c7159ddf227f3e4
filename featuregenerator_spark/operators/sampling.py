"""Deterministic source-mix resampling — the data-mixture stage.

Training-data recipes weight corpus sources (The Pile's per-set epochs,
Gopher/MassiveText's mixture table, DoReMi's learned domain weights —
all public work): source A contributes at rate 2.5 (every doc appears
2-3 times), source B at 0.25 (1 doc in 4 survives). This module is
that stage with NO RNG anywhere:

* the fractional decision for a document is a lexicographic compare of
  the first 8 hex chars of md5("mix:" || doc_id) against a per-source
  threshold string precomputed from the rate (md5 hex is uniform over
  16^32, so ``u8 < hex(frac * 16^8)`` keeps exactly a ``frac``
  fraction in expectation, deterministically per document);
* rate r produces floor(r) guaranteed copies plus one more iff the
  md5 draw passes — upsampling and downsampling are the same rule.

Deterministic sampling is resumable sampling: a re-run, a retried
partition, or a different cluster keeps EXACTLY the same documents, so
lineage stays exact under failure (Spark's per-partition rng would
resample on task retry unless seeded per row anyway). md5 (not
xxhash64) is the draw because the DuckDB oracle computes the identical
hex string — the whole stage, thresholds included, is gate-checked
end to end.

Scale shape: pure Column expressions — a map-only narrow plan, zero
shuffles; the explode that materializes copies is the only row
amplification and it streams. Rates ship as two literal maps
(source -> floor copies, source -> threshold); thousands of sources
fit a plan literal, and past that the same rule broadcast-joins a
rates table (the quality_model large-vocab twin pattern).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Demo mixture used by the driver query: exercises integer upsample +
# fractional draw (2.5), pass-through (1.0), downsample (0.25), full
# drop (0.0), and the default rate for unlisted sources.
DEMO_RATES: dict[str, float] = {
    "src0": 2.5,
    "src1": 1.0,
    "src2": 0.25,
    "src3": 0.0,
}
DEMO_DEFAULT_RATE = 0.6

_SALT = "mix:"


def split_rate(rate: float) -> tuple[int, str]:
    """rate -> (guaranteed copies, 8-hex-char threshold for one more)."""
    if rate < 0:
        raise ValueError(f"negative sampling rate: {rate}")
    base = int(math.floor(rate))
    scaled = int(round((rate - base) * 16**8))
    if scaled >= 16**8:
        # a fraction that rounds to 1.0 must carry into the integer
        # part: format(16^8) would be 9 hex chars, and a 9-char
        # threshold compares LOW lexicographically against 8-char
        # draws ('ff..' > '10..'), silently dropping the copy instead
        # of guaranteeing it
        base += 1
        scaled = 0
    return base, format(scaled, "08x")


def _draw(key: Column) -> Column:
    """Uniform 8-hex-char draw, identical in Spark and DuckDB."""
    return F.substring(
        F.md5(F.encode(F.concat(F.lit(_SALT), key.cast("string")), "UTF-8")),
        1,
        8,
    )


def copies_column(
    key: Column,
    source: Column,
    rates: dict[str, float],
    default_rate: float,
) -> Column:
    """Number of output copies for a row, as a literal-map expression."""
    dbase, dthresh = split_rate(default_rate)
    if not rates:
        # create_map() with no entries is VOID-typed; the default rate
        # applies to every source directly
        return F.lit(dbase) + (_draw(key) < F.lit(dthresh)).cast("int")
    base_map = F.create_map(
        *[
            F.lit(x)
            for s, r in sorted(rates.items())
            for x in (s, split_rate(r)[0])
        ]
    )
    thresh_map = F.create_map(
        *[
            F.lit(x)
            for s, r in sorted(rates.items())
            for x in (s, split_rate(r)[1])
        ]
    )
    base = F.coalesce(base_map[source], F.lit(dbase))
    thresh = F.coalesce(thresh_map[source], F.lit(dthresh))
    return base + (_draw(key) < thresh).cast("int")


def source_mix_sample(
    df: DataFrame,
    rates: dict[str, float] | None = None,
    default_rate: float = DEMO_DEFAULT_RATE,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """One output row per kept copy: (id, source, copy_idx 1..copies)."""
    if rates is None:
        rates = DEMO_RATES
    copies = copies_column(
        F.col(id_col), F.col(source_col), rates, default_rate
    )
    # sequence(1, 0) would DESCEND; emit no rows for dropped docs instead
    idxs = F.when(copies >= 1, F.sequence(F.lit(1), copies)).otherwise(
        F.array().cast("array<int>")
    )
    return df.select(
        F.col(id_col),
        F.col(source_col),
        F.explode(idxs).alias("copy_idx"),
    )


def rates_values_sql(
    rates: dict[str, float] | None = None,
) -> str:
    """The mixture as a SQL VALUES list (source, base, thresh) so the
    DuckDB oracle derives its thresholds from the SAME dict."""
    if rates is None:
        rates = DEMO_RATES
    rows = ", ".join(
        "('{}', {}, '{}')".format(
            s.replace("'", "''"), split_rate(r)[0], split_rate(r)[1]
        )
        for s, r in sorted(rates.items())
    )
    return f"(VALUES {rows})"


_SPLIT_SALT = "split:"
_STRAT_SALT = "strat:"


def split_assign(
    key: Column, cuts: dict[str, float]
) -> Column:
    """Deterministic dataset-split label (train/val/test...) from the
    same md5-hex draw rule as the mixture stage: ``cuts`` maps label ->
    cumulative upper bound (e.g. {"train": .8, "val": .9, "test": 1.0},
    ascending, last == 1.0). A document's split never changes across
    runs, retries, or clusters — the property that keeps eval sets
    uncontaminated when the corpus is rebuilt."""
    bounds = sorted(cuts.items(), key=lambda kv: kv[1])
    if not bounds or abs(bounds[-1][1] - 1.0) > 1e-12:
        raise ValueError(f"cuts must end at 1.0: {cuts}")
    prev = 0.0
    for label, b in bounds:
        if not prev < b <= 1.0:
            raise ValueError(f"cuts must ascend in (0, 1]: {cuts}")
        prev = b
    draw = F.substring(
        F.md5(F.encode(F.concat(F.lit(_SPLIT_SALT), key.cast("string")), "UTF-8")),
        1,
        8,
    )
    # ascending CASE chain: the smallest bound whose threshold the draw
    # undercuts wins; the 1.0 bound is the unconditional tail
    expr = None
    tail = F.lit(bounds[-1][0])
    for label, b in bounds[:-1]:
        scaled = min(int(round(b * 16**8)), 16**8 - 1)
        cond = draw < F.lit(format(scaled, "08x"))
        expr = (
            F.when(cond, F.lit(label))
            if expr is None
            else expr.when(cond, F.lit(label))
        )
    return tail if expr is None else expr.otherwise(tail)


def stratified_sample_exact(
    df: DataFrame,
    group_cols: list[str],
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """EXACTLY min(n, group size) rows per group, chosen by the
    deterministic md5 order of the id (a per-group uniform sample whose
    membership is stable across runs/retries/clusters — balanced
    eval-set construction). One top-n window per group; Spark pushes a
    per-partition partial top-n before the shuffle, so the full groups
    never move."""
    if n <= 0:
        raise ValueError(f"n must be positive: {n}")
    from pyspark.sql import Window

    draw = F.md5(
        F.encode(
            F.concat(F.lit(_STRAT_SALT), F.col(id_col).cast("string")), "UTF-8"
        )
    )
    w = Window.partitionBy(*group_cols).orderBy(draw, F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


_NEG_SALT = "neg:"


def negative_pairs(
    emb: DataFrame,
    k: int = 4,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    for each anchor row, k candidate negatives are addressed by
    ``md5(salt || anchor_id || ':' || j) mod N`` over the dense id space
    — zero RNG, so the pair set is identical across runs, retries, and
    engines (the same resumable-sampling contract as the mixture/split
    draws above). Candidates that land on the anchor itself or share
    its label are DROPPED, not resampled (rejection without resampling:
    each anchor yields <= k negatives; with L uniform labels the
    expected loss is ~1/L per candidate — a documented, deterministic
    thinning, preferable at scale to a variable-length probe chain).

    Ids must be dense 0..N-1 (the driver embeddings table's shape;
    rank first otherwise). Plan shape: candidates explode k-wide
    (narrow), then ONE equijoin on the addressed id against the
    corpus — hash-partitioned, no skew (md5 addresses are uniform),
    no corpus x corpus pairing.
    """
    n_row = emb.agg(F.count(F.lit(1)).alias("n"))
    anchors = emb.select(
        F.col(id_col), F.col(label_col)
    ).crossJoin(F.broadcast(n_row))
    cand = anchors.select(
        id_col,
        label_col,
        F.explode(F.array(*[F.lit(j) for j in range(1, k + 1)])).alias("j"),
        F.col("n"),
    )
    draw_hex = F.substring(
        F.md5(
            F.encode(
                F.concat(
                    F.lit(_NEG_SALT),
                    F.col(id_col).cast("string"),
                    F.lit(":"),
                    F.col("j").cast("string"),
                ),
                "UTF-8",
            )
        ),
        1,
        8,
    )
    cand = cand.withColumn(
        "neg_id", F.conv(draw_hex, 16, 10).cast("long") % F.col("n")
    )
    neg = emb.select(
        F.col(id_col).alias("neg_id"), F.col(label_col).alias("neg_label")
    )
    return (
        cand.join(neg, "neg_id")
        .filter(
            (F.col("neg_id") != F.col(id_col))
            & (F.col("neg_label") != F.col(label_col))
        )
        .select(id_col, "j", "neg_id")
    )

"""Data-driven categorical/numeric feature encoders — the feature-store
ops where temporal leakage actually happens.

Two encoders every tabular feature pipeline ships:

**Point-in-time target encoding** (``target_encode_pit``): replace a
categorical with the smoothed mean of the target over STRICTLY PRIOR
rows of the same category. The classic implementation leaks — it
encodes with the full-dataset category mean, so every row sees its own
label and its future. Here both the category statistic and the
smoothing prior are computed over ``rows between unbounded preceding
and 1 preceding`` frames ordered by (ts, id) — the row itself and
everything after it are invisible, the same as-of discipline as the
snapshot join (plans/temporal.py): at 10^12 turns you cannot re-train
the encoder per cutoff, you make the encoder itself point-in-time.

Float discipline: running double sums are engine- and
implementation-order dependent (sliding-window accumulators may
subtract on evict). Targets therefore QUANTIZE to integer micro-units
first; the window sums are exact longs, and the encoded value is a
single IEEE expression over exact ingredients — bit-identical in any
engine, the same contract as retrieval.py / kmeans.py.

**Quantile binning** (``quantile_bins``): data-driven bucket edges at
the requested percentiles (Spark ``percentile`` == DuckDB
``quantile_cont`` bit-for-bit — pinned by the sketch battery,
operators/sketches.py), applied as a broadcast one-row cross join +
a fold over the edge array. The TRAIN/APPLY split is the caller's
declarative predicate (same convention as lm_perplexity's corpus
split): edges learned on the train slice only, applied everywhere —
the bucketize analogue of raw_feature's static bounds
(functions/bucketize.py), but learned from data.

Reference: fg_lite's raw_feature bucketize consumes PRE-COMPUTED
bounds from its config (BucketizeTest.cpp); these operators are the
upstream stage that produces such bounds/encodings at corpus scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MICRO = 1_000_000


def _micro(col: Column) -> Column:
    """double -> exact long micro-units (round half away from zero —
    identical in Spark's HALF_UP-on-BigDecimal and DuckDB's round)."""
    return F.round(col.cast("double") * MICRO, 0).cast("long")


def target_encode_pit(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    order_cols: Sequence[str],
    smoothing: int = 20,
    out_col: str = "te",
    chunk_col: str | None = None,
) -> DataFrame:
    """Smoothed point-in-time target encoding:

        te = (sum_prior_cat + m * mean_prior_global)
             / (cnt_prior_cat + m)

    where BOTH statistics see only rows strictly before this one under
    ``order_cols`` (must be a unique total order, e.g. (ts, event_id) —
    ties would make "prior" ambiguous). Rows with no global history
    (the first row overall) get NULL — there is nothing leak-free to
    encode them with.

    The per-category frame partitions by cat_col (the expensive,
    correctly-parallel leg). The GLOBAL running prior is the scale
    hazard — a bare global window is a single-partition sort. Pass
    ``chunk_col`` (any column that is CONSTANT-OR-INCREASING along
    ``order_cols``, e.g. the event date when ordering by (ts, id)) and
    the global leg becomes the classic two-level distributed prefix
    sum instead: within-chunk running frames partitioned by chunk
    (parallel), plus a prefix over the tiny per-chunk totals table
    (#days rows), joined back broadcast. Identical exact-long values
    either way — the oracle does not change. Without chunk_col the
    global window is used as-is (fine at test scale; warned against in
    the plan for production).
    """
    order = [F.col(c).asc() for c in order_cols]
    tm_col = "_te_micro"
    base = df.withColumn(tm_col, _micro(F.col(target_col)))
    tm = F.col(tm_col)

    w_cat = (
        Window.partitionBy(cat_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sum_cat = F.sum(tm).over(w_cat)
    cnt_cat = F.count(F.lit(1)).over(w_cat)

    if chunk_col is None:
        w_all = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, -1
        )
        base = base.withColumn("_sum_all", F.sum(tm).over(w_all)).withColumn(
            "_cnt_all", F.count(F.lit(1)).over(w_all)
        )
    else:
        w_in = (
            Window.partitionBy(chunk_col)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        tot = base.groupBy(chunk_col).agg(
            F.sum(tm).alias("_csum"), F.count(F.lit(1)).alias("_ccnt")
        )
        w_ch = Window.orderBy(F.col(chunk_col).asc()).rowsBetween(
            Window.unboundedPreceding, -1
        )
        pre = tot.select(
            chunk_col,
            F.coalesce(F.sum("_csum").over(w_ch), F.lit(0)).alias("_psum"),
            F.coalesce(F.sum("_ccnt").over(w_ch), F.lit(0)).alias("_pcnt"),
        )
        base = (
            base.join(F.broadcast(pre), chunk_col)
            .withColumn(
                "_sum_all",
                F.col("_psum") + F.coalesce(F.sum(tm).over(w_in), F.lit(0)),
            )
            .withColumn(
                "_cnt_all", F.col("_pcnt") + F.count(F.lit(1)).over(w_in)
            )
        )

    prior = F.col("_sum_all").cast("double") / F.col("_cnt_all") / MICRO
    te = (
        (F.coalesce(sum_cat, F.lit(0)).cast("double") / MICRO
         + smoothing * prior)
        / (F.coalesce(cnt_cat, F.lit(0)) + smoothing)
    )
    return base.withColumn(
        out_col, F.when(F.col("_cnt_all") > 0, te)
    ).drop(tm_col, "_sum_all", "_cnt_all", "_psum", "_pcnt")


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    cat_col: str,
    probs: Sequence[float] = (0.2, 0.4, 0.6, 0.8),
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index per category between a reference and
    a current window — the standard feature-drift monitor
    (psi < 0.1 stable / 0.1-0.25 drifting / > 0.25 shifted):

        psi = sum over bins of (p_bin - q_bin) * ln(p_bin / q_bin)

    Bins are learned from the REFERENCE window's per-category
    percentiles (Spark ``percentile`` == DuckDB ``quantile_cont``,
    pinned); zero-count bins clamp to ``eps`` (the standard smoothing,
    deterministic in both engines). Proportions are exact-integer
    divisions; each bin term quantizes to nano-units before the
    per-category sum (exact long adds — the order-independence contract
    of this module). Categories absent from the reference window have
    no edges and are dropped — monitoring needs a baseline.

    Scale shape: the only corpus-sized work is the percentile agg and
    the two binned groupBy counts (map-side combined); everything after
    is (category x bins)-sized. Returns (cat_col, psi).
    """
    n_bins = len(probs) + 1
    edges = ref.groupBy(cat_col).agg(
        F.array(
            *[F.percentile(F.col(value_col), F.lit(p)) for p in probs]
        ).alias("edges")
    )
    v = F.col(value_col).cast("double")
    bin_idx = F.aggregate(
        F.col("edges"),
        F.lit(0),
        lambda acc, e: acc + F.when(v > e, 1).otherwise(0),
    ).alias("bin")

    def _counts(df, name):
        return (
            df.join(F.broadcast(edges), cat_col)
            .select(F.col(cat_col), bin_idx)
            .groupBy(cat_col, "bin")
            .agg(F.count(F.lit(1)).alias(name))
        )

    cr, cc = _counts(ref, "n_ref"), _counts(cur, "n_cur")
    scaffold = edges.select(
        cat_col,
        F.explode(F.sequence(F.lit(0), F.lit(n_bins - 1))).alias("bin"),
    )
    # per-category totals are the EXACT sums of the bin counts (every
    # row lands in exactly one bin) — derived from the tiny count
    # tables, never a second corpus scan.
    tot_r = cr.groupBy(cat_col).agg(F.sum("n_ref").alias("t_ref"))
    tot_c = cc.groupBy(cat_col).agg(F.sum("n_cur").alias("t_cur"))
    j = (
        scaffold.join(cr, [cat_col, "bin"], "left")
        .join(cc, [cat_col, "bin"], "left")
        .join(tot_r, cat_col)
        .join(tot_c, cat_col)
        .withColumn(
            "p",
            F.greatest(
                F.coalesce(F.col("n_ref"), F.lit(0)).cast("double")
                / F.col("t_ref"),
                F.lit(eps),
            ),
        )
        .withColumn(
            "q",
            F.greatest(
                F.coalesce(F.col("n_cur"), F.lit(0)).cast("double")
                / F.col("t_cur"),
                F.lit(eps),
            ),
        )
    )
    term_nano = F.round(
        (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")) * 1e9, 0
    ).cast("long")
    return (
        j.groupBy(cat_col)
        .agg(F.sum(term_nano).alias("nano"))
        .select(cat_col, (F.col("nano") / 1e9).alias("psi"))
    )


def psi_drift_categorical(
    ref: DataFrame,
    cur: DataFrame,
    cat_col: str,
    eps: float = 1e-6,
) -> DataFrame:
    """PSI over a CATEGORICAL column's distribution (role mix, source
    mix, event-type mix) — no binning: categories are their own bins.
    The category set is the UNION of both windows (a category absent
    from one side clamps to ``eps``, the standard smoothing, so new or
    vanished categories contribute large finite terms instead of
    infinities). Returns one row per category with its share in each
    window and its PSI term — the total is the exact sum of ``term``
    (each term is nano-quantized, so the sum is order-independent).

    Scale shape: two map-side-combined counts; everything after is
    category-sized.
    """
    cr = ref.groupBy(cat_col).agg(F.count(F.lit(1)).alias("n_ref"))
    cc = cur.groupBy(cat_col).agg(F.count(F.lit(1)).alias("n_cur"))
    tr = ref.agg(F.count(F.lit(1)).alias("t_ref"))
    tc = cur.agg(F.count(F.lit(1)).alias("t_cur"))
    j = (
        cr.join(cc, cat_col, "full")
        .crossJoin(F.broadcast(tr))
        .crossJoin(F.broadcast(tc))
        .withColumn(
            "p",
            F.greatest(
                F.coalesce(F.col("n_ref"), F.lit(0)).cast("double")
                / F.col("t_ref"),
                F.lit(eps),
            ),
        )
        .withColumn(
            "q",
            F.greatest(
                F.coalesce(F.col("n_cur"), F.lit(0)).cast("double")
                / F.col("t_cur"),
                F.lit(eps),
            ),
        )
    )
    term_nano = F.round(
        (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")) * 1e9, 0
    ).cast("long")
    return j.select(
        cat_col,
        "p",
        "q",
        (term_nano / 1e9).alias("term"),
    )


def quantile_bins(
    train: DataFrame,
    apply_to: DataFrame,
    value_col: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    out_col: str = "bin",
) -> DataFrame:
    """Learn bucket edges at ``probs`` percentiles of ``train``'s
    value_col; annotate ``apply_to`` with the 0-based bin index
    (#edges <= value  — i.e. edge-inclusive to the LOWER bin's right
    boundary, matching functions/bucketize.py's upper_bound rule).
    Edges ride a broadcast one-row cross join; the bin index is a fold
    over the edge array inside codegen — no join per edge, no UDF.
    """
    edges = train.agg(
        F.array(
            *[F.percentile(F.col(value_col), F.lit(p)) for p in probs]
        ).alias("edges")
    )
    v = F.col(value_col).cast("double")
    bin_idx = F.aggregate(
        F.col("edges"),
        F.lit(0),
        lambda acc, e: acc + F.when(v > e, 1).otherwise(0),
    )
    return apply_to.crossJoin(F.broadcast(edges)).withColumn(
        out_col, bin_idx.cast("int")
    ).drop("edges")

"""N-gram language-model perplexity scoring — the CCNet filter, relational.

CCNet (Wenzek et al. 2020, public paper) ranks web documents by the
perplexity of a 5-gram KenLM trained on Wikipedia and keeps the
low-perplexity head/middle. The classifier twin of that stage already
exists here (operators/quality_model.py, the fastText shape); this
module supplies the LM-perplexity slot itself — reference-free, with
the LM TRAINED RELATIONALLY inside the engine instead of loaded from a
KenLM binary:

* train split  = a deterministic hash/modulo slice of the corpus (the
  stand-in for "clean reference corpus"; production points this at its
  Wikipedia-equivalent table),
* model        = bigram LM with add-one smoothing,
  ``P(w2|w1) = (C(w1,w2) + 1) / (C(w1) + V)``,
* score        = mean negative log-likelihood over a document's
  bigrams (log-perplexity in nats); low = fluent under the train
  distribution, high = noise / OOV-heavy.

Because training is nothing but counts, the WHOLE stage — train +
score — is exact relational algebra, so unlike a KenLM binary it is
DuckDB-oracle-checkable end to end, and it scales the way counts
scale:

1. Count tables are vocabulary-sized, not corpus-sized: the explode is
   corpus-token-scale but groupBy gets map-side partial aggregation,
   so the shuffle carries one row per distinct (bi)gram per partition.
2. Grouping/join keys are xxhash64 of the gram, never the string —
   fixed-width longs through every shuffle (the DuckDB oracle groups
   the STRINGS; the gate proving count equality is the collision
   argument used by every *_jaccard query).
3. Scoring joins the exploded bigrams to the two count tables hash-equi
   on those longs; AQE broadcasts the count tables when (as for any
   real vocabulary vs corpus) they are the small side. V arrives as a
   broadcast one-row cross join, not a driver-side collect.
4. One final groupBy(doc) mean — partial-aggregated — then a left join
   back to the doc spine so short documents (< 2 tokens) keep a row
   with NULL log-perplexity and keep=0.
5. The CCNet head/middle/tail assignment is a percent_rank over the
   ROUNDED score: rounding first turns would-be float-noise near-ties
   into exact ties, so both engines (and any two cluster runs) rank
   identically. At test scale this is one global window; at 100 TB the
   swap-in is two approx_percentile cutoffs (per language) joined back
   broadcast — same output contract, no total sort.

No per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# keep a document when its rounded bigram log-perplexity (nats) is at
# or below this bound — sits mid-distribution on the test corpus so
# both branches of the filter fire under the driver gate.
DEFAULT_KEEP_LOGPPL = 3.42

_EMPTY_BIGRAMS = "array()"


def _with_tokens(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("toks"))


def _bigrams(tokens_df: DataFrame, id_col: str) -> DataFrame:
    """(id, h1, hb) per adjacent token pair; docs under 2 tokens emit none.

    h1 = xxhash64(w1) keys the unigram-context count; hb =
    xxhash64(w1, w2) keys the bigram count (multi-arg xxhash64 chains
    per-column, so ("ab","c") and ("a","bc") key differently).
    """
    grams = F.when(
        F.size("toks") >= 2,
        F.expr(
            "transform(sequence(1, size(toks)-1),"
            " i -> struct(toks[i-1] AS w1, toks[i] AS w2))"
        ),
    ).otherwise(F.expr(f"CAST({_EMPTY_BIGRAMS} AS array<struct<w1:string,w2:string>>)"))
    return tokens_df.select(
        F.col(id_col), F.explode(grams).alias("bg")
    ).select(
        id_col,
        F.xxhash64(F.col("bg.w1")).alias("h1"),
        F.xxhash64(F.col("bg.w1"), F.col("bg.w2")).alias("hb"),
    )


def train_bigram_lm(
    train_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count tables of a bigram LM: (unigram, bigram, vocab).

    unigram: (h1, cu) — context counts over ALL tokens (the
    denominator's C(w1) counts every occurrence of w1, including a
    document's final token, matching the textbook add-one estimator
    computed over the token stream).
    bigram:  (hb, cb); vocab: one row (v_size).
    """
    t = _with_tokens(train_df, text_col, id_col)
    uni = (
        t.select(F.explode("toks").alias("tok"))
        .select(F.xxhash64("tok").alias("h1"))
        .groupBy("h1")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    bi = _bigrams(t, id_col).groupBy("hb").agg(F.count(F.lit(1)).alias("cb"))
    vocab = uni.agg(F.count(F.lit(1)).cast("double").alias("v_size"))
    return uni, bi, vocab


def score_log_perplexity(
    docs_df: DataFrame,
    uni: DataFrame,
    bi: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_logppl: float = DEFAULT_KEEP_LOGPPL,
) -> DataFrame:
    """(id, n_bigrams, lm_logppl, keep) for every document in docs_df.

    lm_logppl = mean over bigrams of -ln P_add1(w2|w1); NULL when the
    document has fewer than two tokens (keep=0 there — a one-token
    document carries no evidence of fluency).
    """
    bg = _bigrams(_with_tokens(docs_df, text_col, id_col), id_col)
    scored = (
        bg.join(bi, "hb", "left")
        .join(uni, "h1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            (
                -F.log(
                    (F.coalesce(F.col("cb"), F.lit(0)) + F.lit(1.0))
                    / (F.coalesce(F.col("cu"), F.lit(0)) + F.col("v_size"))
                )
            ).alias("nll"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("nll"), 4).alias("lm_logppl"),
        )
    )
    # CCNet tertiles among scoreable docs only (every lm_logppl here is
    # non-null, so engines never disagree on NULL sort position). The
    # single-partition window is the test-scale form; see module note 5.
    pr = F.percent_rank().over(Window.orderBy("lm_logppl"))
    bucketed = scored.select(
        id_col,
        "n_bigrams",
        "lm_logppl",
        F.when(pr <= 1.0 / 3.0, F.lit("head"))
        .when(pr <= 2.0 / 3.0, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
    )
    return (
        docs_df.select(id_col)
        .join(bucketed, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            F.col("lm_logppl"),
            F.col("ppl_bucket"),
            F.coalesce(
                (F.col("lm_logppl") <= F.lit(keep_logppl)).cast("int"), F.lit(0)
            ).alias("keep"),
        )
    )


def perplexity_filter(
    docs_df: DataFrame,
    train_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_logppl: float = DEFAULT_KEEP_LOGPPL,
) -> DataFrame:
    """Train on train_df (default: the doc_id-even half of docs_df —
    the deterministic stand-in for a clean reference corpus) and score
    every document of docs_df."""
    if train_df is None:
        train_df = docs_df.filter(F.col(id_col) % 2 == 0)
    uni, bi, vocab = train_bigram_lm(train_df, text_col, id_col)
    return score_log_perplexity(
        docs_df, uni, bi, vocab, text_col, id_col, keep_logppl
    )

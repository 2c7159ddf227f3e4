"""Model-based quality scoring: a linear text classifier as Columns.

The second standard stage of a curation pipeline, next to the heuristic
rule battery (operators/quality_rules.py): a linear model over token
features — the shape of CCNet's fastText LM-filter and the
fastText-classifier quality filters in LLaMA/Falcon-style data recipes
(Wenzek et al. 2020, "CCNet"; Joulin et al. 2017, "Bag of Tricks for
Efficient Text Classification" — public papers). Score = sigmoid(bias
+ mean token weight), i.e. a bag-of-words linear layer with mean
pooling, which is exactly fastText with 1-dim "embeddings" = weights.

Two executions of the same model:

* ``linear_score_columns`` — the weight table as a LITERAL MAP inside a
  single ``aggregate`` HOF: zero shuffle, whole-stage codegen, right
  for vocabularies up to a few thousand entries (the literal ships in
  the plan).
* ``linear_score_join`` — explode tokens, broadcast-join a weights
  DataFrame, one groupBy(doc) sum: the form for 100k+ vocabularies
  where a plan literal would bloat; the weight table broadcasts (it is
  tiny next to the corpus) and the groupBy gets map-side partial
  aggregation. A test pins the two forms equal.

Weights in production come from a trained model checkpoint loaded as a
table; ``DEMO_WEIGHTS`` is a deterministic fixture over the test
corpus vocabulary so the driver query and its DuckDB oracle share one
source of truth.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic fixture: "natural prose" markers positive, noise
# markers negative. Production swaps this dict for a learned checkpoint.
DEMO_WEIGHTS: dict[str, float] = {
    "the": 0.9,
    "a": 0.7,
    "of": 0.6,
    "and": 0.6,
    "data": 0.3,
    "query": 0.3,
    "table": 0.2,
    "row": 0.2,
    "value": 0.1,
    "window": 0.1,
    "join": -0.1,
    "hash": -0.2,
    "scan": -0.3,
    "slow": -0.8,
    "fast": 0.4,
}
DEMO_BIAS = -0.1


def _words(text: Column) -> Column:
    return F.split(text, " ")


def linear_score_columns(
    text: Column,
    weights: dict[str, float],
    bias: float = 0.0,
) -> dict[str, Column]:
    """score / prob columns from a literal-map linear model (no shuffle).

    ``score = bias + mean(weight[token], OOV = 0)``; ``prob`` is its
    sigmoid. Map lookup via element_at semantics (NULL when absent ->
    coalesce 0), the sum via one ``aggregate`` HOF pass.
    """
    scale = weights_int_scale(weights)
    if scale is not None:
        # Exact path: sum INTEGER scaled weights (order-independent —
        # integer addition is associative, float addition is not), then
        # divide once. This kills the cross-engine parity flake where a
        # score landing on a round(…, 6) boundary flipped between
        # Spark's text-order HOF fold and an oracle's group-sum order.
        wmap = F.create_map(
            *[
                F.lit(x)
                for tok, wt in sorted(weights.items())
                for x in (tok, int(round(wt * scale)))
            ]
        )
        toks = _words(text)
        total = F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, w: acc + F.coalesce(wmap[w], F.lit(0).cast("long")),
        )
        mean = (total / F.lit(float(scale))) / F.size(toks)
    else:
        wmap = F.create_map(
            *[F.lit(x) for kv in sorted(weights.items()) for x in kv]
        )
        toks = _words(text)
        total = F.aggregate(
            toks,
            F.lit(0.0),
            lambda acc, w: acc + F.coalesce(wmap[w], F.lit(0.0)),
        )
        mean = total / F.size(toks)
    score = F.lit(float(bias)) + mean
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-score))
    return {"quality_score": score, "quality_prob": prob}


def linear_score_join(
    df: DataFrame,
    weights_df: DataFrame,
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The same model, relational: for vocabularies too large to inline.

    ``weights_df``: (token string, weight double). Explode tokens,
    broadcast-join weights, one map-side-combinable groupBy(doc) sum.
    Returns (id, quality_score, quality_prob).
    """
    toks = _words(F.col(text_col))
    exploded = df.select(F.col(id_col), F.size(toks).alias("n"), F.explode(toks).alias("tok"))
    joined = exploded.join(F.broadcast(weights_df), exploded["tok"] == weights_df["token"], "left")
    agg = joined.groupBy(id_col, "n").agg(
        F.sum(F.coalesce(F.col("weight"), F.lit(0.0))).alias("total")
    )
    score = F.lit(float(bias)) + F.col("total") / F.col("n")
    return agg.select(
        id_col,
        score.alias("quality_score"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-score))).alias("quality_prob"),
    )


def weights_int_scale(weights: dict[str, float], max_pow: int = 6) -> int | None:
    """Smallest power-of-10 scale making every weight integral (checked
    to 1e-9), or None if no scale up to 10**max_pow works. Checkpoint
    weights are typically quantized decimals, so the exact integer-sum
    path almost always applies."""
    for p in range(max_pow + 1):
        s = 10 ** p
        if all(abs(w * s - round(w * s)) < 1e-9 for w in weights.values()):
            return s
    return None


def weights_values_sql(weights: dict[str, float]) -> str:
    """The fixture as a SQL VALUES list, for composing DuckDB oracles
    from the same dict the Spark plan uses."""
    rows = ", ".join(
        f"('{tok}', {wt}::DOUBLE)" for tok, wt in sorted(weights.items())
    )
    return f"(VALUES {rows})"


def weights_values_sql_scaled(weights: dict[str, float], scale: int) -> str:
    """Integer-scaled VALUES list — the oracle twin of the exact path in
    ``linear_score_columns``: sum BIGINTs, divide by the scale once, so
    the oracle's group-sum order cannot perturb the float result."""
    rows = ", ".join(
        f"('{tok}', {int(round(wt * scale))}::BIGINT)"
        for tok, wt in sorted(weights.items())
    )
    return f"(VALUES {rows})"


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))

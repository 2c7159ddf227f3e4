"""Relational BPE tokenizer training — byte-pair-merge learning as
pure DataFrame ops.

Tokenizer TRAINING is normally a single-node C++ loop (the
sentencepiece/HuggingFace trainers); at corpus scale the input is first
reduced to a word-frequency table and the merges are learned there.
This module does exactly that, entirely relationally, so the trainer
itself distributes and is deterministic:

1. corpus -> distinct-word frequency table (one map-side-combined
   groupBy — the only corpus-sized pass; everything after is
   vocabulary-sized);
2. words split to single-character token rows (w, wc, pos, tok);
3. per round: adjacent-pair counts weighted by word frequency
   (lead() over the in-word order, groupBy pair), the argmax pair
   under the deterministic (count DESC, left ASC, right ASC) order —
   kept as a one-row DataFrame and broadcast back, never collected —
   then GREEDY LEFT-TO-RIGHT NON-OVERLAPPING application of the merge.

The greedy application is the subtle part: matches at consecutive
positions overlap (only possible for runs like "aaaa" when left ==
right), and BPE consumes them left-to-right ("aaaa" -> "aa","aa", not
three overlapping "aa"s). Relationally that is gaps-and-islands:
consecutive match positions form an island (grp = pos - cumulative
match count), and a match is SELECTED iff its offset from the island
start is even. Selected rows become the merged token; the row after a
selected row is absorbed; positions re-index. Every step is a window
over (w, pos) — counts are exact longs, string compares are binary in
both engines, so the whole recurrence (argmax included) reproduces
bit-for-bit in the unrolled SQL oracle.

All windows partition by the word (vocabulary-sized table, no skew:
words are short); rounds unroll into one lazy plan. For production
round counts (10k+ merges), checkpoint every ~50 rounds like
dedup_cluster.py — each round is two narrow shuffles on a tiny table.

The reference has no tokenizer (fg_lite consumes already-typed
features); this is the training-data pipeline's tokenizer stage next
to token_count (text_analysis.py), which assumes a TRAINED vocab.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def word_freq(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (w, wc) distinct-word frequency table."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _char_rows(words: DataFrame) -> DataFrame:
    return words.select(
        "w", "wc", F.posexplode(F.split(F.col("w"), "")).alias("pos0", "tok")
    ).select("w", "wc", (F.col("pos0") + 1).alias("pos"), "tok")


def _merge_round(toks: DataFrame) -> DataFrame:
    w_ord = Window.partitionBy("w").orderBy("pos")
    p = toks.withColumn("nxt", F.lead("tok").over(w_ord))
    pc = (
        p.filter(F.col("nxt").isNotNull())
        .groupBy("tok", "nxt")
        .agg(F.sum("wc").alias("c"))
    )
    best = (
        pc.orderBy(F.col("c").desc(), F.col("tok").asc(), F.col("nxt").asc())
        .limit(1)
        .select(F.col("tok").alias("l"), F.col("nxt").alias("r"))
    )
    t = p.crossJoin(F.broadcast(best))
    t = t.withColumn(
        "match", (F.col("tok") == F.col("l")) & (F.col("nxt") == F.col("r"))
    )
    t = t.withColumn(
        "cum", F.sum(F.col("match").cast("int")).over(w_ord)
    ).withColumn("grp", F.when(F.col("match"), F.col("pos") - F.col("cum")))
    t = t.withColumn(
        "island_start",
        F.min(F.when(F.col("match"), F.col("pos"))).over(
            Window.partitionBy("w", "grp")
        ),
    )
    t = t.withColumn(
        "sel",
        F.col("match")
        & (((F.col("pos") - F.col("island_start")) % 2) == 0),
    )
    t = t.withColumn("absorbed", F.lag("sel").over(w_ord)).filter(
        F.col("absorbed").isNull() | ~F.col("absorbed")
    )
    return t.select(
        "w",
        "wc",
        F.row_number().over(w_ord).alias("pos"),
        F.when(F.col("sel"), F.concat("l", "r")).otherwise(F.col("tok")).alias(
            "tok"
        ),
    )


def bpe_token_counts(
    docs: DataFrame,
    rounds: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token count under the learned BPE merges — the real
    token-counting op (text_analysis.token_count approximates with a
    regex pre-tokenizer; this one uses the trained vocab). The apply
    path is a broadcast join of the document word stream against the
    vocabulary's tokenization (vocabulary-sized — at corpus scale this
    is THE reason BPE applies as a lookup, not a re-merge per doc), then
    one map-side-combined sum of per-word token counts."""
    vocab = bpe_train_tokenize(docs, rounds, text_col).select(
        "w", F.size("toks").alias("n_tok")
    )
    words = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("w")
    ).filter(F.col("w") != "")
    return (
        words.join(F.broadcast(vocab), "w")
        .groupBy(id_col)
        .agg(F.sum("n_tok").alias("n_tokens"))
    )


def bpe_train_tokenize(
    docs: DataFrame, rounds: int = 3, text_col: str = "text"
) -> DataFrame:
    """Learn ``rounds`` BPE merges on the corpus word-frequency table
    and return every distinct word tokenized under them:
    (w, wc, toks array<string>). The merge table itself is implied by
    the tokenization (and pinned separately in tests)."""
    toks = _char_rows(word_freq(docs, text_col))
    for _ in range(rounds):
        toks = _merge_round(toks)
    return (
        toks.groupBy("w", "wc")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ).alias("toks")
        )
    )

"""Deterministic synthetic conversation transcripts (BASELINE input_hint).

Schema: (conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp) — non-decreasing ts per conv_id.

Generation is *Spark-native and seed-deterministic*: every value derives
from ``xxhash64(seed, conv, turn)`` — no driver-side loops, no rand()
(stable under task retries), O(rows/cores) scale-out. The same call with
the same arguments produces byte-identical tables at any parallelism,
which is what lets bench.py compare local[8] vs local[32] runs fairly.

Skew: ``skew_conv_turns`` adds one mega-conversation (hot key) to exercise
the salted-aggregation and AQE paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "browser", "python", "calculator", "none"]
WORDS = (
    "the a of to and in for on with query plan join scan filter sort merge "
    "window agg spark table turn tool user model reply answer code test data "
    "stream batch key value hash range skew salt shuffle broadcast"
).split()

BASE_EPOCH = 1_700_000_000  # 2023-11-14T22:13:20Z


def _h(*cols) -> F.Column:
    return F.xxhash64(*cols)


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 100,
    max_turns: int = 50,
    seed: int = 42,
    skew_conv_turns: int = 0,
    partitions: int | None = None,
) -> DataFrame:
    """Build the deterministic transcripts DataFrame."""
    convs = spark.range(n_convs).select(
        F.format_string("conv_%08d", F.col("id")).alias("conv_id"),
        (
            3 + F.pmod(_h(F.lit(seed), F.col("id"), F.lit("nt")), F.lit(max_turns - 3))
        ).alias("n_turns"),
        F.pmod(_h(F.lit(seed), F.col("id"), F.lit("base")), F.lit(86400 * 30)).alias(
            "conv_base"
        ),
    )
    if skew_conv_turns > 0:
        skew = spark.range(1).select(
            F.lit("conv_mega").alias("conv_id"),
            F.lit(skew_conv_turns).alias("n_turns").cast("long"),
            F.lit(0).cast("long").alias("conv_base"),
        )
        convs = convs.unionByName(skew)

    turns = convs.select(
        "conv_id",
        "conv_base",
        F.explode(F.sequence(F.lit(0), (F.col("n_turns") - 1).cast("int"))).alias(
            "turn_idx"
        ),
    )
    if partitions:
        turns = turns.repartition(partitions, "conv_id")

    h = _h(F.lit(seed), F.col("conv_id"), F.col("turn_idx"))
    # inter-turn gap: mostly seconds-scale, ~6% long pauses (session breaks)
    gap = (
        F.when(F.pmod(h, F.lit(17)) == 0, 1800 + F.pmod(h, F.lit(7200)))
        .otherwise(1 + F.pmod(h, F.lit(120)))
        .cast("double")
    )
    w = Window.partitionBy("conv_id").orderBy("turn_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ts_sec = F.lit(BASE_EPOCH) + F.col("conv_base") + F.sum(gap).over(w)

    role = (
        F.when(F.col("turn_idx") == 0, F.lit("user"))
        .when(F.pmod(h, F.lit(5)) == 0, F.lit("tool"))
        .when(F.pmod(F.col("turn_idx"), F.lit(2)) == 1, F.lit("assistant"))
        .otherwise(F.lit("user"))
    )
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(*[F.lit(t) for t in TOOLS]),
            (F.pmod(_h(F.lit(seed), F.col("conv_id"), F.col("turn_idx"), F.lit("t")), F.lit(len(TOOLS))) + 1).cast("int"),
        ),
    )
    n_words = (3 + F.pmod(h, F.lit(20))).cast("int")
    words_arr = F.array(*[F.lit(wd) for wd in WORDS])
    text = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_words - 1),
            lambda j: F.element_at(
                words_arr,
                (
                    F.pmod(
                        _h(F.lit(seed), F.col("conv_id"), F.col("turn_idx"), j),
                        F.lit(len(WORDS)),
                    )
                    + 1
                ).cast("int"),
            ),
        ),
        " ",
    )

    return turns.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        F.timestamp_seconds(ts_sec).alias("ts"),
    )


def synth_snapshots(
    spark: SparkSession,
    transcripts: DataFrame,
    every_n_turns: int = 10,
) -> DataFrame:
    """Derived feature-snapshot table for as-of/backfill tests:
    one snapshot row per conversation every N turns, keyed (conv_id, ts)."""
    snaps = transcripts.filter(F.pmod(F.col("turn_idx"), F.lit(every_n_turns)) == 0)
    return snaps.select(
        "conv_id",
        F.col("ts").alias("snap_ts"),
        F.create_map(
            F.lit("turns_seen"),
            F.col("turn_idx").cast("double"),
            F.lit("text_len"),
            F.length("text").cast("double"),
        ).alias("feature_state"),
    )

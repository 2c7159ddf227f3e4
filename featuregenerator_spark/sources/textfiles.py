"""Line-oriented text sources: JSONL and CSV readers/writers.

Raw corpora arrive overwhelmingly as line-delimited text (JSONL dumps,
CSV exports) before they are compacted into parquet/Iceberg. Both
formats are line-splittable, so a 100 TB directory parallelizes across
executors at file-split granularity exactly like parquet — PROVIDED the
schema is declared explicitly: ``inferSchema``/schema sampling adds a
full extra pass over the data and can flip column types between daily
drops, so every reader here requires a DDL schema and never infers.

Timestamps cross the text boundary as explicitly-formatted strings
(microsecond precision, session UTC) rather than relying on the
writers' default timestamp rendering, which differs between engines
and Spark versions. CSV uses RFC 4180 quoting (quote-doubling, not
backslash escapes — Spark's default escape is ``\\`` which silently
corrupts fields containing quotes on the read side if the writer
quoted RFC-style).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# microsecond-lossless wire format for TIMESTAMP_NTZ columns
TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

# the events table's text-file schema: ts travels as a string column
EVENTS_TEXT_DDL = (
    "event_id long, ts_str string, user_id long, event_type string, "
    "value double, props string"
)

_CSV_OPTS = {
    "header": "true",
    "quote": '"',
    "escape": '"',
    # Spark's CSV WRITER defaults these to true and silently trims padded
    # string fields on write (the reader defaults to false) — a lossy
    # asymmetry; declare both sides lossless
    "ignoreLeadingWhiteSpace": "false",
    "ignoreTrailingWhiteSpace": "false",
}


def _to_text_form(events: DataFrame) -> DataFrame:
    return events.select(
        "event_id",
        F.date_format("ts", TS_FMT).alias("ts_str"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def _from_text_form(df: DataFrame) -> DataFrame:
    return df.select(
        "event_id",
        F.to_timestamp("ts_str", TS_FMT).alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def write_events_jsonl(events: DataFrame, path: str) -> None:
    """Write events as line-delimited JSON (one object per line)."""
    _to_text_form(events).write.mode("overwrite").json(path)


def read_events_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read a JSONL events directory with the declared schema (no
    inference pass) and restore the timestamp column."""
    return _from_text_form(spark.read.schema(EVENTS_TEXT_DDL).json(path))


def write_events_csv(events: DataFrame, path: str) -> None:
    """Write events as RFC 4180 CSV with a header line."""
    w = _to_text_form(events).write.mode("overwrite")
    for k, v in _CSV_OPTS.items():
        w = w.option(k, v)
    w.csv(path)


def read_events_csv(spark: SparkSession, path: str) -> DataFrame:
    """Read a CSV events directory with the declared schema and RFC 4180
    quoting (quote-doubling) and restore the timestamp column."""
    r = spark.read.schema(EVENTS_TEXT_DDL)
    for k, v in _CSV_OPTS.items():
        r = r.option(k, v)
    return _from_text_form(r.csv(path))


CORRUPT_COL = "_corrupt"


def read_events_jsonl_audited(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE JSONL ingest: ``(good, quarantined)``.

    At 100 TB a single malformed line must not fail the job (FAILFAST)
    or silently become an all-null row (PERMISSIVE without auditing) —
    it must be quarantined WITH the raw line for replay. PERMISSIVE
    mode + ``columnNameOfCorruptRecord`` gives exactly that: a corrupt
    line yields nulls for unparseable fields and the verbatim line in
    the corrupt column. Note the partial-row semantics: a type
    mismatch on ONE field (e.g. a string event_id) still parses the
    other fields but flags the row — so "good" is strictly
    ``_corrupt IS NULL``, never "event_id IS NOT NULL".

    Engine quirk, found by test: with the native JSON reader, ANY plan
    whose column set collapses to just the corrupt pseudo-column —
    including a plain ``good.count()``, where the optimizer prunes
    everything but the filter's ``_corrupt`` reference — raises
    ``UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN`` unless the
    relation is cached (a non-starter at ingest scale). So this reads
    ``spark.read.text`` + ``from_json`` instead: one identical
    file-split-parallel scan, no pseudo-column restriction, and the
    verbatim raw line comes for free as the text value.
    """
    ddl = f"{EVENTS_TEXT_DDL}, {CORRUPT_COL} string"
    flat = (
        spark.read.text(path)
        .select(
            F.col("value").alias("raw_line"),
            F.from_json(
                "value",
                ddl,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
            ).alias("r"),
        )
        .select("raw_line", "r.*")
    )
    good = _from_text_form(
        flat.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL, "raw_line")
    )
    quarantined = flat.filter(F.col(CORRUPT_COL).isNotNull()).select(
        "event_id", "raw_line"
    )
    return good, quarantined


def read_events_csv_audited(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """PERMISSIVE CSV ingest: ``(good, quarantined)`` — the CSV twin of
    :func:`read_events_jsonl_audited`, same ``read.text`` + ``from_csv``
    shape for the same reason (the native reader's corrupt
    pseudo-column restriction) and the same partial-row semantics (a
    type-mismatch field still parses its neighbors; "good" is strictly
    ``_corrupt IS NULL``).

    CSV-specific handling: the writer emits a header line per part
    file, which a text-level parse would see as one corrupt row per
    file — header lines are filtered by exact text (derived from the
    DDL, so the two cannot drift apart). Line-oriented auditing
    assumes no embedded newlines inside quoted fields (the events wire
    format never emits them); multiline CSV needs the native reader
    and loses the corrupt audit.
    """
    ddl = f"{EVENTS_TEXT_DDL}, {CORRUPT_COL} string"
    header = ",".join(
        p.strip().split()[0] for p in EVENTS_TEXT_DDL.split(",")
    )
    opts = {k: v for k, v in _CSV_OPTS.items() if k != "header"}
    opts.update(
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
    )
    flat = (
        spark.read.text(path)
        .filter(F.col("value") != header)
        .select(
            F.col("value").alias("raw_line"),
            F.from_csv("value", ddl, opts).alias("r"),
        )
        .select("raw_line", "r.*")
    )
    good = _from_text_form(
        flat.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL, "raw_line")
    )
    quarantined = flat.filter(F.col(CORRUPT_COL).isNotNull()).select(
        "event_id", "raw_line"
    )
    return good, quarantined

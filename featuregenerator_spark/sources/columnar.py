"""Columnar binary source formats beyond parquet: ORC.

Raw corpora land as line-delimited text (textfiles.py) and are compacted
into a columnar container for the hot path. Parquet is this repo's
default; ORC is the other Spark-native columnar format (vectorized
reader, whole-stage codegen scan, predicate pushdown, and per-stripe
min/max plus optional bloom-filter indexes). Two contracts carried over
from the text readers, both of which matter at 100 TB:

- **Declared schema, never footer-trusted.** Each ORC file embeds its
  own schema; reading a multi-day directory by footer silently unions
  drifted types. The reader here applies one declared DDL so a type
  drift between daily drops fails loudly at plan time instead.
- **Index the point-lookup keys at write time.** Bloom filters on
  ``event_id``/``user_id`` let a selective scan prune whole stripes
  (the pushed filter is checked against the index before any row
  decode), which is the difference between touching 100 TB and
  touching the few stripes that can match.

ZSTD compression is pinned explicitly rather than inherited from the
session default so files written by different jobs stay byte-compatible
for compaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# the events table's columnar schema: ts stays a native TIMESTAMP_NTZ
# column (no text boundary, so no format string — exact microseconds)
EVENTS_ORC_DDL = (
    "event_id long, ts timestamp_ntz, user_id long, event_type string, "
    "value double, props string"
)


def write_events_orc(events: DataFrame, path: str) -> None:
    """Write events as ZSTD ORC with bloom-filter indexes on the two
    point-lookup key columns."""
    (
        events.select(
            "event_id", "ts", "user_id", "event_type", "value", "props"
        )
        .write.mode("overwrite")
        .option("compression", "zstd")
        .option("orc.bloom.filter.columns", "event_id,user_id")
        .orc(path)
    )


def read_events_orc(
    spark: SparkSession, path: str, ddl: str = EVENTS_ORC_DDL
) -> DataFrame:
    """Read an ORC events directory with the declared schema (footer
    schemas are not trusted across daily drops)."""
    return spark.read.schema(ddl).orc(path)


def read_evolved(spark: SparkSession, ddl: str, *paths: str) -> DataFrame:
    """Read daily-drop directories whose files predate a column
    addition, under one declared TARGET schema.

    Schema evolution the declarative way: parquet/ORC scans accept a
    user schema that is a SUPERSET of any file's footer — files missing
    a column yield nulls for it, vectorized, with no per-file branching
    and, unlike ``mergeSchema``, no footer-union pre-pass over every
    file on the driver (at 100 TB that pre-pass is a full listing +
    footer fetch per file). Renames/retypes stay loud failures — only
    additive evolution is silently tolerated, which is the contract a
    curated lake wants.
    """
    return spark.read.schema(ddl).parquet(*paths)

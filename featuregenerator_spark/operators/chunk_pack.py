"""Document chunking + sequence packing — the training-batch tail of a
curation pipeline.

After filtering/dedup, documents become model-ready sequences in two
steps: CHUNK long documents into overlapping token windows (context-
window fitting: a 40k-token document becomes ~20 chunks of 2048 with a
small overlap so no span is ever split mid-context), then PACK chunks
into fixed-capacity bins (training batches waste whatever a bin leaves
empty, so packing density is a direct compute-cost knob).

Both stages are pure relational programs:

- ``chunk_documents`` is map-only — one ``sequence``/``transform``/
  ``slice`` higher-order expression per row, no shuffle, no UDF. A
  document yields ceil((n - overlap) / (stride)) chunks (stride =
  max_tokens - overlap); short documents pass through as one chunk.
- ``pack_chunks`` assigns contiguous deterministic bins per group: a
  running token total over (group, doc, chunk) order, then
  ``pack_id = floor(exclusive_cumsum / capacity)`` — the standard
  streaming-packing approximation (a chunk may straddle a boundary by
  at most one chunk length; first-fit-decreasing would need sequential
  state for ~1 extra-percent density). The window partitions by the
  ``by`` grouping column(s) — at 100 TB pack within natural shards
  (source, date) rather than globally, exactly the skew contract the
  window family documents (a single global pack order would serialize;
  per-shard packing shards the sort, and shard boundaries waste at most
  one bin each).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    max_tokens: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per (document, chunk): ``chunk_idx`` (0-based),
    ``chunk_text`` (whitespace tokens rejoined), ``chunk_tokens``.

    Chunk i covers tokens [i*stride, i*stride + max_tokens) with
    stride = max_tokens - overlap; the last chunk may be short. Empty
    documents yield one empty chunk (they were someone's row — dropping
    silently would break row-count lineage)."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive: {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < max_tokens: {overlap}"
        )
    stride = max_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1), F.ceil((n - F.lit(overlap)) / F.lit(stride)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.slice(toks, i * stride + 1, max_tokens).alias("ctoks"),
        ),
    )
    ex = docs.select(
        id_col, F.explode(chunks).alias("c")
    )
    return ex.select(
        id_col,
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.array_join(F.col("c.ctoks"), " ").alias("chunk_text"),
        F.size(F.col("c.ctoks")).alias("chunk_tokens"),
    )


def pack_chunks(
    chunks: DataFrame,
    capacity: int,
    by: list[str] | None = None,
    id_col: str = "doc_id",
    tokens_col: str = "chunk_tokens",
    order_cols: list[str] | None = None,
    out_prefix: str = "pack",
) -> DataFrame:
    """Deterministic contiguous packing: within each ``by`` group,
    chunks in ``order_cols`` order (default (doc, chunk)) accumulate
    into bins of ``capacity`` tokens — ``<out_prefix>_id`` (0-based per
    group) and ``<out_prefix>_offset`` (the bin's token count before
    this chunk) added to every row."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive: {capacity}")
    parts = by or []
    w = (
        Window.partitionBy(*parts)
        .orderBy(*(order_cols or [id_col, "chunk_idx"]))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_excl = F.sum(tokens_col).over(w) - F.col(tokens_col)
    pack_id = F.floor(cum_excl / capacity).cast("long")
    return chunks.withColumn(f"{out_prefix}_id", pack_id).withColumn(
        f"{out_prefix}_offset", (cum_excl - pack_id * capacity).cast("long")
    )


def materialize_packs(
    packed: DataFrame,
    by: list[str] | None = None,
    id_col: str = "doc_id",
    text_col: str = "chunk_text",
    tokens_col: str = "chunk_tokens",
    pack_col: str = "pack_id",
    separator: str = "<|endofchunk|>",
) -> DataFrame:
    """One row per bin: the pack's chunks concatenated in (doc, chunk)
    order with a separator token — the sequence a trainer actually
    consumes. Order inside the aggregate comes from sorting an array of
    (doc, chunk, text) structs (Spark sorts structs lexicographically),
    so the result is deterministic without a second window pass; the
    groupBy is map-side-combinable and shuffles one narrow row per
    (group, pack)."""
    parts = (by or []) + [pack_col]
    ordered = F.array_sort(
        F.collect_list(
            F.struct(F.col(id_col), F.col("chunk_idx"), F.col(text_col))
        )
    )
    return (
        packed.groupBy(*parts)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(tokens_col).alias("n_tokens"),
            F.array_join(
                F.transform(ordered, lambda s: s[text_col]), separator
            ).alias("packed_text"),
        )
    )

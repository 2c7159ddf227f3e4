"""Chunking + packing invariants: coverage, overlap, bin discipline."""

import pytest

from pyspark.sql import functions as F

from featuregenerator_spark.operators.chunk_pack import (
    chunk_documents,
    pack_chunks,
)


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_chunk_coverage_and_overlap(spark):
    """Every token appears in some chunk; consecutive chunks share
    exactly `overlap` tokens; token order is preserved."""
    words = [f"w{i}" for i in range(100)]
    docs = _mkdocs(spark, [" ".join(words)])
    out = sorted(
        chunk_documents(docs, max_tokens=40, overlap=8).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # stride 32: chunks start at 0, 32, 64, 96 -> ceil((100-8)/32) = 3
    assert len(out) == 3
    toks = [r["chunk_text"].split(" ") for r in out]
    assert toks[0] == words[0:40]
    assert toks[1] == words[32:72]
    assert toks[2] == words[64:100]  # short last chunk
    assert toks[0][-8:] == toks[1][:8]  # overlap content identical
    covered = set(toks[0]) | set(toks[1]) | set(toks[2])
    assert covered == set(words)


def test_short_and_empty_documents(spark):
    docs = _mkdocs(spark, ["a b c", ""])
    out = {
        (r["doc_id"], r["chunk_idx"]): r
        for r in chunk_documents(docs, max_tokens=40, overlap=8).collect()
    }
    assert len(out) == 2  # one chunk each, including the empty doc
    assert out[(0, 0)]["chunk_text"] == "a b c"
    assert out[(0, 0)]["chunk_tokens"] == 3
    assert out[(1, 0)]["chunk_tokens"] == 1  # split('') -> ['']


def test_chunk_validation():
    with pytest.raises(ValueError, match="max_tokens"):
        chunk_documents(None, max_tokens=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(None, max_tokens=10, overlap=10)
    with pytest.raises(ValueError, match="capacity"):
        pack_chunks(None, capacity=0)


def test_pack_bin_discipline(spark):
    """Bins fill contiguously: offsets start at 0 per bin, a chunk that
    would cross the boundary starts the next bin region (straddle by at
    most one chunk), and pack_ids are dense-ish nondecreasing in order."""
    docs = _mkdocs(
        spark, [" ".join(f"t{i}_{j}" for j in range(70)) for i in range(10)]
    )
    ch = chunk_documents(docs, max_tokens=40, overlap=0)
    packed = sorted(
        pack_chunks(ch, capacity=100).collect(),
        key=lambda r: (r["doc_id"], r["chunk_idx"]),
    )
    cum = 0
    for r in packed:
        assert r["pack_id"] == cum // 100
        assert r["pack_offset"] == cum - r["pack_id"] * 100
        cum += r["chunk_tokens"]
    # per-group packing restarts ids within each group
    docs2 = docs.withColumn("source", (F.col("doc_id") % 2).cast("string"))
    ch2 = chunk_documents(docs2, max_tokens=40, overlap=0).join(
        docs2.select("doc_id", "source"), "doc_id"
    )
    p2 = pack_chunks(ch2, capacity=100, by=["source"]).collect()
    firsts = {}
    for r in sorted(p2, key=lambda r: (r["source"], r["doc_id"], r["chunk_idx"])):
        firsts.setdefault(r["source"], r["pack_id"])
    assert all(v == 0 for v in firsts.values())


def test_materialize_packs_order_and_content(spark):
    """Packed text preserves (doc, chunk) order across bins, counts add
    up, and the separator never corrupts chunk boundaries."""
    from featuregenerator_spark.operators.chunk_pack import (
        chunk_documents,
        materialize_packs,
        pack_chunks,
    )

    docs = _mkdocs(
        spark, [" ".join(f"d{i}w{j}" for j in range(25)) for i in range(6)]
    )
    ch = chunk_documents(docs, max_tokens=10, overlap=0)
    packed = pack_chunks(ch, capacity=30)
    out = {r["pack_id"]: r for r in materialize_packs(packed).collect()}
    # 6 docs x (10+10+5) tokens = 150 tokens -> 5 bins of 30
    assert set(out) == {0, 1, 2, 3, 4}
    all_chunks = sorted(
        packed.collect(), key=lambda r: (r["doc_id"], r["chunk_idx"])
    )
    sep = "<|endofchunk|>"
    for pid, r in out.items():
        members = [c for c in all_chunks if c["pack_id"] == pid]
        assert r["n_chunks"] == len(members)
        assert r["n_tokens"] == sum(c["chunk_tokens"] for c in members)
        assert r["packed_text"] == sep.join(c["chunk_text"] for c in members)

"""B-tree and bitmap-sparse legacy codec tests.

Golden vectors and structural expectations transcribed from the reference
test suite (fg_lite/feature/test/BTreeTest.cpp, LookupSparseTest.cpp) —
the byte layouts are specified in BTree.h / StoreMapDataBTreeVisitor.h /
LookupFeatureSparseEncoder.h and autil/bitmap.cpp:7-17 (MSB-first u32
slots).
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from featuregenerator_spark.operators.lookup_legacy import (
    _pack_bitmap,
    btree_layout_order,
    decode_btree,
    decode_sparse,
    encode_btree,
    encode_sparse,
    encode_sparse_raw,
    lookup_legacy_btree,
    lookup_legacy_sparse,
    murmur64a,
    synth_legacy_btree_payloads,
    synth_legacy_sparse_payloads,
)


# ---------------------------------------------------------------------------
# B-tree layout
# ---------------------------------------------------------------------------


def test_btree_layout_matches_reference_structure():
    """BTreeTest.testStoreMapDataMultiLayer: n=7, B=3 gives root={4,6,7},
    first child {1,2,3}, last leaf {5} (1-indexed sorted ranks), stored in
    BFS order; n=15, B=3 is the full two-layer tree."""
    assert (btree_layout_order(7, 3) + 1).tolist() == [4, 6, 7, 1, 2, 3, 5]
    assert (btree_layout_order(15, 3) + 1).tolist() == [
        4, 8, 12, 1, 2, 3, 5, 6, 7, 9, 10, 11, 13, 14, 15,
    ]
    # single (possibly partial) root block: identity
    assert (btree_layout_order(2, 3)).tolist() == [0, 1]
    assert (btree_layout_order(3, 3)).tolist() == [0, 1, 2]
    assert btree_layout_order(0, 3).tolist() == []


def test_btree_empty_doc_is_bare_header():
    """BTreeTest.testEncodeEmptyDoc: empty map encodes to the 12-byte
    header alone."""
    assert len(encode_btree({}, 1, 16, key_type=6, value_type=2)) == 12


@pytest.mark.parametrize("block", [4, 8, 16, 32])
def test_btree_roundtrip_across_sizes(block):
    """BTreeTest.testMurmurHashKeyAndFind shape: every size in a range
    probes back every key and misses absent ones, across block sizes
    (22..88 in the reference; sampled here plus edge sizes)."""
    for n in (1, 2, 22, 32, 59, 88):
        m = {f"w{i}": [float(i + 1)] for i in range(n)}
        buf = encode_btree(m, 1, block, key_type=6, value_type=2)
        kt, keys, vals = decode_btree(buf, 1)
        assert kt == 6 and len(keys) == n
        got = dict(zip(keys.tolist(), vals[:, 0].tolist()))
        want = {murmur64a(f"w{i}".encode()): float(i + 1) for i in range(n)}
        assert got == want


def test_btree_16bit_keys_and_8bit_values():
    """Narrow widths round-trip: 16-bit key slice, 8-bit values with the
    0xFF missing sentinel -> NaN."""
    m = {"a": [3.0, float("nan")], "b": [7.0, 9.0], "c": [1.0, 2.0]}
    buf = encode_btree(m, 2, 4, key_type=0, value_type=0)
    kt, keys, vals = decode_btree(buf, 2)
    assert kt == 0 and keys.dtype == np.dtype("<u2")
    by_key = {int(k): v for k, v in zip(keys, vals)}
    ka = murmur64a(b"a") & 0xFFFF
    assert by_key[ka][0] == 3.0 and np.isnan(by_key[ka][1])


def test_btree_spark_probe(spark):
    """End-to-end probe over Spark with a hand-checkable combine."""
    df = spark.createDataFrame(
        [(1, 10.0, 3.0), (2, 20.0, 5.0)], "id long, x double, y double"
    )
    enc = synth_legacy_btree_payloads(
        df,
        {"x": [F.col("x")], "y": [F.col("y")], "z": [F.col("x") + F.col("y")]},
        dim=1,
        block_size=2,  # 3 keys, block 2 -> a real two-node tree
        value_type=2,
    )
    out = lookup_legacy_btree(enc, "payload", ["x", "z", "missing"], dim=1)
    rows = {r["id"]: r["bt_d0"] for r in out.collect()}
    assert rows == {1: 10.0 + 13.0, 2: 20.0 + 25.0}


# ---------------------------------------------------------------------------
# Bitmap-sparse layout
# ---------------------------------------------------------------------------


def test_sparse_encoded_lengths_match_reference():
    """LookupSparseTest.testConstruct golden lengths: keyNum=2, 5 non-zero
    values, dim=4 for all nine (key width x value width) combos."""
    m = {100: [0.0, 11.0, 22.0, 33.0], 200: [0.0, 44.0, 55.0, 0.0]}
    expected = {
        (0, 0): 29, (0, 1): 34, (0, 2): 44,
        (4, 0): 33, (4, 1): 38, (4, 2): 48,
        (6, 0): 41, (6, 1): 46, (6, 2): 56,
    }
    for (kt, vt), want in expected.items():
        assert len(encode_sparse_raw(m, 4, kt, vt)) == want, (kt, vt)


def test_sparse_bitmap_is_msb_first_u32():
    """autil::Bitmap bit order: bit i lives at mask 0x80000000 >> (i%32)
    of little-endian u32 slot i//32 (bitmap.cpp:7-17); the encodeValue
    golden ({1.0,0,2.0,0,1.1} @ dim 4 -> 12 bytes) follows."""
    bm = _pack_bitmap(np.array([True, False, True, False]))
    assert bm == (0x80000000 | 0x20000000).to_bytes(4, "little")
    blob = bm + np.array([1.0, 2.0], dtype="<f4").tobytes()
    assert len(blob) == 12


@pytest.mark.parametrize("kt", [0, 4, 6])
@pytest.mark.parametrize("vt", [0, 1, 2])
def test_sparse_roundtrip_all_type_combos(kt, vt):
    """LookupSparseTest.testEncodeDecode: zeros drop out of storage and
    decode back as 0.0; absent keys stay absent."""
    vals = (
        {123: [0.0, 11.0, 22.0, 33.0], 234: [0.0, 44.0, 55.0, 0.0]}
        if vt != 2
        else {123: [0.0, 1.1, 2.2, 3.3], 234: [0.0, 4.4, 5.5, 0.0]}
    )
    buf = encode_sparse_raw(vals, 4, kt, vt)
    keys, dense = decode_sparse(buf, 4, kt, vt)
    assert keys.tolist() == [123, 234]
    exp = np.array(
        [
            [np.float64(np.float32(x)) if vt == 2 else float(int(x)) for x in v]
            for v in vals.values()
        ]
    )
    assert np.allclose(dense, exp)
    assert decode_sparse(b"", 4, kt, vt)[0].size == 0


def test_sparse_word_keys_hash_and_slice():
    m = {"alpha": [1.5, 0.0], "beta": [0.0, 2.5]}
    buf = encode_sparse(m, 2, key_type=4, value_type=2)
    keys, dense = decode_sparse(buf, 2, 4, 2)
    ka = murmur64a(b"alpha") & 0xFFFFFFFF
    i = keys.tolist().index(ka)
    assert dense[i].tolist() == [1.5, 0.0]


def test_sparse_spark_probe(spark):
    df = spark.createDataFrame(
        [(1, 2.0, 3.0), (2, 4.0, 6.0)], "id long, x double, y double"
    )
    enc = synth_legacy_sparse_payloads(
        df,
        {"x": [F.col("x"), F.col("x") * 2], "y": [F.col("y"), F.col("y") * 3]},
        dim=2,
        value_type=2,
    )
    out = lookup_legacy_sparse(
        enc, "payload", ["x", "y", "missing"], dim=2
    )
    rows = {r["id"]: (r["sp_d0"], r["sp_d1"]) for r in out.collect()}
    assert rows == {1: (5.0, 13.0), 2: (10.0, 26.0)}


def test_sparse_synth_rejects_zero_values(spark):
    df = spark.createDataFrame([(1, 0.0)], "id long, x double")
    enc = synth_legacy_sparse_payloads(
        df, {"x": [F.col("x")]}, dim=1, value_type=2
    )
    with pytest.raises(Exception, match="non-zero"):
        enc.collect()

"""Distributed write-side legacy codecs (operators/lookup_writer.py):
operator output must be byte-identical to the per-row encoders (which
hold the layout goldens from the reference's own tests, see
tests/test_legacy_codecs.py), decode back to the input values for every
codec, and reject invalid codec requests at plan time."""

import math

import pytest

from pyspark.sql import functions as F

from featuregenerator_spark.operators.lookup_legacy import (
    decode_btree,
    decode_sparse,
    decode_v3,
    encode_btree,
    encode_legacy_v2,
    encode_sparse,
    encode_v3,
    murmur64a,
)
from featuregenerator_spark.operators.lookup_writer import (
    encode_lookup_entries,
)

ROWS = [
    (1, [("alpha", 3.0), ("beta", 1.0), ("gamma", 250.0)]),
    (2, [("delta", 7.0)]),
    (3, [("alpha", 1.0), ("zz", 65000.0), ("beta", 2.0), ("q", 1.0)]),
]


def _df(spark):
    return spark.createDataFrame(
        ROWS,
        "id long, entries array<struct<key: string, value: double>>",
    )


def test_operator_bytes_equal_per_row_encoders(spark):
    got = {
        r["id"]: r
        for r in encode_lookup_entries(
            _df(spark),
            "entries",
            {
                "p_v2": "v2",
                "p_v3": "v3",
                "p_sp": "sparse",
                "p_bt": ("btree", {"block_size": 2}),
            },
        ).collect()
    }
    for rid, entries in ROWS:
        m1 = {k: v for k, v in entries}
        md = {k: [v] for k, v in entries}
        assert bytes(got[rid]["p_v2"]) == encode_legacy_v2(m1)
        assert bytes(got[rid]["p_v3"]) == encode_v3(md, 1)
        assert bytes(got[rid]["p_sp"]) == encode_sparse(md, 1)
        assert bytes(got[rid]["p_bt"]) == encode_btree(md, 1, block_size=2)


def test_multidim_roundtrip_through_decoders(spark):
    nan = float("nan")
    rows = [(1, [("a", [1.0, 2.0]), ("b", [3.0, nan])])]
    df = spark.createDataFrame(
        rows, "id long, entries array<struct<key: string, value: array<double>>>"
    )
    out = encode_lookup_entries(
        df, "entries",
        {"p_v3": "v3", "p_bt": ("btree", {"block_size": 2})},
        dim=2,
    ).collect()[0]
    _, k3, v3 = decode_v3(bytes(out["p_v3"]), dim=2)
    by_val0 = sorted(v3.tolist())
    assert by_val0[0][0] == 1.0 and by_val0[0][1] == 2.0
    assert by_val0[1][0] == 3.0 and math.isnan(by_val0[1][1])
    _, kb, vb = decode_btree(bytes(out["p_bt"]), dim=2)
    assert sorted(x[0] for x in vb.tolist()) == [1.0, 3.0]


def test_entry_order_does_not_change_bytes(spark):
    fwd = spark.createDataFrame(
        [(1, [("a", 1.0), ("b", 2.0), ("c", 3.0)])],
        "id long, entries array<struct<key: string, value: double>>",
    )
    rev = spark.createDataFrame(
        [(1, [("c", 3.0), ("b", 2.0), ("a", 1.0)])],
        "id long, entries array<struct<key: string, value: double>>",
    )
    codecs = {"p_v2": "v2", "p_v3": "v3", "p_sp": "sparse", "p_bt": "btree"}
    a = encode_lookup_entries(fwd, "entries", codecs).collect()[0]
    b = encode_lookup_entries(rev, "entries", codecs).collect()[0]
    for c in codecs:
        assert bytes(a[c]) == bytes(b[c])


def test_invalid_requests_raise_at_plan_time(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="unknown codec"):
        encode_lookup_entries(df, "entries", {"p": "v9"})
    with pytest.raises(ValueError, match="scalar-valued"):
        encode_lookup_entries(df, "entries", {"p": "v2"}, dim=2)


def test_sparse_operator_drops_zero_values(spark):
    df = spark.createDataFrame(
        [(1, [("a", 0.0), ("b", 5.0)])],
        "id long, entries array<struct<key: string, value: double>>",
    )
    out = encode_lookup_entries(df, "entries", {"p": "sparse"}).collect()[0]
    keys, vals = decode_sparse(bytes(out["p"]), dim=1, key_type=6, value_type=2)
    dense = {int(k): v[0] for k, v in zip(keys.tolist(), vals.tolist())}
    ha = murmur64a(b"a")
    hb = murmur64a(b"b")
    assert dense[hb] == 5.0
    assert dense[ha] == 0.0  # absent bit restores as 0.0

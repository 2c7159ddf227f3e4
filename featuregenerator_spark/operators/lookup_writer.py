"""Distributed write-side legacy codecs: encode per-row lookup maps into
the reference byte layouts (V2 / V3 / sparse / B-tree) as ONE Arrow pass.

The per-row byte layouts live in ``operators/lookup_legacy.py`` (decode
side + golden layout pins vs the reference's own tests:
``LookupFeatureEncoder.cpp:1-302``, ``LookupFeatureSparseEncoder.cpp:
87-116``, ``LookupFeatureBTreeEncoder.h``, layout goldens from
``BTreeTest.cpp`` / ``LookupSparseTest.cpp`` /
``LookupFeatureFunctionV3Test.cpp``). This module lifts those per-row
encoders to a DataFrame operator so a user migrating INTO this engine
can (re)produce reference-encoded binary columns at scale — fixture
generation, backfill of encoded feature stores, or A/B parity tables.

Scale shape: encoding is embarrassingly parallel by row — one
``mapInPandas`` pass writes every requested codec column per Arrow
batch (no shuffle, no second scan); the payloads ride Parquet
binary+ZSTD downstream. The roundtrip driver query
(``legacy_encode_roundtrip``) proves encode -> decode == the direct
relational computation through the DuckDB gate.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from featuregenerator_spark.operators.lookup_legacy import (
    encode_btree,
    encode_legacy_v2,
    encode_sparse,
    encode_v3,
)

_CODECS = ("v2", "v3", "sparse", "btree")


def _encode_one(codec: str, mapping: dict, dim: int, opts: dict) -> bytes:
    if codec == "v2":
        # V2 is scalar-valued: dim must be 1 and values unwrap
        return encode_legacy_v2({k: v[0] for k, v in mapping.items()})
    if codec == "v3":
        return encode_v3(mapping, dim, **opts)
    if codec == "sparse":
        return encode_sparse(mapping, dim, **opts)
    if codec == "btree":
        return encode_btree(
            mapping, dim, block_size=opts.get("block_size", 4),
            key_type=opts.get("key_type", 6),
            value_type=opts.get("value_type", 2),
        )
    raise ValueError(f"unknown codec: {codec!r}")


def encode_lookup_entries(
    df: DataFrame,
    entries_col: str,
    codecs: dict[str, str] | dict[str, tuple[str, dict]],
    dim: int = 1,
) -> DataFrame:
    """Add one binary payload column per requested codec, encoding the
    row's ``entries_col`` (``array<struct<key: string, value: ...>>``;
    ``value`` a double when ``dim == 1``, else an array of ``dim``
    doubles) in the reference byte layout.

    ``codecs`` maps output column name -> codec name (one of ``v2``,
    ``v3``, ``sparse``, ``btree``) or ``(codec name, options dict)``
    (e.g. ``{"p": ("btree", {"block_size": 3})}``). All requested codecs
    encode in the same Arrow batch loop — one pass, no shuffle. Key
    order inside a row does not matter: every layout sorts by hashed key
    internally, so the operator is deterministic under any upstream
    ``collect_list`` ordering.
    """
    specs = []
    for out_col, c in codecs.items():
        codec, opts = c if isinstance(c, tuple) else (c, {})
        if codec not in _CODECS:
            raise ValueError(f"unknown codec: {codec!r}")
        if codec == "v2" and dim != 1:
            raise ValueError("v2 is scalar-valued: dim must be 1")
        specs.append((out_col, codec, opts))

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", " + ", ".join(f"{c} binary" for c, _, _ in specs)

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {c: [] for c, _, _ in specs}
            for entries in pdf[entries_col]:
                if entries is None:
                    # a NULL entries row (e.g. a key with no history
                    # after an outer join) encodes as NULL payloads, not
                    # a worker TypeError that kills the whole job
                    for out_col, _, _ in specs:
                        cols[out_col].append(None)
                    continue
                mapping = {
                    e["key"]: (
                        [float(e["value"])]
                        if dim == 1
                        else [float(x) for x in e["value"]]
                    )
                    for e in entries
                }
                for out_col, codec, opts in specs:
                    cols[out_col].append(
                        _encode_one(codec, mapping, dim, opts)
                    )
            pdf = pdf.copy()
            for out_col, vals in cols.items():
                pdf[out_col] = vals
            yield pdf

    return df.mapInPandas(encode, schema=out_schema)

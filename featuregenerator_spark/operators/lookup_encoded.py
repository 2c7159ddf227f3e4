"""lookup_feature_v2 / v3 / btree — hashed-map probe semantics.

Reference (``fg_lite/feature/LookupFeatureFunctionV2.cpp:34-323``,
``...V3.cpp:44-190``, ``...BTree.cpp:38-118``): the offline phase packs a
``map<murmur64(key) -> float[dim]>`` into a binary string column (legacy V2
``count|u64 keys|f32 values``, V3 headers with key/value bit-width
minification, sparse bitmap and B-tree blocked layouts); the online phase
decodes and probes (sorted lower_bound merge / AVX block search).

Those byte layouts are *physical RPC compression*, not semantics
(SURVEY.md §4) — the Spark-native carrier is simply a
``MapType(LongType, ArrayType(FloatType))`` column stored in Parquet
(dictionary+ZSTD supersede the bit-width tricks). What we keep:

  - key hashing: probe key k -> hash64(k); we use ``xxhash64`` (Spark
    built-in, stable across the table lifetime). murmur64A identity only
    matters when decoding reference-encoded bytes, which we don't port.
  - per-dimension combine over multi-probe keys (V3 multi-value output):
    element-wise sum/min/max/mean with first-hit-initialises semantics
    (``Combiner.h:92-158``).
  - miss handling: misses contribute nothing; all-miss -> 0-filled vector.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def encode_map(keys: Column, values: Column) -> Column:
    """Offline phase: parallel arrays -> map<xxhash64(key), value>.

    keys: array<string|numeric>; values: array<T> (scalar or array per key).
    """
    hashed = F.transform(keys, lambda k: F.xxhash64(k.cast("string")))
    return F.map_from_arrays(hashed, values)


def lookup_encoded_scalar(
    encoded: Column,
    probe_keys: Column,
    combiner: str = "sum",
) -> Column:
    """V2 path: map<long,float> probe + scalar combine -> double."""
    from featuregenerator_spark.functions.combiners import combine_array

    probed = F.transform(
        probe_keys,
        lambda k: F.try_element_at(encoded, F.xxhash64(k.cast("string"))).cast("double"),
    )
    return combine_array(probed, combiner)


def lookup_encoded_multidim(
    encoded: Column,
    probe_keys: Column,
    value_dimension: int,
    combiner: str = "sum",
) -> Column:
    """V3 path: map<long, array<float>> probe + element-wise combine.

    Returns array<double> of length value_dimension (0.0 where no probe
    key hit — Combiner.h multi-dim empty semantics).
    """
    hit_vecs = F.filter(
        F.transform(
            probe_keys,
            lambda k: F.try_element_at(encoded, F.xxhash64(k.cast("string"))),
        ),
        lambda v: v.isNotNull(),
    )
    dims = F.sequence(F.lit(0), F.lit(value_dimension - 1))

    def per_dim(i: Column) -> Column:
        vals = F.transform(hit_vecs, lambda v: F.try_element_at(v, i + 1).cast("double"))
        from featuregenerator_spark.functions.combiners import combine_array

        return combine_array(vals, combiner)

    return F.transform(dims, per_dim)

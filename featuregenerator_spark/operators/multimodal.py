"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real (schema, Arrow batching over mapInPandas,
partition sizing); only the codec calls are stubbed behind
``NotImplementedError`` / a deterministic fake, because the image/audio
libraries are not in this container. On a real cluster, swap `_decode_*`
for PIL/torchaudio/ffmpeg calls — the batch shape and UDF signatures stay
unchanged.

Layout convention (one row per asset):
    asset_id:long, kind:string('image'|'audio'|'video'),
    payload:binary, meta:map<string,string>
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_DDL = (
    "asset_id long, kind string, payload binary, meta map<string,string>"
)

FEATURE_DDL = (
    "asset_id long, kind string, n_bytes int, payload_hash string, "
    "feature array<float>"
)

_FEATURE_DIM = 8


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for decode + feature extraction.

    REAL IMPLEMENTATION REQUIRED on cluster: decode payload (PIL/ffmpeg),
    resize / frame-sample, run the feature extractor. The fake derives a
    stable 8-dim vector from payload bytes so tests pin the plumbing.
    """
    if payload is None:
        return [0.0] * _FEATURE_DIM
    acc = [0] * _FEATURE_DIM
    for i, b in enumerate(payload):
        acc[i % _FEATURE_DIM] = (acc[i % _FEATURE_DIM] + b) % 997
    return [v / 997.0 for v in acc]


def decode_assets(assets: DataFrame, batch_rows: int = 256) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow transports payloads zero-copy into pandas; batch_rows bounds
    memory per task (binary payloads can be MBs each — at 100 TB the
    parallelism unit must be the asset, not the file).
    """
    import hashlib

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                yield pd.DataFrame(
                    {
                        "asset_id": chunk["asset_id"],
                        "kind": chunk["kind"],
                        "n_bytes": chunk["payload"].map(
                            lambda p: 0 if p is None else len(p)
                        ),
                        "payload_hash": chunk["payload"].map(
                            lambda p: hashlib.md5(p or b"").hexdigest()
                        ),
                        "feature": chunk["payload"].map(_fake_decode_features),
                    }
                )

    return assets.mapInPandas(extract, schema=FEATURE_DDL)


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Stub: real impl decodes, resizes, re-encodes via PIL in mapInPandas."""
    raise NotImplementedError(
        "image codec not available in this container; wire PIL in "
        "decode_assets-style mapInPandas on a real cluster"
    )


def sample_video_frames(assets: DataFrame, every_n: int) -> DataFrame:
    """Stub: real impl uses ffmpeg frame sampling in mapInPandas."""
    raise NotImplementedError(
        "video codec not available in this container; wire ffmpeg in "
        "decode_assets-style mapInPandas on a real cluster"
    )


def synth_assets(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake binary assets for plumbing tests."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    h = F.xxhash64(F.col("id"), F.lit(seed))
    return spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.element_at(kinds, (F.pmod(h, F.lit(3)) + 1).cast("int")).alias("kind"),
        F.encode(
            F.concat(F.lit("payload_"), F.conv(h.cast("string"), 10, 16)), "UTF-8"
        ).cast("binary").alias("payload"),
        F.create_map(
            F.lit("src"), F.concat(F.lit("synthetic:"), F.col("id").cast("string"))
        ).alias("meta"),
    )

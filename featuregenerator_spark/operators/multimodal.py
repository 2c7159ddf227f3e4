"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real (schema, Arrow batching over mapInPandas,
partition sizing). The audio path is a REAL codec end-to-end: WAV
(RIFF/WAVE + PCM) parses with the stdlib ``wave`` module — see
``decode_wav_assets``. Image/video codecs need libraries this container
lacks, so those calls are stubbed behind ``NotImplementedError`` / a
deterministic fake; on a real cluster, swap them for PIL/ffmpeg calls —
the batch shape and UDF signatures stay unchanged.

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


WAV_FEATURE_DDL = (
    "asset_id long, n_channels int, sample_width int, sample_rate int, "
    "n_frames int, duration_s double, rms double"
)


def synth_wav_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Deterministic 16-bit PCM WAV payloads, one per input id: a square
    wave whose amplitude and length derive from the id (Arrow-batched
    generation; the payload is a byte-exact RIFF/WAVE file written by the
    stdlib ``wave`` codec)."""
    import io
    import wave

    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col].astype("int64"):
                amp = 1000 + (int(i) % 7) * 100
                n_frames = 800 + (int(i) % 5) * 80
                samples = np.empty(n_frames, dtype=np.int16)
                samples[0::2] = amp
                samples[1::2] = -amp
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(8000)
                    w.writeframes(samples.tobytes())
                payloads.append(buf.getvalue())
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "kind": "audio",
                    "payload": payloads,
                }
            )

    return ids.mapInPandas(gen, schema="asset_id long, kind string, payload binary")


def decode_wav_assets(assets: DataFrame, batch_rows: int = 256) -> DataFrame:
    """REAL audio decode path: parse each binary payload with the stdlib
    ``wave`` codec (RIFF/WAVE container + PCM frames) inside mapInPandas
    and emit per-asset audio features — header fields plus the RMS of the
    int16 samples (numpy, vectorized per asset). This is the pattern the
    PIL/ffmpeg paths follow on a real cluster; WAV needs no external
    library, so this one runs end-to-end here."""
    import io
    import wave

    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for aid, payload in zip(chunk["asset_id"], chunk["payload"]):
                    with wave.open(io.BytesIO(payload), "rb") as w:
                        nch = w.getnchannels()
                        sw = w.getsampwidth()
                        rate = w.getframerate()
                        nf = w.getnframes()
                        frames = w.readframes(nf)
                    samples = np.frombuffer(frames, dtype=np.int16).astype(np.float64)
                    rms = float(np.sqrt(np.mean(samples * samples))) if len(samples) else 0.0
                    rows.append(
                        (int(aid), nch, sw, rate, nf, nf / float(rate), rms)
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "asset_id", "n_channels", "sample_width", "sample_rate",
                        "n_frames", "duration_s", "rms",
                    ],
                )

    return assets.mapInPandas(decode, schema=WAV_FEATURE_DDL)


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

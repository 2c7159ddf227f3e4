"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real (schema, Arrow batching over mapInPandas,
partition sizing). All three codec paths are REAL end-to-end: audio —
WAV (RIFF/WAVE + PCM) via the stdlib ``wave`` module
(``decode_wav_assets``); image — 24-bit BMP via a pure-numpy
reader/writer (``decode_bmp_assets`` / ``resize_images``); video —
YUV4MPEG2 (.y4m) uncompressed planar streams via a pure-numpy
reader/writer (``decode_y4m_assets`` / ``sample_video_frames``).
Compressed codecs (JPEG/PNG/H.264) swap in PIL/ffmpeg on a real
cluster — the batch shape and UDF signatures stay unchanged.

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


# ---------------------------------------------------------------------------
# REAL image codec path: 24-bit uncompressed BMP (BITMAPFILEHEADER +
# BITMAPINFOHEADER + bottom-up BGR rows padded to 4 bytes) needs no
# external library, so — like the WAV path above — it runs end-to-end
# here. JPEG/PNG swap in PIL with the same batch shape on a cluster.
# ---------------------------------------------------------------------------


def _bmp_encode(rgb) -> bytes:
    """(H, W, 3) uint8 RGB -> byte-exact 24bpp BMP file."""
    import struct

    import numpy as np

    h, w, _ = rgb.shape
    row_len = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    img_size = row_len * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, row_len), dtype=np.uint8)
    rows[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    return header + info + rows.tobytes()


def _bmp_decode(buf: bytes):
    """24bpp BMP bytes -> (H, W, 3) uint8 RGB (top-down)."""
    import struct

    import numpy as np

    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", buf, 10)[0]
    _, w, h = struct.unpack_from("<Iii", buf, 14)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    compression = struct.unpack_from("<I", buf, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    top_down, hh = h < 0, abs(h)
    row_len = (w * 3 + 3) & ~3
    data = np.frombuffer(buf, dtype=np.uint8, count=row_len * hh, offset=off)
    rgb = data.reshape(hh, row_len)[:, : w * 3].reshape(hh, w, 3)[:, :, ::-1]
    return rgb if top_down else rgb[::-1]


def synth_bmp_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Deterministic RGB test images, one real BMP payload per id:
    W = 16 + id%8, H = 12 + id%5; R constant (id % 251), G = column
    index, B = row index — chosen so the channel means have closed
    forms the SQL oracle can state exactly."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col].astype("int64"):
                i = int(i)
                w, h = 16 + i % 8, 12 + i % 5
                rgb = np.empty((h, w, 3), dtype=np.uint8)
                rgb[:, :, 0] = i % 251
                rgb[:, :, 1] = np.arange(w, dtype=np.uint8)[None, :]
                rgb[:, :, 2] = np.arange(h, dtype=np.uint8)[:, None]
                payloads.append(_bmp_encode(rgb))
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "kind": "image",
                    "payload": payloads,
                }
            )

    return ids.mapInPandas(gen, schema="asset_id long, kind string, payload binary")


IMAGE_FEATURE_DDL = (
    "asset_id long, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


def decode_bmp_assets(assets: DataFrame, batch_rows: int = 256) -> DataFrame:
    """REAL image decode path: parse each binary payload with the pure-
    numpy BMP reader inside mapInPandas and emit per-asset image features
    (dimensions + per-channel means)."""
    import numpy as np

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for aid, payload in zip(chunk["asset_id"], chunk["payload"]):
                    rgb = _bmp_decode(bytes(payload))
                    means = rgb.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        (
                            int(aid), int(rgb.shape[1]), int(rgb.shape[0]),
                            float(means[0]), float(means[1]), float(means[2]),
                        )
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "asset_id", "width", "height",
                        "mean_r", "mean_g", "mean_b",
                    ],
                )

    return assets.mapInPandas(decode, schema=IMAGE_FEATURE_DDL)


def synth_png_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Deterministic RGB test images, one REAL compressed PNG payload per
    id (pure-numpy encoder, stdlib-zlib DEFLATE; ``operators/png.py``).
    Same closed-form pattern as the BMP synth (W = 16 + id%8,
    H = 12 + id%5; constant R, column-gradient G, row-gradient B) so the
    SQL oracle is identical. Encoded with the "cycle" filter strategy —
    scanline y uses filter y % 5 — so every decode branch (None / Sub /
    Up / Average / Paeth) is exercised by every payload."""
    import numpy as np

    from featuregenerator_spark.operators.png import png_encode

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col].astype("int64"):
                i = int(i)
                w, h = 16 + i % 8, 12 + i % 5
                rgb = np.empty((h, w, 3), dtype=np.uint8)
                rgb[:, :, 0] = i % 251
                rgb[:, :, 1] = np.arange(w, dtype=np.uint8)[None, :]
                rgb[:, :, 2] = np.arange(h, dtype=np.uint8)[:, None]
                payloads.append(png_encode(rgb, filter_strategy="cycle"))
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "kind": "image",
                    "payload": payloads,
                }
            )

    return ids.mapInPandas(gen, schema="asset_id long, kind string, payload binary")


def decode_png_assets(assets: DataFrame, batch_rows: int = 256) -> DataFrame:
    """REAL compressed-image decode path: CRC-checked chunk parse, zlib
    inflate, and scanline unfiltering (pure numpy) inside mapInPandas;
    emits the same per-asset features as the BMP path. Grayscale
    payloads report the luma in all three channel means."""
    import numpy as np

    from featuregenerator_spark.operators.png import png_decode

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for aid, payload in zip(chunk["asset_id"], chunk["payload"]):
                    img = png_decode(bytes(payload))
                    if img.ndim == 2:
                        m = float(img.mean())
                        means = np.array([m, m, m])
                    else:
                        means = img.reshape(-1, 3).mean(axis=0)
                    rows.append(
                        (
                            int(aid), int(img.shape[1]), int(img.shape[0]),
                            float(means[0]), float(means[1]), float(means[2]),
                        )
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "asset_id", "width", "height",
                        "mean_r", "mean_g", "mean_b",
                    ],
                )

    return assets.mapInPandas(decode, schema=IMAGE_FEATURE_DDL)


def resize_images(
    assets: DataFrame, width: int, height: int, batch_rows: int = 256
) -> DataFrame:
    """Decode each BMP payload, nearest-neighbor resample to
    (width, height) with numpy index maps, re-encode as BMP — same
    columns out as in. PIL's Image.resize swaps in for JPEG/PNG inputs
    with the identical batch shape."""
    import numpy as np

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows].copy()
                out = []
                for payload in chunk["payload"]:
                    rgb = _bmp_decode(bytes(payload))
                    h, w, _ = rgb.shape
                    ys = (np.arange(height) * h) // height
                    xs = (np.arange(width) * w) // width
                    out.append(_bmp_encode(rgb[np.ix_(ys, xs)]))
                chunk["payload"] = out
                yield chunk

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in assets.schema.fields
    )
    return assets.mapInPandas(resize, schema=schema)


# ---------------------------------------------------------------------------
# REAL video codec path: YUV4MPEG2 (.y4m) — a plain-text stream header
# ("YUV4MPEG2 W.. H.. F.. .. C444\n") followed by "FRAME\n" + raw planar
# YUV bytes per frame. It is a real interchange format (ffmpeg/x264's
# uncompressed intermediate) that needs no external library, so — like
# WAV and BMP above — decode, feature-extract and frame-sample run
# end-to-end here. Compressed codecs (H.264 etc.) swap in ffmpeg with
# the identical batch shape on a cluster.
# ---------------------------------------------------------------------------


def _y4m_encode(frames, fps: str = "25:1") -> bytes:
    """(N, H, W, 3) uint8 planar-YUV-per-pixel array -> C444 .y4m bytes."""
    n, h, w, _ = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps} Ip A1:1 C444\n".encode("ascii")
    parts = [head]
    for f in range(n):
        parts.append(b"FRAME\n")
        # planar: full Y plane, then U, then V (C444 = no subsampling)
        parts.append(frames[f, :, :, 0].tobytes())
        parts.append(frames[f, :, :, 1].tobytes())
        parts.append(frames[f, :, :, 2].tobytes())
    return b"".join(parts)


def _y4m_decode(buf: bytes):
    """C444/Cmono .y4m bytes -> ((N, H, W, 3) uint8 YUV frames, fps str).
    Cmono fills U/V with the neutral 128."""
    import numpy as np

    nl = buf.index(b"\n")
    tokens = buf[:nl].split(b" ")
    if tokens[0] != b"YUV4MPEG2":
        raise ValueError("not a YUV4MPEG2 payload")
    w = h = None
    fps = "25:1"
    colorspace = b"C420"
    for t in tokens[1:]:
        if t[:1] == b"W":
            w = int(t[1:])
        elif t[:1] == b"H":
            h = int(t[1:])
        elif t[:1] == b"F":
            fps = t[1:].decode("ascii")
        elif t[:1] == b"C":
            colorspace = t
    if w is None or h is None:
        raise ValueError("missing W/H in y4m header")
    if colorspace.startswith(b"C444"):
        plane_count = 3
    elif colorspace.startswith(b"Cmono"):
        plane_count = 1
    else:
        raise ValueError(f"unsupported y4m colorspace {colorspace!r}")
    frame_bytes = plane_count * w * h
    frames = []
    pos = nl + 1
    while pos < len(buf):
        fnl = buf.index(b"\n", pos)
        if buf[pos : pos + 5] != b"FRAME":
            raise ValueError("bad y4m frame marker")
        pos = fnl + 1
        planes = np.frombuffer(buf, dtype=np.uint8, count=frame_bytes, offset=pos)
        if plane_count == 3:
            frames.append(planes.reshape(3, h, w).transpose(1, 2, 0))
        else:
            yuv = np.empty((h, w, 3), dtype=np.uint8)
            yuv[:, :, 0] = planes.reshape(h, w)
            yuv[:, :, 1:] = 128
            frames.append(yuv)
        pos += frame_bytes
    import numpy as _np

    return _np.stack(frames) if frames else _np.empty((0, h, w, 3), _np.uint8), fps


def synth_y4m_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Deterministic C444 .y4m payloads, one per id: W = 8 + 2*(id%4),
    H = 6 + 2*(id%3), n_frames = 4 + id%4; frame f has constant luma
    (id%200 + f), U = column index, V = row index — so frame count, luma
    mean and the frame-sampled luma mean all have closed forms the SQL
    oracle states exactly."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col].astype("int64"):
                i = int(i)
                w, h, n = 8 + 2 * (i % 4), 6 + 2 * (i % 3), 4 + i % 4
                frames = np.empty((n, h, w, 3), dtype=np.uint8)
                for f in range(n):
                    frames[f, :, :, 0] = (i % 200 + f) & 0xFF
                frames[:, :, :, 1] = np.arange(w, dtype=np.uint8)[None, None, :]
                frames[:, :, :, 2] = np.arange(h, dtype=np.uint8)[None, :, None]
                payloads.append(_y4m_encode(frames))
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "kind": "video",
                    "payload": payloads,
                }
            )

    return ids.mapInPandas(gen, schema="asset_id long, kind string, payload binary")


VIDEO_FEATURE_DDL = (
    "asset_id long, width int, height int, n_frames int, fps string, "
    "mean_y double"
)


def decode_y4m_assets(assets: DataFrame, batch_rows: int = 64) -> DataFrame:
    """REAL video decode path: parse each .y4m payload inside mapInPandas
    and emit per-asset features (dimensions, frame count, frame rate,
    mean luma over all frames). batch_rows is smaller than the image/
    audio paths because video payloads are frames x planes big."""
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for aid, payload in zip(chunk["asset_id"], chunk["payload"]):
                    frames, fps = _y4m_decode(bytes(payload))
                    n, h, w, _ = frames.shape
                    mean_y = float(frames[:, :, :, 0].mean()) if n else 0.0
                    rows.append((int(aid), w, h, n, fps, mean_y))
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "asset_id", "width", "height", "n_frames", "fps",
                        "mean_y",
                    ],
                )

    return assets.mapInPandas(decode, schema=VIDEO_FEATURE_DDL)


def sample_video_frames(
    assets: DataFrame, every_n: int, batch_rows: int = 64
) -> DataFrame:
    """REAL frame sampling: decode each .y4m payload, keep frames
    0, every_n, 2*every_n, ..., re-encode — same columns out as in.
    ffmpeg's select filter swaps in for compressed inputs with the
    identical batch shape."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows].copy()
                out = []
                for payload in chunk["payload"]:
                    frames, fps = _y4m_decode(bytes(payload))
                    out.append(_y4m_encode(frames[::every_n], fps))
                chunk["payload"] = out
                yield chunk

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in assets.schema.fields
    )
    return assets.mapInPandas(sample, schema=schema)


# ---------------------------------------------------------------------------
# REAL compressed-image codec path: baseline-sequential JPEG via the
# pure-numpy codec in operators/jpeg.py (Annex K tables, Huffman entropy
# coding, byte stuffing, restart markers). Unlike BMP/WAV/Y4M above this
# exercises an actual entropy-coded format — the compressed-codec slot —
# with no PIL/ffmpeg. Color swaps in PIL with the identical batch shape.
# ---------------------------------------------------------------------------


def synth_jpeg_assets(
    ids: DataFrame, id_col: str = "asset_id", quality: int = 50
) -> DataFrame:
    """Deterministic grayscale JPEG payloads, one per id: a 16x16 image of
    four 8x8 blocks in raster order, block b constant at
    128 + 2*((id + b) % 60 - 30). Even offsets make the DC quantization
    at quality 50 (q00 = 16) exact, so the decoded image equals the
    source bit-for-bit and every emitted stat has a closed form the SQL
    oracle states exactly. AC-active content is covered by the
    transform-domain roundtrip pins in tests/test_jpeg.py."""
    import numpy as np

    from featuregenerator_spark.operators.jpeg import jpeg_encode_gray

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col].astype("int64"):
                i = int(i)
                img = np.empty((16, 16), dtype=np.uint8)
                for b in range(4):
                    r, c = (b // 2) * 8, (b % 2) * 8
                    img[r : r + 8, c : c + 8] = 128 + 2 * ((i + b) % 60 - 30)
                payloads.append(jpeg_encode_gray(img, quality))
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "kind": "image",
                    "payload": payloads,
                }
            )

    return ids.mapInPandas(gen, schema="asset_id long, kind string, payload binary")


def synth_jpeg_color_assets(
    ids: DataFrame, id_col: str = "asset_id", quality: int = 50
) -> DataFrame:
    """Deterministic COLOR JPEG payloads (3-component YCbCr, 4:2:0
    interleaved MCUs, chroma tables + chroma Huffman classes), one per
    id: a 16x16 RGB image of four flat gray blocks (R=G=B, even offsets
    from 128). Gray values make the color transform exact (Y = v,
    Cb = Cr = 128 up to float eps that quantizes to zero), so the whole
    color pipeline — MCU layout, both Huffman table classes, chroma
    subsample/upsample, inverse color transform — roundtrips bit-exact
    and the per-channel means have closed forms the oracle states.
    Chromatic content is pinned bit-exact against the transform-domain
    reference in tests/test_jpeg.py (random RGB, 4:4:4 and 4:2:0)."""
    import numpy as np

    from featuregenerator_spark.operators.jpeg import jpeg_encode

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col].astype("int64"):
                i = int(i)
                img = np.empty((16, 16, 3), dtype=np.uint8)
                for b in range(4):
                    r, c = (b // 2) * 8, (b % 2) * 8
                    img[r : r + 8, c : c + 8, :] = 128 + 2 * ((i + b) % 60 - 30)
                payloads.append(jpeg_encode(img, quality, subsampling="420"))
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].astype("int64"),
                    "kind": "image",
                    "payload": payloads,
                }
            )

    return ids.mapInPandas(gen, schema="asset_id long, kind string, payload binary")


JPEG_COLOR_FEATURE_DDL = (
    "asset_id long, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


def decode_jpeg_color_assets(assets: DataFrame, batch_rows: int = 256) -> DataFrame:
    """Full color JPEG decode (marker parse -> interleaved-MCU Huffman
    decode with per-component predictors -> dequantize -> IDCT -> chroma
    upsample -> YCbCr->RGB) per payload inside mapInPandas."""
    import numpy as np

    from featuregenerator_spark.operators.jpeg import jpeg_decode

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for aid, payload in zip(chunk["asset_id"], chunk["payload"]):
                    rgb = jpeg_decode(bytes(payload))
                    means = rgb.reshape(-1, 3).mean(axis=0, dtype=np.float64)
                    rows.append(
                        (
                            int(aid), int(rgb.shape[1]), int(rgb.shape[0]),
                            float(means[0]), float(means[1]), float(means[2]),
                        )
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "asset_id", "width", "height",
                        "mean_r", "mean_g", "mean_b",
                    ],
                )

    return assets.mapInPandas(decode, schema=JPEG_COLOR_FEATURE_DDL)


JPEG_FEATURE_DDL = (
    "asset_id long, width int, height int, mean_y double, "
    "y_first int, y_last int"
)


def decode_jpeg_assets(assets: DataFrame, batch_rows: int = 256) -> DataFrame:
    """REAL compressed-image decode path: full baseline JPEG decode
    (marker parse -> Huffman entropy decode -> dequantize -> IDCT) per
    payload inside mapInPandas; emits dimensions, mean luma and the
    first/last pixel values."""
    import numpy as np

    from featuregenerator_spark.operators.jpeg import jpeg_decode_gray

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                rows = []
                for aid, payload in zip(chunk["asset_id"], chunk["payload"]):
                    img = jpeg_decode_gray(bytes(payload))
                    rows.append(
                        (
                            int(aid), int(img.shape[1]), int(img.shape[0]),
                            float(np.mean(img, dtype=np.float64)),
                            int(img[0, 0]), int(img[-1, -1]),
                        )
                    )
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "asset_id", "width", "height", "mean_y",
                        "y_first", "y_last",
                    ],
                )

    return assets.mapInPandas(decode, schema=JPEG_FEATURE_DDL)


TONE_FEATURE_DDL = (
    "asset_id long, sample_rate int, n_frames int, zcr int, rms double, "
    "dominant_bin int, dominant_hz double"
)

_TONE_N = 1600
_TONE_SR = 8000
_TONE_HALF_PERIODS = (2, 4, 5, 8, 10)


def synth_tone_wav_assets(ids: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Deterministic square-tone WAV payloads whose spectral features have
    closed forms: half-period ``p`` samples and amplitude derive from the
    id, ``n`` is a multiple of every ``2*p``, so the sampled signal is
    exactly periodic — RMS == amp, zero-crossing count == n/p - 1, and
    the FFT fundamental at bin n/(2*p) dominates every harmonic by a
    >= 2.4x magnitude margin (verified over all id classes)."""
    import io
    import wave

    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col].astype("int64"):
                p = _TONE_HALF_PERIODS[int(i) % 5]
                amp = 1000 + (int(i) % 7) * 100
                period = np.concatenate(
                    [np.full(p, amp, np.int16), np.full(p, -amp, np.int16)]
                )
                samples = np.tile(period, _TONE_N // (2 * p))
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(_TONE_SR)
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


def audio_spectral_features(assets: DataFrame, batch_rows: int = 256) -> DataFrame:
    """REAL audio analysis beyond container decode: per-asset DSP inside
    mapInPandas — zero-crossing count, exact RMS, and the dominant
    non-DC frequency via a vectorized batched rfft (all payloads in one
    batch share the frame count, so the FFT runs as ONE numpy matrix op
    per batch, not per asset). The parallelism unit is the asset;
    batch_rows bounds per-task memory exactly like the codec paths, so
    the same shape holds on a 1000-executor cluster."""
    import io
    import wave

    import numpy as np

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[start : start + batch_rows]
                ids, rates, sigs = [], [], []
                for aid, payload in zip(chunk["asset_id"], chunk["payload"]):
                    with wave.open(io.BytesIO(payload), "rb") as w:
                        rate = w.getframerate()
                        nf = w.getnframes()
                        frames = w.readframes(nf)
                    ids.append(int(aid))
                    rates.append(rate)
                    sigs.append(
                        np.frombuffer(frames, dtype=np.int16).astype(np.float64)
                    )
                # group by frame count so each group FFTs as one 2-D batch
                out = {}
                lengths = np.array([len(s) for s in sigs])
                for n in np.unique(lengths):
                    sel = np.nonzero(lengths == n)[0]
                    x = np.stack([sigs[j] for j in sel])
                    mag = np.abs(np.fft.rfft(x, axis=1))
                    dom = np.argmax(mag[:, 1:], axis=1) + 1
                    zcr = np.count_nonzero(np.diff(np.sign(x), axis=1), axis=1)
                    rms = np.sqrt(np.mean(x * x, axis=1))
                    for k, j in enumerate(sel):
                        out[j] = (
                            ids[j],
                            rates[j],
                            int(n),
                            int(zcr[k]),
                            float(rms[k]),
                            int(dom[k]),
                            float(dom[k] * rates[j] / n),
                        )
                yield pd.DataFrame(
                    [out[j] for j in range(len(sigs))],
                    columns=[
                        "asset_id", "sample_rate", "n_frames", "zcr", "rms",
                        "dominant_bin", "dominant_hz",
                    ],
                )

    return assets.mapInPandas(feats, schema=TONE_FEATURE_DDL)


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

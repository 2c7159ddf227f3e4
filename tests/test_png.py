"""PNG codec: exact roundtrips per filter, chunk/CRC handling, Spark path."""

import struct
import zlib

import numpy as np
import pytest

from featuregenerator_spark.operators.png import (
    PNG_SIG,
    _chunk,
    png_decode,
    png_encode,
)

STRATS = ["none", "sub", "up", "average", "paeth", "cycle", "adaptive"]


@pytest.mark.parametrize("strat", STRATS)
@pytest.mark.parametrize(
    "shape", [(12, 16, 3), (5, 1, 3), (1, 7, 3), (9, 23), (1, 1), (33, 17, 3)]
)
def test_roundtrip_exact(shape, strat):
    img = np.random.default_rng(sum(shape) * 31 + len(strat)).integers(
        0, 256, size=shape, dtype=np.uint8
    )
    out = png_decode(png_encode(img, strat))
    assert out.shape == img.shape
    assert (out == img).all()


def test_adaptive_compresses_gradient():
    img = np.zeros((64, 64, 3), np.uint8)
    img[:, :, 1] = np.arange(64, dtype=np.uint8)[None, :]
    img[:, :, 2] = np.arange(64, dtype=np.uint8)[:, None]
    assert len(png_encode(img, "adaptive")) < len(png_encode(img, "none")) / 10


def test_crc_corruption_raises():
    buf = bytearray(png_encode(np.zeros((4, 4), np.uint8), "none"))
    # flip one byte inside the IDAT payload (after sig+IHDR chunk)
    idat_at = bytes(buf).index(b"IDAT")
    buf[idat_at + 6] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(buf))


def test_multi_idat_equivalent():
    img = np.random.default_rng(3).integers(0, 256, (6, 5, 3), dtype=np.uint8)
    buf = png_encode(img, "paeth")
    # re-split the single IDAT into two chunks
    at = buf.index(b"IDAT") - 4
    (length,) = struct.unpack_from(">I", buf, at)
    payload = buf[at + 8 : at + 8 + length]
    head, tail = buf[:at], buf[at + 12 + length :]
    two = head + _chunk(b"IDAT", payload[:3]) + _chunk(b"IDAT", payload[3:]) + tail
    assert (png_decode(two) == img).all()


def test_ancillary_chunk_skipped():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    buf = png_encode(img, "up")
    at = buf.index(b"IDAT") - 4
    buf = buf[:at] + _chunk(b"tEXt", b"k\x00v") + buf[at:]
    assert (png_decode(buf) == img).all()


def test_rejects_unsupported():
    with pytest.raises(ValueError, match="not a PNG"):
        png_decode(b"BM123456789")
    # hand-build a 16-bit-depth IHDR
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    buf = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported PNG"):
        png_decode(buf)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)  # Adam7
    buf = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlace"):
        png_decode(buf)
    with pytest.raises(ValueError, match="truncated"):
        png_decode(PNG_SIG + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)))


def test_truncated_stream_raises():
    img = np.zeros((4, 4, 3), np.uint8)
    buf = png_encode(img, "none")
    # drop IEND entirely
    with pytest.raises(ValueError, match="truncated"):
        png_decode(buf[:-12])


def test_spark_png_end_to_end(spark):
    from featuregenerator_spark.operators.multimodal import (
        decode_png_assets,
        synth_png_assets,
    )

    ids = spark.range(0, 40).selectExpr("id as asset_id")
    feats = decode_png_assets(synth_png_assets(ids)).collect()
    assert len(feats) == 40
    for r in feats:
        i = r["asset_id"]
        w, h = 16 + i % 8, 12 + i % 5
        assert (r["width"], r["height"]) == (w, h)
        assert r["mean_r"] == pytest.approx(i % 251)
        assert r["mean_g"] == pytest.approx((w - 1) / 2.0)
        assert r["mean_b"] == pytest.approx((h - 1) / 2.0)

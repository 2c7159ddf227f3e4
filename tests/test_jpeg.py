"""Pins for the pure-numpy baseline JPEG codec (operators/jpeg.py).

The load-bearing invariant: the entropy layer (Huffman + byte stuffing +
restart markers) is lossless, so the full byte-level codec must reproduce
the transform-domain pipeline (DCT -> quantize -> dequantize -> IDCT)
BIT-FOR-BIT on arbitrary images — that pin exercises every AC path
(run-lengths, ZRL, EOB, byte stuffing) that the constant-block driver
oracle cannot."""

import numpy as np
import pytest

from featuregenerator_spark.operators.jpeg import (
    QUANT_LUMA,
    ZIGZAG,
    jpeg_decode_gray,
    jpeg_encode_gray,
    jpeg_reference_gray,
    quality_scale,
)


def test_zigzag_is_the_standard_order():
    # spot-check the canonical T.81 figure 5 prefix and permutation-ness
    assert list(ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(ZIGZAG) == list(range(64))


def test_quality_scaling():
    assert quality_scale(QUANT_LUMA, 50)[0, 0] == 16  # unchanged at 50
    assert quality_scale(QUANT_LUMA, 100).max() == 1  # all-ones at 100
    assert quality_scale(QUANT_LUMA, 1).max() == 255  # clamped at 1
    with pytest.raises(ValueError):
        quality_scale(QUANT_LUMA, 0)


@pytest.mark.parametrize("quality", [10, 25, 50, 75, 90, 95])
@pytest.mark.parametrize(
    "shape", [(8, 8), (16, 16), (24, 16), (20, 13), (7, 5), (64, 48)]
)
def test_roundtrip_equals_transform_reference(shape, quality):
    """decode(encode(img)) == transform-domain reference, bit-for-bit,
    on random images (dense AC activity) incl. non-multiple-of-8 dims."""
    rng = np.random.default_rng(hash(shape) % 2**32)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    dec = jpeg_decode_gray(jpeg_encode_gray(img, quality))
    assert np.array_equal(dec, jpeg_reference_gray(img, quality))


def test_constant_even_blocks_roundtrip_exactly():
    """Constant 8x8 blocks with even offsets from 128: DC quantization at
    quality 50 (q00 = 16) is exact, so the decode is the source image —
    the closed form the driver oracle (multimodal_jpeg_decode) states."""
    img = np.empty((16, 16), dtype=np.uint8)
    for b, v in enumerate([68, 130, 186, 128]):
        r, c = (b // 2) * 8, (b % 2) * 8
        img[r : r + 8, c : c + 8] = v
    assert np.array_equal(jpeg_decode_gray(jpeg_encode_gray(img, 50)), img)


def test_restart_markers_decode_identically():
    """DRI/RSTn byte-align and reset the DC predictor (the parallel-decode
    split points at scale); output must not change."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(40, 32), dtype=np.uint8)
    plain = jpeg_decode_gray(jpeg_encode_gray(img, 60))
    restarted = jpeg_encode_gray(img, 60, restart_interval=3)
    assert any(
        restarted[i : i + 1] == b"\xff" and 0xD0 <= restarted[i + 1] <= 0xD7
        for i in range(len(restarted) - 1)
    )
    assert np.array_equal(jpeg_decode_gray(restarted), plain)


def test_smooth_image_small_error():
    """True lossy behavior sanity: a smooth gradient survives q90 within
    1 gray level (would fail if the IDCT were not the DCT's inverse)."""
    img = np.outer(np.ones(64), np.linspace(0, 255, 64)).astype(np.uint8)
    dec = jpeg_decode_gray(jpeg_encode_gray(img, 90))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 1


def test_decoder_rejections():
    with pytest.raises(ValueError, match="SOI"):
        jpeg_decode_gray(b"\x89PNG\r\n")
    rng = np.random.default_rng(3)
    buf = bytearray(jpeg_encode_gray(
        rng.integers(0, 256, (16, 16), np.uint8), 50))
    sof = buf.index(b"\xff\xc0")
    buf[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        jpeg_decode_gray(bytes(buf))
    with pytest.raises(ValueError, match="single-channel"):
        jpeg_encode_gray(np.zeros((8, 8, 3), dtype=np.uint8))


def test_sixteen_bit_dqt_honored():
    """Decoder must honor a 16-bit-precision DQT from the stream: widen
    the encoder's 8-bit table segment to Pq=1 by hand and re-decode."""
    import struct

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    buf = jpeg_encode_gray(img, 50)
    ref = jpeg_decode_gray(buf)
    i = buf.index(b"\xff\xdb")
    vals = buf[i + 5 : i + 5 + 64]
    wide = (
        buf[:i]
        + b"\xff\xdb"
        + struct.pack(">HB", 2 + 1 + 128, 0x10)
        + b"".join(struct.pack(">H", v) for v in vals)
        + buf[i + 5 + 64 :]
    )
    assert np.array_equal(jpeg_decode_gray(wide), ref)


def test_spark_decode_matches_closed_form(spark):
    from featuregenerator_spark.operators.multimodal import (
        decode_jpeg_assets,
        synth_jpeg_assets,
    )

    ids = spark.range(40).withColumnRenamed("id", "asset_id")
    rows = decode_jpeg_assets(synth_jpeg_assets(ids)).collect()
    assert len(rows) == 40
    for r in rows:
        i = r.asset_id
        vals = [128 + 2 * ((i + b) % 60 - 30) for b in range(4)]
        assert (r.width, r.height) == (16, 16)
        assert r.y_first == vals[0] and r.y_last == vals[3]
        assert abs(r.mean_y - sum(vals) / 4.0) < 1e-9


# ---------------------------------------------------------------------------
# Color (3-component YCbCr, 4:4:4 and 4:2:0)
# ---------------------------------------------------------------------------

from featuregenerator_spark.operators.jpeg import (  # noqa: E402
    jpeg_decode,
    jpeg_encode,
    jpeg_reference,
)


@pytest.mark.parametrize("quality", [25, 50, 75, 90])
@pytest.mark.parametrize("subsampling", ["444", "420"])
@pytest.mark.parametrize("shape", [(8, 8), (16, 16), (20, 13), (33, 47)])
def test_color_roundtrip_equals_transform_reference(shape, subsampling, quality):
    """Byte-level color decode == transform-domain reference bit-for-bit
    on random RGB: exercises interleaved MCUs, both Huffman table
    classes, per-component DC predictors, chroma subsample/upsample and
    the inverse color transform, incl. non-MCU-multiple dims."""
    rng = np.random.default_rng((hash(shape) ^ hash(subsampling)) % 2**32)
    img = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality, subsampling=subsampling))
    assert np.array_equal(dec, jpeg_reference(img, quality, subsampling))


def test_color_restart_markers_decode_identically():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(40, 32, 3), dtype=np.uint8)
    plain = jpeg_decode(jpeg_encode(img, 60, subsampling="420"))
    restarted = jpeg_encode(img, 60, restart_interval=2, subsampling="420")
    assert b"\xff\xd0" in restarted or b"\xff\xd1" in restarted
    assert np.array_equal(jpeg_decode(restarted), plain)


def test_gray_rgb_blocks_roundtrip_exactly_in_color():
    """Flat gray RGB blocks with even offsets: Y = v exactly and
    Cb = Cr = 128 (coefficient rows sum to 1 / 0), so the FULL color
    pipeline at 4:2:0 returns the source image — the closed form the
    multimodal_jpeg_color_decode oracle states."""
    img = np.empty((16, 16, 3), dtype=np.uint8)
    for b, v in enumerate([68, 130, 186, 128]):
        r, c = (b // 2) * 8, (b % 2) * 8
        img[r : r + 8, c : c + 8, :] = v
    dec = jpeg_decode(jpeg_encode(img, 50, subsampling="420"))
    assert np.array_equal(dec, img)


def test_color_rejections():
    with pytest.raises(ValueError, match="444 or 420"):
        jpeg_encode(np.zeros((8, 8, 3), dtype=np.uint8), 50, subsampling="422")
    with pytest.raises(ValueError, match="grayscale or"):
        jpeg_encode(np.zeros((8, 8, 4), dtype=np.uint8), 50)
    buf = jpeg_encode(np.zeros((8, 8, 3), dtype=np.uint8), 50)
    with pytest.raises(ValueError, match="jpeg_decode"):
        jpeg_decode_gray(buf)  # gray entry point refuses color streams


def test_color_smooth_gradient_small_error():
    x = np.linspace(0, 255, 64).astype(np.uint8)
    img = np.stack(
        [np.tile(x, (64, 1)), np.tile(x[::-1], (64, 1)),
         np.full((64, 64), 128, np.uint8)], axis=-1,
    )
    dec = jpeg_decode(jpeg_encode(img, 90))
    assert np.abs(dec.astype(int) - img.astype(int)).max() <= 3


def test_spark_color_decode_matches_closed_form(spark):
    from featuregenerator_spark.operators.multimodal import (
        decode_jpeg_color_assets,
        synth_jpeg_color_assets,
    )

    ids = spark.range(30).withColumnRenamed("id", "asset_id")
    rows = decode_jpeg_color_assets(synth_jpeg_color_assets(ids)).collect()
    assert len(rows) == 30
    for r in rows:
        want = sum(128 + 2 * ((r.asset_id + b) % 60 - 30) for b in range(4)) / 4.0
        assert (r.width, r.height) == (16, 16)
        for got in (r.mean_r, r.mean_g, r.mean_b):
            assert abs(got - want) < 1e-9

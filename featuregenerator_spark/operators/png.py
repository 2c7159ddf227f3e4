"""Pure-numpy + stdlib-zlib PNG codec (RFC 2083 / ISO 15948 baseline).

Second REAL compressed-image codec next to the baseline JPEG
(``operators/jpeg.py``): PNG is the lossless half of the story — DEFLATE
entropy coding (stdlib ``zlib``) under the five per-scanline prediction
filters (None / Sub / Up / Average / Paeth). Everything outside the
DEFLATE stream is implemented here from the public spec: chunk framing
with CRC-32 validation, IHDR parsing, scanline filtering on encode and
unfiltering on decode.

Scope (enough to round-trip real 8-bit images, and to *reject* anything
else loudly): bit depth 8, color types 0 (grayscale) and 2 (RGB), no
interlace. Encode can pin the filter per scanline (``"none"`` …
``"paeth"``), ``"cycle"`` through all five (so one payload exercises
every decode branch), or pick per-row by the standard minimum-sum-of-
absolute-differences heuristic (``"adaptive"``).

Vectorization notes — the part that matters for the mapInPandas hot
path: *encode* filters read only RAW neighbor bytes, so all five are
whole-row numpy expressions. *Decode* reconstruction is sequential in x
for Average/Paeth (each byte needs the already-reconstructed left
neighbor); Sub is a per-lane ``cumsum % 256`` and Up is one vector add,
so only filters 3/4 fall back to a per-scanline loop that is still
vectorized across channels. Assets decode independently inside
Arrow-batched ``mapInPandas`` — the parallel axis at 100 TB is assets,
not scanlines.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_FILTERS = {"none": 0, "sub": 1, "up": 2, "average": 3, "paeth": 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a, b, c):
    """Vectorized Paeth predictor (int16-safe inputs)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)).astype(
        np.uint8
    )


def _filter_row(raw: np.ndarray, prior: np.ndarray, bpp: int, ftype: int):
    """Filtered bytes for one scanline (all five are closed-form in the
    RAW bytes, so encode never has a sequential dependency)."""
    left = np.zeros_like(raw)
    left[bpp:] = raw[:-bpp]
    upleft = np.zeros_like(prior)
    upleft[bpp:] = prior[:-bpp]
    r16 = raw.astype(np.int16)
    if ftype == 0:
        return raw.copy()
    if ftype == 1:
        return (r16 - left).astype(np.uint8)
    if ftype == 2:
        return (r16 - prior).astype(np.uint8)
    if ftype == 3:
        return (r16 - (left.astype(np.int16) + prior) // 2).astype(np.uint8)
    if ftype == 4:
        return (r16 - _paeth(left, prior, upleft)).astype(np.uint8)
    raise ValueError(f"bad filter type {ftype}")


def png_encode(
    img: np.ndarray, filter_strategy: str = "adaptive", level: int = 6
) -> bytes:
    """(H, W) or (H, W, 3) uint8 -> PNG bytes (bit depth 8, no interlace).

    ``filter_strategy``: one of the five filter names (fixed per row),
    ``"cycle"`` (row i uses filter i % 5 — every decode branch in one
    payload), or ``"adaptive"`` (per-row minimum sum of absolute
    differences, the reference heuristic from the spec)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        color_type, bpp = 0, 1
        h, w = img.shape
        flat = img.reshape(h, w)
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, bpp = 2, 3
        h, w = img.shape[:2]
        flat = img.reshape(h, w * 3)
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    if h == 0 or w == 0:
        raise ValueError("empty image")

    out = bytearray()
    prior = np.zeros(w * bpp, dtype=np.uint8)
    for y in range(h):
        raw = flat[y]
        if filter_strategy == "cycle":
            ftype = y % 5
            filt = _filter_row(raw, prior, bpp, ftype)
        elif filter_strategy == "adaptive":
            best, ftype = None, 0
            for t in range(5):
                cand = _filter_row(raw, prior, bpp, t)
                # spec heuristic: bytes as signed, minimize sum |v|
                cost = int(
                    np.abs(cand.view(np.int8).astype(np.int16)).sum()
                )
                if best is None or cost < best:
                    best, ftype, filt = cost, t, cand
        else:
            ftype = _FILTERS[filter_strategy]
            filt = _filter_row(raw, prior, bpp, ftype)
        out.append(ftype)
        out += filt.tobytes()
        prior = raw

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out), level))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Sequential scanline reconstruction; Sub/Up stay fully vectorized,
    Average/Paeth loop in x (vectorized across the bpp lanes)."""
    stride = w * bpp
    rows = raw.reshape(h, 1 + stride)
    recon = np.zeros((h, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = int(rows[y, 0])
        filt = rows[y, 1:]
        if ftype == 0:
            cur = filt.copy()
        elif ftype == 1:
            # recon[x] = filt[x] + recon[x-bpp]: per-lane prefix sum
            lanes = filt.reshape(w, bpp).astype(np.int64)
            cur = (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(stride)
        elif ftype == 2:
            cur = (filt.astype(np.int16) + prior).astype(np.uint8)
        elif ftype == 3:
            cur = np.empty(stride, dtype=np.uint8)
            pr = prior.reshape(w, bpp).astype(np.int16)
            fl = filt.reshape(w, bpp).astype(np.int16)
            left = np.zeros(bpp, dtype=np.int16)
            for x in range(w):
                left = (fl[x] + (left + pr[x]) // 2) & 0xFF
                cur[x * bpp : (x + 1) * bpp] = left.astype(np.uint8)
        elif ftype == 4:
            cur = np.empty(stride, dtype=np.uint8)
            pr = prior.reshape(w, bpp)
            fl = filt.reshape(w, bpp)
            left = np.zeros(bpp, dtype=np.uint8)
            upleft = np.zeros(bpp, dtype=np.uint8)
            for x in range(w):
                pred = _paeth(left, pr[x], upleft)
                left = ((fl[x].astype(np.int16) + pred) & 0xFF).astype(np.uint8)
                cur[x * bpp : (x + 1) * bpp] = left
                upleft = pr[x]
        else:
            raise ValueError(f"bad scanline filter {ftype}")
        recon[y] = cur
        prior = cur
    return recon


def png_decode(buf: bytes) -> np.ndarray:
    """PNG bytes -> (H, W) gray or (H, W, 3) RGB uint8. Validates the
    signature and every chunk CRC; rejects (loudly) bit depths != 8,
    palette/alpha color types, interlace, and non-zero compression or
    filter methods."""
    if bytes(buf[:8]) != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, n = 8, len(buf)
    ihdr = None
    idat = bytearray()
    seen_end = False
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = bytes(buf[pos + 4 : pos + 8])
        data = bytes(buf[pos + 8 : pos + 8 + length])
        (crc,) = struct.unpack_from(">I", buf, pos + 8 + length)
        if zlib.crc32(tag + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = data
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            seen_end = True
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped after CRC check
    if ihdr is None or not seen_end:
        raise ValueError("truncated PNG: missing IHDR or IEND")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or color_type not in (0, 2):
        raise ValueError(
            f"unsupported PNG: depth={depth} color_type={color_type} "
            "(baseline codec handles 8-bit gray and RGB)"
        )
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlace not supported")
    bpp = 1 if color_type == 0 else 3
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    expect = h * (1 + w * bpp)
    if raw.size != expect:
        raise ValueError(f"PNG data length {raw.size} != expected {expect}")
    recon = _unfilter(raw, h, w, bpp)
    return recon.reshape(h, w) if color_type == 0 else recon.reshape(h, w, 3)

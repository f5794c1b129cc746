"""Native PNG/BMP decode (sources/image.py) — encoder-side fixtures built
here from the spec (filters applied scanline by scanline, real zlib
streams, real CRCs), decoded back pixel-exact vs the NumPy golden, through
both the C unfilter kernel and the pinned Python fallback, and end-to-end
through operators/multimodal.resize_images on Spark."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from sequila_spark.sources.image import decode_bmp, decode_png

_CT = {1: 0, 2: 4, 3: 2, 4: 6}  # channels -> PNG color type


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _filt(img: np.ndarray, ftype: int, prev: np.ndarray, bpp: int) -> bytes:
    """Apply PNG filter ``ftype`` to one raw scanline (encoder side)."""
    cur = img.astype(np.int32)
    out = np.empty_like(cur)
    for i in range(len(cur)):
        a = cur[i - bpp] if i >= bpp else 0
        b = int(prev[i])
        c = int(prev[i - bpp]) if i >= bpp else 0
        if ftype == 0:
            out[i] = cur[i]
        elif ftype == 1:
            out[i] = cur[i] - a
        elif ftype == 2:
            out[i] = cur[i] - b
        elif ftype == 3:
            out[i] = cur[i] - ((a + b) >> 1)
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out[i] = cur[i] - pr
    return (out & 0xFF).astype(np.uint8).tobytes()


def encode_png(img: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Minimal spec-faithful PNG encoder for fixtures: img is (h, w) or
    (h, w, c) uint8; ``filters`` picks the per-scanline filter type."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    bpp = c
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CT[c], 0, 0, 0)
    prev = np.zeros(w * c, dtype=np.uint8)
    lines = []
    for y in range(h):
        f = filters[y % len(filters)] if filters else (y % 5)
        row = img[y].reshape(-1)
        lines.append(bytes([f]) + _filt(row, f, prev, bpp))
        prev = row
    idat = zlib.compress(b"".join(lines))
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _rand_img(rng, h, w, c):
    a = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    return a if c > 1 else a[:, :, 0]


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_png_roundtrip_all_filters(c):
    rng = np.random.default_rng(42 + c)
    img = _rand_img(rng, 13, 17, c)
    # every filter type exercised (filters cycle 0..4 per scanline)
    d = decode_png(encode_png(img))
    assert (d["width"], d["height"], d["channels"]) == (17, 13, c)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(13, 17, c)
    assert (got == img.reshape(13, 17, c)).all()


def test_png_single_filter_streams():
    rng = np.random.default_rng(7)
    img = _rand_img(rng, 9, 31, 3)
    for f in range(5):
        d = decode_png(encode_png(img, filters=[f]))
        got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(9, 31, 3)
        assert (got == img).all(), f"filter {f}"


def test_png_c_and_python_unfilter_identical(monkeypatch):
    from sequila_spark.sources import _ckern as CK

    rng = np.random.default_rng(3)
    img = _rand_img(rng, 21, 19, 4)
    payload = encode_png(img)
    via_c = decode_png(payload)
    monkeypatch.setattr(CK, "png_unfilter", lambda *a, **k: False)
    via_py = decode_png(payload)
    assert via_c == via_py


def test_png_corrupt_and_unsupported():
    rng = np.random.default_rng(5)
    img = _rand_img(rng, 4, 4, 1)
    good = encode_png(img)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"notapng" + good)
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad_crc))
    # 16-bit depth: raise by name, not garbage
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    p = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(p)
    # implausible dimensions rejected BEFORE allocation
    ihdr = struct.pack(">IIBBBBB", 1 << 24, 1 << 24, 8, 6, 0, 0, 0)
    p = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    with pytest.raises(ValueError, match="implausible"):
        decode_png(p)


def _encode_bmp24(img: np.ndarray, top_down: bool = False) -> bytes:
    h, w, _ = img.shape
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    rows = img if top_down else img[::-1]
    for y in range(h):
        line = rows[y][:, ::-1].tobytes()  # RGB -> BGR
        body += line + b"\x00" * (row_bytes - len(line))
    hdr = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII",
            40, w, -h if top_down else h, 1, 24, 0, len(body), 0, 0, 0, 0,
        )
    )
    return bytes(hdr) + bytes(body)


def test_bmp24_roundtrip_both_orders():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
    for td in (False, True):
        d = decode_bmp(_encode_bmp24(img, top_down=td))
        assert (d["width"], d["height"], d["channels"]) == (5, 6, 3)
        got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(6, 5, 3)
        assert (got == img).all(), f"top_down={td}"


def test_bmp8_gray_palette():
    rng = np.random.default_rng(13)
    idx = rng.integers(0, 256, size=(4, 7), dtype=np.uint8)
    pal = b"".join(bytes([i, i, i, 0]) for i in range(256))  # gray identity
    row_bytes = (7 + 3) & ~3
    body = b"".join(
        idx[::-1][y].tobytes() + b"\x00" * (row_bytes - 7) for y in range(4)
    )
    hdr = (
        b"BM"
        + struct.pack("<IHHI", 54 + 1024 + len(body), 0, 0, 54 + 1024)
        + struct.pack("<IiiHHIIiiII", 40, 7, 4, 1, 8, 0, len(body), 0, 0, 0, 0)
    )
    d = decode_bmp(bytes(hdr) + pal + body)
    assert d["channels"] == 1
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(4, 7)
    assert (got == idx).all()


def test_resize_real_png_through_spark(spark):
    """The verdict's done-bar: a real PNG decoded + resized through
    multimodal.resize_images, pixel-exact vs the NumPy-computed golden,
    via the default image/png registry entry."""
    from sequila_spark.operators.multimodal import resize_images

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    payload = encode_png(img)
    media = spark.createDataFrame(
        [(1, bytearray(payload), "image/png", len(payload))],
        "doc_id long, payload binary, media_type string, byte_len int",
    )
    out = resize_images(media, 6, 4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["width"], r["height"], r["channels"]) == (6, 4, 3)
    yi = (np.arange(4) * 16) // 4
    xi = (np.arange(6) * 24) // 6
    golden = img[yi[:, None], xi[None, :], :]
    got = np.frombuffer(r["pixels"], dtype=np.uint8).reshape(4, 6, 3)
    assert (got == golden).all()

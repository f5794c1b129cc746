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
    # 16-bit depth is now supported — a header-only stream fails loudly
    # on the missing IDAT instead
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
    p = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    with pytest.raises(ValueError, match="IDAT"):
        decode_png(p)
    # illegal depth/color-type combination (16-bit palette)
    ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 3, 0, 0, 0)
    p = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    with pytest.raises(ValueError, match="illegal"):
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


# ---- palette / sub-byte / 16-bit / Adam7 (VERDICT r11 task 6) -------------

_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _pack_row(row: np.ndarray, depth: int) -> bytes:
    """Pack one scanline of samples at ``depth`` bits (MSB-first)."""
    if depth == 16:
        return row.astype(">u2").tobytes()
    if depth == 8:
        return row.astype(np.uint8).tobytes()
    out = bytearray()
    acc = nb = 0
    for v in row:
        acc = (acc << depth) | int(v)
        nb += depth
        if nb == 8:
            out.append(acc)
            acc = nb = 0
    if nb:
        out.append(acc << (8 - nb))
    return bytes(out)


def encode_png_ex(
    samples: np.ndarray,
    depth: int,
    ctype: int,
    plte: np.ndarray | None = None,
    trns: bytes | None = None,
    interlace: int = 0,
    filters: list[int] | None = None,
) -> bytes:
    """Spec-faithful encoder over the full IHDR space: ``samples`` is
    (h, w, spp) of sample values at source depth; palette rows are
    (n, 3) uint8; interlace=1 emits real Adam7 per-pass streams."""
    h, w, spp = samples.shape
    bpp = max(1, spp * depth // 8)

    def sub_stream(sub: np.ndarray) -> bytes:
        ph = sub.shape[0]
        prev = np.zeros((sub.shape[1] * spp * depth + 7) // 8, dtype=np.uint8)
        lines = []
        for y in range(ph):
            packed = np.frombuffer(
                _pack_row(sub[y].reshape(-1), depth), dtype=np.uint8
            )
            f = filters[y % len(filters)] if filters else (y % 5)
            lines.append(bytes([f]) + _filt(packed, f, prev, bpp))
            prev = packed
        return b"".join(lines)

    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = samples[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                parts.append(sub_stream(sub))
        stream = b"".join(parts)
    else:
        stream = sub_stream(samples)

    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _chunk(b"PLTE", np.ascontiguousarray(plte, dtype=np.uint8).tobytes())
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    out += _chunk(b"IDAT", zlib.compress(stream)) + _chunk(b"IEND", b"")
    return out


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
@pytest.mark.parametrize("interlace", [0, 1])
def test_png_palette_depths(depth, interlace):
    rng = np.random.default_rng(60 + depth + interlace)
    n_pal = 1 << depth
    plte = rng.integers(0, 256, size=(n_pal, 3), dtype=np.uint8)
    idx = rng.integers(0, n_pal, size=(13, 17, 1), dtype=np.uint8)
    d = decode_png(encode_png_ex(idx, depth, 3, plte=plte, interlace=interlace))
    assert (d["width"], d["height"], d["channels"]) == (17, 13, 3)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(13, 17, 3)
    assert (got == plte[idx[:, :, 0]]).all()


def test_png_palette_trns_alpha():
    rng = np.random.default_rng(71)
    plte = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    trns = bytes(rng.integers(0, 256, size=7, dtype=np.uint8))  # partial
    idx = rng.integers(0, 16, size=(9, 11, 1), dtype=np.uint8)
    d = decode_png(encode_png_ex(idx, 4, 3, plte=plte, trns=trns))
    assert d["channels"] == 4
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(9, 11, 4)
    alpha = np.full(16, 255, dtype=np.uint8)
    alpha[:7] = np.frombuffer(trns, dtype=np.uint8)
    assert (got[:, :, :3] == plte[idx[:, :, 0]]).all()
    assert (got[:, :, 3] == alpha[idx[:, :, 0]]).all()


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_subbyte_gray_bit_replication(depth):
    rng = np.random.default_rng(80 + depth)
    maxv = (1 << depth) - 1
    img = rng.integers(0, maxv + 1, size=(7, 19, 1), dtype=np.uint8)
    d = decode_png(encode_png_ex(img, depth, 0))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(7, 19)
    assert (got == img[:, :, 0] * (255 // maxv)).all()


@pytest.mark.parametrize("ctype,spp", [(0, 1), (2, 3), (4, 2), (6, 4)])
@pytest.mark.parametrize("interlace", [0, 1])
def test_png_16bit_downscale(ctype, spp, interlace):
    rng = np.random.default_rng(90 + ctype + interlace)
    img = rng.integers(0, 1 << 16, size=(12, 15, spp), dtype=np.uint16)
    d = decode_png(encode_png_ex(img, 16, ctype, interlace=interlace))
    assert d["channels"] == spp
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(12, 15, spp)
    assert (got == (img >> 8).astype(np.uint8)).all()


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_png_adam7_equals_sequential(c):
    """Interlaced and sequential encodings of the same image decode
    identically — sizes chosen so several passes are non-trivial and one
    dimension is not a multiple of 8."""
    rng = np.random.default_rng(100 + c)
    img = rng.integers(0, 256, size=(21, 13, c), dtype=np.uint8)
    seq = decode_png(encode_png_ex(img, 8, _CT[c]))
    inter = decode_png(encode_png_ex(img, 8, _CT[c], interlace=1))
    assert seq == inter
    got = np.frombuffer(inter["pixels"], dtype=np.uint8).reshape(21, 13, c)
    assert (got == img).all()


def test_png_adam7_tiny_images_skip_empty_passes():
    rng = np.random.default_rng(110)
    for h, w in [(1, 1), (1, 5), (3, 2), (7, 7), (8, 8), (9, 1)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        d = decode_png(encode_png_ex(img, 8, 2, interlace=1))
        got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, 3)
        assert (got == img).all(), (h, w)


def test_png_colorkey_trns():
    rng = np.random.default_rng(120)
    img = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    key = img[0, 0]  # guarantee at least one transparent pixel
    trns = struct.pack(">HHH", *[int(v) for v in key])
    d = decode_png(encode_png_ex(img, 8, 2, trns=trns))
    assert d["channels"] == 4
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(8, 8, 4)
    assert (got[:, :, :3] == img).all()
    expect_a = np.where((img == key).all(axis=2), 0, 255)
    assert (got[:, :, 3] == expect_a).all()
    # 16-bit gray color key compares at SOURCE depth
    img16 = rng.integers(0, 1 << 16, size=(6, 6, 1), dtype=np.uint16)
    key16 = int(img16[1, 1, 0])
    d16 = decode_png(encode_png_ex(img16, 16, 0, trns=struct.pack(">H", key16)))
    assert d16["channels"] == 2
    got16 = np.frombuffer(d16["pixels"], dtype=np.uint8).reshape(6, 6, 2)
    expect_a16 = np.where(img16[:, :, 0] == key16, 0, 255)
    assert (got16[:, :, 1] == expect_a16).all()


def test_png_palette_corruption_loud():
    rng = np.random.default_rng(130)
    plte = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
    idx = rng.integers(0, 4, size=(4, 4, 1), dtype=np.uint8)
    # palette index past PLTE end
    idx_bad = idx.copy()
    idx_bad[0, 0, 0] = 9
    with pytest.raises(ValueError, match="palette index"):
        decode_png(encode_png_ex(idx_bad, 4, 3, plte=plte))
    # tRNS longer than the palette
    with pytest.raises(ValueError, match="tRNS"):
        decode_png(encode_png_ex(idx, 4, 3, plte=plte, trns=b"\x00" * 9))
    # palette image with no PLTE chunk at all
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(encode_png_ex(idx, 4, 3, plte=None))
    # tRNS is illegal alongside a real alpha channel
    rgba = rng.integers(0, 256, size=(4, 4, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="alpha"):
        decode_png(encode_png_ex(rgba, 8, 6, trns=b"\x00\x01"))


def test_resize_palette_and_interlaced_png_through_spark(spark):
    """The new PNG shapes through the REAL Spark pipeline: a palette
    image (expands to RGB) and an Adam7-interlaced 16-bit gray image,
    decoded + resized by multimodal.resize_images via the image/png
    registry entry, pixel-exact vs NumPy goldens."""
    from sequila_spark.operators.multimodal import resize_images

    rng = np.random.default_rng(140)
    plte = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(12, 20, 1), dtype=np.uint8)
    pal_payload = encode_png_ex(idx, 4, 3, plte=plte)
    img16 = rng.integers(0, 1 << 16, size=(12, 20, 1), dtype=np.uint16)
    i16_payload = encode_png_ex(img16, 16, 0, interlace=1)
    media = spark.createDataFrame(
        [
            (1, bytearray(pal_payload), "image/png", len(pal_payload)),
            (2, bytearray(i16_payload), "image/png", len(i16_payload)),
        ],
        "doc_id long, payload binary, media_type string, byte_len int",
    )
    out = {r["doc_id"]: r for r in resize_images(media, 5, 4).collect()}
    yi = (np.arange(4) * 12) // 4
    xi = (np.arange(5) * 20) // 5
    golden_pal = plte[idx[:, :, 0]][np.ix_(yi, xi)]
    r1 = out[1]
    assert (r1["width"], r1["height"], r1["channels"]) == (5, 4, 3)
    got1 = np.frombuffer(bytes(r1["pixels"]), dtype=np.uint8).reshape(4, 5, 3)
    assert (got1 == golden_pal).all()
    golden_16 = (img16[:, :, 0] >> 8).astype(np.uint8)[np.ix_(yi, xi)]
    r2 = out[2]
    assert (r2["width"], r2["height"], r2["channels"]) == (5, 4, 1)
    got2 = np.frombuffer(bytes(r2["pixels"]), dtype=np.uint8).reshape(4, 5)
    assert (got2 == golden_16).all()

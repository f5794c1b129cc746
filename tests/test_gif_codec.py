"""Native GIF decode (sources/gif.py) — the LZW decoder is pinned against
a HAND-PACKED code sequence (independent of our encoder), then a
spec-faithful encoder built here generates roundtrip fixtures across
palette sizes, code-width growth, dictionary-full CLEAR, interlace,
transparency and the three disposal methods, and the codec runs
end-to-end through multimodal.sample_frames / resize_images on Spark."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sequila_spark.sources.gif import _lzw_decode, decode_gif


def _pack_codes(codes: list[tuple[int, int]]) -> bytes:
    """LSB-first bit packing of explicit (code, width) pairs — an
    independent reimplementation of the wire format for pinning."""
    acc = nbits = 0
    out = bytearray()
    for code, width in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def test_lzw_hand_computed_sequence():
    """Pixels [1,1,0,0] at min code size 2: codes are CLEAR,1,1,0,0,EOI
    with the width stepping 3->4 before the 5th code (the decoder's
    dictionary hits 8 entries after the 4th) — worked by hand from the
    GIF89a spec, so decoder and encoder cannot be symmetrically wrong."""
    codes = [(4, 3), (1, 3), (1, 3), (0, 3), (0, 4), (5, 4)]
    out = _lzw_decode(2, _pack_codes(codes), 16)
    assert bytes(out) == bytes([1, 1, 0, 0])


def test_lzw_kwkwk_case():
    """The classic cScSc sequence: code == next_code (entry not yet
    defined) must expand as prev + first(prev)."""
    # pixels 0,0,0: encoder emits CLEAR, 0, then 6 (undefined!) = b"\x00\x00"
    codes = [(4, 3), (0, 3), (6, 3), (5, 3)]
    out = _lzw_decode(2, _pack_codes(codes), 16)
    assert bytes(out) == bytes([0, 0, 0])


# --- encoder side (fixtures) -------------------------------------------------


def _lzw_encode(min_code_size: int, data: bytes) -> bytes:
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    table = {bytes([c]): c for c in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    acc = nbits = 0
    out = bytearray()

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    s = b""
    for ch in data:
        t = s + bytes([ch])
        if t in table:
            s = t
            continue
        emit(table[s])
        table[t] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:  # dictionary full: reset via CLEAR
            emit(clear)
            table = {bytes([c]): c for c in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        s = bytes([ch])
    if s:
        emit(table[s])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        part = data[i : i + 255]
        out.append(len(part))
        out += part
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    *,
    transparent: int | None = None,
    disposals: list[int] | None = None,
    offsets: list[tuple[int, int]] | None = None,
    screen: tuple[int, int] | None = None,
    interlace: bool = False,
) -> bytes:
    """Minimal spec-faithful GIF89a writer for fixtures: ``frames`` are
    (h, w) uint8 index arrays into ``palette`` ((n, 3) uint8)."""
    n = len(palette)
    size_field = max((n - 1).bit_length() - 1, 0)
    pal = np.zeros((2 << size_field, 3), dtype=np.uint8)
    pal[:n] = palette
    h0, w0 = frames[0].shape
    sw, sh = screen if screen else (w0, h0)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | size_field, 0, 0)
    out += pal.tobytes()
    min_code = max(size_field + 1, 2)
    for k, fr in enumerate(frames):
        fh, fw = fr.shape
        fl, ft = offsets[k] if offsets else (0, 0)
        disposal = disposals[k] if disposals else 0
        gp = (disposal & 7) << 2 | (1 if transparent is not None else 0)
        out += b"\x21\xf9" + _subblocks(
            struct.pack("<BHB", gp, 4, transparent if transparent is not None else 0)
        )
        idx = fr
        if interlace:
            rows = []
            for off, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                rows.extend(range(off, fh, step))
            idx = fr[rows]
        out += b"\x2c" + struct.pack(
            "<HHHHB", fl, ft, fw, fh, 0x40 if interlace else 0
        )
        out += bytes([min_code])
        out += _subblocks(_lzw_encode(min_code, idx.tobytes()))
    out += b"\x3b"
    return bytes(out)


@pytest.mark.parametrize("ncolors,shape", [(4, (7, 5)), (16, (23, 31)), (256, (60, 80))])
def test_roundtrip_palettes_and_width_growth(ncolors, shape):
    rng = np.random.default_rng(ncolors)
    pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    img = rng.integers(0, ncolors, size=shape, dtype=np.uint8)
    d = decode_gif(encode_gif([img], pal))
    assert (d["width"], d["height"], d["channels"]) == (shape[1], shape[0], 3)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(*shape, 3)
    assert np.array_equal(got, pal[img])


def test_roundtrip_dictionary_full_clear():
    """A long low-entropy frame pushes the LZW dictionary to 4096 and
    forces the encoder's mid-stream CLEAR; the decoder must resync."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 4, size=(200, 300), dtype=np.uint8)
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    d = decode_gif(encode_gif([img], pal))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(200, 300, 3)
    assert np.array_equal(got, pal[img])


def test_interlaced_frame():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 8, size=(17, 11), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(8, 3), dtype=np.uint8)
    d = decode_gif(encode_gif([img], pal, interlace=True))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(17, 11, 3)
    assert np.array_equal(got, pal[img])


def test_animation_compositing_disposals():
    """Three frames exercising disposal 1 (keep), 2 (restore background)
    and transparency, composited exactly as a NumPy golden."""
    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    f0 = np.full((4, 4), 1, dtype=np.uint8)  # red canvas
    f1 = np.full((2, 2), 2, dtype=np.uint8)  # green patch at (1,1)
    f2 = np.full((2, 2), 3, dtype=np.uint8)  # blue patch at (0,0)
    gif = encode_gif(
        [f0, f1, f2],
        pal,
        disposals=[1, 2, 0],
        offsets=[(0, 0), (1, 1), (0, 0)],
        screen=(4, 4),
    )
    d = decode_gif(gif)
    assert len(d["frames"]) == 3
    g0 = pal[f0]
    got0 = np.frombuffer(d["frames"][0], dtype=np.uint8).reshape(4, 4, 3)
    assert np.array_equal(got0, g0)
    g1 = g0.copy()
    g1[1:3, 1:3] = pal[2]
    got1 = np.frombuffer(d["frames"][1], dtype=np.uint8).reshape(4, 4, 3)
    assert np.array_equal(got1, g1)
    g2 = g0.copy()  # disposal 2 cleared the green patch to background...
    g2[1:3, 1:3] = 0  # ...which renders as transparent black
    g2[0:2, 0:2] = pal[3]
    got2 = np.frombuffer(d["frames"][2], dtype=np.uint8).reshape(4, 4, 3)
    assert np.array_equal(got2, g2)


def test_transparency_keeps_underlying_pixels():
    pal = np.array([[9, 9, 9], [255, 255, 255]], dtype=np.uint8)
    f0 = np.zeros((3, 3), dtype=np.uint8)
    f1 = np.eye(3, dtype=np.uint8)  # 1s on the diagonal, 0 = transparent
    gif = encode_gif([f0, f1], pal, transparent=0)
    # frame0's transparent=0 skips every pixel -> canvas stays black there
    d = decode_gif(gif)
    got1 = np.frombuffer(d["frames"][1], dtype=np.uint8).reshape(3, 3, 3)
    golden = np.zeros((3, 3, 3), dtype=np.uint8)
    golden[np.eye(3, dtype=bool)] = 255
    assert np.array_equal(got1, golden)


def test_corrupt_and_unsupported_are_loud():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"PNG..")
    with pytest.raises(ValueError, match="no frames"):
        decode_gif(b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0, 0, 0) + b"\x3b")
    pal = np.zeros((2, 3), dtype=np.uint8)
    img = np.zeros((2, 2), dtype=np.uint8)
    good = encode_gif([img], pal)
    with pytest.raises(ValueError, match="sub-block"):
        decode_gif(good[:-4])
    with pytest.raises(ValueError):
        decode_gif(good[:20])


def test_gif_through_spark_sample_frames_and_resize(spark):
    """End-to-end: an animated GIF demuxed by multimodal.sample_frames via
    the default image/gif registry entry, and its first frame resized by
    resize_images through the same entry."""
    from sequila_spark.operators.multimodal import resize_images, sample_frames

    rng = np.random.default_rng(21)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    frames = [rng.integers(0, 16, size=(8, 12), dtype=np.uint8) for _ in range(5)]
    payload = encode_gif(frames, pal, disposals=[1] * 5)
    media = spark.createDataFrame(
        [(7, bytearray(payload), "image/gif", len(payload))],
        "doc_id long, payload binary, media_type string, byte_len int",
    )
    out = sample_frames(media, 2).collect()
    assert [r["frame_idx"] for r in sorted(out, key=lambda r: r["frame_idx"])] == [0, 2, 4]
    got0 = np.frombuffer(bytes(out[0]["frame"]), dtype=np.uint8).reshape(8, 12, 3)
    assert np.array_equal(got0, pal[frames[0]])

    rs = resize_images(media, 6, 4).collect()
    assert (rs[0]["width"], rs[0]["height"], rs[0]["channels"]) == (6, 4, 3)
    yi = (np.arange(4) * 8) // 4
    xi = (np.arange(6) * 12) // 6
    golden = pal[frames[0]][yi[:, None], xi[None, :], :]
    got = np.frombuffer(rs[0]["pixels"], dtype=np.uint8).reshape(4, 6, 3)
    assert np.array_equal(got, golden)


def test_truncated_image_descriptor_raises_valueerror():
    """All malformed-GIF paths raise ValueError, including a payload that
    ends inside the image descriptor or before the LZW min-code byte
    (previously struct.error escaped — code-review regression)."""
    pal = np.zeros((2, 3), dtype=np.uint8)
    img = np.zeros((2, 2), dtype=np.uint8)
    good = encode_gif([img], pal)
    i = good.index(b"\x2c")
    with pytest.raises(ValueError, match="truncated GIF"):
        decode_gif(good[: i + 3])

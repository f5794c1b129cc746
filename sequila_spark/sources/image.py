"""Native PNG / BMP decode for the multimodal registry — zero new
dependencies.

The multimodal operators (operators/multimodal.py) dispatch media decode
through a per-worker registry; this module provides REAL decoders for
the two formats a pure-Python + NumPy + zlib stack can handle exactly:

- PNG (RFC 2083): signature + chunk walk with CRC validation, IHDR /
  IDAT / IEND, zlib inflate, scanline filters 0-4 (None/Sub/Up/Average/
  Paeth), 8-bit gray (color type 0), gray+alpha (4), RGB (2) and
  RGBA (6).  Palette (3), 16-bit and Adam7-interlaced images raise
  NotImplementedError by name.  The unfilter hot loop runs in C
  (bamscan.c png_unfilter) with the NumPy/Python loop as the pinned
  fallback — tests pin both paths byte-identical.
- BMP (BITMAPINFOHEADER, BI_RGB): 24-bit BGR and 8-bit palettized
  (grayscale palettes decode to 1 channel, colored ones expand to RGB),
  top-down and bottom-up row order, 4-byte row padding.

Decoders return ``{"width", "height", "channels", "pixels"}`` with
``pixels`` = row-major uint8 bytes (h * w * channels) — the contract
operators/multimodal.resize_images consumes.  Size fields are validated
before any allocation (a corrupt header cannot force a huge buffer).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channel count (palette type 3 intentionally absent)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
# allocation guard: decoded image must stay under 1 GiB
_MAX_PIXEL_BYTES = 1 << 30


def decode_png(b: bytes) -> dict:
    """Decode one PNG image -> {width, height, channels, pixels}."""
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    i = 8
    w = h = depth = ctype = None
    idat: list[bytes] = []
    while i + 8 <= len(b):
        (ln,) = struct.unpack_from(">I", b, i)
        typ = b[i + 4 : i + 8]
        if ln > len(b) - i - 12:
            raise ValueError(f"truncated PNG chunk {typ!r}")
        data = b[i + 8 : i + 8 + ln]
        (crc,) = struct.unpack_from(">I", b, i + 8 + ln)
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        i += 12 + ln
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if comp or filt:
                raise ValueError("invalid PNG compression/filter method")
            if interlace:
                raise NotImplementedError("Adam7-interlaced PNG")
            if depth != 8:
                raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
            if ctype not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"PNG color type {ctype} (gray/RGB/GA/RGBA only)"
                )
            if (
                w == 0
                or h == 0
                or h * (w * _PNG_CHANNELS[ctype] + 1) > _MAX_PIXEL_BYTES
            ):
                raise ValueError(f"implausible PNG dimensions {w}x{h}")
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    c = _PNG_CHANNELS[ctype]
    stride = w * c
    expected = h * (stride + 1)
    d = zlib.decompressobj()
    raw = d.decompress(b"".join(idat), expected)
    if len(raw) != expected or d.decompress(b"", 1):
        raise ValueError("PNG pixel data size mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = np.ascontiguousarray(arr[:, 0])
    data_a = np.ascontiguousarray(arr[:, 1:])
    _unfilter(data_a, filters, c)
    return {"width": w, "height": h, "channels": c, "pixels": data_a.tobytes()}


def _unfilter(data: np.ndarray, filters: np.ndarray, bpp: int) -> None:
    """In-place scanline unfilter (RFC 2083 section 6): C kernel when
    available, NumPy/Python reference otherwise (pinned identical)."""
    from sequila_spark.sources import _ckern as CK

    if CK.png_unfilter(data, filters, bpp):
        return
    h, stride = data.shape
    for y in range(h):
        f = int(filters[y])
        cur = data[y]
        up = data[y - 1] if y else None
        if f == 0:
            continue
        if f == 2:  # Up — vectorizable
            if up is not None:
                np.add(cur, up, out=cur, casting="unsafe")
            continue
        if f not in (1, 3, 4):
            raise ValueError(f"unknown PNG filter type {f}")
        for i in range(stride):
            a = int(cur[i - bpp]) if i >= bpp else 0
            bb = int(up[i]) if up is not None else 0
            if f == 1:  # Sub
                cur[i] = (int(cur[i]) + a) & 0xFF
            elif f == 3:  # Average
                cur[i] = (int(cur[i]) + ((a + bb) >> 1)) & 0xFF
            else:  # Paeth
                cc = int(up[i - bpp]) if (up is not None and i >= bpp) else 0
                p = a + bb - cc
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - cc)
                pr = a if (pa <= pb and pa <= pc) else (bb if pb <= pc else cc)
                cur[i] = (int(cur[i]) + pr) & 0xFF


def decode_bmp(b: bytes) -> dict:
    """Decode one BMP (BITMAPINFOHEADER+, BI_RGB) ->
    {width, height, channels, pixels}."""
    if b[:2] != b"BM" or len(b) < 54:
        raise ValueError("not a BMP (bad signature/header)")
    (pix_off,) = struct.unpack_from("<I", b, 10)
    (hdr_size,) = struct.unpack_from("<I", b, 14)
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP")
    w, h_signed = struct.unpack_from("<ii", b, 18)
    _planes, bpp = struct.unpack_from("<HH", b, 26)
    (comp,) = struct.unpack_from("<I", b, 30)
    if comp != 0:
        raise NotImplementedError(f"BMP compression {comp} (BI_RGB only)")
    top_down = h_signed < 0
    h = abs(h_signed)
    if w <= 0 or h == 0 or w * h * 3 > _MAX_PIXEL_BYTES:
        raise ValueError(f"implausible BMP dimensions {w}x{h_signed}")
    if bpp == 24:
        row_bytes = (w * 3 + 3) & ~3
        need = pix_off + row_bytes * h
        if need > len(b):
            raise ValueError("truncated BMP pixel data")
        rows = np.frombuffer(
            b, dtype=np.uint8, count=row_bytes * h, offset=pix_off
        ).reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
        rgb = rows[:, :, ::-1]  # BGR -> RGB
        if not top_down:
            rgb = rgb[::-1]
        return {
            "width": w, "height": h, "channels": 3,
            "pixels": np.ascontiguousarray(rgb).tobytes(),
        }
    if bpp == 8:
        (clr_used,) = struct.unpack_from("<I", b, 46)
        n_pal = clr_used or 256
        pal_off = 14 + hdr_size
        pal = np.frombuffer(
            b, dtype=np.uint8, count=4 * n_pal, offset=pal_off
        ).reshape(n_pal, 4)[:, :3][:, ::-1]  # BGRA rows -> RGB
        row_bytes = (w + 3) & ~3
        if pix_off + row_bytes * h > len(b):
            raise ValueError("truncated BMP pixel data")
        idx = np.frombuffer(
            b, dtype=np.uint8, count=row_bytes * h, offset=pix_off
        ).reshape(h, row_bytes)[:, :w]
        if not top_down:
            idx = idx[::-1]
        if int(idx.max(initial=0)) >= n_pal:
            raise ValueError("BMP palette index out of range")
        gray = (pal[:, 0] == pal[:, 1]).all() and (pal[:, 1] == pal[:, 2]).all()
        if gray:
            px = pal[:, 0][idx]
            return {
                "width": w, "height": h, "channels": 1,
                "pixels": np.ascontiguousarray(px).tobytes(),
            }
        px = pal[idx]
        return {
            "width": w, "height": h, "channels": 3,
            "pixels": np.ascontiguousarray(px).tobytes(),
        }
    raise NotImplementedError(f"BMP bit depth {bpp} (8/24 only)")

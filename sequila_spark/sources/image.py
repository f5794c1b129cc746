"""Native PNG / BMP decode for the multimodal registry — zero new
dependencies.

The multimodal operators (operators/multimodal.py) dispatch media decode
through a per-worker registry; this module provides REAL decoders for
the two formats a pure-Python + NumPy + zlib stack can handle exactly:

- PNG (RFC 2083): signature + chunk walk with CRC validation, IHDR /
  PLTE / tRNS / IDAT / IEND, zlib inflate, scanline filters 0-4 (None/
  Sub/Up/Average/Paeth), ALL legal depth x color-type combinations:
  gray (0) at 1/2/4/8/16 bits, RGB (2) at 8/16, palette (3) at
  1/2/4/8 with PLTE expansion and optional tRNS alpha, gray+alpha (4)
  and RGBA (6) at 8/16, and Adam7 interlacing for every combination
  (per-pass sub-images unfiltered independently, scattered into the
  final raster).  16-bit samples downscale to 8 (high byte — the
  contract is uint8 pixels); sub-byte gray upsamples by exact bit
  replication (x255/x85/x17); a tRNS color key on gray/RGB adds an
  alpha channel.  The unfilter hot loop runs in C (bamscan.c
  png_unfilter) with the NumPy/Python loop as the pinned fallback —
  tests pin both paths byte-identical.
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
# color type -> samples per pixel (palette indexes count as 1 sample)
_PNG_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# color type -> legal bit depths (PNG spec 11.2.2, table 11.1)
_PNG_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}
# allocation guard: decoded image must stay under 1 GiB
_MAX_PIXEL_BYTES = 1 << 30

# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def decode_png(b: bytes) -> dict:
    """Decode one PNG image -> {width, height, channels, pixels}."""
    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    i = 8
    w = h = depth = ctype = interlace = None
    idat: list[bytes] = []
    plte = None
    trns = None
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
            if len(data) != 13:
                raise ValueError("PNG IHDR wrong length")
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if comp or filt:
                raise ValueError("invalid PNG compression/filter method")
            if interlace not in (0, 1):
                raise ValueError(f"invalid PNG interlace method {interlace}")
            if ctype not in _PNG_SAMPLES:
                raise NotImplementedError(f"PNG color type {ctype}")
            if depth not in _PNG_DEPTHS[ctype]:
                raise ValueError(
                    f"PNG bit depth {depth} illegal for color type {ctype}"
                )
            # worst-case output: 4 channels of uint8 (+1 filter byte/row)
            if w == 0 or h == 0 or h * (w * 4 + 1) > _MAX_PIXEL_BYTES:
                raise ValueError(f"implausible PNG dimensions {w}x{h}")
        elif typ == b"PLTE":
            if ln % 3 or ln > 3 * 256 or ln == 0:
                raise ValueError("PNG PLTE length invalid")
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    if trns is not None and ctype in (4, 6):
        raise ValueError("PNG tRNS illegal with an alpha color type")

    spp = _PNG_SAMPLES[ctype]
    expected = _png_stream_bytes(w, h, depth, spp, interlace)
    d = zlib.decompressobj()
    raw = d.decompress(b"".join(idat), expected)
    if len(raw) != expected or d.decompress(b"", 1):
        raise ValueError("PNG pixel data size mismatch")

    if interlace:
        # per-pass sub-images, each filtered independently, scattered
        # into the final raster (PNG spec 8.2)
        out = np.zeros((h, w, spp), dtype=np.uint16 if depth == 16 else np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            sub, off = _png_subimage(raw, off, pw, ph, depth, spp)
            out[y0::dy, x0::dx, :] = sub
        samples = out
    else:
        samples, _ = _png_subimage(raw, 0, w, h, depth, spp)

    return _png_render(samples, w, h, depth, ctype, plte, trns)


def _png_stream_bytes(w: int, h: int, depth: int, spp: int, interlace) -> int:
    """Exact inflated-stream size: per scanline 1 filter byte +
    ceil(w*spp*depth/8) data bytes, summed over Adam7 passes when
    interlaced."""
    def rows(pw: int, ph: int) -> int:
        return ph * (1 + (pw * spp * depth + 7) // 8) if pw and ph else 0

    if not interlace:
        return rows(w, h)
    return sum(
        rows((w - x0 + dx - 1) // dx, (h - y0 + dy - 1) // dy)
        for x0, y0, dx, dy in _ADAM7
    )


def _png_subimage(raw: bytes, off: int, w: int, h: int, depth: int, spp: int):
    """Unfilter + unpack one (sub-)image from the inflated stream at
    ``off``: returns (h x w x spp array of uint8 [depth<=8] or uint16
    [depth 16], new offset)."""
    row_bytes = (w * spp * depth + 7) // 8
    arr = np.frombuffer(
        raw, dtype=np.uint8, count=h * (row_bytes + 1), offset=off
    ).reshape(h, row_bytes + 1)
    off += h * (row_bytes + 1)
    filters = np.ascontiguousarray(arr[:, 0])
    data = np.ascontiguousarray(arr[:, 1:])
    bpp = max(1, (spp * depth) // 8)  # filter unit: bytes per pixel, min 1
    _unfilter(data, filters, bpp)
    if depth == 16:
        px = data.view(">u2").astype(np.uint16).reshape(h, w, spp)
    elif depth == 8:
        px = data.reshape(h, w, spp)
    else:
        # sub-byte packed samples, MSB first within each byte (spec 7.2)
        bits = np.unpackbits(data, axis=1)
        n = w * spp
        vals = np.zeros((h, n), dtype=np.uint8)
        for k in range(depth):
            vals |= (
                bits[:, k : n * depth : depth][:, :n] << (depth - 1 - k)
            ).astype(np.uint8)
        px = vals.reshape(h, w, spp)
    return px, off


def _png_render(samples, w, h, depth, ctype, plte, trns) -> dict:
    """Samples -> final uint8 pixel contract: palette expansion, tRNS
    alpha, 16->8 downscale, sub-byte gray bit-replication."""
    if ctype == 3:
        idx = samples[:, :, 0]
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG palette index out of range")
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, dtype=np.uint8)
            if len(trns) > len(plte):
                raise ValueError("PNG tRNS longer than palette")
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            out = np.dstack([rgb, alpha[idx]])
            return {
                "width": w, "height": h, "channels": 4,
                "pixels": np.ascontiguousarray(out).tobytes(),
            }
        return {
            "width": w, "height": h, "channels": 3,
            "pixels": np.ascontiguousarray(rgb).tobytes(),
        }

    key_alpha = None
    if trns is not None and ctype in (0, 2):
        # color-key transparency, compared at source depth (spec 11.3.2)
        n_key = _PNG_SAMPLES[ctype]
        if len(trns) != 2 * n_key:
            raise ValueError("PNG tRNS wrong length for color type")
        key = np.frombuffer(trns, dtype=">u2").astype(np.uint16)
        key_alpha = np.where(
            (samples == key.reshape(1, 1, n_key)).all(axis=2), 0, 255
        ).astype(np.uint8)

    if depth == 16:
        px8 = (samples >> 8).astype(np.uint8)
    elif depth == 8:
        px8 = samples.astype(np.uint8, copy=False)
    else:
        # exact bit replication: 1->x255, 2->x85, 4->x17
        px8 = (samples * (255 // ((1 << depth) - 1))).astype(np.uint8)

    if key_alpha is not None:
        px8 = np.dstack([px8, key_alpha])
    c = px8.shape[2]
    return {
        "width": w, "height": h, "channels": c,
        "pixels": np.ascontiguousarray(px8).tobytes(),
    }


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

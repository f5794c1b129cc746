"""Native GIF decode for the multimodal registry — zero new dependencies.

Third real image codec next to PNG/BMP (sources/image.py), and the first
real MULTI-FRAME one: an animated GIF is an honest stand-in for the video
column's demux path, so ``operators/multimodal.sample_frames`` gets a real
backend instead of the deterministic fake.  Spec: GIF89a (GIF87a reads as
the subset it is):

- logical screen descriptor + global color table;
- image descriptors with optional local color tables and frame offsets;
- full LZW decompression (variable code width 3..12 bits, LSB-first
  packing, CLEAR/EOI codes, the deferred-clear rule);
- graphic control extensions: transparency index and disposal methods
  1 (keep), 2 (restore to background — decoded as transparent-black per
  every modern renderer) and 3 (restore to previous); other extensions
  (comment, application/NETSCAPE, plain text) are skipped via their
  sub-block chains;
- interlaced frames (the four-pass row shuffle).

``decode_gif`` returns the image contract PLUS the frame list:
``{"width", "height", "channels": 3, "pixels": <first frame RGB>,
"frames": [<RGB bytes per frame>], "delays_cs": [...]}`` — so the same
registry entry serves ``resize_images`` (uses ``pixels``) and
``sample_frames`` (uses ``frames``).  Size fields are validated before
any allocation, mirroring image.py's guard.
"""

from __future__ import annotations

import struct

import numpy as np

#: allocation guard: one decoded RGB canvas must stay under 256 MiB and a
#: whole animation under 1 GiB
_MAX_FRAME_BYTES = 1 << 28
_MAX_TOTAL_BYTES = 1 << 30


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> bytearray:
    """GIF-flavored LZW: codes packed LSB-first, width grows with the
    dictionary up to 12 bits, CLEAR resets, EOI terminates (a missing EOI
    tolerated at end-of-data like every real renderer)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # dictionary as (prefix_code, last_byte); roots are single bytes
    prefix = np.full(4096, -1, dtype=np.int32)
    suffix = np.zeros(4096, dtype=np.uint8)
    for c in range(clear):
        suffix[c] = c
    next_code = eoi + 1
    width = min_code_size + 1
    acc = 0
    nbits = 0
    prev = -1
    buf = bytearray(4096)  # scratch for reversed expansion
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                next_code = eoi + 1
                width = min_code_size + 1
                prev = -1
                continue
            if code == eoi:
                return out
            if prev < 0:
                if code >= clear:
                    raise ValueError("GIF LZW: first code not a literal")
                out.append(code)
                prev = code
                continue
            if code > next_code or code == next_code == 4096:
                raise ValueError("GIF LZW: code out of range")
            # expand `code` (or prev+firstbyte for the not-yet-defined one)
            c = prev if code == next_code else code
            n = 0
            while c >= 0:
                buf[n] = suffix[c]
                c = prefix[c]
                n += 1
            first = buf[n - 1]
            out += bytes(reversed(buf[:n]))
            if code == next_code:
                out.append(first)
            if next_code < 4096:
                prefix[next_code] = prev
                suffix[next_code] = first
                next_code += 1
                # deferred clear: at 4096 the width stays 12 until CLEAR
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = code
            if len(out) > max_pixels:
                raise ValueError("GIF LZW output exceeds frame size")
    return out


#: interlace passes: (row offset, row step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(b: bytes) -> dict:
    """Decode one GIF -> image contract + frames (module docstring)."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (bad signature)")
    if len(b) < 13:
        raise ValueError("truncated GIF header")
    w, h, packed, _bg, _aspect = struct.unpack_from("<HHBBB", b, 6)
    if w == 0 or h == 0 or w * h * 3 > _MAX_FRAME_BYTES:
        raise ValueError(f"implausible GIF dimensions {w}x{h}")
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(b[i : i + 3 * n], dtype=np.uint8).reshape(-1, 3)
        if len(gct) != n:
            raise ValueError("truncated GIF global color table")
        i += 3 * n

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    frames: list[bytes] = []
    delays: list[int] = []
    transparent = -1
    disposal = 0
    delay = 0

    def _subblocks(j: int) -> tuple[bytes, int]:
        parts = []
        while True:
            if j >= len(b):
                raise ValueError("truncated GIF sub-block chain")
            n = b[j]
            j += 1
            if n == 0:
                return b"".join(parts), j
            parts.append(b[j : j + n])
            if len(b[j : j + n]) != n:
                raise ValueError("truncated GIF sub-block")
            j += n

    while i < len(b):
        block = b[i]
        i += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if i >= len(b):
                raise ValueError("truncated GIF extension")
            label = b[i]
            i += 1
            if label == 0xF9:  # graphic control
                body, i = _subblocks(i)
                if len(body) >= 4:
                    gp, delay = body[0], struct.unpack_from("<H", body, 1)[0]
                    disposal = (gp >> 2) & 7
                    transparent = body[3] if gp & 1 else -1
            else:  # comment / application / plain text: skip the chain
                _, i = _subblocks(i)
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        # image descriptor
        if i + 9 > len(b):
            raise ValueError("truncated GIF image descriptor")
        fl, ft, fw, fh, fp = struct.unpack_from("<HHHHB", b, i)
        i += 9
        if fw == 0 or fh == 0 or ft + fh > h or fl + fw > w:
            raise ValueError("GIF frame exceeds logical screen")
        ct = gct
        if fp & 0x80:
            n = 2 << (fp & 7)
            ct = np.frombuffer(b[i : i + 3 * n], dtype=np.uint8).reshape(-1, 3)
            if len(ct) != n:
                raise ValueError("truncated GIF local color table")
            i += 3 * n
        if ct is None:
            raise ValueError("GIF frame has no color table")
        if i >= len(b):
            raise ValueError("truncated GIF before LZW data")
        min_code = b[i]
        i += 1
        lzw, i = _subblocks(i)
        idx = np.frombuffer(
            _lzw_decode(min_code, lzw, fw * fh), dtype=np.uint8
        )
        if len(idx) < fw * fh:
            raise ValueError("GIF frame pixel data short")
        idx = idx[: fw * fh].reshape(fh, fw)
        if fp & 0x40:  # interlaced: undo the four-pass row order
            de = np.empty_like(idx)
            src = 0
            for off, step in _INTERLACE:
                rows = range(off, fh, step)
                de[list(rows)] = idx[src : src + len(rows)]
                src += len(rows)
            idx = de
        if int(idx.max()) >= len(ct):
            raise ValueError("GIF pixel index outside color table")

        prev_canvas = canvas.copy() if disposal == 3 else None
        region = canvas[ft : ft + fh, fl : fl + fw]
        rgb = ct[idx]
        if transparent >= 0:
            keep = idx != transparent
            region[keep] = rgb[keep]
        else:
            region[...] = rgb
        if (len(frames) + 1) * h * w * 3 > _MAX_TOTAL_BYTES:
            raise ValueError("implausible GIF frame count")
        frames.append(canvas.tobytes())
        delays.append(delay)
        if disposal == 2:  # restore to background: transparent black
            canvas[ft : ft + fh, fl : fl + fw] = 0
        elif disposal == 3:
            canvas = prev_canvas
        disposal = 0
        transparent = -1
        delay = 0
    if not frames:
        raise ValueError("GIF contains no frames")
    return {
        "width": w,
        "height": h,
        "channels": 3,
        "pixels": frames[0],
        "frames": frames,
        "delays_cs": delays,
    }

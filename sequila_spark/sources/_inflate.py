"""gzip-member decompression through libdeflate when the SYSTEM provides
it, zlib otherwise — the same acceleration htslib itself ships (htslib
links libdeflate for BGZF when available; we bind the public libdeflate
API via ctypes, no extra package).

BGZF blocks (and CRAM gzip blocks) are complete gzip members whose
uncompressed size is known up front (BGZF: the member's ISIZE trailer;
CRAM: the block header's raw size), which is exactly the shape
libdeflate's one-shot ``libdeflate_gzip_decompress`` wants — measured
~2.5-3x zlib on BGZF payloads, on a decode path where inflate was ~30%
of single-core wall.

``gzip_decompress(block, out_size=None)`` is a drop-in for
``zlib.decompress(block, wbits=31)``: same bytes out, including the CRC32
check (libdeflate verifies the gzip trailer too — LIBDEFLATE_BAD_DATA on
mismatch).  Falls back to zlib when libdeflate is absent, fails to load,
or rejects a member (e.g. multi-member concatenation, which BGZF/CRAM
never produce per-block but a defensive fallback keeps correct).
"""

from __future__ import annotations

import ctypes
import ctypes.util
import struct
import threading
import zlib

_LIB = None  # ctypes CDLL once loaded; False = unavailable
_TLS = threading.local()  # one decompressor per thread (not shareable)


def _load() -> object | None:
    global _LIB
    if _LIB is None:
        try:
            name = ctypes.util.find_library("deflate") or "libdeflate.so.0"
            lib = ctypes.CDLL(name)
            lib.libdeflate_alloc_decompressor.restype = ctypes.c_void_p
            lib.libdeflate_gzip_decompress.restype = ctypes.c_int
            lib.libdeflate_gzip_decompress.argtypes = [
                ctypes.c_void_p,
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.c_void_p,
                ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_size_t),
            ]
            _LIB = lib
        except OSError:
            _LIB = False
    return _LIB or None


def _decompressor(lib) -> int:
    d = getattr(_TLS, "d", None)
    if d is None:
        d = lib.libdeflate_alloc_decompressor()
        _TLS.d = d
    return d


def gzip_decompress(block: bytes, out_size: int | None = None) -> bytes:
    """Decompress ONE complete gzip member.  ``out_size`` is the known
    uncompressed size (BGZF ISIZE / CRAM raw size); when None it is read
    from the member's ISIZE trailer (exact for any member < 4 GiB — true
    for every BGZF block by construction)."""
    lib = _load()
    if lib is None:
        return zlib.decompress(block, wbits=31)
    if out_size is None:
        if len(block) < 4:
            return zlib.decompress(block, wbits=31)
        out_size = struct.unpack_from("<I", block, len(block) - 4)[0]
        if out_size > 1 << 26:
            # the ISIZE trailer is untrusted: a corrupt 18-byte block can
            # claim ~4 GiB and this would allocate it BEFORE libdeflate
            # rejects the member.  No caller without an explicit out_size
            # is near this (BGZF members are <= 64 KiB by construction);
            # let zlib stream-decode (and raise) instead.
            return zlib.decompress(block, wbits=31)
    elif out_size > len(block) * 1032 + 4096:
        # explicit out_size is ALSO untrusted (CRAM's itf8 rsize comes
        # straight off disk): deflate's maximum expansion is 1032x, so a
        # claimed size past that bound is impossible for a valid member —
        # don't pre-allocate ~GiB for an 18-byte corrupt block, let zlib
        # stream-decode (it allocates as it inflates) and raise.
        return zlib.decompress(block, wbits=31)
    out = ctypes.create_string_buffer(out_size) if out_size else b""
    if out_size == 0:
        # empty payload (BGZF EOF marker): nothing to inflate, but still
        # let zlib validate the member rather than hand-checking the CRC
        return zlib.decompress(block, wbits=31)
    actual = ctypes.c_size_t(0)
    rc = lib.libdeflate_gzip_decompress(
        _decompressor(lib),
        block,
        len(block),
        out,
        out_size,
        ctypes.byref(actual),
    )
    if rc != 0 or actual.value != out_size:
        # LIBDEFLATE_BAD_DATA / SHORT_OUTPUT / INSUFFICIENT_SPACE — let
        # zlib produce the canonical error (or succeed, if the trailer
        # lied about the size)
        return zlib.decompress(block, wbits=31)
    return out.raw


def active_engine() -> str:
    """'libdeflate' or 'zlib' — which engine gzip_decompress will use."""
    return "libdeflate" if _load() is not None else "zlib"


def _load_comp() -> object | None:
    """Compressor-side symbols (separate probe: an old libdeflate could in
    principle expose only one side)."""
    lib = _load()
    if lib is None or getattr(lib, "_comp_ready", None) is False:
        return None
    if getattr(lib, "_comp_ready", None) is None:
        try:
            lib.libdeflate_alloc_compressor.restype = ctypes.c_void_p
            lib.libdeflate_alloc_compressor.argtypes = [ctypes.c_int]
            lib.libdeflate_deflate_compress.restype = ctypes.c_size_t
            lib.libdeflate_deflate_compress.argtypes = [
                ctypes.c_void_p,
                ctypes.c_char_p,
                ctypes.c_size_t,
                ctypes.c_void_p,
                ctypes.c_size_t,
            ]
            lib.libdeflate_crc32.restype = ctypes.c_uint32
            lib.libdeflate_crc32.argtypes = [
                ctypes.c_uint32,
                ctypes.c_char_p,
                ctypes.c_size_t,
            ]
            lib._comp_ready = True
        except AttributeError:
            lib._comp_ready = False
            return None
    return lib


def raw_deflate(payload: bytes, level: int) -> tuple[bytes, int] | None:
    """(raw deflate stream, crc32) via libdeflate, or None when
    unavailable / the output would not fit the caller's bound — callers
    fall back to zlib.  Output BYTES differ from zlib's (any compliant
    inflater accepts both); BGZF round-trip tests pin record equality,
    not compressed bytes."""
    lib = _load_comp()
    if lib is None:
        return None
    comps = getattr(_TLS, "c", None)
    if comps is None:
        comps = _TLS.c = {}
    c = comps.get(level)
    if c is None:
        c = comps[level] = lib.libdeflate_alloc_compressor(level)
    if not c:
        return None
    # worst-case bound: stored blocks, ~5 bytes per 65535 + slack
    cap = len(payload) + (len(payload) >> 9) + 64
    out = ctypes.create_string_buffer(cap)
    n = lib.libdeflate_deflate_compress(c, payload, len(payload), out, cap)
    if n == 0:
        return None
    crc = lib.libdeflate_crc32(0, payload, len(payload))
    return out.raw[:n], int(crc)

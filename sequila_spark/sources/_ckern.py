"""Optional C decode kernels (sources/bamscan.c) — compile-at-first-use
via the system C compiler, loaded with ctypes.

The kernels are pure data movement (record-offset scan, ragged segment
gather); the NumPy fallbacks in bamvec.py stay the semantic reference and
tests pin both paths to identical output.  Everything degrades gracefully:
no compiler, a failed compile, a big-endian host, or
``SEQUILA_DISABLE_CKERN=1`` all mean ``scan_offsets``/``take_ragged``
are None and callers use the Python paths.

The shared object is cached under a per-user 0700 cache directory
(``~/.cache/sequila_spark`` or ``$TMPDIR/sequila_ckern_<uid>``) keyed by
an md5 of the C source, so a source change recompiles and concurrent
Spark worker processes converge on one file (atomic rename; losers of
the race just overwrite with identical bytes).  Before ``CDLL`` the
cached file must be owned by us and not group/other-writable — a
pre-planted .so at a predictable shared-tempdir name would otherwise be
loaded into every worker (CWE-379/427).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import sys
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bamscan.c")

_LIB = None  # CDLL | False


class CramSeries(ctypes.Structure):
    """Mirror of bamscan.c's CramSeries: bulk-decoded data-series arrays
    for the per-slice CRAM feature-walk kernel."""

    _fields_ = [
        ("ref", ctypes.c_void_p), ("ref_len", ctypes.c_int64),
        ("subtab", ctypes.c_void_p),
        ("fn", ctypes.c_void_p), ("fp", ctypes.c_void_p),
        ("dl", ctypes.c_void_p), ("rs", ctypes.c_void_p),
        ("pd", ctypes.c_void_p), ("hc", ctypes.c_void_p),
        ("fn_n", ctypes.c_int64), ("fp_n", ctypes.c_int64),
        ("dl_n", ctypes.c_int64), ("rs_n", ctypes.c_int64),
        ("pd_n", ctypes.c_int64), ("hc_n", ctypes.c_int64),
        ("fc", ctypes.c_void_p), ("bs", ctypes.c_void_p),
        ("ba", ctypes.c_void_p),
        ("fc_n", ctypes.c_int64), ("bs_n", ctypes.c_int64),
        ("ba_n", ctypes.c_int64),
        ("sc_b", ctypes.c_void_p), ("sc_o", ctypes.c_void_p),
        ("sc_n", ctypes.c_int64),
        ("in_b", ctypes.c_void_p), ("in_o", ctypes.c_void_p),
        ("in_n", ctypes.c_int64),
        ("bb_b", ctypes.c_void_p), ("bb_o", ctypes.c_void_p),
        ("bb_n", ctypes.c_int64),
        ("qs_total", ctypes.c_int64),
    ]


def _cache_dir() -> str | None:
    """Per-user 0700 cache directory for compiled kernels."""
    candidates = []
    home = os.path.expanduser("~")
    if home and home != "~":
        candidates.append(os.path.join(home, ".cache", "sequila_spark"))
    candidates.append(
        os.path.join(tempfile.gettempdir(), f"sequila_ckern_{os.getuid()}")
    )
    for d in candidates:
        try:
            os.makedirs(d, mode=0o700, exist_ok=True)
            st = os.stat(d)
            if st.st_uid != os.getuid() or (st.st_mode & 0o022):
                os.chmod(d, 0o700)
                st = os.stat(d)
                if st.st_uid != os.getuid() or (st.st_mode & 0o022):
                    continue
            return d
        except OSError:
            continue
    return None


def _safe_to_load(path: str) -> bool:
    """Refuse a cached .so not owned by us or writable by group/other."""
    try:
        st = os.stat(path)
    except OSError:
        return False
    return st.st_uid == os.getuid() and not (st.st_mode & 0o022)


def _build() -> object | None:
    if sys.byteorder != "little":
        return None
    if os.environ.get("SEQUILA_DISABLE_CKERN") == "1":
        return None
    try:
        with open(_SRC, "rb") as fh:
            src = fh.read()
    except OSError:
        return None
    cache = _cache_dir()
    if cache is None:
        return None
    key = hashlib.md5(src).hexdigest()[:16]
    so = os.path.join(cache, f"sequila_bamscan_{key}.so")
    if not os.path.exists(so):
        tmp = so + f".build{os.getpid()}"
        for cc in ("cc", "gcc", "clang"):
            try:
                r = subprocess.run(
                    [cc, "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
                    capture_output=True,
                    timeout=60,
                )
            except (OSError, subprocess.TimeoutExpired):
                continue
            if r.returncode == 0:
                os.chmod(tmp, 0o500)
                os.replace(tmp, so)  # atomic: racers write identical bytes
                break
        else:
            return None
    if not _safe_to_load(so):
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    i64 = ctypes.c_int64
    p_u8 = ctypes.POINTER(ctypes.c_uint8)
    p_i64 = ctypes.POINTER(i64)
    p_u32 = ctypes.POINTER(ctypes.c_uint32)
    p_u64 = ctypes.POINTER(ctypes.c_uint64)
    lib.bam_scan_offsets.restype = i64
    lib.bam_scan_offsets.argtypes = [p_u8, i64, p_i64, i64, p_i64]
    lib.gather_ragged.restype = None
    lib.gather_ragged.argtypes = [p_u8, p_i64, p_i64, p_i64, i64, p_u8]
    for fn in (lib.rans4x8_decode0, lib.rans4x8_decode1):
        fn.restype = i64
        fn.argtypes = [p_u8, i64, i64, p_u64, p_u32, p_u8, i64]
    lib.itf8_scan.restype = i64
    lib.itf8_scan.argtypes = [p_u8, i64, p_i64]
    for fn in (lib.rans_nx16_decode0, lib.rans_nx16_decode1):
        fn.restype = i64
        fn.argtypes = [
            p_u8, i64, i64, p_u64, ctypes.c_int, p_u32, ctypes.c_int,
            p_u8, i64,
        ]
    lib.cram_walk.restype = i64
    lib.cram_walk.argtypes = [
        ctypes.POINTER(CramSeries), i64, p_i64, p_i64, p_u8, p_i64,
        p_i64, p_u8, p_u8, i64, p_i64, p_i64, p_i64, p_i64, p_i64,
    ]
    lib.png_unfilter.restype = i64
    lib.png_unfilter.argtypes = [p_u8, p_u8, i64, i64, i64]
    lib.rans_tables_fill.restype = i64
    lib.rans_tables_fill.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), p_u8, p_i64, i64, p_u8, p_i64,
    ]
    return lib


def _lib() -> object | None:
    global _LIB
    if _LIB is None:
        _LIB = _build() or False
    return _LIB or None


def _p_u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _p_i64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def available() -> bool:
    return _lib() is not None


def scan_offsets(u8: np.ndarray, total: int) -> tuple[np.ndarray, int] | None:
    """Offsets of every complete BAM record in ``u8[:total]``.
    Returns (int64 offsets, end_off) — end_off is where the carry-over
    partial record starts.  Raises ValueError on a corrupt block_size
    (mirrors the Python scan's guard).  None when the kernel is absent."""
    lib = _lib()
    if lib is None:
        return None
    max_n = total // 36 + 1  # smallest record = 4-byte size + 32-byte header
    offs = np.empty(max_n, dtype=np.int64)
    end = ctypes.c_int64(0)
    n = lib.bam_scan_offsets(
        _p_u8(u8), total, _p_i64(offs), max_n, ctypes.byref(end)
    )
    if n < 0:
        raise ValueError(
            f"corrupt BAM record: block_size at offset {end.value} "
            "below the 32-byte fixed section"
        )
    return offs[: int(n)], int(end.value)


def rans4x8(
    order: int,
    data: bytes,
    i: int,
    tables: np.ndarray,
    states: np.ndarray,
    out_size: int,
) -> tuple[bytes, int] | None:
    """4-lane interleaved rANS 4x8 decode (CRAM 3.0 method 4).  ``tables``
    is the packed per-slot table (uint64 — freq needs 13 bits; 4096 for
    order 0, 256*4096 flat for order 1), ``states`` the 4 initial lane
    states.  Returns (decoded bytes, new input index); ValueError on
    input overrun; None when the kernel is absent."""
    lib = _lib()
    if lib is None:
        return None
    out = np.empty(out_size, dtype=np.uint8)
    u8 = np.frombuffer(data, dtype=np.uint8)
    fn = lib.rans4x8_decode1 if order else lib.rans4x8_decode0
    new_i = fn(
        _p_u8(u8),
        len(data),
        i,
        np.ascontiguousarray(tables, dtype=np.uint64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint64)
        ),
        np.ascontiguousarray(states, dtype=np.uint32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint32)
        ),
        _p_u8(out),
        out_size,
    )
    if new_i < 0:
        raise ValueError("rANS 4x8 stream overran its input (corrupt block)")
    return out.tobytes(), int(new_i)


def rans_nx16(
    order: int,
    data: bytes,
    i: int,
    tables: np.ndarray,
    shift: int,
    states: np.ndarray,
    n_way: int,
    out_size: int,
) -> tuple[bytes, int] | None:
    """N-state interleaved rANS Nx16 decode (CRAM 3.1 method 5).
    ``tables``: packed u64 words (freq << 24 | bias << 8 | sym) — one
    (1<<shift)-entry table for order 0, flat 256 tables for order 1.
    Returns (bytes, new input index); ValueError on overrun; None when
    the kernel is absent."""
    lib = _lib()
    if lib is None:
        return None
    out = np.empty(out_size, dtype=np.uint8)
    u8 = np.frombuffer(data, dtype=np.uint8)
    fn = lib.rans_nx16_decode1 if order else lib.rans_nx16_decode0
    new_i = fn(
        _p_u8(u8),
        len(data),
        i,
        np.ascontiguousarray(tables, dtype=np.uint64).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint64)
        ),
        shift,
        np.ascontiguousarray(states, dtype=np.uint32).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint32)
        ),
        n_way,
        _p_u8(out),
        out_size,
    )
    if new_i < 0:
        raise ValueError("rANS Nx16 stream overran its input (corrupt block)")
    return out.tobytes(), int(new_i)


def itf8_scan_all(data: bytes) -> np.ndarray | None:
    """Every ITF8 value in ``data`` (matches ByteReader.itf8, 5-byte
    negative wrap included).  None when the kernel is absent; ValueError
    when the final value is truncated."""
    lib = _lib()
    if lib is None:
        return None
    u8 = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(max(len(data), 1), dtype=np.int64)
    n = lib.itf8_scan(_p_u8(u8), len(data), _p_i64(out))
    if n < 0:
        raise ValueError("truncated ITF8 stream")
    return out[: int(n)]


class CramWalkAbort(Exception):
    """The C walk declined this slice (unsupported feature code, series
    underrun, or a boundary case whose semantics live in the Python walk).
    Callers re-run the slice through the pinned Python path."""

    def __init__(self, code: int, info: int):
        super().__init__(f"cram_walk abort code={code} info={info}")
        self.code = code
        self.info = info


def has_cram_walk() -> bool:
    return _lib() is not None


def _vp(a: np.ndarray | None):
    return a.ctypes.data if a is not None and a.size else None


def cram_walk(
    ref: np.ndarray,
    subtab: np.ndarray,
    ints: dict,
    byts: dict,
    arrs: dict,
    qs_total: int,
    rl: np.ndarray,
    ap: np.ndarray,
    mapped: np.ndarray,
    cf: np.ndarray,
):
    """Per-slice CRAM feature-walk: reconstruct every record's sequence,
    CIGAR text, reference span, NM count and QS offset in one C call.

    ``ints``: name -> int64 array for FN/FP/DL/RS/PD/HC (missing ok);
    ``byts``: name -> uint8 array for FC/BS/BA; ``arrs``: name ->
    (concat uint8, int64 offsets) for SC/IN/BB.  Raises CramWalkAbort
    when the slice needs the Python walk."""
    lib = _lib()
    if lib is None:
        raise CramWalkAbort(-99, 0)
    n = len(rl)
    seq_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(rl, out=seq_off[1:])
    total_seq = int(seq_off[-1])
    fn = ints.get("FN")
    total_fn = int(np.clip(fn, 0, None).sum()) if fn is not None else 0
    if total_seq < 0 or total_seq > 1 << 31 or total_fn > 50_000_000:
        raise CramWalkAbort(-98, 0)  # implausible sizes: corrupt input
    seq_out = np.empty(max(total_seq, 1), dtype=np.uint8)
    cig_cap = 12 * (2 * total_fn + 2 * n + 2) + 16
    cig_out = np.empty(cig_cap, dtype=np.uint8)
    cig_off = np.empty(n + 1, dtype=np.int64)
    reflen = np.empty(n, dtype=np.int64)
    nm = np.empty(n, dtype=np.int64)
    qual_off = np.empty(n + 1, dtype=np.int64)
    err = ctypes.c_int64(0)

    S = CramSeries()
    S.ref = _vp(ref)
    S.ref_len = int(ref.size)
    S.subtab = subtab.ctypes.data
    keep = [seq_off]  # hold temporaries alive across the C call
    for name, fld in (("FN", "fn"), ("FP", "fp"), ("DL", "dl"),
                      ("RS", "rs"), ("PD", "pd"), ("HC", "hc")):
        a = ints.get(name)
        if a is not None:
            a = np.ascontiguousarray(a, dtype=np.int64)
            keep.append(a)
        setattr(S, fld, _vp(a))
        setattr(S, fld + "_n", int(a.size) if a is not None else 0)
    for name, fld in (("FC", "fc"), ("BS", "bs"), ("BA", "ba")):
        a = byts.get(name)
        if a is not None:
            a = np.ascontiguousarray(a, dtype=np.uint8)
            keep.append(a)
        setattr(S, fld, _vp(a))
        setattr(S, fld + "_n", int(a.size) if a is not None else 0)
    for name, fld in (("SC", "sc"), ("IN", "in"), ("BB", "bb")):
        pair = arrs.get(name)
        if pair is not None:
            b = np.ascontiguousarray(pair[0], dtype=np.uint8)
            o = np.ascontiguousarray(pair[1], dtype=np.int64)
            keep.extend((b, o))
            setattr(S, fld + "_b", _vp(b))
            setattr(S, fld + "_o", o.ctypes.data)
            setattr(S, fld + "_n", int(o.size) - 1)
        else:
            setattr(S, fld + "_b", None)
            setattr(S, fld + "_o", None)
            setattr(S, fld + "_n", 0)
    S.qs_total = int(qs_total)

    rl_a = np.ascontiguousarray(rl, dtype=np.int64)
    ap_a = np.ascontiguousarray(ap, dtype=np.int64)
    mp_a = np.ascontiguousarray(mapped, dtype=np.uint8)
    cf_a = np.ascontiguousarray(cf, dtype=np.int64)
    rc = lib.cram_walk(
        ctypes.byref(S), n,
        _p_i64(rl_a), _p_i64(ap_a), _p_u8(mp_a), _p_i64(cf_a),
        _p_i64(seq_off), _p_u8(seq_out), _p_u8(cig_out), cig_cap,
        _p_i64(cig_off), _p_i64(reflen), _p_i64(nm), _p_i64(qual_off),
        ctypes.byref(err),
    )
    if rc != 0:
        raise CramWalkAbort(int(rc), int(err.value))
    return seq_out, seq_off, cig_out, cig_off, reflen, nm, qual_off


def rans_tables_fill(
    tables: np.ndarray,
    ctx_ids: np.ndarray,
    ctx_off: np.ndarray,
    syms: np.ndarray,
    freqs: np.ndarray,
) -> bool:
    """Fill rANS 4x8 packed decode tables for all contexts in one C call
    (same per-slot word layout as cramcodec._rans_pack_table_np, which
    stays the pinned fallback).  ``tables`` is a zeroed uint64 array with
    4096 slots per context row; context k's (symbol, freq) pairs are
    syms/freqs[ctx_off[k]:ctx_off[k+1]], written to row ctx_ids[k].
    Returns True when the kernel ran, False when absent; ValueError when
    frequencies overflow a row."""
    lib = _lib()
    if lib is None:
        return False
    rc = lib.rans_tables_fill(
        tables.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        _p_u8(ctx_ids),
        _p_i64(ctx_off),
        len(ctx_ids),
        _p_u8(syms),
        _p_i64(freqs),
    )
    if rc != 0:
        raise ValueError("corrupt rANS frequency table (slot overflow)")
    return True


def png_unfilter(data: np.ndarray, filters: np.ndarray, bpp: int) -> bool:
    """In-place PNG scanline unfilter over ``data`` (h x stride uint8,
    filter bytes already stripped into ``filters``).  Returns True when
    the C kernel ran, False when absent (caller uses the NumPy/Python
    fallback); raises ValueError on an unknown filter type."""
    lib = _lib()
    if lib is None:
        return False
    h, stride = data.shape
    rc = lib.png_unfilter(
        _p_u8(data),
        _p_u8(np.ascontiguousarray(filters, dtype=np.uint8)),
        h,
        stride,
        bpp,
    )
    if rc != 0:
        raise ValueError("unknown PNG filter type")
    return True


def take_ragged(
    u8: np.ndarray, starts: np.ndarray, lens: np.ndarray, cum: np.ndarray
) -> np.ndarray | None:
    """One-memcpy-pass ragged gather; same output as the NumPy
    repeat/iota construction in bamvec._ragged_take.  None when absent."""
    lib = _lib()
    if lib is None:
        return None
    n = len(starts)
    out = np.empty(int(cum[-1]), dtype=np.uint8)
    if n:
        lib.gather_ragged(
            _p_u8(u8),
            _p_i64(np.ascontiguousarray(starts, dtype=np.int64)),
            _p_i64(np.ascontiguousarray(lens, dtype=np.int64)),
            _p_i64(np.ascontiguousarray(cum, dtype=np.int64)),
            n,
            _p_u8(out),
        )
    return out

"""Pure-Python CRAM 3.0/3.1 decoder — no htslib/pysam.

Implements the public hts-specs CRAM 3.0 container format
(https://samtools.github.io/hts-specs/CRAMv3.pdf): ITF8/LTF8 varints,
container/block framing, compression methods raw/gzip/bzip2/lzma/rANS4x8
(order-0 and order-1 rANS implemented from the spec's frequency-table
layout), compression-header preservation/data-series/tag maps, and the
record model — positional deltas, detached mate info, feature-based
sequence reconstruction against the reference (substitution matrix,
insertions, deletions, clips, splices) and CIGAR synthesis.

CRAM 3.1 (same container layout, new codecs) is accepted at the version
check, and every 3.1 block compression method decodes natively: rANS
Nx16 in full (orders 0/1, 4-/32-way interleave, CAT/NoSize and the
STRIPE/RLE/PACK transforms), the adaptive arithmetic (range) coder
(orders 0/1, CAT/EXT/PACK/STRIPE and the integrated RLE model), the
fqzcomp quality codec (method 7) and the name tokenizer (method 8).
Unknown future methods still raise NotImplementedError at PLAN time
(validate_container_file), so callers know exactly what a given archive
needs.

Parity surface: the reference gates CRAM behind disq/htslib
(datasources/BAM/CRAMDataSource.scala:7-15); here plain CRAM decodes
natively with the FULL spec §13 core-bitstream codec set — canonical
Huffman (multi-symbol and 0-bit constant), BETA, GAMMA, GOLOMB,
GOLOMB_RICE and SUBEXP — and only files using the remaining 3.1 codecs
above raise NotImplementedError, which callers may catch to fall back to
pysam.

Scale model mirrors the BAM codec: containers are self-contained decode
units (their compression header travels with them), so the driver scans
container *headers only* to plan one task per container, and each task
seeks straight to its byte offset (`scan_containers` / `decode_container`).

Output tuples match sources.bamcodec.parse_records exactly:
(qname, flag, contig, pos_start, pos_end, mapq, cigar, rnext, pnext,
 tlen, seq, qual, tags) — 1-based, end-inclusive.
"""

from __future__ import annotations

import bz2
import lzma
import struct
import zlib
from typing import BinaryIO, Iterator

CRAM_MAGIC = b"CRAM"

# --- primitive readers ------------------------------------------------------


class ByteReader:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes, i: int = 0):
        self.b = b
        self.i = i

    def u8(self) -> int:
        v = self.b[self.i]
        self.i += 1
        return v

    def read(self, n: int) -> bytes:
        v = self.b[self.i : self.i + n]
        self.i += n
        return v

    def int32(self) -> int:
        (v,) = struct.unpack_from("<i", self.b, self.i)
        self.i += 4
        return v

    def itf8(self) -> int:
        # hot path: one attribute read + local indexing (this is called
        # once per EXTERNAL int symbol of every CRAM record)
        b = self.b
        i = self.i
        b0 = b[i]
        if b0 < 0x80:
            self.i = i + 1
            return b0
        if b0 < 0xC0:
            self.i = i + 2
            return ((b0 & 0x7F) << 8) | b[i + 1]
        if b0 < 0xE0:
            self.i = i + 3
            return ((b0 & 0x3F) << 16) | (b[i + 1] << 8) | b[i + 2]
        if b0 < 0xF0:
            self.i = i + 4
            return ((b0 & 0x1F) << 24) | (b[i + 1] << 16) | (b[i + 2] << 8) | b[i + 3]
        v = ((b0 & 0x0F) << 28) | (b[i + 1] << 20) | (b[i + 2] << 12) | (
            b[i + 3] << 4
        ) | (b[i + 4] & 0x0F)
        self.i = i + 5
        if v >= 1 << 31:
            v -= 1 << 32
        return v

    def ltf8(self) -> int:
        b0 = self.u8()
        n = 0
        while n < 8 and b0 & (0x80 >> n):
            n += 1
        v = b0 & (0xFF >> n) if n < 8 else 0
        for _ in range(n):
            v = (v << 8) | self.u8()
        if v >= 1 << 63:
            v -= 1 << 64
        return v


# --- rANS 4x8 (CRAM 3.0 external compression method 4) ----------------------

_RANS_LOW = 1 << 23


def _rans_read_freq_pairs(r: ByteReader) -> list[tuple[int, int]]:
    """The order-0 frequency RLE parse -> [(symbol, freq)] in stream
    order (shared by the Python and C decode paths)."""
    pairs = []
    sym = r.u8()
    rle = 0
    while True:
        f = r.itf8()
        pairs.append((sym, f))
        if rle > 0:
            rle -= 1
            sym += 1
        else:
            # htscodecs compares the next explicit symbol against the
            # RUN-ADVANCED current symbol (j+1 == *cp), so a spec-valid
            # stream whose explicit symbol equals run_end+1 starts a new
            # RLE run rather than desyncing
            nxt = r.u8()
            if nxt == sym + 1:
                rle = r.u8()
            sym = nxt
        if sym == 0:
            break
    # corrupt-input contract, host-independent: a symbol run past 255 or a
    # total frequency over the 4096-slot normalization raises the SAME
    # ValueError whether the C kernel, the NumPy builder, or the pure-
    # Python packer consumes these pairs (without this, each path failed
    # with a different error type for the same corrupt stream)
    total = 0
    for s, f in pairs:
        if not 0 <= s <= 255 or f < 0:
            raise ValueError("corrupt rANS frequency table")
        total += f
    if total > 4096:
        raise ValueError("corrupt rANS frequency table")
    return pairs


def _rans_pack_table(pairs: list[tuple[int, int]]) -> list[int]:
    """Per-SLOT decode table (total is 4096 per spec normalization), PACKED
    into one int per slot — (freq << 24) | (slot_bias << 12) | symbol —
    so the hot loop does ONE list index + three bit ops per byte instead
    of three list indexes (freq <= 4096 and bias < freq both fit 12 bits).
    Cumulative offsets run in SYMBOL order (later duplicates overwrite,
    like the C htscodecs table build)."""
    freq = [0] * 256
    for s, f in pairs:
        freq[s] = f
    packed = [0] * 4096
    c = 0
    for s in range(256):
        f = freq[s]
        if not f:
            continue
        fs = f << 24
        for slot in range(c, c + f):
            packed[slot] = fs | ((slot - c) << 12) | s
        c += f
    return packed


def _rans_pack_table_np(pairs: list[tuple[int, int]]):
    """_rans_pack_table as a uint32 NumPy array (the C kernel's input),
    built with one np.repeat pass instead of per-slot Python."""
    import numpy as np

    freq = np.zeros(256, dtype=np.int64)
    for s, f in pairs:
        freq[s] = f
    syms = np.nonzero(freq)[0]
    f = freq[syms]
    total = int(f.sum())
    packed = np.zeros(4096, dtype=np.uint64)  # freq is 13 bits: u64 word
    if total:
        starts = np.concatenate(([0], np.cumsum(f)[:-1]))
        # bit 48 = slot-filled marker: the C kernel refuses unfilled slots
        # (missing order-1 contexts, out-of-range padding) instead of
        # decoding the zero word into silent garbage on corrupt input
        base = np.repeat((f << 24) | syms | (1 << 48), f)
        bias = np.arange(total, dtype=np.int64) - np.repeat(starts, f)
        packed[:total] = (base | (bias << 12)).astype(np.uint64)
    return packed


def _rans_read_freqs0(r: ByteReader) -> list[int]:
    return _rans_pack_table(_rans_read_freq_pairs(r))


def _rans_decode0(r: ByteReader, out_size: int) -> bytes:
    packed = _rans_read_freqs0(r)
    x0, x1, x2, x3 = (struct.unpack("<I", r.read(4))[0] for _ in range(4))
    out = bytearray(out_size)
    b = r.b
    i = r.i
    low = _RANS_LOW
    # 4 interleaved states, unrolled (list-indexed state arrays cost ~25%)
    for pos in range(0, out_size - 3, 4):
        v = packed[x0 & 0xFFF]
        out[pos] = v & 0xFF
        x0 = (v >> 24) * (x0 >> 12) + ((v >> 12) & 0xFFF)
        while x0 < low:
            x0 = (x0 << 8) | b[i]
            i += 1
        v = packed[x1 & 0xFFF]
        out[pos + 1] = v & 0xFF
        x1 = (v >> 24) * (x1 >> 12) + ((v >> 12) & 0xFFF)
        while x1 < low:
            x1 = (x1 << 8) | b[i]
            i += 1
        v = packed[x2 & 0xFFF]
        out[pos + 2] = v & 0xFF
        x2 = (v >> 24) * (x2 >> 12) + ((v >> 12) & 0xFFF)
        while x2 < low:
            x2 = (x2 << 8) | b[i]
            i += 1
        v = packed[x3 & 0xFFF]
        out[pos + 3] = v & 0xFF
        x3 = (v >> 24) * (x3 >> 12) + ((v >> 12) & 0xFFF)
        while x3 < low:
            x3 = (x3 << 8) | b[i]
            i += 1
    states = [x0, x1, x2, x3]
    for pos in range(out_size & ~3, out_size):
        j = pos & 3
        x = states[j]
        v = packed[x & 0xFFF]
        out[pos] = v & 0xFF
        x = (v >> 24) * (x >> 12) + ((v >> 12) & 0xFFF)
        while x < low:
            x = (x << 8) | b[i]
            i += 1
        states[j] = x
    r.i = i
    return bytes(out)


def _rans_decode1(r: ByteReader, out_size: int) -> bytes:
    """Order-1: 256 conditional tables keyed by previous symbol; four
    interleaved streams each decode a quarter of the output."""
    tables = [None] * 256
    sym = r.u8()
    rle = 0
    while True:
        if not 0 <= sym <= 255:  # same contract as the C path's ctx check
            raise ValueError("corrupt rANS frequency table")
        tables[sym] = _rans_read_freqs0(r)
        if rle > 0:
            rle -= 1
            sym += 1
        else:
            # run-advanced comparison — see _rans_read_freqs0
            nxt = r.u8()
            if nxt == sym + 1:
                rle = r.u8()
            sym = nxt
        if sym == 0:
            break
    x0, x1, x2, x3 = (struct.unpack("<I", r.read(4))[0] for _ in range(4))
    quarter = out_size >> 2
    truncated = out_size & 3
    out = bytearray(out_size)
    b = r.b
    i = r.i
    low = _RANS_LOW
    t0 = t1 = t2 = t3 = tables[0]  # prev-symbol tables, lanes unrolled
    q2 = 2 * quarter
    q3 = 3 * quarter
    for pos in range(quarter):
        v = t0[x0 & 0xFFF]
        s = v & 0xFF
        out[pos] = s
        t0 = tables[s]
        x0 = (v >> 24) * (x0 >> 12) + ((v >> 12) & 0xFFF)
        while x0 < low:
            x0 = (x0 << 8) | b[i]
            i += 1
        v = t1[x1 & 0xFFF]
        s = v & 0xFF
        out[quarter + pos] = s
        t1 = tables[s]
        x1 = (v >> 24) * (x1 >> 12) + ((v >> 12) & 0xFFF)
        while x1 < low:
            x1 = (x1 << 8) | b[i]
            i += 1
        v = t2[x2 & 0xFFF]
        s = v & 0xFF
        out[q2 + pos] = s
        t2 = tables[s]
        x2 = (v >> 24) * (x2 >> 12) + ((v >> 12) & 0xFFF)
        while x2 < low:
            x2 = (x2 << 8) | b[i]
            i += 1
        v = t3[x3 & 0xFFF]
        s = v & 0xFF
        out[q3 + pos] = s
        t3 = tables[s]
        x3 = (v >> 24) * (x3 >> 12) + ((v >> 12) & 0xFFF)
        while x3 < low:
            x3 = (x3 << 8) | b[i]
            i += 1
    # remainder bytes decode on stream 3
    for pos in range(out_size - truncated, out_size):
        v = t3[x3 & 0xFFF]
        s = v & 0xFF
        out[pos] = s
        t3 = tables[s]
        x3 = (v >> 24) * (x3 >> 12) + ((v >> 12) & 0xFFF)
        while x3 < low:
            x3 = (x3 << 8) | b[i]
            i += 1
    r.i = i
    return bytes(out)


def rans_decode(data: bytes) -> bytes:
    r = ByteReader(data)
    order = r.u8()
    _csize = struct.unpack("<I", r.read(4))[0]
    rsize = struct.unpack("<I", r.read(4))[0]
    if order not in (0, 1):
        raise NotImplementedError(f"rANS order {order}")

    from sequila_spark.sources import _ckern as CK

    if CK.available():
        # C hot loop fed by Python-parsed tables (the pure-Python decoders
        # below stay the pinned reference; test_cram_native pins parity)
        import numpy as np

        if order == 0:
            ctx_pairs = [(0, _rans_read_freq_pairs(r))]
            tables = np.zeros(4096, dtype=np.uint64)
        else:
            ctx_pairs = []
            sym = r.u8()
            rle = 0
            while True:
                ctx_pairs.append((sym, _rans_read_freq_pairs(r)))
                if rle > 0:
                    rle -= 1
                    sym += 1
                else:
                    # run-advanced comparison — see _rans_read_freq_pairs
                    nxt = r.u8()
                    if nxt == sym + 1:
                        rle = r.u8()
                    sym = nxt
                if sym == 0:
                    break
            tables = np.zeros((256, 4096), dtype=np.uint64)
        # context ids share the corrupt-input contract of
        # _rans_read_freq_pairs (which already validates each table's
        # symbols and total): a context RLE run past 255 is corrupt
        if any(not 0 <= c <= 255 for c, _ in ctx_pairs):
            raise ValueError("corrupt rANS frequency table")
        # all contexts' tables in ONE C pass (pinned fallback: the
        # per-context NumPy builder)
        ctx_ids = np.fromiter(
            (c for c, _ in ctx_pairs), dtype=np.uint8, count=len(ctx_pairs)
        )
        ctx_off = np.zeros(len(ctx_pairs) + 1, dtype=np.int64)
        np.cumsum([len(p) for _, p in ctx_pairs], out=ctx_off[1:])
        flat = [sf for _, p in ctx_pairs for sf in p]
        syms_a = np.fromiter(
            (s for s, _ in flat), dtype=np.uint8, count=len(flat)
        )
        freqs_a = np.fromiter(
            (f for _, f in flat), dtype=np.int64, count=len(flat)
        )
        if not CK.rans_tables_fill(tables, ctx_ids, ctx_off, syms_a, freqs_a):
            if order == 0:
                tables = _rans_pack_table_np(ctx_pairs[0][1])
            else:
                for c, p in ctx_pairs:
                    tables[c] = _rans_pack_table_np(p)
        sbytes = r.read(16)
        if len(sbytes) != 16:
            raise ValueError("corrupt rANS 4x8 block: truncated state vector")
        states = np.frombuffer(sbytes, dtype="<u4")
        out, _ = CK.rans4x8(order, r.b, r.i, tables, states, rsize)
        return out

    if order == 0:
        return _rans_decode0(r, rsize)
    return _rans_decode1(r, rsize)


# --- rANS Nx16 (CRAM 3.1 external compression method 5) ---------------------
#
# hts-specs CRAMcodecs §"rANS Nx16": 16-bit renormalization (vs 4x8's
# 8-bit), 12-bit frequencies summing to 4096, uint7 lengths, and a flags
# byte composing bit-transforms.  Implemented in FULL: orders 0 and 1
# (4- and 32-way interleaving, reduced-precision order-1 tables), plus
# every bit-transform — CAT, NoSize, STRIPE, RLE (verbatim or nested
# order-0 metadata) and PACK — composed in spec order
# (entropy -> unRLE -> unPACK); see rans_nx16_decode.

_NX16_ORDER1 = 0x01
_NX16_X32 = 0x04
_NX16_STRIPE = 0x08
_NX16_NOSZ = 0x10
_NX16_CAT = 0x20
_NX16_RLE = 0x40
_NX16_PACK = 0x80
_NX16_LOW = 1 << 15


def _uint7(r: ByteReader) -> int:
    """Variable-length unsigned int, 7 bits per byte, most significant
    first; top bit set = more bytes follow."""
    v = 0
    while True:
        c = r.u8()
        v = (v << 7) | (c & 0x7F)
        if not c & 0x80:
            return v


def _nx16_read_alphabet(r: ByteReader) -> list[int]:
    """Symbols present, ascending, with run-length encoding for consecutive
    runs (htscodecs decode_alphabet; terminated by a 0 symbol, which can
    therefore only appear first)."""
    syms: list[int] = []
    sym = r.u8()
    last = sym
    rle = 0
    while True:
        syms.append(sym)
        if rle > 0:
            rle -= 1
            sym += 1
        else:
            sym = r.u8()
            if sym == last + 1:
                rle = r.u8()
        last = sym
        if sym == 0:
            return syms


def _nx16_norm_freqs(freq: list[int], target: int) -> None:
    """Spec frequency renormalization (htscodecs normalise_freq_shift):
    tables may legally be stored at reduced precision — every frequency
    right-shifted so the sum is ``target >> k`` — and the decoder upscales
    by the power-of-two shift.  A sum that is not an exact power-of-two
    fraction of ``target`` cannot come from that encoder: corrupt data,
    raised loudly rather than decoded as garbage."""
    tot = sum(freq)
    if tot == 0 or tot == target:
        return
    shift = 0
    t = tot
    while t < target:
        t <<= 1
        shift += 1
    if t != target:
        raise ValueError(
            f"rANS Nx16 frequencies sum to {tot}: not a power-of-two "
            f"fraction of {target}"
        )
    for s in range(len(freq)):
        freq[s] <<= shift


def _nx16_pack_np(freq: list[int], tot: int):
    """Packed Nx16 decode table (u64 per slot: freq << 24 | cum << 8 |
    sym) for the C kernel, built with one np.repeat pass."""
    import numpy as np

    f = np.asarray(freq, dtype=np.int64)
    syms = np.nonzero(f)[0]
    fs = f[syms]
    packed = np.zeros(tot, dtype=np.uint64)
    total = int(fs.sum())
    if total:
        cum = np.concatenate(([0], np.cumsum(fs)[:-1]))
        # bit 48 = slot-filled marker (see _rans_pack_table_np)
        packed[:total] = np.repeat(
            (fs << 24) | (cum << 8) | syms | (1 << 48), fs
        ).astype(np.uint64)
    return packed


def _nx16_decode0(r: ByteReader, out_size: int, n_way: int) -> bytes:
    syms = _nx16_read_alphabet(r)
    freq = [0] * 256
    for s in syms:
        freq[s] = _uint7(r)
    _nx16_norm_freqs(freq, 4096)

    from sequila_spark.sources import _ckern as CK

    if CK.available() and out_size:
        import numpy as np

        sbytes = r.read(4 * n_way)
        if len(sbytes) != 4 * n_way:
            raise ValueError("corrupt rANS Nx16 block: truncated state vector")
        states_a = np.frombuffer(sbytes, dtype="<u4")
        out, new_i = CK.rans_nx16(
            0, r.b, r.i, _nx16_pack_np(freq, 4096), 12, states_a, n_way,
            out_size,
        )
        r.i = new_i
        return out

    cum = [0] * 257
    for s in range(256):
        cum[s + 1] = cum[s] + freq[s]
    lookup = [0] * 4096
    for s in range(256):
        for slot in range(cum[s], cum[s + 1]):
            lookup[slot] = s
    states = [struct.unpack("<I", r.read(4))[0] for _ in range(n_way)]
    out = bytearray(out_size)
    b = r.b
    i = r.i
    for pos in range(out_size):
        j = pos % n_way
        x = states[j]
        slot = x & 0xFFF
        s = lookup[slot]
        out[pos] = s
        x = freq[s] * (x >> 12) + slot - cum[s]
        if x < _NX16_LOW:
            x = (x << 16) | b[i] | (b[i + 1] << 8)
            i += 2
        states[j] = x
    r.i = i
    return bytes(out)


def _nx16_decode1(r: ByteReader, out_size: int, n_way: int) -> bytes:
    """rANS Nx16 order-1: per-context frequency rows (zero-run RLE over the
    shared alphabet, optionally themselves order-0-compressed), output split
    into N contiguous slices — state j decodes slice j, the remainder is
    decoded by the last state continuing its context chain (CRAMcodecs
    'rANS Nx16' order-1 pseudocode)."""
    comp = r.u8()
    shift = comp >> 4
    if comp & 1:  # frequency table itself order-0 compressed
        u_size = _uint7(r)
        c_size = _uint7(r)
        freq_r = ByteReader(_nx16_decode0(ByteReader(r.read(c_size)), u_size, 4))
    else:
        freq_r = r
    syms = _nx16_read_alphabet(freq_r)
    tot = 1 << shift
    mask = tot - 1
    # per-context rows with zero-run RLE: an explicit 0 frequency is
    # followed by a byte counting further implied zeros
    F: dict[int, list[int]] = {}
    cum: dict[int, list[int]] = {}
    lookup: dict[int, bytearray] = {}
    for i in syms:
        row = [0] * 256
        run = 0
        for j in syms:
            if run > 0:
                run -= 1
                continue
            f = _uint7(freq_r)
            row[j] = f
            if f == 0:
                run = freq_r.u8()
        if sum(row) == 0:
            continue  # context never used by the stream
        _nx16_norm_freqs(row, tot)  # reduced-precision rows upscale
        c = [0] * 257
        for s in range(256):
            c[s + 1] = c[s] + row[s]
        lk = bytearray(tot)
        for s in syms:
            if row[s]:
                for slot in range(c[s], c[s + 1]):
                    lk[slot] = s
        F[i] = row
        cum[i] = c
        lookup[i] = lk

    from sequila_spark.sources import _ckern as CK

    # C path only for shift <= 12: the packed u64 word gives freq a 13-bit
    # field ((v>>24)&0x1FFF in bamscan.c), so a context with freq >= 8192
    # (possible at shift 13-15 with a dominant symbol) would mis-extract.
    # Spec-valid high-shift streams take the pinned Python path instead.
    if CK.available() and out_size and shift <= 12:
        import numpy as np

        tables = np.zeros((256, tot), dtype=np.uint64)
        for ctx, row in F.items():
            tables[ctx] = _nx16_pack_np(row, tot)
        sbytes = r.read(4 * n_way)
        if len(sbytes) != 4 * n_way:
            raise ValueError("corrupt rANS Nx16 block: truncated state vector")
        states_a = np.frombuffer(sbytes, dtype="<u4")
        out_b, new_i = CK.rans_nx16(
            1, r.b, r.i, tables, shift, states_a, n_way, out_size
        )
        r.i = new_i
        return out_b

    states = [struct.unpack("<I", r.read(4))[0] for _ in range(n_way)]
    out = bytearray(out_size)
    b = r.b
    ptr = r.i
    i2 = out_size // n_way
    last = [0] * n_way
    for pos in range(i2):
        for j in range(n_way):
            x = states[j]
            slot = x & mask
            ctx = last[j]
            s = lookup[ctx][slot]
            out[j * i2 + pos] = s
            x = F[ctx][s] * (x >> shift) + slot - cum[ctx][s]
            if x < _NX16_LOW:
                x = (x << 16) | b[ptr] | (b[ptr + 1] << 8)
                ptr += 2
            states[j] = x
            last[j] = s
    # remainder: the last state continues its context chain
    x = states[n_way - 1]
    ctx = last[n_way - 1]
    for pos in range(n_way * i2, out_size):
        slot = x & mask
        s = lookup[ctx][slot]
        out[pos] = s
        x = F[ctx][s] * (x >> shift) + slot - cum[ctx][s]
        if x < _NX16_LOW:
            x = (x << 16) | b[ptr] | (b[ptr + 1] << 8)
            ptr += 2
        ctx = s
    r.i = ptr
    return bytes(out)


def _nx16_unpack(data: bytes, pmap: list[int], out_size: int) -> bytes:
    """Inverse PACK: expand 0/1/2/4-bit indices (LSB-first within each
    byte) through the symbol map."""
    nsym = len(pmap)
    out = bytearray(out_size)
    if nsym <= 1:
        sym = pmap[0] if pmap else 0
        for i in range(out_size):
            out[i] = sym
    elif nsym <= 2:
        for i in range(out_size):
            out[i] = pmap[(data[i >> 3] >> (i & 7)) & 1]
    elif nsym <= 4:
        for i in range(out_size):
            out[i] = pmap[(data[i >> 2] >> ((i & 3) << 1)) & 3]
    elif nsym <= 16:
        for i in range(out_size):
            out[i] = pmap[(data[i >> 1] >> ((i & 1) << 2)) & 15]
    else:
        raise ValueError(f"rANS Nx16 PACK with {nsym} symbols")
    return bytes(out)


def _nx16_unrle(data: bytes, has_run: bytearray, runs: ByteReader,
                out_size: int) -> bytes:
    """Inverse RLE: symbols flagged in ``has_run`` are followed (in the
    side meta stream) by a uint7 count of EXTRA repeats."""
    out = bytearray(out_size)
    j = 0
    for sym in data:
        if has_run[sym]:
            n = _uint7(runs) + 1
            out[j : j + n] = bytes([sym]) * n
            j += n
        else:
            out[j] = sym
            j += 1
    if j != out_size:
        raise ValueError(f"rANS Nx16 RLE expanded to {j} != {out_size}")
    return bytes(out)


def _nx16_stripe(r: ByteReader, out_size: int) -> bytes:
    """Inverse STRIPE: N independent sub-streams (each a complete rANS
    Nx16 stream), de-interleaved byte-round-robin into the output."""
    n = r.u8()
    clens = [_uint7(r) for _ in range(n)]
    out = bytearray(out_size)
    q, rem = divmod(out_size, n)
    for j in range(n):
        ulen = q + (1 if j < rem else 0)
        sub = rans_nx16_decode(bytes(r.read(clens[j])), ulen)
        if len(sub) != ulen:
            raise ValueError("rANS Nx16 STRIPE substream length mismatch")
        out[j::n] = sub
    return bytes(out)


def rans_nx16_decode(data: bytes, raw_size: int) -> bytes:
    """Full rANS Nx16 decode per the CRAMcodecs spec: orders 0/1, 4- or
    32-way interleave, and the CAT / STRIPE / PACK / RLE transforms.
    Transform metadata reads in stream order (PACK map, then RLE symbol
    set + run stream), inverses apply in reverse (entropy -> unRLE ->
    unPACK)."""
    r = ByteReader(data)
    flags = r.u8()
    n_way = 32 if flags & _NX16_X32 else 4
    out_size = raw_size if flags & _NX16_NOSZ else _uint7(r)
    if flags & _NX16_STRIPE:
        return _nx16_stripe(r, out_size)
    pmap: list[int] | None = None
    has_run: bytearray | None = None
    runs_r: ByteReader | None = None
    pack_len = rle_len = 0
    if flags & _NX16_PACK:
        pack_len = out_size
        nsym = r.u8()
        pmap = [r.u8() for _ in range(nsym)]
        out_size = _uint7(r)
    if flags & _NX16_RLE:
        rle_len = out_size
        rle_meta_len = _uint7(r)
        out_size = _uint7(r)
        if rle_meta_len & 1:  # stored verbatim
            meta = ByteReader(r.read((rle_meta_len - 1) >> 1))
        else:  # itself order-0 compressed
            cmeta_len = _uint7(r)
            meta = ByteReader(
                _nx16_decode0(ByteReader(r.read(cmeta_len)), rle_meta_len >> 1, 4)
            )
        n_rle = meta.u8() or 256
        has_run = bytearray(256)
        for _ in range(n_rle):
            has_run[meta.u8()] = 1
        runs_r = meta
    if out_size == 0:  # e.g. PACK with a <=1-symbol map packs to nothing
        out = b""
    elif flags & _NX16_CAT:
        out = bytes(r.read(out_size))
    elif flags & _NX16_ORDER1:
        out = _nx16_decode1(r, out_size, n_way)
    else:
        out = _nx16_decode0(r, out_size, n_way)
    if has_run is not None:
        out = _nx16_unrle(out, has_run, runs_r, rle_len)
    if pmap is not None:
        out = _nx16_unpack(out, pmap, pack_len)
    return out


# --- CRAM 3.1 adaptive arithmetic (range) coder -----------------------------
# Implemented from the public CRAMcodecs specification: an LZMA-family
# carry-aware range coder (StartDecode consumes 5 bytes — the encoder's
# leading carry-headroom byte shifts straight out of the 32-bit code
# register) with Fenwick-free adaptive byte models: per-symbol frequencies
# start at 1, bump by 16 on use, bubble one slot toward the front when they
# pass their predecessor, and halve (rounding up) when the total crosses
# MAX_FREQ.  Shares the Nx16 transform flag byte, except bit 0x04 means
# EXT (bzip2-compressed payload) rather than 32-way interleave and RLE is
# an integrated model (symbol, then run length from a 258-model bank) —
# not side metadata as in rANS Nx16.

_ARITH_EXT = 0x04
_ARITH_STEP = 16
_ARITH_MAX_FREQ = (1 << 16) - 17


class _RangeDecoder:
    __slots__ = ("b", "i", "range", "code")

    def __init__(self, r: ByteReader):
        self.b = r.b
        self.i = r.i
        self.range = 0xFFFFFFFF
        code = 0
        for _ in range(5):
            code = ((code << 8) | self.b[self.i]) & 0xFFFFFFFFFF
            self.i += 1
        self.code = code & 0xFFFFFFFF

    def get_freq(self, tot: int) -> int:
        self.range //= tot
        return self.code // self.range

    def decode(self, cum: int, freq: int) -> None:
        self.code -= cum * self.range
        self.range *= freq
        while self.range < (1 << 24):
            self.range = (self.range << 8) & 0xFFFFFFFFFF
            self.code = ((self.code << 8) | self.b[self.i]) & 0xFFFFFFFFFF
            self.i += 1


class _AdaptiveModel:
    """Adaptive frequency model: entries (symbol, freq) kept approximately
    sorted by bubbling a used entry one slot forward; linear cumulative
    scan (hot symbols sit at the front, so the scan is short in practice)."""

    __slots__ = ("syms", "freqs", "total")

    def __init__(self, nsym: int):
        self.syms = list(range(nsym))
        self.freqs = [1] * nsym
        self.total = nsym

    def decode(self, rc: _RangeDecoder) -> int:
        f = rc.get_freq(self.total)
        freqs = self.freqs
        cum = 0
        x = 0
        while cum + freqs[x] <= f:
            cum += freqs[x]
            x += 1
        rc.decode(cum, freqs[x])
        sym = self.syms[x]
        self._update(x)
        return sym

    def _update(self, x: int) -> None:
        freqs = self.freqs
        freqs[x] += _ARITH_STEP
        self.total += _ARITH_STEP
        if x > 0 and freqs[x] > freqs[x - 1]:
            freqs[x], freqs[x - 1] = freqs[x - 1], freqs[x]
            s = self.syms
            s[x], s[x - 1] = s[x - 1], s[x]
        if self.total > _ARITH_MAX_FREQ:
            self.total = 0
            for j in range(len(freqs)):
                freqs[j] -= freqs[j] >> 1
                self.total += freqs[j]


def _arith_decode0(r: ByteReader, out_size: int) -> bytes:
    max_sym = r.u8() or 256
    rc = _RangeDecoder(r)
    model = _AdaptiveModel(max_sym)
    out = bytearray(out_size)
    for pos in range(out_size):
        out[pos] = model.decode(rc)
    r.i = rc.i
    return bytes(out)


def _arith_decode1(r: ByteReader, out_size: int) -> bytes:
    max_sym = r.u8() or 256
    rc = _RangeDecoder(r)
    models = [_AdaptiveModel(max_sym) for _ in range(max_sym)]
    out = bytearray(out_size)
    ctx = 0
    for pos in range(out_size):
        ctx = out[pos] = models[ctx].decode(rc)
    r.i = rc.i
    return bytes(out)


def _arith_decode_rle(r: ByteReader, out_size: int, order1: bool) -> bytes:
    """Integrated RLE mode of the CRAM 3.1 adaptive arithmetic coder
    (CRAMcodecs spec, arithmetic coding section): each literal is decoded
    from the usual order-0/1 byte model, then its run length from a bank of
    258 adaptive models — the first length part keyed by the literal symbol,
    the first continuation by model 256 and all further continuations by
    model 257, each part adding up to 255 with 255 meaning "more"."""
    max_sym = r.u8() or 256
    rc = _RangeDecoder(r)
    lits = [_AdaptiveModel(max_sym) for _ in range(max_sym if order1 else 1)]
    runs = [_AdaptiveModel(256) for _ in range(258)]
    out = bytearray(out_size)
    i = 0
    last = 0
    while i < out_size:
        sym = lits[last if order1 else 0].decode(rc)
        last = sym
        part = runs[sym].decode(rc)
        run = part
        rctx = 256
        while part == 255:
            part = runs[rctx].decode(rc)
            rctx = 257
            run += part
        end = min(i + run + 1, out_size)
        for j in range(i, end):
            out[j] = sym
        i += run + 1
    r.i = rc.i
    return bytes(out)


def _arith_stripe(r: ByteReader, out_size: int) -> bytes:
    n = r.u8()
    clens = [_uint7(r) for _ in range(n)]
    out = bytearray(out_size)
    q, rem = divmod(out_size, n)
    for j in range(n):
        ulen = q + (1 if j < rem else 0)
        sub = arith_decode(bytes(r.read(clens[j])), ulen)
        if len(sub) != ulen:
            raise ValueError("arith STRIPE substream length mismatch")
        out[j::n] = sub
    return bytes(out)


def arith_decode(data: bytes, raw_size: int) -> bytes:
    """CRAM 3.1 block method 6 (adaptive arithmetic coding): orders 0/1,
    CAT, EXT (bzip2), PACK, STRIPE and the integrated RLE mode."""
    r = ByteReader(data)
    flags = r.u8()
    out_size = raw_size if flags & _NX16_NOSZ else _uint7(r)
    if flags & _NX16_STRIPE:
        return _arith_stripe(r, out_size)
    pmap: list[int] | None = None
    pack_len = 0
    if flags & _NX16_PACK:
        pack_len = out_size
        nsym = r.u8()
        pmap = [r.u8() for _ in range(nsym)]
        out_size = _uint7(r)
    if out_size == 0:
        out = b""
    elif flags & _NX16_CAT:
        out = bytes(r.read(out_size))
    elif flags & _ARITH_EXT:
        out = bz2.decompress(bytes(r.b[r.i :]))
        if len(out) != out_size:
            raise ValueError("arith EXT payload length mismatch")
    elif flags & _NX16_RLE:
        out = _arith_decode_rle(r, out_size, bool(flags & _NX16_ORDER1))
    elif flags & _NX16_ORDER1:
        out = _arith_decode1(r, out_size)
    else:
        out = _arith_decode0(r, out_size)
    if pmap is not None:
        out = _nx16_unpack(out, pmap, pack_len)
    return out


# --- CRAM 3.1 name tokenizer (block method 8) -------------------------------
# Implemented from the public hts-specs CRAMcodecs "Name tokenisation"
# section (the codec htscodecs calls tok3): read names are split into
# tokens (alpha runs, digit runs with or without leading zeros, single
# chars) and encoded column-wise against a reference name — MATCH for
# identical tokens, small numeric deltas as one byte, fresh values
# otherwise — with one byte stream per (token position, token type), each
# stream itself compressed with rANS Nx16 or the arithmetic coder.
# Decoded output is validated against the header's name count and total
# length, so a malformed (or mis-serialized) stream fails loudly rather
# than yielding corrupt names.

N_TYPE, N_ALPHA, N_CHAR, N_DIGITS0, N_DZLEN, N_DUP, N_DIFF = range(7)
N_DIGITS, N_DDELTA, N_DDELTA0, N_MATCH, N_NOP, N_END = range(7, 13)


class _ConstReader:
    """Virtual TYPE stream for a constant-type column (the encoder elides
    the TYPE stream and declares the type in the stream header byte)."""

    __slots__ = ("v",)

    def __init__(self, v: int):
        self.v = v

    def u8(self) -> int:
        return self.v


def _tok_read_streams(
    r: ByteReader, use_arith: bool
) -> dict[tuple[int, int], ByteReader]:
    """Deserialize the per-(position, type) byte streams.  Header byte per
    stream: low 6 bits token type, 0x80 = starts a new token position,
    0x40 = duplicate of an earlier stream (two follow-up bytes give the
    source position and type)."""
    B: dict[tuple[int, int], ByteReader] = {}
    t = -1
    while r.i < len(r.b):
        head = r.u8()
        typ = head & 0x3F
        if head & 0x80:
            t += 1
        if t < 0:
            raise ValueError("name tokenizer: stream before first position")
        if head & 0x40:
            src = (r.u8(), r.u8())
            if src not in B:
                raise ValueError("name tokenizer: dup of unknown stream")
            B[(t, typ)] = ByteReader(B[src].b)
        else:
            clen = _uint7(r)
            payload = bytes(r.read(clen))
            raw = (
                arith_decode(payload, 0)
                if use_arith
                else rans_nx16_decode(payload, 0)
            )
            B[(t, typ)] = ByteReader(raw)
        if head & 0x80 and typ != N_TYPE:
            # constant-type column: every name has this type here
            B.setdefault((t, N_TYPE), _ConstReader(typ))
    return B


def name_tok_decode(data: bytes, raw_size: int) -> bytes:
    """Decode a name-tokenizer block back to the uncompressed RN payload
    (names each followed by their separator byte)."""
    r = ByteReader(data)
    ulen, nnames = struct.unpack("<II", r.read(8))
    use_arith = r.u8() & 1
    B = _tok_read_streams(r, bool(use_arith))

    def u32(t: int, typ: int) -> int:
        br = B[(t, typ)]
        v = struct.unpack("<I", bytes(br.read(4)))[0]
        return v

    # per-name token table for back-references:
    # tok[n][t] = (rendered_str, int_value_or_None, zero_pad_len_or_None)
    toks: list[list[tuple[str, int | None, int | None]]] = []
    names: list[str] = []
    for n in range(nnames):
        t0 = B[(0, N_TYPE)].u8()
        if t0 not in (N_DIFF, N_DUP):
            raise ValueError(f"name tokenizer: position-0 type {t0}")
        dist = u32(0, t0)
        p = n - dist
        if p < 0 or (dist and p >= n):
            raise ValueError("name tokenizer: bad back-reference distance")
        if t0 == N_DUP:
            names.append(names[p])
            toks.append(toks[p])
            continue
        row: list[tuple[str, int | None, int | None]] = [("", None, None)]
        parts: list[str] = []
        t = 0
        while True:
            t += 1
            typ = B[(t, N_TYPE)].u8()
            if typ == N_END:
                break
            if typ == N_NOP:
                row.append(("", None, None))
                continue
            if typ == N_ALPHA:
                br = B[(t, N_ALPHA)]
                start = br.i
                while br.b[br.i] != 0:
                    br.i += 1
                s = bytes(br.b[start : br.i]).decode("ascii")
                br.i += 1
                row.append((s, None, None))
            elif typ == N_CHAR:
                s = chr(B[(t, N_CHAR)].u8())
                row.append((s, None, None))
            elif typ == N_DIGITS:
                v = u32(t, N_DIGITS)
                row.append((str(v), v, None))
            elif typ == N_DIGITS0:
                v = u32(t, N_DIGITS0)
                z = B[(t, N_DZLEN)].u8()
                row.append((str(v).zfill(z), v, z))
            elif typ == N_DDELTA:
                d = B[(t, N_DDELTA)].u8()
                if t >= len(toks[p]):
                    raise ValueError("name tokenizer: delta past ref tokens")
                pv = toks[p][t][1]
                if pv is None:
                    raise ValueError("name tokenizer: delta from non-digit")
                v = pv + d
                row.append((str(v), v, None))
            elif typ == N_DDELTA0:
                d = B[(t, N_DDELTA0)].u8()
                if t >= len(toks[p]):
                    raise ValueError("name tokenizer: delta past ref tokens")
                prev = toks[p][t]
                if prev[1] is None or prev[2] is None:
                    raise ValueError("name tokenizer: delta0 from non-digit0")
                v = prev[1] + d
                row.append((str(v).zfill(prev[2]), v, prev[2]))
            elif typ == N_MATCH:
                if t >= len(toks[p]):
                    raise ValueError("name tokenizer: match past ref tokens")
                row.append(toks[p][t])
            else:
                raise ValueError(f"name tokenizer: token type {typ}")
            parts.append(row[-1][0])
        toks.append(row)
        names.append("".join(parts))
    for sep in (b"\x00", b"\n"):
        out = b"".join(nm.encode("ascii") + sep for nm in names)
        if len(out) == ulen:
            return out
    # last name may legally lack a trailing separator
    out = b"\x00".join(nm.encode("ascii") for nm in names)
    if len(out) == ulen:
        return out
    raise ValueError(
        f"name tokenizer: decoded {len(out)} bytes, header says {ulen}"
    )


# --- CRAM 3.1 fqzcomp quality codec (block method 7) ------------------------
# Implemented from the public hts-specs CRAMcodecs "fqzcomp qual codec"
# section: quality values are coded by the same adaptive range coder as
# block method 6, with a 16-bit context mixing the recent quality history
# (qtab-mapped, qshift/qbits window at qloc), the remaining record length
# (ptab at ploc), the count of quality changes so far (dtab at dloc) and
# the per-record parameter selector (at sloc).  Parameter sets carry
# optional symbol remapping (qmap) and the three context tables serialized
# with the spec's two-level run-length ReadArray format.  Reference parity:
# the reference consumes fqzcomp via htslib (datasources/BAM/
# CRAMDataSource.scala:7-15); here it is a from-scratch Python decoder
# validated against an independently written spec-side encoder in
# tests/test_cram_native.py.

_FQZ_VERS = 5

_FQZ_GFLAG_MULTI_PARAM = 1
_FQZ_GFLAG_HAVE_STAB = 2
_FQZ_GFLAG_DO_REV = 4

_FQZ_PFLAG_DEDUP = 2
_FQZ_PFLAG_FLEN = 4
_FQZ_PFLAG_DO_SEL = 8
_FQZ_PFLAG_HAVE_QMAP = 16
_FQZ_PFLAG_HAVE_PTAB = 32
_FQZ_PFLAG_HAVE_DTAB = 64
_FQZ_PFLAG_HAVE_QTAB = 128


def _fqz_read_array(r: ByteReader, size: int) -> list[int]:
    """The spec's two-level run-length table serialization: level 2 undoes
    duplicate-byte compression (a byte equal to its predecessor is followed
    by a count of extra copies), level 1 reads the resulting stream as
    255-capped run-length chunks for the successive values 0, 1, 2, ... —
    the tables are non-decreasing step functions, so only run lengths are
    stored."""
    chunks: list[int] = []
    z = 0
    last = -1
    while z < size:
        run = r.u8()
        chunks.append(run)
        z += run
        if run == last:
            copy = r.u8()
            chunks.extend([run] * copy)
            z += run * copy
        last = run
    a = [0] * size
    i = 0
    j = 0
    z = 0
    while i < size:
        run_len = 0
        while True:
            if z >= len(chunks):
                raise ValueError("fqzcomp: table run data underflow")
            part = chunks[z]
            z += 1
            run_len += part
            if part != 255:
                break
        for _ in range(run_len):
            if i < size:
                a[i] = j
                i += 1
        j += 1
    return a


class _FqzParam:
    """One fqzcomp parameter set (spec: fqz_param)."""

    __slots__ = (
        "context", "pflags", "max_sym", "qbits", "qshift", "qloc", "sloc",
        "ploc", "dloc", "do_dedup", "fixed_len", "do_sel", "do_qmap",
        "do_pos", "do_delta", "qmap", "qtab", "ptab", "dtab",
    )

    def __init__(self, r: ByteReader):
        self.context = r.u8() | (r.u8() << 8)
        self.pflags = r.u8()
        self.max_sym = r.u8()
        x = r.u8()
        self.qbits = x >> 4
        self.qshift = x & 15
        x = r.u8()
        self.qloc = x >> 4
        self.sloc = x & 15
        x = r.u8()
        self.ploc = x >> 4
        self.dloc = x & 15
        self.do_dedup = bool(self.pflags & _FQZ_PFLAG_DEDUP)
        self.fixed_len = bool(self.pflags & _FQZ_PFLAG_FLEN)
        self.do_sel = bool(self.pflags & _FQZ_PFLAG_DO_SEL)
        self.do_qmap = bool(self.pflags & _FQZ_PFLAG_HAVE_QMAP)
        self.do_pos = bool(self.pflags & _FQZ_PFLAG_HAVE_PTAB)
        self.do_delta = bool(self.pflags & _FQZ_PFLAG_HAVE_DTAB)
        if self.do_qmap:
            self.qmap = [r.u8() for _ in range(self.max_sym)]
        else:
            self.qmap = None
        if self.pflags & _FQZ_PFLAG_HAVE_QTAB:
            self.qtab = _fqz_read_array(r, 256)
        else:
            self.qtab = list(range(256))
        self.ptab = _fqz_read_array(r, 1024) if self.do_pos else [0] * 1024
        self.dtab = _fqz_read_array(r, 256) if self.do_delta else [0] * 256


def fqz_decode(data: bytes, raw_size: int) -> bytes:
    """CRAM 3.1 block method 7 (fqzcomp): decode ``raw_size`` quality
    bytes.  Record lengths travel inside the stream (4 range-coded bytes,
    little-endian), so the decoder needs no slice metadata."""
    r = ByteReader(data)
    vers = r.u8()
    if vers != _FQZ_VERS:
        raise ValueError(f"fqzcomp: version {vers}, expected {_FQZ_VERS}")
    gflags = r.u8()
    nparam = r.u8() if gflags & _FQZ_GFLAG_MULTI_PARAM else 1
    max_sel = nparam - 1 if nparam > 1 else 0
    if gflags & _FQZ_GFLAG_HAVE_STAB:
        max_sel = r.u8()
        stab = _fqz_read_array(r, 256)
    else:
        stab = [min(i, nparam - 1) for i in range(256)]
    params = [_FqzParam(r) for _ in range(nparam)]
    max_sym = max(p.max_sym for p in params)

    rc = _RangeDecoder(r)
    nsym = (max_sym + 1) if max_sym else 256
    qual_models: dict[int, _AdaptiveModel] = {}
    len_models = [_AdaptiveModel(256) for _ in range(4)]
    rev_model = _AdaptiveModel(2)
    dup_model = _AdaptiveModel(2)
    sel_model = _AdaptiveModel(max_sel + 1) if max_sel else None

    out = bytearray(raw_size)
    rev_spans: list[tuple[int, int]] = []
    # Record-length latch: htscodecs (the encoder of real-world 3.1 CRAMs,
    # fqzcomp_qual.c fqz_state.first_len/last_len) keeps ONE global
    # first_len flag and ONE global last_len shared by every parameter set:
    # a length is decoded iff `!pm->fixed_len || state.first_len`, and every
    # decode updates last_len.  The spec pseudocode can be read as latching
    # per parameter set, but the two only diverge on multi-param streams
    # that mix fixed-length params — and such streams in the wild are
    # htscodecs-encoded, so the global latch is the semantics that decodes
    # them (pinned by test_fqz_multi_param_fixed_len_global_latch).
    first_len = True
    last_len = 0
    i = 0
    while i < raw_size:
        sel = sel_model.decode(rc) if sel_model is not None else 0
        x = stab[sel] if sel < len(stab) else nparam - 1
        pm = params[x]
        if pm.fixed_len and not first_len:
            rec_len = last_len
        else:
            rec_len = (
                len_models[0].decode(rc)
                | (len_models[1].decode(rc) << 8)
                | (len_models[2].decode(rc) << 16)
                | (len_models[3].decode(rc) << 24)
            )
            first_len = False
            last_len = rec_len
        if rec_len <= 0 or i + rec_len > raw_size:
            raise ValueError(
                f"fqzcomp: record length {rec_len} overruns block "
                f"({i}/{raw_size})"
            )
        if gflags & _FQZ_GFLAG_DO_REV:
            if rev_model.decode(rc):
                rev_spans.append((i, rec_len))
        if pm.do_dedup and dup_model.decode(rc):
            if i < rec_len:
                raise ValueError("fqzcomp: dup flag on the first record")
            out[i : i + rec_len] = out[i - rec_len : i]
            i += rec_len
            continue
        ctx = pm.context
        qctx = 0
        delta = 0
        prevq = 0
        p = rec_len
        qbits_mask = (1 << pm.qbits) - 1
        for _ in range(rec_len):
            m = qual_models.get(ctx)
            if m is None:
                m = qual_models[ctx] = _AdaptiveModel(nsym)
            q = m.decode(rc)
            out[i] = pm.qmap[q] if pm.qmap is not None and q < len(pm.qmap) else q
            i += 1
            qctx = ((qctx << pm.qshift) + pm.qtab[q if q < 256 else 255]) & 0xFFFFFFFF
            ctx = ((qctx & qbits_mask) << pm.qloc)
            if pm.do_pos:
                ctx += pm.ptab[p if p < 1024 else 1023] << pm.ploc
            if pm.do_delta:
                ctx += pm.dtab[delta if delta < 256 else 255] << pm.dloc
                delta += 1 if prevq != q else 0
                prevq = q
            if pm.do_sel:
                ctx += sel << pm.sloc
            p -= 1
            ctx &= 0xFFFF
    for start, ln in rev_spans:
        out[start : start + ln] = out[start : start + ln][::-1]
    return bytes(out)


def _decompress(method: int, data: bytes, raw_size: int) -> bytes:
    if method == 0:
        return data
    if method == 1:
        # gzip member with a spec-declared raw size: libdeflate one-shot
        # when the system has it, zlib otherwise (sources/_inflate)
        from sequila_spark.sources._inflate import gzip_decompress

        return gzip_decompress(data, raw_size)
    if method == 2:
        return bz2.decompress(data)
    if method == 3:
        return lzma.decompress(data)
    if method == 4:
        return rans_decode(data)
    if method == 5:
        return rans_nx16_decode(data, raw_size)
    if method == 6:
        return arith_decode(data, raw_size)
    if method == 7:
        return fqz_decode(data, raw_size)
    if method == 8:
        return name_tok_decode(data, raw_size)
    raise NotImplementedError(f"CRAM block compression: method {method}")


# --- bit reader for core-stream codecs --------------------------------------


class BitReader:
    __slots__ = ("b", "pos", "bit")

    def __init__(self, b: bytes):
        self.b = b
        self.pos = 0
        self.bit = 0

    def take(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.b[self.pos]
            v = (v << 1) | ((byte >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v


# --- encodings --------------------------------------------------------------


class Encoding:
    """One parsed data-series/tag encoding.  decode_int / decode_bytes pull
    from the core bit stream and the external byte streams as the codec
    dictates."""

    def __init__(self, codec: int, params: bytes):
        self.codec = codec
        p = ByteReader(params)
        if codec == 0:  # NULL
            pass
        elif codec == 1:  # EXTERNAL
            self.content_id = p.itf8()
        elif codec == 3:  # HUFFMAN (canonical; 0-bit single symbol = const)
            n = p.itf8()
            self.alphabet = [p.itf8() for _ in range(n)]
            n2 = p.itf8()
            self.bitlens = [p.itf8() for _ in range(n2)]
            if any(self.bitlens):
                # canonical code assignment (spec 13.7)
                pairs = sorted(zip(self.bitlens, self.alphabet))
                codes = []
                code = 0
                prev_len = pairs[0][0]
                for ln, symv in pairs:
                    code <<= ln - prev_len
                    prev_len = ln
                    codes.append((ln, code, symv))
                    code += 1
                self.table = codes
        elif codec == 4:  # BYTE_ARRAY_LEN
            self.len_enc = Encoding(p.itf8(), p.read(p.itf8()))
            self.val_enc = Encoding(p.itf8(), p.read(p.itf8()))
        elif codec == 5:  # BYTE_ARRAY_STOP
            self.stop = p.u8()
            self.content_id = p.itf8()
        elif codec == 6:  # BETA
            self.offset = p.itf8()
            self.nbits = p.itf8()
        elif codec == 2:  # GOLOMB (spec 13.5: unary quotient + trunc binary)
            self.offset = p.itf8()
            self.m = p.itf8()
            if self.m <= 0:
                raise ValueError(f"GOLOMB m={self.m}")
            self.ceil_bits = self.m.bit_length()  # floor(log2 m) + 1
        elif codec == 7:  # GAMMA (Elias gamma, spec 13.8)
            self.offset = p.itf8()
        elif codec == 8:  # SUBEXP (subexponential, spec 13.9)
            self.offset = p.itf8()
            self.k = p.itf8()
        elif codec == 9:  # GOLOMB_RICE (m = 2^log2m, spec 13.10)
            self.offset = p.itf8()
            self.log2m = p.itf8()
        else:
            raise NotImplementedError(f"CRAM encoding codec {codec}")

    def decode_int(self, core: BitReader, ext: dict[int, ByteReader]) -> int:
        c = self.codec
        if c == 1:
            return ext[self.content_id].itf8()
        if c == 3:
            if not any(self.bitlens):
                return self.alphabet[0]
            ln = 0
            code = 0
            idx = 0
            while True:
                code = (code << 1) | core.take(1)
                ln += 1
                while idx < len(self.table) and self.table[idx][0] == ln:
                    if self.table[idx][1] == code:
                        return self.table[idx][2]
                    idx += 1
                if ln > 31:
                    raise ValueError("bad huffman stream")
        if c == 6:
            return core.take(self.nbits) - self.offset
        if c == 2:  # GOLOMB: 1*-unary quotient, truncated-binary remainder
            q = 0
            while core.take(1):
                q += 1
            # truncated binary: read ceil_bits-1; extend by one bit iff the
            # short code falls in the high range (htsjdk GolombIntegerCodec)
            cutoff = (1 << self.ceil_bits) - self.m
            r = core.take(self.ceil_bits - 1) if self.ceil_bits > 1 else 0
            if r >= cutoff:
                r = (r << 1) | core.take(1)
                r -= cutoff
            return q * self.m + r - self.offset
        if c == 7:  # GAMMA: count 0s to the leading 1, then mantissa
            length = 1
            while not core.take(1):
                length += 1
            v = (1 << (length - 1)) | core.take(length - 1)
            return v - self.offset
        if c == 8:  # SUBEXP: 1*-unary u, then k or u+k-1 mantissa bits
            u = 0
            while core.take(1):
                u += 1
            if u == 0:
                n = core.take(self.k)
            else:
                b = u + self.k - 1
                n = (1 << b) | core.take(b)
            return n - self.offset
        if c == 9:  # GOLOMB_RICE: unary quotient, log2m remainder bits
            q = 0
            while core.take(1):
                q += 1
            return (q << self.log2m) + core.take(self.log2m) - self.offset
        raise NotImplementedError(f"int decode for codec {c}")

    def decode_byte(self, core: BitReader, ext: dict[int, ByteReader]) -> int:
        if self.codec == 1:
            return ext[self.content_id].u8()
        return self.decode_int(core, ext)

    def decode_bytes(self, core: BitReader, ext: dict[int, ByteReader]) -> bytes:
        c = self.codec
        if c == 5:
            st = ext[self.content_id]
            b = st.b
            j = b.index(bytes([self.stop]), st.i)
            out = b[st.i : j]
            st.i = j + 1
            return out
        if c == 4:
            n = self.len_enc.decode_int(core, ext)
            if self.val_enc.codec == 1:
                return ext[self.val_enc.content_id].read(n)
            return bytes(self.val_enc.decode_byte(core, ext) for _ in range(n))
        raise NotImplementedError(f"byte-array decode for codec {c}")

    # --- per-slice specialized zero-arg readers (hot path) ------------------
    # The scalar decode_* methods above stay the semantic reference; these
    # factories bind the (core, ext) streams ONCE per slice and collapse the
    # dominant real-world cases — EXTERNAL values and single-symbol
    # ("constant") Huffman — to a bound method / constant closure, removing
    # two dict lookups and a dispatch per decoded symbol.  Exercised by the
    # byte-exact CRAM-vs-BAM parity suite (test_cram_native.py).

    def _const(self):
        return (
            self.codec == 3 and self.alphabet and not any(self.bitlens)
        )

    def int_reader(self, core: BitReader, ext: dict[int, "ByteReader"]):
        # a series may be DEFINED in the compression header while its
        # content block is absent from this slice (blocks ship only when
        # used) — fall back to the generic path, which raises only if the
        # series is actually read, exactly like the scalar decoder
        if self.codec == 1 and self.content_id in ext:
            return ext[self.content_id].itf8
        if self._const():
            v = self.alphabet[0]
            return lambda: v
        return lambda: self.decode_int(core, ext)

    def byte_reader(self, core: BitReader, ext: dict[int, "ByteReader"]):
        if self.codec == 1 and self.content_id in ext:
            return ext[self.content_id].u8
        if self._const():
            v = self.alphabet[0]
            return lambda: v
        return lambda: self.decode_byte(core, ext)

    def bytes_reader(self, core: BitReader, ext: dict[int, "ByteReader"]):
        if self.codec == 5 and self.content_id in ext:
            st = ext[self.content_id]
            stop = bytes([self.stop])

            def rd_stop():
                b = st.b
                j = b.index(stop, st.i)
                out = b[st.i : j]
                st.i = j + 1
                return out

            return rd_stop
        if (
            self.codec == 4
            and self.val_enc.codec == 1
            and self.val_enc.content_id in ext
        ):
            ln = self.len_enc.int_reader(core, ext)
            vst = ext[self.val_enc.content_id]

            def rd_len():
                return vst.read(ln())

            return rd_len
        return lambda: self.decode_bytes(core, ext)


# --- compression header -----------------------------------------------------

_DS_BYTE = {"FC", "BA", "BS", "QS"}  # byte-typed data series


class _SeriesMap(dict):
    """Data-series map whose misses raise NotImplementedError (not
    KeyError): a record needing a series the writer did not encode means
    the file is outside this decoder's supported shape, and read_bam uses
    that signal to fall back to pysam."""

    def __missing__(self, key):
        raise NotImplementedError(
            f"record requires data series {key!r} absent from the "
            "compression header — unsupported CRAM writer configuration"
        )


class CompressionHeader:
    def __init__(self, raw: bytes):
        r = ByteReader(raw)
        # preservation map
        r.itf8()
        self.rn_preserved = True
        self.ap_delta = True
        self.rr = True
        self.sub_matrix = b"\x1b" * 5
        self.tag_lines: list[list[tuple[str, str]]] = [[]]
        for _ in range(r.itf8()):
            key = r.read(2).decode()
            if key == "RN":
                self.rn_preserved = bool(r.u8())
            elif key == "AP":
                self.ap_delta = bool(r.u8())
            elif key == "RR":
                self.rr = bool(r.u8())
            elif key == "SM":
                self.sub_matrix = r.read(5)
            elif key == "TD":
                blob = r.read(r.itf8())
                self.tag_lines = []
                for line in blob.split(b"\x00")[:-1]:
                    tags = []
                    for k in range(0, len(line), 3):
                        tags.append(
                            (line[k : k + 2].decode(), chr(line[k + 2]))
                        )
                    self.tag_lines.append(tags)
                if not self.tag_lines:
                    self.tag_lines = [[]]
            else:
                raise ValueError(f"unknown preservation key {key}")
        # data series encodings
        r.itf8()
        self.ds: dict[str, Encoding] = _SeriesMap()
        for _ in range(r.itf8()):
            key = r.read(2).decode()
            self.ds[key] = Encoding(r.itf8(), r.read(r.itf8()))
        # tag encodings, keyed by (tag, type)
        r.itf8()
        self.tag_enc: dict[tuple[str, str], Encoding] = {}
        for _ in range(r.itf8()):
            k = r.itf8()
            name = chr((k >> 16) & 0xFF) + chr((k >> 8) & 0xFF)
            typ = chr(k & 0xFF)
            self.tag_enc[(name, typ)] = Encoding(r.itf8(), r.read(r.itf8()))
        # substitution decode table: per ref base, code -> substituted base
        self.sub_table: dict[str, str] = {}
        bases = "ACGTN"
        for bi, refb in enumerate(bases):
            others = [b for b in bases if b != refb]
            byte = self.sub_matrix[bi]
            by_code = [""] * 4
            for oi, ob in enumerate(others):
                code = (byte >> (6 - 2 * oi)) & 3
                by_code[code] = ob
            self.sub_table[refb] = "".join(by_code)
        # byte-valued mirror for the hot X-feature branch (direct bytearray
        # store, no per-substitution ord()/str indexing)
        self.sub_table_b = {k: v.encode() for k, v in self.sub_table.items()}


# --- container / slice scan -------------------------------------------------


def _read_container_header(r: ByteReader) -> dict:
    h = {}
    h["length"] = r.int32()
    h["ref_id"] = r.itf8()
    h["start"] = r.itf8()
    h["span"] = r.itf8()
    h["n_records"] = r.itf8()
    h["counter"] = r.ltf8()
    h["n_bases"] = r.ltf8()
    h["n_blocks"] = r.itf8()
    h["landmarks"] = [r.itf8() for _ in range(r.itf8())]
    r.read(4)  # crc32
    h["data_offset"] = r.i
    return h


def _read_block(r: ByteReader) -> tuple[int, int, bytes]:
    """-> (content_type, content_id, uncompressed payload)."""
    method = r.u8()
    ctype = r.u8()
    cid = r.itf8()
    csize = r.itf8()
    rsize = r.itf8()
    payload = _decompress(method, r.read(csize), rsize)
    r.read(4)  # crc
    return ctype, cid, payload


class _LazyExt(dict):
    """content-id -> ByteReader map whose external blocks decompress on
    FIRST access: a column-pruned decode never touches the streams that
    feed pruned series (QS quals, RN qnames, tag blocks), so their
    rANS/gzip payloads are never even decompressed — on real files those
    are roughly half the container bytes (measured 8.9 ms of 14.2 ms
    pruned decode on the NA12878 slice).  Unmaterialized blocks hold raw
    (method, payload, rsize); :meth:`remaining` reports a stream's
    remaining length without materializing it (the C feature walk needs
    only QS's SIZE when quals are pruned).  ``items()`` intentionally
    shows only materialized readers — the columnar bail/restore resets
    exactly those."""

    __slots__ = ("_raw",)

    def __init__(self):
        super().__init__()
        self._raw: dict[int, tuple[int, bytes, int]] = {}

    def add_raw(self, cid: int, method: int, payload: bytes, rsize: int) -> None:
        self.pop(cid, None)
        self._raw[cid] = (method, payload, rsize)

    def __missing__(self, cid: int) -> ByteReader:
        method, payload, rsize = self._raw[cid]  # KeyError when absent
        br = ByteReader(_decompress(method, payload, rsize))
        dict.__setitem__(self, cid, br)
        return br

    def __contains__(self, cid) -> bool:
        return dict.__contains__(self, cid) or cid in self._raw

    def get(self, cid, default=None):
        return self[cid] if cid in self else default

    def remaining(self, cid) -> int:
        if dict.__contains__(self, cid):
            st = dict.__getitem__(self, cid)
            return len(st.b) - st.i
        if cid in self._raw:
            return self._raw[cid][2]
        return 0


def read_file_header(data: bytes) -> tuple[list[str], str, int]:
    """-> (reference names from @SQ lines, SAM header text, offset of the
    first data container)."""
    if data[:4] != CRAM_MAGIC:
        raise ValueError("not a CRAM file (bad magic)")
    major, minor = data[4], data[5]
    if (major, minor) not in ((3, 0), (3, 1)):
        # v2 uses different container framing (no CRC32); v4 is a draft.
        # 3.1 shares the 3.0 container layout and is accepted here — all
        # of its block codecs (rANS Nx16, arith, fqzcomp, name tokenizer)
        # decode natively; unknown future methods raise per block.
        raise NotImplementedError(f"CRAM version {major}.{minor}")
    r = ByteReader(data, 26)
    h = _read_container_header(r)
    ctype, _cid, payload = _read_block(r)
    if ctype != 0:
        raise ValueError("first container does not hold the file header")
    p = ByteReader(payload)
    text = p.read(p.int32()).decode("ascii", "replace")
    names = []
    for line in text.splitlines():
        if line.startswith("@SQ"):
            for f in line.split("\t"):
                if f.startswith("SN:"):
                    names.append(f[3:])
    return names, text, h["data_offset"] + h["length"]


def scan_containers(data: bytes) -> list[dict]:
    """Container headers only (no block decompression) — the planning step:
    one decode task per container."""
    _names, _text, off = read_file_header(data)
    out = []
    r = ByteReader(data, off)
    while r.i < len(data):
        h = _read_container_header(r)
        if h["ref_id"] == -1 and h["start"] == 4_542_278 and h["n_blocks"] == 1:
            break  # EOF container (spec magic start value)
        h["offset"] = h["data_offset"] - 0  # absolute offset of first block
        out.append(h)
        r.i = h["data_offset"] + h["length"]
    return out


def read_file_header_file(f: BinaryIO) -> tuple[list[str], str, int]:
    """read_file_header against an open file, reading only as many bytes as
    the header container needs (grown geometrically until the FIRST
    container is fully contained — a short raw block would otherwise parse
    as silently truncated header text)."""
    size = 1 << 20
    while True:
        f.seek(0)
        data = f.read(size)
        whole_file = len(data) < size
        try:
            names, text, off = read_file_header(data)
            if off <= len(data):  # first container fully contained: trust it
                return names, text, off
        except NotImplementedError:
            raise
        except Exception:  # varint/struct/decompress errors on a short read
            pass
        if whole_file:
            raise ValueError("truncated CRAM file header")
        size *= 4


def scan_containers_file(path: str) -> tuple[list[str], str, list[dict]]:
    """Incremental planning scan over a CRAM file: reads the SAM header
    container plus one bounded chunk per container HEADER — never the data
    blocks — so planning I/O is O(n_containers), not O(file size).

    -> (reference names, SAM header text, container headers with
    ``abs_offset`` / ``abs_data_offset`` absolute file positions)."""
    out = []
    with open(path, "rb") as f:
        names, text, pos = read_file_header_file(f)
        f.seek(0, 2)
        fsize = f.tell()
        while pos < fsize:
            f.seek(pos)
            chunk = f.read(65536)  # container header is far smaller
            r = ByteReader(chunk)
            h = _read_container_header(r)
            if h["ref_id"] == -1 and h["start"] == 4_542_278 and h["n_blocks"] == 1:
                break  # EOF container
            h["abs_offset"] = pos
            h["abs_data_offset"] = pos + r.i
            out.append(h)
            pos = h["abs_data_offset"] + h["length"]
    return names, text, out


def validate_container_file(path, h: dict) -> None:
    """Driver-side support check for one container, decompressing ONLY the
    compression-header and slice-header blocks — data block payloads are
    seek()ed past by their compressed size, never read, so validation I/O
    per container is a few KB regardless of container size.  Raises
    NotImplementedError for compression methods, codecs or slice shapes
    (embedded reference) outside the implemented set — the signal read_bam
    uses to fall back to pysam BEFORE any executor work is scheduled.

    ``path`` may be a file path or an open binary file (read_cram_native
    reuses one handle across all containers)."""
    f = open(path, "rb") if isinstance(path, str) else path
    try:
        pos = h["abs_data_offset"]
        for _ in range(h["n_blocks"]):
            f.seek(pos)
            r = ByteReader(f.read(32))  # block header: <= 17 bytes
            method = r.u8()
            ctype = r.u8()
            r.itf8()  # content id
            csize = r.itf8()
            rsize = r.itf8()
            payload_at = pos + r.i
            if method > 8:
                raise NotImplementedError(
                    f"CRAM block compression: method {method}"
                )
            if ctype == 1:  # compression header: parse fully (codec check)
                f.seek(payload_at)
                CompressionHeader(_decompress(method, f.read(csize), rsize))
            elif ctype == 2:  # slice header: embedded-reference check
                f.seek(payload_at)
                sh = ByteReader(_decompress(method, f.read(csize), rsize))
                for _ in range(4):
                    sh.itf8()  # ref, start, span, n_records
                sh.ltf8()  # record counter
                sh.itf8()  # n_blocks
                [sh.itf8() for _ in range(sh.itf8())]  # content ids
                if sh.itf8() != -1:
                    raise NotImplementedError(
                        "embedded-reference CRAM slices"
                    )
            pos = payload_at + csize + 4  # payload + crc32
    finally:
        if isinstance(path, str):
            f.close()


# --- record decoding --------------------------------------------------------

def _decode_tag_value(typ: str, raw: bytes) -> str:
    """Canonical string rendering — delegates to the SHARED renderer
    bamcodec.decode_tag_bytes (CRAM stores tag values in BAM wire
    encoding, hts-specs CRAMv3 §10.6), so the same file read via the CRAM
    and BAM paths yields byte-identical tags values, 'B' arrays included."""
    from sequila_spark.sources.bamcodec import decode_tag_bytes

    return decode_tag_bytes(typ, raw)


def _tag_render_fn(typ: str, raw_r):
    """Fuse one tag's raw reader with a TYPE-SPECIALIZED renderer — after
    the C feature walk the record loop's remaining hot path is tag
    rendering, and decode_tag_bytes' per-value type dispatch (two function
    calls + an if-chain per tag per record) is most of it.  Binds the
    struct unpacker once per slice; semantics identical to
    _decode_tag_value (decode_tag_bytes stays the pinned reference —
    test_tag_render_fn_matches_shared_renderer pins every type)."""
    if typ == "A":
        return lambda: chr(raw_r()[0])
    from sequila_spark.sources.bamcodec import _TAG_SCALAR_FMT

    if typ in _TAG_SCALAR_FMT:
        u = struct.Struct(_TAG_SCALAR_FMT[typ]).unpack_from
        return lambda: str(u(raw_r())[0])
    if typ == "f":
        u = struct.Struct("<f").unpack_from
        return lambda: repr(u(raw_r())[0])
    if typ in ("Z", "H"):
        def _z():
            return raw_r().split(b"\x00", 1)[0].decode("ascii", "replace")

        return _z
    from sequila_spark.sources.bamcodec import decode_tag_bytes

    return lambda: decode_tag_bytes(typ, raw_r())


def _tag_render_series(typ: str, vals: list[bytes]) -> list[str]:
    """Render a whole pre-split tag value series in one comprehension —
    the per-record fused renderer (_tag_render_fn) pays a closure frame +
    reader call per tag per record; when _bulk_bytes_series already holds
    the raw values, rendering them all up front turns the record loop's
    tag step into a list-iterator next().  Per-type logic is IDENTICAL to
    _tag_render_fn / decode_tag_bytes (pinned by
    test_tag_render_series_matches_shared_renderer)."""
    if typ == "A":
        return [chr(v[0]) for v in vals]
    from sequila_spark.sources.bamcodec import _TAG_SCALAR_FMT

    if typ in _TAG_SCALAR_FMT:
        u = struct.Struct(_TAG_SCALAR_FMT[typ]).unpack_from
        return [str(u(v)[0]) for v in vals]
    if typ == "f":
        u = struct.Struct("<f").unpack_from
        return [repr(u(v)[0]) for v in vals]
    if typ in ("Z", "H"):
        return [v.split(b"\x00", 1)[0].decode("ascii", "replace") for v in vals]
    from sequila_spark.sources.bamcodec import decode_tag_bytes

    return [decode_tag_bytes(typ, v) for v in vals]


def parse_rg_ids(header_text: str) -> list[str]:
    """Read-group IDs in @RG header-line order — the RG data series indexes
    this list (htslib materializes tags['RG'] from it at decode the same
    way; reference surfaces RG via htslib, CRAMDataSource.scala:7-15)."""
    out = []
    for line in header_text.splitlines():
        if line.startswith("@RG"):
            for f in line.split("\t"):
                if f.startswith("ID:"):
                    out.append(f[3:])
                    break
    return out


def decode_container(
    data: bytes,
    header: dict,
    ref_names: list[str],
    ref_seqs: dict[str, str] | None,
    synthesize_nm: bool = False,
    rg_names: list[str] | None = None,
) -> Iterator[tuple]:
    """Decode every record of one container (all its slices).

    ``ref_seqs`` maps reference NAME -> full sequence string (1-based via
    index+1); required when the container holds reference-based reads
    (preservation RR=true) — pass None only for unmapped/RR=false data.

    ``rg_names`` is the @RG ID list from the SAM header (parse_rg_ids);
    when given, a record's RG data-series index materializes as
    ``tags['RG']`` — matching htslib's decode, which reconstructs the RG
    tag from the series rather than the tag dictionary.
    """
    for ch, core, ext, s_ref, s_start, s_nrec in _iter_container_slices(
        data, header
    ):
        cols = _decode_slice_columns(
            ch, core, ext, s_ref, s_start, s_nrec, ref_names, ref_seqs,
            synthesize_nm, rg_names,
        )
        if cols is not None:
            yield from zip(*(cols[c] for c in _REC_COLS))
        else:
            yield from _decode_slice_records(
                ch, core, ext, s_ref, s_start, s_nrec, ref_names, ref_seqs,
                synthesize_nm, rg_names,
            )


def decode_container_columns(
    data: bytes,
    header: dict,
    ref_names: list[str],
    ref_seqs: dict[str, str] | None,
    synthesize_nm: bool = False,
    rg_names: list[str] | None = None,
    columns: set | None = None,
):
    """Columnar analog of :func:`decode_container`: yields one
    ``{col: list}`` dict per slice (keys :data:`_REC_COLS`) — the shape
    an Arrow RecordBatch builder consumes without a row round-trip.
    Slices whose layout defeats the columnar preconditions are decoded by
    the pinned per-record path and transposed.

    ``columns`` prunes the expensive per-record rendering at the decode
    (see _decode_slice_columns); unrequested keys come back all-None
    (the fallback path decodes fully — a correct superset)."""
    for ch, core, ext, s_ref, s_start, s_nrec in _iter_container_slices(
        data, header
    ):
        cols = _decode_slice_columns(
            ch, core, ext, s_ref, s_start, s_nrec, ref_names, ref_seqs,
            synthesize_nm, rg_names, columns=columns,
        )
        if cols is None:
            recs = list(
                _decode_slice_records(
                    ch, core, ext, s_ref, s_start, s_nrec, ref_names,
                    ref_seqs, synthesize_nm, rg_names,
                )
            )
            cols = {
                c: [r[k] for r in recs] for k, c in enumerate(_REC_COLS)
            }
        yield cols


def _iter_container_slices(data: bytes, header: dict):
    """Shared container walk: compression header + per-slice (ch, core,
    ext, s_ref, s_start, s_nrec)."""
    r = ByteReader(data, header["data_offset"])
    ctype, _cid, payload = _read_block(r)
    if ctype != 1:
        raise ValueError("expected compression header block")
    ch = CompressionHeader(payload)
    end = header["data_offset"] + header["length"]
    while r.i < end:
        ctype, _cid, payload = _read_block(r)
        if ctype != 2:
            continue  # skip stray blocks between slices
        sh = ByteReader(payload)
        s_ref = sh.itf8()
        s_start = sh.itf8()
        _s_span = sh.itf8()
        s_nrec = sh.itf8()
        sh.ltf8()  # counter
        s_nblocks = sh.itf8()
        [sh.itf8() for _ in range(sh.itf8())]  # content ids
        emb_ref = sh.itf8()
        if emb_ref != -1:
            raise NotImplementedError("embedded-reference CRAM slices")
        # data blocks of this slice — external payloads are kept RAW and
        # decompress lazily on first series access (_LazyExt), so a
        # pruned decode skips the qual/qname/tag block decompression
        core = BitReader(b"")
        ext = _LazyExt()
        for _ in range(s_nblocks):
            method = r.u8()
            btype = r.u8()
            bid = r.itf8()
            csize = r.itf8()
            rsize = r.itf8()
            bpayload = r.read(csize)
            r.read(4)  # crc
            if btype == 5:
                core = BitReader(_decompress(method, bpayload, rsize))
            elif btype == 4:
                ext.add_raw(bid, method, bpayload, rsize)
        yield ch, core, ext, s_ref, s_start, s_nrec


def _enc_content_ids(e: "Encoding") -> list[int]:
    """External content ids an encoding reads from (recursing into
    BYTE_ARRAY_LEN's sub-encodings)."""
    if e.codec in (1, 5):
        return [e.content_id]
    if e.codec == 4:
        return _enc_content_ids(e.len_enc) + _enc_content_ids(e.val_enc)
    return []


#: data series consumed ONLY by the feature walk / seq-qual extraction —
#: the set whose streams may be bulk-decoded and (when their content
#: streams are disjoint from every other series') deferred past the
#: record-field loop for the C walk kernel.
_WALK_SERIES = (
    "FN", "FC", "FP", "BS", "BA", "DL", "RS", "PD", "HC",
    "IN", "SC", "BB", "QQ", "QS",
)


def _reads_core(e: "Encoding") -> bool:
    """Whether decoding this series consumes core bit-stream bits (which
    would make its read order relative to other core readers observable)."""
    c = e.codec
    if c in (0, 1, 5):
        return False
    if c == 3:
        return not e._const()
    if c == 4:
        return _reads_core(e.len_enc) or _reads_core(e.val_enc)
    return True


def _bulk_feature_series(ch, ds, ext, rdr) -> dict:
    """Bulk pre-decode of the per-FEATURE series: when a series is
    EXTERNAL (or BYTE_ARRAY_STOP) with a content stream no other encoding
    shares, its whole slice block IS the series' value sequence, so it
    decodes in one pass (C itf8 kernel for int series, a single split()
    for stop-delimited byte arrays) and the per-feature reads become
    C-level list-iterator next() calls — the feature walk in _reconstruct
    was dominated by these reader invocations.  Non-external /
    shared-stream / kernel-less layouts keep the per-value readers
    (identical output; parity pinned by the byte-exact CRAM-vs-BAM test).

    Returns the bulk arrays for the C walk kernel:
    ``{"ints": {name: int64 array}, "bytes": {name: uint8 array},
    "arrs": {name: (concat uint8, int64 offsets)}, "id_use": {...}}``.
    QS is never iterator-replaced (its stream position interleaves with
    the per-record quality reads), only counted via ``id_use``."""
    from sequila_spark.sources import _ckern as CK

    out: dict = {"ints": {}, "bytes": {}, "arrs": {}, "id_use": {}}
    id_use: dict[int, int] = {}
    for e in list(ds.values()) + list(ch.tag_enc.values()):
        for cid in _enc_content_ids(e):
            id_use[cid] = id_use.get(cid, 0) + 1
    out["id_use"] = id_use
    if not CK.available():
        return out
    import numpy as np

    def exclusive(name: str, codec: int):
        e = ds.get(name)
        if (
            e is not None
            and e.codec == codec
            and id_use.get(e.content_id) == 1
            and e.content_id in ext
        ):
            return e, ext[e.content_id]
        return None, None

    for name in ("FC", "BS", "BA"):
        _e, st = exclusive(name, 1)
        if st is None:
            continue
        raw = bytes(st.b[st.i :])
        st.i = len(st.b)
        out["bytes"][name] = np.frombuffer(raw, dtype=np.uint8)
        rdr[name] = _series_reader(raw)

    for name in ("FN", "FP", "DL", "RS", "PD", "HC"):
        _e, st = exclusive(name, 1)
        if st is None:
            continue
        raw = bytes(st.b[st.i :])
        try:
            arr = CK.itf8_scan_all(raw)
        except ValueError:
            continue  # truncated stream: keep the per-value reader
        if arr is None:
            continue
        st.i = len(st.b)
        out["ints"][name] = arr
        rdr[name] = _series_reader(arr.tolist())

    for name in ("SC", "IN", "BB"):
        e, st = exclusive(name, 5)
        if st is None:
            continue
        raw = st.b[st.i :]
        parts = raw.split(bytes([e.stop]))
        vals = parts[:-1]  # trailing piece = unread tail past the last stop
        st.i = len(st.b)
        lens = np.fromiter((len(v) for v in vals), dtype=np.int64,
                           count=len(vals))
        offs = np.zeros(len(vals) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        out["arrs"][name] = (
            np.frombuffer(b"".join(vals), dtype=np.uint8), offs
        )
        rdr[name] = _series_reader(vals)
    return out


#: kill switch for the whole-series record-field/tag pre-decode below —
#: tests flip it to pin bulk == per-value paths record-identically.
_BULK_RECORD_SERIES = True


def _series_reader(vals):
    """Zero-arg reader over a pre-decoded value series.  Exhaustion raises
    ValueError — the same error type the per-value readers raise on a
    truncated stream — instead of StopIteration, which PEP 479 would
    surface as ``RuntimeError('generator raised StopIteration')`` from
    the record-decode generator (an error-contract drift the fuzz tests
    pin against)."""
    it = iter(vals)

    def read():
        try:
            return next(it)
        except StopIteration:
            raise ValueError(
                "CRAM: pre-decoded series exhausted (truncated stream)"
            ) from None

    return read


def _bulk_int_array(e, ext, id_use, n: int | None = None):
    """Whole-series int array for an EXTERNAL itf8 series whose content
    stream no other encoding shares (C itf8 kernel scans the remaining
    block once, consuming it), or a constant Huffman series broadcast to
    ``n``.  Returns an int64 ndarray or ``None`` when the layout (shared
    stream, other codec, missing block, truncated stream, no C kernel)
    requires the per-value reader."""
    if not _BULK_RECORD_SERIES or e is None:
        return None
    import numpy as np

    if n is not None and e._const():
        return np.full(n, e.alphabet[0], dtype=np.int64)
    if e.codec != 1:
        return None
    if id_use.get(e.content_id) != 1 or e.content_id not in ext:
        return None
    from sequila_spark.sources import _ckern as CK

    if not CK.available():
        return None
    st = ext[e.content_id]
    raw = bytes(st.b[st.i :])
    try:
        arr = CK.itf8_scan_all(raw)
    except ValueError:
        return None  # truncated stream: keep the per-value reader
    if arr is None:
        return None
    st.i = len(st.b)
    return arr


def _bulk_int_reader(e, ext, id_use):
    """One-pass decode of an EXTERNAL itf8 int series (record fields: BF,
    CF, RL, AP, TL, MQ, ...) whose content stream no other encoding
    shares: the whole remaining block IS the value sequence, so the C
    itf8 kernel scans it once and the per-record reads become list-
    iterator ``next()`` calls — after the C feature walk and the fused
    tag renderers, these per-record ``itf8()`` calls were the largest
    remaining slice-decode cost (~33k calls per NA12878 slice).  Returns
    ``None`` when the layout (shared stream, non-EXTERNAL codec, missing
    block, truncated stream, no C kernel) requires the per-value reader,
    which stays the pinned semantic reference."""
    arr = _bulk_int_array(e, ext, id_use)
    return None if arr is None else _series_reader(arr.tolist())


def _bulk_bytes_reader(e, ext, id_use):
    """Zero-arg reader over :func:`_bulk_bytes_series` (``None`` when the
    series cannot be pre-split)."""
    vals = _bulk_bytes_series(e, ext, id_use)
    return None if vals is None else _series_reader(vals)


def _bulk_bytes_series(e, ext, id_use):
    """Whole-series pre-split for byte-array series (RN, tag values) on
    exclusive streams.  BYTE_ARRAY_STOP splits the block on the stop byte
    once; BYTE_ARRAY_LEN with EXTERNAL values slices by the constant
    length or by a bulk itf8-decoded length stream.  Short-read semantics
    at a truncated tail match ByteReader.read (slices clamp).  Returns the
    value list or ``None`` (keep the per-value reader)."""
    if not _BULK_RECORD_SERIES or e is None:
        return None
    if e.codec == 5:
        if id_use.get(e.content_id) != 1 or e.content_id not in ext:
            return None
        st = ext[e.content_id]
        # drop the piece past the last stop: either the empty unread tail
        # or an incomplete value the per-value reader would refuse too
        vals = st.b[st.i :].split(bytes([e.stop]))[:-1]
        st.i = len(st.b)
        return vals
    if e.codec == 4 and e.val_enc.codec == 1:
        vcid = e.val_enc.content_id
        if id_use.get(vcid) != 1 or vcid not in ext:
            return None
        vst = ext[vcid]
        raw = vst.b[vst.i :]
        le = e.len_enc
        if le._const():
            k = le.alphabet[0]
            if k <= 0:
                return None  # zero/negative length: per-value semantics
            vals = [raw[i : i + k] for i in range(0, len(raw), k)]
        elif le.codec == 1 and id_use.get(le.content_id) == 1 and le.content_id in ext:
            from sequila_spark.sources import _ckern as CK

            if not CK.available():
                return None
            lst = ext[le.content_id]
            try:
                lens = CK.itf8_scan_all(bytes(lst.b[lst.i :]))
            except ValueError:
                return None
            if lens is None or (len(lens) and int(lens.min()) < 0):
                return None
            lst.i = len(lst.b)
            vals = []
            off = 0
            for n in lens.tolist():
                vals.append(raw[off : off + n])
                off += n
        else:
            return None
        vst.i = len(vst.b)
        return vals
    return None


def _can_defer_walk(ch, ds, bulk, s_ref, qs_ext) -> bool:
    """Whether the feature walk may run AFTER the record-field loop as one
    C call (bamscan.c cram_walk).  Deferral preserves observable behavior
    iff (a) no walk series reads core bits (their order vs the record
    fields' core reads would change), (b) no walk series shares an
    external content stream with a record-field or tag series, and (c)
    the slice maps to one known reference (per-record RI handled by the
    Python path).  QS additionally must be the sole reader of its stream
    so quality extraction can move after the loop."""
    from sequila_spark.sources import _ckern as CK

    if not CK.has_cram_walk() or s_ref < 0 or "FN" not in bulk["ints"]:
        return False
    id_use = bulk["id_use"]
    walk_ids: set[int] = set()
    for n in _WALK_SERIES:
        e = ds.get(n)
        if e is None:
            continue
        if _reads_core(e):
            return False
        walk_ids.update(_enc_content_ids(e))
    nonwalk_ids: set[int] = set()
    for n, e in ds.items():
        if n not in _WALK_SERIES:
            nonwalk_ids.update(_enc_content_ids(e))
    for e in ch.tag_enc.values():
        nonwalk_ids.update(_enc_content_ids(e))
    if walk_ids & nonwalk_ids:
        return False
    qe = ds.get("QS")
    if qe is not None and qs_ext is not None and id_use.get(qe.content_id) != 1:
        return False
    return True


#: str reference -> uint8 view cache (id-keyed; the tuple keeps the str
#: alive so the id cannot be reused).  Bounded by the number of distinct
#: contig strings a worker decodes — the genome itself dominates it.
_REF_B: dict[int, tuple] = {}


def _ref_bytes(s: str):
    import numpy as np

    e = _REF_B.get(id(s))
    if e is not None and e[0] is s:
        return e[1]
    try:
        arr = np.frombuffer(s.encode("ascii"), dtype=np.uint8)
    except UnicodeEncodeError:
        return None  # non-ASCII reference: Python-walk semantics only
    _REF_B[id(s)] = (s, arr)
    return arr


def _subtab_c(ch):
    """256x4 uint8 (ref byte, substitution code) -> base table for the C
    walk, replicating _reconstruct's lookup exactly: rows from
    ch.sub_table_b (which may be SHORTER than 4 when the matrix repeats a
    code — join compaction), 'ACGT' for bytes without a row, 'N' past the
    row end."""
    t = getattr(ch, "_subtab_c", None)
    if t is not None:
        return t
    import numpy as np

    t = np.empty((256, 4), dtype=np.uint8)
    default = b"ACGT"
    for refb in range(256):
        row = ch.sub_table_b.get(chr(refb), default)
        for c in range(4):
            t[refb, c] = row[c] if c < len(row) else 78  # 'N'
    ch._subtab_c = t
    return t


def _finish_deferred_walk(
    ch, rdr, recs, bulk, qs_ext, ref_names, s_ref, ref_seqs, synthesize_nm
) -> None:
    """Run the deferred feature walk for one slice: one cram_walk C call;
    any abort (unsupported code, bounds case, series underrun) replays
    the slice through the pinned Python walk over the SAME bulk arrays —
    their iterators are untouched because the C call consumes nothing
    Python-visible."""
    from sequila_spark.sources import _ckern as CK
    from sequila_spark.sources.bamcodec import _QUAL33

    import numpy as np

    def replay() -> None:
        qs_r = rdr["QS"]
        ba_r = rdr["BA"]
        for rec in recs:
            rl = rec["rl"]
            cf = rec["cf"]
            if not rec["unmapped"]:
                seq, cigar, ref_len, nm = _reconstruct(
                    ch, rdr, rl, rec["ap"], rec["contig"], ref_seqs, cf
                )
                rec["seq"] = seq
                rec["cigar"] = cigar
                rec["end"] = (rec["ap"] + ref_len - 1) if ref_len > 0 else 0
                if synthesize_nm:
                    rec["tags"].setdefault("NM", str(nm))
            else:
                rec["seq"] = bytes(ba_r() for _ in range(rl)).decode(
                    "ascii", "replace"
                )
            if cf & 1:
                qraw = (
                    qs_ext.read(rl)
                    if qs_ext is not None
                    else bytes(qs_r() for _ in range(rl))
                )
                if qraw != b"\xff" * rl:
                    rec["qual"] = qraw.translate(_QUAL33).decode("latin-1")

    contig = ref_names[s_ref] if 0 <= s_ref < len(ref_names) else None
    have_ref = ref_seqs is not None and contig in ref_seqs
    if (not have_ref) and ch.rr and any(not r["unmapped"] for r in recs):
        replay()  # raises _reconstruct's reference-required ValueError
        return
    refseq = ref_seqs[contig] if have_ref else ""
    ref_b = _ref_bytes(refseq)
    if ref_b is None:
        replay()
        return
    n = len(recs)
    rl_a = np.fromiter((r["rl"] for r in recs), dtype=np.int64, count=n)
    ap_a = np.fromiter((r["ap"] for r in recs), dtype=np.int64, count=n)
    mp_a = np.fromiter(
        (0 if r["unmapped"] else 1 for r in recs), dtype=np.uint8, count=n
    )
    cf_a = np.fromiter((r["cf"] for r in recs), dtype=np.int64, count=n)
    qs_total = (len(qs_ext.b) - qs_ext.i) if qs_ext is not None else 0
    try:
        seq_out, seq_off, cig_out, cig_off, reflen, nm_a, qual_off = (
            CK.cram_walk(
                ref_b, _subtab_c(ch), bulk["ints"], bulk["bytes"],
                bulk["arrs"], qs_total, rl_a, ap_a, mp_a, cf_a,
            )
        )
    except CK.CramWalkAbort:
        replay()
        return
    total = int(seq_off[-1])
    if total and int(seq_out[:total].max()) > 127:
        replay()  # >0x7F byte: strict-vs-replace decode semantics differ
        return
    big = seq_out[:total].tobytes().decode("ascii")
    cig_s = cig_out[: int(cig_off[-1])].tobytes().decode("ascii")
    qs_b = qs_ext.b if qs_ext is not None else b""
    qbase = qs_ext.i if qs_ext is not None else 0
    so = seq_off.tolist()
    co = cig_off.tolist()
    qo = qual_off.tolist()
    rf = reflen.tolist()
    nmv = nm_a.tolist()
    for i, rec in enumerate(recs):
        rec["seq"] = big[so[i] : so[i + 1]]
        rec["cigar"] = cig_s[co[i] : co[i + 1]]
        if not rec["unmapped"]:
            rec["end"] = (rec["ap"] + rf[i] - 1) if rf[i] > 0 else 0
            if synthesize_nm:
                rec["tags"].setdefault("NM", str(nmv[i]))
        q = qo[i]
        if q >= 0:
            rl = rec["rl"]
            qraw = qs_b[qbase + q : qbase + q + rl]
            if qraw != b"\xff" * rl:
                rec["qual"] = qraw.translate(_QUAL33).decode("latin-1")


#: kill switch for the fully-columnar slice decode below — tests flip it
#: to pin columnar == per-record paths record-identically.
_COLUMNAR_SLICE = True

#: yield-tuple field order (matches _decode_slice_records' yield)
_REC_COLS = (
    "qname", "flag", "contig", "pos_start", "pos_end", "mapq", "cigar",
    "rnext", "pnext", "tlen", "seq", "qual", "tags",
)


def _walk_columns(ch, bulk, qs_ext, s_ref, ref_names, ref_seqs,
                  rl_a, ap_a, mp_a, cf_a,
                  want_seq=True, want_cigar=True, want_qual=True,
                  raw_cigar=False, qs_total=None):
    """Columnar analog of _finish_deferred_walk: ONE cram_walk C call over
    the already-held arrays (no dict round-trip, no np.fromiter).
    Returns (seqs, cigars, reflen ndarray, quals, nm ndarray) or ``None``
    on any abort — the caller then restores stream state and replays the
    slice through the pinned per-record path."""
    from sequila_spark.sources import _ckern as CK
    from sequila_spark.sources.bamcodec import _QUAL33

    n = len(rl_a)
    contig = ref_names[s_ref] if 0 <= s_ref < len(ref_names) else None
    have_ref = ref_seqs is not None and contig in ref_seqs
    if (not have_ref) and ch.rr and bool(mp_a.any()):
        return None  # the per-record path raises the reference-required error
    refseq = ref_seqs[contig] if have_ref else ""
    ref_b = _ref_bytes(refseq)
    if ref_b is None:
        return None
    if qs_total is None:
        qs_total = (len(qs_ext.b) - qs_ext.i) if qs_ext is not None else 0
    try:
        seq_out, seq_off, cig_out, cig_off, reflen, nm_a, qual_off = (
            CK.cram_walk(
                ref_b, _subtab_c(ch), bulk["ints"], bulk["bytes"],
                bulk["arrs"], qs_total, rl_a, ap_a, mp_a, cf_a,
            )
        )
    except CK.CramWalkAbort:
        return None
    total = int(seq_off[-1])
    if total and int(seq_out[:total].max()) > 127:
        return None  # >0x7F byte: strict-vs-replace decode semantics differ
    if want_seq:
        big = seq_out[:total].tobytes().decode("ascii")
        so = seq_off.tolist()
        seqs = [big[so[i] : so[i + 1]] or None for i in range(n)]
    else:
        seqs = [None] * n
    if want_cigar:
        cig_s = cig_out[: int(cig_off[-1])].tobytes().decode("ascii")
        co = cig_off.tolist()
        cigars = [cig_s[co[i] : co[i + 1]] for i in range(n)]
    elif raw_cigar:
        # fused coverage reader: hand back the walk's rendered cigar TEXT
        # buffer + offsets as arrays — no per-record string slicing
        cigars = (cig_out[: int(cig_off[-1])], cig_off)
    else:
        cigars = [None] * n
    quals: list = [None] * n
    if want_qual:
        qo = qual_off.tolist()
        qs_b = qs_ext.b if qs_ext is not None else b""
        qbase = qs_ext.i if qs_ext is not None else 0
        rl_l = rl_a.tolist()
        for i in range(n):
            q = qo[i]
            if q >= 0:
                rl = rl_l[i]
                qraw = qs_b[qbase + q : qbase + q + rl]
                if qraw != b"\xff" * rl:
                    quals[i] = qraw.translate(_QUAL33).decode("latin-1")
    return seqs, cigars, reflen, quals, nm_a


def _resolve_mates_arrays(nf_full, bf, ap, end, unmapped,
                          next_rid, next_pos, tlen, rid: int) -> None:
    """Array port of _resolve_mates (same chain semantics, pinned by the
    columnar==per-record tests): NF chains within the slice, mate fields
    from the mate record, flag bits 0x20/0x8 mirrored, template-span TLEN
    with the +span-on-leftmost convention."""
    n = len(nf_full)
    in_chain: set[int] = set()
    for i in range(n):
        if nf_full[i] < 0 or i in in_chain:
            continue
        chain = [i]
        j = i
        while nf_full[j] >= 0:
            nxt = j + int(nf_full[j]) + 1
            if nxt <= j or nxt >= n or nxt in in_chain:
                break  # malformed link (backward/out-of-range): stop here
            j = nxt
            chain.append(j)
            in_chain.add(j)
        in_chain.update(chain)
        m = len(chain)
        if m < 2:  # malformed out-of-range link: leave the record unmated
            continue
        for k, idx in enumerate(chain):
            b_idx = chain[(k + 1) % m]
            next_rid[idx] = rid
            next_pos[idx] = ap[b_idx]
            if bf[b_idx] & 0x10:
                bf[idx] |= 0x20
            if bf[b_idx] & 0x4:
                bf[idx] |= 0x8
        if all(
            (not unmapped[idx]) and end[idx] > 0 for idx in chain
        ):
            left_start = min(ap[idx] for idx in chain)
            right_end = max(end[idx] for idx in chain)
            t = right_end - left_start + 1
            leftmost = min(range(m), key=lambda k: (ap[chain[k]], k))
            for k, idx in enumerate(chain):
                tlen[idx] = t if k == leftmost else -t


def _decode_slice_columns(
    ch: CompressionHeader,
    core: BitReader,
    ext: dict[int, ByteReader],
    s_ref: int,
    s_start: int,
    s_nrec: int,
    ref_names: list[str],
    ref_seqs: dict[str, str] | None,
    synthesize_nm: bool = False,
    rg_names: list[str] | None = None,
    columns: set | None = None,
):
    """Fully-columnar slice decode: every record-field series is decoded
    whole into arrays (C itf8 kernel / byte splits), the feature walk runs
    as one C call, and per-record work shrinks to tag-dict assembly plus
    string slicing — no per-record dicts, no per-record reader calls.

    Returns ``{col: list}`` (keys _REC_COLS, value lists of length
    s_nrec) or ``None`` when any precondition fails — core-bit series,
    shared streams, non-EXTERNAL codecs, walk aborts — in which case ALL
    stream positions are restored and the caller replays the slice
    through _decode_slice_records, the pinned semantic reference.

    ``columns`` (subset of _REC_COLS) prunes the EXPENSIVE per-record
    rendering — qname decode, tag rendering, seq/cigar string slicing,
    qual phred translation — at the decode itself; unrequested keys come
    back as all-None lists.  Stream consumption, mate resolution and the
    C walk are unchanged (series must be read in order regardless), so a
    pruned decode is positionally identical to the full one."""
    from sequila_spark.sources import _ckern as CK

    if not (_COLUMNAR_SLICE and _BULK_RECORD_SERIES and CK.available()):
        return None
    want = set(_REC_COLS) if columns is None else set(columns)
    import numpy as np

    n = s_nrec
    if n == 0:
        return {c: [] for c in _REC_COLS}

    snap = {cid: st.i for cid, st in ext.items()}
    core_snap = (core.pos, core.bit)

    def bail():
        # blocks materialized AFTER the snapshot (lazy ext) started at
        # i=0 — reset them there so the per-record replay sees fresh
        # streams
        for cid, st in ext.items():
            st.i = snap.get(cid, 0)
        core.pos, core.bit = core_snap
        return None

    ds = ch.ds
    rdr_dummy: dict = {}
    bulk = _bulk_feature_series(ch, ds, ext, rdr_dummy)
    qs_enc = ds.get("QS")
    qs_cid = (
        qs_enc.content_id
        if qs_enc is not None and qs_enc.codec == 1
        else None
    )
    qs_present = qs_cid is not None and qs_cid in ext
    # materialize the QS stream ONLY when quals are wanted — otherwise
    # the walk needs just its remaining SIZE (lazy ext keeps the qual
    # block, typically the largest in the container, compressed)
    qs_ext = ext.get(qs_cid) if (qs_present and "qual" in want) else None
    qs_total = 0
    if qs_present:
        qs_total = (
            ext.remaining(qs_cid)
            if hasattr(ext, "remaining")
            else len(ext[qs_cid].b) - ext[qs_cid].i
        )
    if not _can_defer_walk(ch, ds, bulk, s_ref, qs_present or None):
        return bail()
    id_use = bulk["id_use"]

    def ints(name):
        a = _bulk_int_array(ds.get(name), ext, id_use, n)
        return None if a is None else a

    bf = ints("BF")
    cf = ints("CF")
    rl = ints("RL")
    ap = ints("AP")
    tl = ints("TL")
    rg = ints("RG")
    if any(
        a is None or len(a) < n for a in (bf, cf, rl, ap, tl, rg)
    ):
        return bail()
    bf = bf[:n].copy()
    cf = cf[:n]
    rl = rl[:n]
    tl = tl[:n]
    rg = rg[:n]
    ap = (s_start + np.cumsum(ap[:n])) if ch.ap_delta else ap[:n].copy()

    detached = (cf & 2) != 0
    samemate = ((cf & 4) != 0) & ~detached
    unmapped = (bf & 4) != 0
    d_idx = np.flatnonzero(detached)
    nd = len(d_idx)

    next_rid = np.full(n, -1, dtype=np.int64)
    next_pos = np.zeros(n, dtype=np.int64)
    tlen = np.zeros(n, dtype=np.int64)
    if nd:
        mf = ints("MF")
        ns = ints("NS")
        np_a = ints("NP")
        ts = ints("TS")
        if any(a is None or len(a) < nd for a in (mf, ns, np_a, ts)):
            return bail()
        mf = mf[:nd]
        next_rid[d_idx] = ns[:nd]
        next_pos[d_idx] = np_a[:nd]
        tlen[d_idx] = ts[:nd]
        bf[d_idx] |= np.where((mf & 1) != 0, 0x20, 0) | np.where(
            (mf & 2) != 0, 0x8, 0
        )
    m_idx = np.flatnonzero(samemate)
    nf_full = np.full(n, -1, dtype=np.int64)
    if len(m_idx):
        nf = ints("NF")
        if nf is None or len(nf) < len(m_idx):
            return bail()
        nf_full[m_idx] = nf[: len(m_idx)]

    # qnames: whole RN series (BYTE_ARRAY_STOP split) — every record when
    # names are preserved, detached records otherwise.  RN's stream is
    # exclusive (fan-in-1 guard), so a pruned decode may skip it whole.
    qnames: list = [None] * n
    need_rn = (n if ch.rn_preserved else nd) if "qname" in want else 0
    if need_rn:
        rn_vals = _bulk_bytes_series(ds.get("RN"), ext, id_use)
        if rn_vals is None or len(rn_vals) < need_rn:
            return bail()
        decoded = [v.decode("ascii", "replace") for v in rn_vals[:need_rn]]
        if ch.rn_preserved:
            qnames = decoded
        else:
            for k, i in enumerate(d_idx.tolist()):
                qnames[i] = decoded[k]

    # MQ: read by mapped records only, in record order
    mapped_idx = np.flatnonzero(~unmapped)
    mapq = np.zeros(n, dtype=np.int64)
    if len(mapped_idx):
        mq = ints("MQ")
        if mq is None or len(mq) < len(mapped_idx):
            return bail()
        mapq[mapped_idx] = mq[: len(mapped_idx)]

    # tags: whole-series pre-render per (name, typ) key, consumed in
    # record order by the records whose tag line carries the key
    n_lines = len(ch.tag_lines)
    if int(tl.min(initial=0)) < 0 or int(tl.max(initial=0)) >= n_lines:
        return bail()  # per-record path raises the pinned IndexError
    rendered: dict[tuple, list] = {}
    if ch.tag_enc and "tags" in want:
        line_counts = np.bincount(tl, minlength=n_lines)
        need_by_key: dict[tuple, int] = {}
        for li, line in enumerate(ch.tag_lines):
            for key in line:
                need_by_key[key] = need_by_key.get(key, 0) + int(line_counts[li])
        for key, need in need_by_key.items():
            if need == 0:
                rendered[key] = []
                continue
            vals = _bulk_bytes_series(ch.tag_enc[key], ext, id_use)
            if vals is None or len(vals) < need:
                return bail()
            try:
                rendered[key] = _tag_render_series(key[1], vals)
            except Exception:
                return bail()  # malformed value: pinned per-record error

    # feature walk: seq / cigar / ref_len / qual for every record (the C
    # walk always runs — ref_len feeds pos_end and template TLEN — but
    # the per-record STRING rendering is pruned)
    walk = _walk_columns(
        ch, bulk, qs_ext, s_ref, ref_names, ref_seqs,
        rl, ap, (~unmapped).astype(np.uint8), cf,
        want_seq="seq" in want,
        want_cigar="cigar" in want,
        want_qual="qual" in want,
        raw_cigar="__cig_raw" in want,
        qs_total=qs_total,
    )
    if walk is None:
        return bail()
    seqs, cigars, reflen, quals, nm_a = walk
    cig_raw = None
    if "__cig_raw" in want and "cigar" not in want:
        cig_raw, cigars = cigars, [None] * n
    end = np.where((~unmapped) & (reflen > 0), ap + reflen - 1, 0)

    _resolve_mates_arrays(
        nf_full, bf, ap, end, unmapped, next_rid, next_pos, tlen, s_ref
    )

    # tag dict assembly, scattered PER KEY: for each (name, typ) the j-th
    # record whose line carries it takes rendered[j] — a flatnonzero +
    # direct assignments instead of per-record cursor-dict bookkeeping
    tags: list = [dict() for _ in range(n)] if "tags" in want else [None] * n
    if rendered:
        line_has = {key: np.zeros(n_lines, dtype=bool) for key in rendered}
        for li, line in enumerate(ch.tag_lines):
            for key in line:
                line_has[key][li] = True
        for key, vals in rendered.items():
            name = key[0]
            idxs = np.flatnonzero(line_has[key][tl]).tolist()
            for j, i in enumerate(idxs):
                tags[i][name] = vals[j]
    if synthesize_nm and "tags" in want:
        nm_l = nm_a.tolist()
        for i in mapped_idx.tolist():
            tags[i].setdefault("NM", str(nm_l[i]))
    if rg_names is not None and "tags" in want:
        n_rg = len(rg_names)
        for i in np.flatnonzero((rg >= 0) & (rg < n_rg)).tolist():
            tags[i].setdefault("RG", rg_names[rg[i]])

    contig = ref_names[s_ref] if 0 <= s_ref < len(ref_names) else None
    rid_next = next_rid.tolist()
    out = {
        "qname": qnames,
        "flag": bf.tolist(),
        "contig": [contig] * n,
        "pos_start": np.maximum(ap, 0).tolist(),
        "pos_end": end.tolist(),
        "mapq": mapq.tolist(),
        "cigar": cigars,
        "rnext": [
            ref_names[r] if 0 <= r < len(ref_names) else None
            for r in rid_next
        ],
        "pnext": np.maximum(next_pos, 0).tolist(),
        "tlen": tlen.tolist(),
        "seq": seqs,
        "qual": quals,
        "tags": tags,
    }
    if "__cig_raw" in want:
        # fused-coverage extras (bam.read_cram_coverage_events): walk text
        # buffer + offsets and the NUMERIC per-record series, no lists
        out["__cig_raw"] = cig_raw
        out["__ap"] = np.maximum(ap, 0)
        out["__bf"] = bf
        out["__mapq"] = mapq
        out["__s_ref"] = s_ref
    return out


def _decode_slice_records(
    ch: CompressionHeader,
    core: BitReader,
    ext: dict[int, ByteReader],
    s_ref: int,
    s_start: int,
    s_nrec: int,
    ref_names: list[str],
    ref_seqs: dict[str, str] | None,
    synthesize_nm: bool = False,
    rg_names: list[str] | None = None,
) -> Iterator[tuple]:
    ds = ch.ds

    # per-slice specialized readers: bind (core, ext) once, collapse
    # EXTERNAL/constant-Huffman series to bound methods (see Encoding.
    # int_reader) — this loop was dominated by per-symbol dispatch
    def _missing(name):
        def f():
            raise KeyError(name)

        return f

    def ir(name):
        return ds[name].int_reader(core, ext) if name in ds else _missing(name)

    def br(name):
        return ds[name].byte_reader(core, ext) if name in ds else _missing(name)

    def sr(name):
        return ds[name].bytes_reader(core, ext) if name in ds else _missing(name)

    ba_r = br("BA")
    qs_enc = ds.get("QS")
    qs_ext = ext.get(qs_enc.content_id) if qs_enc is not None and qs_enc.codec == 1 else None
    qs_r = br("QS")
    rdr = {
        "FN": ir("FN"), "FC": br("FC"), "FP": ir("FP"), "BS": br("BS"),
        "IN": sr("IN"), "SC": sr("SC"), "BA": ba_r, "DL": ir("DL"),
        "RS": ir("RS"), "PD": ir("PD"), "HC": ir("HC"), "BB": sr("BB"),
        "QQ": sr("QQ"), "QS": qs_r,
    }
    bulk = _bulk_feature_series(ch, ds, ext, rdr)
    # content-id fan-in from the bulk pass (single source); streams with
    # fan-in 1 are safe to pre-decode whole (order within an exclusive
    # stream is the only observable the per-value readers depend on).
    # _bulk_feature_series only consumed WALK-series streams — disjoint
    # from the record-field/tag streams by the same fan-in-1 guard.
    _pre_id_use = bulk["id_use"]

    def ir_bulk(name):
        r = _bulk_int_reader(ds.get(name), ext, _pre_id_use)
        return r if r is not None else ir(name)

    def sr_bulk(name):
        r = _bulk_bytes_reader(ds.get(name), ext, _pre_id_use)
        return r if r is not None else sr(name)

    bf_r, cf_r, ri_r = ir_bulk("BF"), ir_bulk("CF"), ir_bulk("RI")
    rl_r, ap_r = ir_bulk("RL"), ir_bulk("AP")
    rg_r, tl_r, mq_r = ir_bulk("RG"), ir_bulk("TL"), ir_bulk("MQ")
    rn_r = sr_bulk("RN")
    mf_r, ns_r, np_r = ir_bulk("MF"), ir_bulk("NS"), ir_bulk("NP")
    ts_r, nf_r = ir_bulk("TS"), ir_bulk("NF")
    # defer the feature walk past the record-field loop and run it as ONE
    # C call per slice (cram_walk in bamscan.c) when every walk series'
    # content stream is isolated from the record-field series — legal
    # because deferral then preserves per-stream read order exactly
    defer = _can_defer_walk(ch, ds, bulk, s_ref, qs_ext)
    # per-TL-line tag readers (name, fused raw-read + type-specialized
    # renderer — see _tag_render_fn).  ONE raw reader per (name, typ):
    # the same tag in several tag lines must share consumption state
    # (stream position for per-value readers, the iterator for bulk).
    tag_fn: dict[tuple, object] = {}
    for line in ch.tag_lines:
        for key in line:
            if key in tag_fn:
                continue
            name, typ = key
            enc = ch.tag_enc[key]
            vals = _bulk_bytes_series(enc, ext, _pre_id_use)
            if vals is not None:
                try:
                    # pre-render the whole series (hot path)
                    tag_fn[key] = _series_reader(_tag_render_series(typ, vals))
                except Exception:
                    # a malformed value anywhere in the series (possibly in
                    # an unconsumed tail): per-record rendering over the
                    # same pre-split values raises only if actually read
                    tag_fn[key] = _tag_render_fn(typ, _series_reader(vals))
            else:
                tag_fn[key] = _tag_render_fn(typ, enc.bytes_reader(core, ext))
    tag_rdr = [
        [(name, tag_fn[(name, typ)]) for name, typ in line]
        for line in ch.tag_lines
    ]

    prev_ap = s_start
    recs: list[dict] = []
    for _ in range(s_nrec):
        bf = bf_r()
        cf = cf_r()
        rid = ri_r() if s_ref == -2 else s_ref
        rl = rl_r()
        ap = ap_r()
        if ch.ap_delta:
            ap = prev_ap + ap
            prev_ap = ap
        rg = rg_r()
        qname = None
        if ch.rn_preserved:
            qname = rn_r().decode("ascii", "replace")
        next_rid = -1
        next_pos = 0
        tlen = 0
        nf = None
        if cf & 2:  # detached: explicit mate info
            mf = mf_r()
            if not ch.rn_preserved:
                qname = rn_r().decode("ascii", "replace")
            next_rid = ns_r()
            next_pos = np_r()
            tlen = ts_r()
            if mf & 1:
                bf |= 0x20  # mate reverse strand
            if mf & 2:
                bf |= 0x8  # mate unmapped
        elif cf & 4:
            # mate downstream in the SAME slice: its fields come from the
            # mate record itself (resolved after the decode loop)
            nf = nf_r()
        # tags
        tl = tl_r()
        tags: dict[str, str] = {}
        for name, render in tag_rdr[tl]:
            tags[name] = render()
        if rg_names is not None and 0 <= rg < len(rg_names):
            tags.setdefault("RG", rg_names[rg])

        unmapped = bool(bf & 0x4)
        contig = ref_names[rid] if 0 <= rid < len(ref_names) else None

        if not unmapped:
            if defer:
                seq = None
                cigar = None
                ref_len = 0
            else:
                seq, cigar, ref_len, nm = _reconstruct(
                    ch, rdr, rl, ap, contig, ref_seqs, cf
                )
                if synthesize_nm:
                    # edit distance from the feature walk (samtools-calmd
                    # analog).  Off by default: htslib drops NM at encode
                    # when it assumes recomputability, so a faithful decode
                    # yields no NM unless the tag dictionary carried it —
                    # synthesizing is only correct when ref_seqs is the
                    # aligner's actual reference.
                    tags.setdefault("NM", str(nm))
            mapq = mq_r()
        else:
            if defer:
                seq = None
            else:
                # rdr["BA"], not the pre-bulk local: _bulk_feature_series
                # may have replaced the series reader with a list iterator
                ba_rd = rdr["BA"]
                seq = bytes(ba_rd() for _ in range(rl)).decode(
                    "ascii", "replace"
                )
            cigar = "*"
            ref_len = 0
            mapq = 0
        qual = None
        if (cf & 1) and not defer:
            qraw = (
                qs_ext.read(rl)
                if qs_ext is not None
                else bytes(qs_r() for _ in range(rl))
            )
            if qraw != b"\xff" * rl:
                from sequila_spark.sources.bamcodec import _QUAL33

                # C-level phred+33 rendering (same table as the BAM codec)
                qual = qraw.translate(_QUAL33).decode("latin-1")
        recs.append(
            {
                "qname": qname,
                "bf": bf,
                "rid": rid,
                "ap": ap,
                "rl": rl,
                "cf": cf,
                "contig": contig,
                "end": (ap + ref_len - 1) if (not unmapped and ref_len > 0) else 0,
                "mapq": mapq,
                "cigar": cigar,
                "next_rid": next_rid,
                "next_pos": next_pos,
                "tlen": tlen,
                "seq": seq,
                "qual": qual,
                "tags": tags,
                "nf": nf,
                "unmapped": unmapped,
            }
        )

    if defer:
        _finish_deferred_walk(
            ch, rdr, recs, bulk, qs_ext, ref_names, s_ref, ref_seqs,
            synthesize_nm,
        )
    _resolve_mates(recs)
    for rec in recs:
        yield (
            rec["qname"],
            rec["bf"],
            ref_names[rec["rid"]] if 0 <= rec["rid"] < len(ref_names) else None,
            rec["ap"] if rec["ap"] > 0 else 0,
            rec["end"],
            rec["mapq"],
            rec["cigar"],
            ref_names[rec["next_rid"]]
            if 0 <= rec["next_rid"] < len(ref_names)
            else None,
            rec["next_pos"] if rec["next_pos"] > 0 else 0,
            rec["tlen"],
            rec["seq"] or None,
            rec["qual"],
            rec["tags"],
        )


def _resolve_mates(recs: list[dict]) -> None:
    """Reconstruct mate fields for records linked within a slice
    (CF bit 0x4 'mate downstream': NF = number of records to skip to the
    mate, htsjdk convention mate_index = i + NF + 1; spec section 10.2).

    Each fragment points to the next in the chain and the last wraps to
    the first (standard BAM pair semantics for two-fragment templates):
    rnext/pnext come from the mate record; flag bits 0x20/0x8 mirror the
    mate's reverse/unmapped state; TLEN spans leftmost start to rightmost
    end for same-reference two-fragment templates, positive on the
    leftmost record (ties: the first record in the chain), zero otherwise
    — the BAM writer's convention."""
    in_chain: set[int] = set()
    for i, r in enumerate(recs):
        if r["nf"] is None or i in in_chain:
            continue
        chain = [i]
        j = i
        while recs[j]["nf"] is not None:
            nxt = j + recs[j]["nf"] + 1
            if nxt <= j or nxt >= len(recs) or nxt in in_chain:
                break  # malformed link (backward/out-of-range): stop here
            j = nxt
            chain.append(j)
            in_chain.add(j)
        in_chain.update(chain)
        n = len(chain)
        if n < 2:  # malformed out-of-range link: leave the record unmated
            continue
        for k, idx in enumerate(chain):
            a = recs[idx]
            b = recs[chain[(k + 1) % n]]
            a["next_rid"] = b["rid"]
            a["next_pos"] = b["ap"]
            if b["bf"] & 0x10:
                a["bf"] |= 0x20
            if b["bf"] & 0x4:
                a["bf"] |= 0x8
        members = [recs[idx] for idx in chain]
        if all(
            not m["unmapped"] and m["end"] > 0 and m["rid"] == members[0]["rid"]
            for m in members
        ):
            # htslib computes TLEN for EVERY segment of a same-reference
            # template (cram_decode's template-span walk), not just pairs:
            # span = leftmost start to rightmost end; the leftmost segment
            # (ties: first in chain order) gets +span, all others -span —
            # the SAM convention htslib's BAM writer emits.
            left_start = min(m["ap"] for m in members)
            right_end = max(m["end"] for m in members)
            t = right_end - left_start + 1
            leftmost = min(range(n), key=lambda k: (members[k]["ap"], k))
            for k, m in enumerate(members):
                m["tlen"] = t if k == leftmost else -t


def _reconstruct(
    ch: CompressionHeader,
    rdr: dict[str, object],
    rl: int,
    ap: int,
    contig: str | None,
    ref_seqs: dict[str, str] | None,
    cf: int,
) -> tuple[str, str, int, int]:
    """Feature-walk sequence + CIGAR reconstruction (spec section 10.5).
    Also accumulates the NM edit distance: substituted + inserted +
    deleted bases (clips/splices excluded), literal runs compared against
    the reference.  ``rdr`` maps data-series name -> zero-arg specialized
    reader built once per slice (Encoding.int_reader & co).

    Single pass: each feature is decoded from its series and applied to
    the seq/CIGAR walk immediately (no intermediate feature list — FP
    deltas are non-negative, so decode order IS walk order)."""
    if ref_seqs is None or contig not in (ref_seqs or {}):
        if ch.rr:
            raise ValueError(
                f"reference sequence for {contig!r} required to reconstruct "
                "reads (preservation RR=true) — pass ref_path"
            )
        refseq = ""
    else:
        # load_fasta uppercases at load, so slices need no per-read fold
        refseq = ref_seqs[contig]

    fn = rdr["FN"]()
    if fn == 0 and not (cf & 8) and ap > 0 and rl > 0 and ap - 1 + rl <= len(refseq):
        # featureless full-match read (the common case on high-identity
        # data): one reference slice, no bytearray walk
        return refseq[ap - 1 : ap - 1 + rl], f"{rl}M", rl, 0

    fc_r, fp_r = rdr["FC"], rdr["FP"]
    bs_r, in_r, sc_r, ba_r = rdr["BS"], rdr["IN"], rdr["SC"], rdr["BA"]
    dl_r, rs_r, pd_r, hc_r = rdr["DL"], rdr["RS"], rdr["PD"], rdr["HC"]
    bb_r, qs_r, qq_r = rdr["BB"], rdr["QS"], rdr["QQ"]
    sub_table_b = ch.sub_table_b
    seq = bytearray(b"N" * rl)
    cig: list[list] = []
    last = None  # last cigar op, mirrored in cig[-1][1]

    fpos = 0
    rpos = 0  # 0-based in read
    ref_off = ap - 1  # 0-based in reference
    nm = 0
    for _ in range(fn):
        code = fc_r()
        fpos += fp_r()
        gap = (fpos - 1) - rpos  # matched bases before this feature
        if gap > 0:
            seq[rpos : rpos + gap] = refseq[ref_off : ref_off + gap].encode()
            if last == "M":
                cig[-1][0] += gap
            else:
                cig.append([gap, "M"])
                last = "M"
            rpos += gap
            ref_off += gap
        if code == 88:  # X: substitution code via the header table
            val = bs_r()
            refb = refseq[ref_off] if ref_off < len(refseq) else "N"
            table = sub_table_b.get(refb, b"ACGT")
            seq[rpos] = table[val] if val < len(table) else 78
            if last == "M":
                cig[-1][0] += 1
            else:
                cig.append([1, "M"])
                last = "M"
            nm += 1
            rpos += 1
            ref_off += 1
        elif code == 66 or code == 98:  # B / b: literal M-type base run
            # B carries one explicit base + its quality (the qual lands in
            # the QS array this record reads separately); b is a base run.
            # Both consume reference AND query (M-type, NOT insertions —
            # htslib uses B e.g. for bases beyond the reference end).
            if code == 66:
                val = bytes([ba_r()])
                qs_r()
            else:
                val = bb_r()
            n = len(val)
            if n > 0:
                run = refseq[ref_off : ref_off + n].encode()
                nm += sum(1 for a, bch in zip(val, run) if a != bch)
                nm += max(0, n - len(run))
                seq[rpos : rpos + n] = val
                if last == "M":
                    cig[-1][0] += n
                else:
                    cig.append([n, "M"])
                    last = "M"
                rpos += n
                ref_off += n
        elif code == 73:  # I: insertion bytes
            val = in_r()
            n = len(val)
            if n > 0:
                seq[rpos : rpos + n] = val
                if last == "I":
                    cig[-1][0] += n
                else:
                    cig.append([n, "I"])
                    last = "I"
                nm += n
                rpos += n
        elif code == 83:  # S: soft clip
            val = sc_r()
            n = len(val)
            if n > 0:
                seq[rpos : rpos + n] = val
                if last == "S":
                    cig[-1][0] += n
                else:
                    cig.append([n, "S"])
                    last = "S"
                rpos += n
        elif code == 105:  # i: single inserted base
            seq[rpos] = ba_r()
            if last == "I":
                cig[-1][0] += 1
            else:
                cig.append([1, "I"])
                last = "I"
            nm += 1
            rpos += 1
        elif code == 68:  # D: deletion
            val = dl_r()
            if val > 0:
                if last == "D":
                    cig[-1][0] += val
                else:
                    cig.append([val, "D"])
                    last = "D"
            nm += val
            ref_off += val
        elif code == 78:  # N: reference skip
            val = rs_r()
            if val > 0:
                if last == "N":
                    cig[-1][0] += val
                else:
                    cig.append([val, "N"])
                    last = "N"
            ref_off += val
        elif code == 80:  # P: padding
            val = pd_r()
            if val > 0:
                if last == "P":
                    cig[-1][0] += val
                else:
                    cig.append([val, "P"])
                    last = "P"
        elif code == 72:  # H: hard clip
            val = hc_r()
            if val > 0:
                if last == "H":
                    cig[-1][0] += val
                else:
                    cig.append([val, "H"])
                    last = "H"
        elif code == 81:  # Q: per-base quality (stream consumed, no walk)
            qs_r()
        elif code == 113:  # q: quality run (stream consumed, no walk)
            qq_r()
        else:
            raise NotImplementedError(f"CRAM feature code {chr(code)!r}")
    tail = rl - rpos
    if tail > 0:
        seq[rpos : rpos + tail] = refseq[ref_off : ref_off + tail].encode()
        if last == "M":
            cig[-1][0] += tail
        else:
            cig.append([tail, "M"])
            last = "M"
        ref_off += tail
    if cf & 8:  # sequence unknown
        seq = bytearray(b"N" * rl)
    ref_len = sum(n for n, op in cig if op in "MDN=X")
    cigar = "".join(f"{n}{op}" for n, op in cig) or "*"
    return seq.decode("ascii"), cigar, ref_len, nm


# --- convenience ------------------------------------------------------------


def load_fasta(path: str) -> dict[str, str]:
    """{name: sequence} — simple FASTA load for reference-based decode.
    Sequences are uppercased here (soft-masking folded once at load), so
    the per-read reconstruction never re-uppercases reference slices.
    ``.gz`` input (bgzip/BGZF is valid multi-member gzip) streams through
    the gzip module — this path loads whole sequences anyway, so random
    access buys nothing here."""
    import gzip

    seqs: dict[str, str] = {}
    name = None
    chunks: list[str] = []
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        for line in f:
            line = line.strip()
            if line.startswith(">"):
                if name is not None:
                    seqs[name] = "".join(chunks).upper()
                name = line[1:].split()[0]
                chunks = []
            else:
                chunks.append(line)
    if name is not None:
        seqs[name] = "".join(chunks).upper()
    return seqs


def read_cram_records(path: str, ref_path: str | None = None) -> Iterator[tuple]:
    """Decode a whole CRAM file sequentially (single task) — the per-
    container API (scan_containers + decode_container) is the parallel
    path."""
    data = open(path, "rb").read()
    names, text, _off = read_file_header(data)
    refs = load_fasta(ref_path) if ref_path else None
    rgs = parse_rg_ids(text)
    for h in scan_containers(data):
        yield from decode_container(data, h, names, refs, rg_names=rgs)

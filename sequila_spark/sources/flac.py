"""Native FLAC decode for the multimodal registry — zero new dependencies.

Companion to sources/audio.py (WAV): FLAC is the remaining mainstream
audio format a pure-Python + NumPy stack can decode EXACTLY — the codec
is integer-only (linear prediction + Rice coding), fully specified in
RFC 9639 / the xiph.org format document, and self-verifying (CRC-8 per
frame header, CRC-16 per frame, MD5 of the unencoded PCM in
STREAMINFO).  The reference engine has no media layer at all; this
exists for the LLM-pipeline multimodal family (operators/multimodal.py),
where ``audio/flac`` payloads decode through the same registry contract
as ``audio/wav``.

Implemented (the full fixed-predictor/LPC decode space):

- STREAMINFO parse + skip of all other metadata block types.
- Frame headers: both blocking strategies, every block-size code
  (table, 8-bit, 16-bit), every sample-rate code (table, kHz, Hz,
  daHz), channel assignments 0-10 (independent, left/side, right/side,
  mid/side), sample-size codes (8/12/16/20/24/32 and from-STREAMINFO),
  extended-UTF-8 frame numbers.
- Subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  with arbitrary shift/precision; wasted-bits unary prefix.
- Residual: Rice method 0 (4-bit params) and 1 (5-bit), partition
  orders 0-15, escape partitions (raw n-bit residuals).
- Integrity: CRC-8 of every frame header and CRC-16 of every frame are
  VERIFIED (corrupt payloads fail loudly, per the media-fuzz contract);
  a non-zero STREAMINFO MD5 is verified against the decoded PCM.

``decode_flac`` returns the same contract as ``decode_wav``:
``{"sample_rate", "channels", "bits", "n_frames", "duration_s",
"samples"}`` with ``samples`` = float32 bytes, frame-major interleaved,
scaled to [-1, 1] by the symmetric 2^(bits-1) divisor.
"""

from __future__ import annotations

import hashlib

import numpy as np

#: allocation guard: decoded float32 sample buffer must stay under 1 GiB
_MAX_SAMPLE_BYTES = 1 << 30

_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_SAMPLE_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_CRC8_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TABLE.append(_c)

_CRC16_TABLE = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16_TABLE.append(_c)


def _crc8(b: bytes) -> int:
    c = 0
    t = _CRC8_TABLE
    for x in b:
        c = t[c ^ x]
    return c


def _crc16(b: bytes) -> int:
    c = 0
    t = _CRC16_TABLE
    for x in b:
        c = ((c << 8) & 0xFFFF) ^ t[(c >> 8) ^ x]
    return c


class _Bits:
    """MSB-first bit reader; every read is bounds-checked so truncated
    payloads raise ValueError, never IndexError (media-fuzz contract)."""

    __slots__ = ("b", "pos", "n")

    def __init__(self, b: bytes):
        self.b = b
        self.pos = 0
        self.n = len(b) * 8

    def u(self, k: int) -> int:
        p = self.pos
        if p + k > self.n:
            raise ValueError("truncated FLAC stream")
        self.pos = p + k
        i0 = p >> 3
        i1 = (p + k + 7) >> 3
        v = int.from_bytes(self.b[i0:i1], "big")
        return (v >> ((i1 << 3) - p - k)) & ((1 << k) - 1)

    def s(self, k: int) -> int:
        v = self.u(k)
        return v - (1 << k) if v >> (k - 1) else v

    def unary(self) -> int:
        p = self.pos
        n = self.n
        b = self.b
        cnt = 0
        while True:
            if p >= n:
                raise ValueError("truncated FLAC stream")
            chunk = (b[p >> 3] << (p & 7)) & 0xFF
            if chunk == 0:
                step = 8 - (p & 7)
                cnt += step
                p += step
                continue
            lead = 8 - chunk.bit_length()
            self.pos = p + lead + 1
            return cnt + lead

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7


def _utf8_num(br: _Bits, max_bytes: int) -> int:
    """Extended UTF-8 coded frame/sample number (up to 7 bytes)."""
    b0 = br.u(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > max_bytes - 1:
        raise ValueError("invalid FLAC frame number coding")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = br.u(8)
        if c & 0xC0 != 0x80:
            raise ValueError("invalid FLAC frame number coding")
        v = (v << 6) | (c & 0x3F)
    return v


def _residual(br: _Bits, blocksize: int, order: int) -> list[int]:
    """Rice-coded residual section -> blocksize-order signed ints."""
    method = br.u(2)
    if method > 1:
        raise ValueError("reserved FLAC residual coding method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    porder = br.u(4)
    nparts = 1 << porder
    if blocksize % nparts:
        raise ValueError("FLAC partition order does not divide block size")
    psize = blocksize >> porder
    if psize < order:
        raise ValueError("FLAC partition smaller than predictor order")
    out: list[int] = []
    for part in range(nparts):
        count = psize - order if part == 0 else psize
        k = br.u(plen)
        if k == escape:
            nbits = br.u(5)
            if nbits == 0:
                out.extend([0] * count)
            else:
                app = out.append
                for _ in range(count):
                    app(br.s(nbits))
        else:
            unary = br.unary
            u = br.u
            if k:
                for _ in range(count):
                    v = (unary() << k) | u(k)
                    out.append((v >> 1) ^ -(v & 1))
            else:
                for _ in range(count):
                    v = unary()
                    out.append((v >> 1) ^ -(v & 1))
    return out


_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


def _subframe(br: _Bits, blocksize: int, bps: int) -> list[int]:
    if br.u(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = br.u(6)
    wasted = 0
    if br.u(1):
        wasted = br.unary() + 1
        bps -= wasted
        if bps <= 0:
            raise ValueError("FLAC wasted bits exceed sample size")
    if stype == 0:  # CONSTANT
        out = [br.s(bps)] * blocksize
    elif stype == 1:  # VERBATIM
        s = br.s
        out = [s(bps) for _ in range(blocksize)]
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        if order > blocksize:
            raise ValueError("FLAC predictor order exceeds block size")
        s = br.s
        out = [s(bps) for _ in range(order)]
        res = _residual(br, blocksize, order)
        coefs = _FIXED_COEFS[order]
        for r in res:
            acc = r
            for j, c in enumerate(coefs):
                acc += c * out[-1 - j]
            out.append(acc)
    elif stype >= 32:  # LPC order 1-32
        order = (stype & 31) + 1
        if order > blocksize:
            raise ValueError("FLAC predictor order exceeds block size")
        s = br.s
        out = [s(bps) for _ in range(order)]
        prec = br.u(4)
        if prec == 15:
            raise ValueError("invalid FLAC LPC precision code")
        prec += 1
        shift = br.s(5)
        if shift < 0:
            raise ValueError("negative FLAC LPC shift")
        coefs = [s(prec) for _ in range(order)]
        res = _residual(br, blocksize, order)
        for r in res:
            acc = 0
            for j, c in enumerate(coefs):
                acc += c * out[-1 - j]
            out.append(r + (acc >> shift))
    else:
        raise ValueError(f"reserved FLAC subframe type {stype}")
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode_flac(b: bytes) -> dict:
    """Decode one FLAC payload -> {sample_rate, channels, bits, n_frames,
    duration_s, samples(float32 bytes)} — the decode_wav contract."""
    if len(b) < 42 or b[:4] != b"fLaC":
        raise ValueError("not a FLAC (bad fLaC marker)")
    # --- metadata blocks -------------------------------------------------
    i = 4
    si = None
    while True:
        if i + 4 > len(b):
            raise ValueError("truncated FLAC metadata")
        hdr = b[i]
        last = hdr & 0x80
        btype = hdr & 0x7F
        ln = int.from_bytes(b[i + 1 : i + 4], "big")
        body = b[i + 4 : i + 4 + ln]
        if len(body) != ln:
            raise ValueError("truncated FLAC metadata block")
        if btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        if btype == 0:
            if si is not None:
                raise ValueError("duplicate FLAC STREAMINFO")
            if ln != 34:
                raise ValueError("FLAC STREAMINFO must be 34 bytes")
            mr = _Bits(body)
            si = {
                "min_block": mr.u(16),
                "max_block": mr.u(16),
                "min_frame": mr.u(24),
                "max_frame": mr.u(24),
                "sample_rate": mr.u(20),
                "channels": mr.u(3) + 1,
                "bits": mr.u(5) + 1,
                "total": mr.u(36),
                "md5": body[18:34],
            }
        i += 4 + ln
        if last:
            break
    if si is None:
        raise ValueError("FLAC missing STREAMINFO")
    if si["sample_rate"] == 0:
        raise ValueError("FLAC sample rate 0")
    bits = si["bits"]
    channels = si["channels"]
    if si["total"] * channels * 4 > _MAX_SAMPLE_BYTES:
        raise ValueError("FLAC decoded size exceeds allocation guard")

    # --- frames ----------------------------------------------------------
    br = _Bits(b)
    br.pos = i * 8
    chans: list[list[int]] = [[] for _ in range(channels)]
    n_frames_audio = 0
    while br.pos < br.n:
        start_byte = br.pos >> 3
        if br.u(14) != 0x3FFE:
            raise ValueError("bad FLAC frame sync")
        if br.u(1):
            raise ValueError("FLAC frame reserved bit set")
        variable = br.u(1)
        bs_code = br.u(4)
        sr_code = br.u(4)
        ch_asgn = br.u(4)
        ss_code = br.u(3)
        if br.u(1):
            raise ValueError("FLAC frame reserved bit set")
        _utf8_num(br, 7 if variable else 6)
        if bs_code == 0:
            raise ValueError("reserved FLAC block size code")
        elif bs_code == 1:
            bs = 192
        elif bs_code <= 5:
            bs = 576 << (bs_code - 2)
        elif bs_code == 6:
            bs = br.u(8) + 1
        elif bs_code == 7:
            bs = br.u(16) + 1
        else:
            bs = 256 << (bs_code - 8)
        if sr_code == 0:
            rate = si["sample_rate"]
        elif sr_code in _SAMPLE_RATE_CODES:
            rate = _SAMPLE_RATE_CODES[sr_code]
        elif sr_code == 12:
            rate = br.u(8) * 1000
        elif sr_code == 13:
            rate = br.u(16)
        elif sr_code == 14:
            rate = br.u(16) * 10
        else:
            raise ValueError("invalid FLAC sample rate code")
        if rate != si["sample_rate"]:
            raise ValueError("FLAC frame sample rate differs from STREAMINFO")
        if ss_code == 0:
            fbits = bits
        elif ss_code in _SAMPLE_SIZE_CODES:
            fbits = _SAMPLE_SIZE_CODES[ss_code]
        else:
            raise ValueError("reserved FLAC sample size code")
        if fbits != bits:
            raise ValueError("FLAC frame bit depth differs from STREAMINFO")
        if ch_asgn < 8:
            n_ch = ch_asgn + 1
            side_extra = [0] * n_ch
        elif ch_asgn <= 10:
            n_ch = 2
            # left/side and mid/side widen channel 1; right/side channel 0
            side_extra = [1, 0] if ch_asgn == 9 else [0, 1]
        else:
            raise ValueError("reserved FLAC channel assignment")
        if n_ch != channels:
            raise ValueError("FLAC frame channel count differs from STREAMINFO")
        hdr_end = br.pos >> 3  # header is byte-aligned before the CRC-8
        if _crc8(b[start_byte:hdr_end]) != br.u(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        sub = [_subframe(br, bs, fbits + side_extra[c]) for c in range(n_ch)]
        br.align()
        crc_end = br.pos >> 3
        if _crc16(b[start_byte:crc_end]) != br.u(16):
            raise ValueError("FLAC frame CRC-16 mismatch")

        if ch_asgn == 8:  # left/side: right = left - side
            left, side = sub
            sub = [left, [l - s for l, s in zip(left, side)]]
        elif ch_asgn == 9:  # side/right: left = side + right
            side, right = sub
            sub = [[s + r for s, r in zip(side, right)], right]
        elif ch_asgn == 10:  # mid/side
            mid, side = sub
            left, right = [], []
            for m, s in zip(mid, side):
                m = (m << 1) | (s & 1)
                left.append((m + s) >> 1)
                right.append((m - s) >> 1)
            sub = [left, right]
        for c in range(channels):
            chans[c].extend(sub[c])
        n_frames_audio += bs
        if len(chans[0]) * channels * 4 > _MAX_SAMPLE_BYTES:
            raise ValueError("FLAC decoded size exceeds allocation guard")
        br.align()
        # trailing garbage vs next frame: stop exactly at total_samples
        if si["total"] and n_frames_audio >= si["total"]:
            break

    if si["total"] and n_frames_audio != si["total"]:
        raise ValueError(
            f"FLAC frame samples {n_frames_audio} != STREAMINFO total {si['total']}"
        )

    x = np.empty((n_frames_audio, channels), dtype=np.int64)
    for c in range(channels):
        x[:, c] = chans[c]
    lim = np.int64(1) << (bits - 1)
    if (x >= lim).any() or (x < -lim).any():
        raise ValueError("FLAC sample exceeds declared bit depth")

    if si["md5"] != b"\x00" * 16:
        # spec: MD5 of the unencoded PCM, channel-interleaved, signed
        # little-endian, ceil(bits/8) bytes per sample
        nbytes = (bits + 7) // 8
        flat = x.reshape(-1)
        raw = (
            (flat & ((np.int64(1) << (8 * nbytes)) - 1))
            .astype(f"<u{8}")
            .tobytes()
        )
        # keep only the low nbytes of each 8-byte little-endian word
        arr = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 8)[:, :nbytes]
        if hashlib.md5(arr.tobytes()).digest() != si["md5"]:
            raise ValueError("FLAC MD5 mismatch (decoded PCM differs)")

    samples = (x.astype(np.float32) / np.float32(lim)).tobytes()
    return {
        "sample_rate": si["sample_rate"],
        "channels": channels,
        "bits": bits,
        "n_frames": n_frames_audio,
        "duration_s": n_frames_audio / si["sample_rate"],
        "samples": samples,
    }

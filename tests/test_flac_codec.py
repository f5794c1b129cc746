"""Native FLAC decode (sources/flac.py) — the encoder lives HERE (like
encode_png/encode_gif/encode_jpeg): fixtures are built from the RFC 9639
bit grammar over known PCM (generated via the same NumPy paths the WAV
tests use), then decoded back sample-exact.  Because the encoder
computes every residual with the SAME integer predictor the decoder
inverts, a roundtrip is exact by construction — the independent checks
are (a) a hand-assembled golden stream whose bits were written out
by hand below, (b) the STREAMINFO MD5 (computed from the raw PCM, not
the codec path), and (c) CRC/tamper tests."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from sequila_spark.sources.flac import _crc8, _crc16, decode_flac

# ---------------------------------------------------------------------------
# encoder (test-side fixture builder)
# ---------------------------------------------------------------------------


class _Bw:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def u(self, v: int, k: int) -> None:
        assert 0 <= v < (1 << k), (v, k)
        self.acc = (self.acc << k) | v
        self.nbits += k
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def s(self, v: int, k: int) -> None:
        self.u(v & ((1 << k) - 1), k)

    def unary(self, q: int) -> None:
        while q >= 32:
            self.u(0, 32)
            q -= 32
        self.u(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.u(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _utf8_enc(w: _Bw, v: int) -> None:
    if v < 0x80:
        w.u(v, 8)
        return
    n = 1  # continuation bytes; capacity of the n-cont form is 6+5n bits
    while v >= (1 << (6 + 5 * n)):
        n += 1
    w.u(((0xFF << (7 - n)) & 0xFF) | (v >> (6 * n)), 8)
    for i in range(n - 1, -1, -1):
        w.u(0x80 | ((v >> (6 * i)) & 0x3F), 8)


_BS_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5}
for _i in range(8, 16):
    _BS_CODES[256 << (_i - 8)] = _i
_SR_CODES = {
    88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5, 22050: 6,
    24000: 7, 32000: 8, 44100: 9, 48000: 10, 96000: 11,
}
_SS_CODES = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}


def _rice_param(res: list[int]) -> int:
    if not res:
        return 0
    mean = sum(abs(r) for r in res) / len(res) + 1
    k = 0
    while (1 << k) < mean and k < 30:
        k += 1
    return k


def _needed_bits(r: int) -> int:
    return (r.bit_length() if r >= 0 else (-r - 1).bit_length()) + 1


def _write_residual(w: _Bw, res: list[int], porder: int, order: int,
                    blocksize: int, *, rice2: bool = False,
                    escape: bool = False) -> None:
    plen = 5 if rice2 else 4
    w.u(1 if rice2 else 0, 2)
    w.u(porder, 4)
    nparts = 1 << porder
    assert blocksize % nparts == 0 and len(res) == blocksize - order
    psize = blocksize >> porder
    idx = 0
    for part in range(nparts):
        count = psize - order if part == 0 else psize
        part_res = res[idx : idx + count]
        idx += count
        # Rice params that overflow the field width use the escape form
        if escape or _rice_param(part_res) >= (1 << plen) - 1:
            nbits = max((_needed_bits(r) for r in part_res), default=1)
            w.u((1 << plen) - 1, plen)
            w.u(nbits, 5)
            for r in part_res:
                w.s(r, nbits)
        else:
            k = _rice_param(part_res)
            w.u(k, plen)
            for r in part_res:
                z = (abs(r) << 1) - (1 if r < 0 else 0)
                w.unary(z >> k)
                if k:
                    w.u(z & ((1 << k) - 1), k)
    assert idx == len(res)


_FIXED = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _write_subframe(w: _Bw, x: list[int], bps: int, *, mode: str = "auto",
                    order: int | None = None, porder: int = 0,
                    lpc: tuple[list[int], int, int] | None = None,
                    wasted: int = 0, rice2: bool = False,
                    escape: bool = False) -> None:
    if wasted:
        assert all(v % (1 << wasted) == 0 for v in x)
        x = [v >> wasted for v in x]
        bps -= wasted
    if mode == "auto":
        mode = "constant" if len(set(x)) == 1 else "fixed"
    if mode == "constant":
        assert len(set(x)) == 1
        w.u(0, 1)
        w.u(0, 6)
        _wasted_flag(w, wasted)
        w.s(x[0], bps)
        return
    if mode == "verbatim":
        w.u(0, 1)
        w.u(1, 6)
        _wasted_flag(w, wasted)
        for v in x:
            w.s(v, bps)
        return
    if mode == "fixed":
        if order is None:
            best, order = None, 0
            for o, coefs in _FIXED.items():
                if o > len(x):
                    continue
                res = [
                    x[i] - sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
                    for i in range(o, len(x))
                ]
                cost = sum(abs(r) for r in res)
                if best is None or cost < best:
                    best, order = cost, o
        coefs = _FIXED[order]
        res = [
            x[i] - sum(c * x[i - 1 - j] for j, c in enumerate(coefs))
            for i in range(order, len(x))
        ]
        w.u(0, 1)
        w.u(8 + order, 6)
        _wasted_flag(w, wasted)
        for v in x[:order]:
            w.s(v, bps)
        _write_residual(w, res, porder, order, len(x), rice2=rice2,
                        escape=escape)
        return
    if mode == "lpc":
        coefs, prec, shift = lpc
        order = len(coefs)
        res = [
            x[i] - (sum(c * x[i - 1 - j] for j, c in enumerate(coefs)) >> shift)
            for i in range(order, len(x))
        ]
        w.u(0, 1)
        w.u(32 + order - 1, 6)
        _wasted_flag(w, wasted)
        for v in x[:order]:
            w.s(v, bps)
        w.u(prec - 1, 4)
        w.s(shift, 5)
        for c in coefs:
            w.s(c, prec)
        _write_residual(w, res, porder, order, len(x), rice2=rice2,
                        escape=escape)
        return
    raise AssertionError(mode)


def _wasted_flag(w: _Bw, wasted: int) -> None:
    if wasted:
        w.u(1, 1)
        w.unary(wasted - 1)
    else:
        w.u(0, 1)


def encode_flac(x: np.ndarray, rate: int, bits: int, *, blocksize: int = 256,
                stereo: str = "independent", mode: str = "auto",
                order: int | None = None, porder: int = 0,
                lpc: tuple[list[int], int, int] | None = None,
                wasted: int = 0, rice2: bool = False, escape: bool = False,
                variable: bool = False, md5: bool = True,
                extra_meta: bool = False) -> bytes:
    """Minimal spec-driven FLAC encoder for fixtures.  ``x`` is (n, ch)
    int; stereo in {independent, left_side, right_side, mid_side}."""
    x = np.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    n, ch = x.shape
    out = bytearray(b"fLaC")
    si = _Bw()
    si.u(min(blocksize, n) if n else blocksize, 16)
    si.u(blocksize, 16)
    si.u(0, 24)
    si.u(0, 24)
    si.u(rate, 20)
    si.u(ch - 1, 3)
    si.u(bits - 1, 5)
    si.u(n, 36)
    body = si.bytes()
    if md5:
        nbytes = (bits + 7) // 8
        raw = bytearray()
        for v in x.reshape(-1).tolist():
            raw += int(v & ((1 << (8 * nbytes)) - 1)).to_bytes(nbytes, "little")
        body += hashlib.md5(bytes(raw)).digest()
    else:
        body += b"\x00" * 16
    last = 0x00 if extra_meta else 0x80
    out += bytes([last | 0]) + len(body).to_bytes(3, "big") + body
    if extra_meta:
        pad = b"\x00" * 10
        out += bytes([0x80 | 1]) + len(pad).to_bytes(3, "big") + pad

    frame_no = 0
    pos = 0
    while pos < n:
        bs = min(blocksize, n - pos)
        blk = x[pos : pos + bs]
        w = _Bw()
        w.u(0x3FFE, 14)
        w.u(0, 1)
        w.u(1 if variable else 0, 1)
        bs_code = _BS_CODES.get(bs)
        if bs_code is None:
            bs_code = 6 if bs <= 256 else 7
        w.u(bs_code, 4)
        sr_code = _SR_CODES.get(rate)
        if sr_code is None:
            sr_code = 13 if rate <= 0xFFFF else 12
        w.u(sr_code, 4)
        if stereo == "independent" or ch != 2:
            assert stereo == "independent"
            ch_asgn = ch - 1
            subs = [(blk[:, c].tolist(), bits) for c in range(ch)]
        else:
            left = blk[:, 0].astype(np.int64)
            right = blk[:, 1].astype(np.int64)
            side = (left - right).tolist()
            if stereo == "left_side":
                ch_asgn = 8
                subs = [(left.tolist(), bits), (side, bits + 1)]
            elif stereo == "right_side":
                ch_asgn = 9
                subs = [(side, bits + 1), (right.tolist(), bits)]
            else:
                ch_asgn = 10
                mid = ((left + right) >> 1).tolist()
                subs = [(mid, bits), (side, bits + 1)]
        w.u(ch_asgn, 4)
        w.u(_SS_CODES[bits], 3)
        w.u(0, 1)
        _utf8_enc(w, pos if variable else frame_no)
        if bs_code == 6:
            w.u(bs - 1, 8)
        elif bs_code == 7:
            w.u(bs - 1, 16)
        if sr_code == 12:
            w.u(rate // 1000, 8)
        elif sr_code == 13:
            w.u(rate, 16)
        w.align()
        hdr = w.bytes()
        w = _Bw()
        for data, bps in subs:
            _write_subframe(
                w, data, bps, mode=mode, order=order,
                porder=porder if bs % (1 << porder) == 0 else 0,
                lpc=lpc, wasted=wasted, rice2=rice2, escape=escape,
            )
        w.align()
        frame = hdr + bytes([_crc8(hdr)]) + w.bytes()
        out += frame + _crc16(frame).to_bytes(2, "big")
        pos += bs
        frame_no += 1
    return bytes(out)


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


def _pcm(n: int, ch: int, bits: int, seed: int = 7) -> np.ndarray:
    """Smooth-ish signal (sine + noise) so fixed/LPC predictors engage."""
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    lim = 1 << (bits - 1)
    base = (0.4 * lim) * np.sin(t / 12.0)
    x = np.stack(
        [
            np.clip(
                base * (c + 1) / ch
                + rng.integers(-lim // 64, lim // 64, size=n),
                -lim,
                lim - 1,
            )
            for c in range(ch)
        ],
        axis=1,
    )
    return x.astype(np.int64)


def _assert_exact(d: dict, x: np.ndarray, rate: int, bits: int) -> None:
    n, ch = x.shape
    assert (d["sample_rate"], d["channels"], d["bits"], d["n_frames"]) == (
        rate, ch, bits, n,
    )
    got = np.frombuffer(d["samples"], dtype=np.float32).reshape(n, ch)
    want = (x.astype(np.float32) / np.float32(1 << (bits - 1)))
    assert np.array_equal(got, want)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("bits", [8, 12, 16, 20, 24, 32])
def test_roundtrip_bit_depths(bits):
    x = _pcm(700, 1, bits)
    d = decode_flac(encode_flac(x, 8000, bits))
    _assert_exact(d, x, 8000, bits)


@pytest.mark.parametrize("stereo", ["independent", "left_side", "right_side", "mid_side"])
def test_roundtrip_stereo_modes(stereo):
    x = _pcm(600, 2, 16)
    d = decode_flac(encode_flac(x, 44100, 16, stereo=stereo))
    _assert_exact(d, x, 44100, 16)


@pytest.mark.parametrize("mode,order", [
    ("constant", None), ("verbatim", None),
    ("fixed", 0), ("fixed", 1), ("fixed", 2), ("fixed", 3), ("fixed", 4),
])
def test_roundtrip_subframe_types(mode, order):
    if mode == "constant":
        x = np.full((500, 1), -1234, dtype=np.int64)
    else:
        x = _pcm(500, 1, 16)
    d = decode_flac(encode_flac(x, 16000, 16, mode=mode, order=order))
    _assert_exact(d, x, 16000, 16)


@pytest.mark.parametrize("lpc", [
    ([3443, -1561], 13, 11),       # order 2, near (2, -1) scaled
    ([1024], 12, 10),              # order 1 identity-ish
    ([900, 500, -300, 100, -50, 25, -12, 6], 11, 10),  # order 8
])
def test_roundtrip_lpc(lpc):
    x = _pcm(640, 1, 16)
    d = decode_flac(encode_flac(x, 32000, 16, mode="lpc", lpc=lpc))
    _assert_exact(d, x, 32000, 16)


@pytest.mark.parametrize("porder", [0, 1, 2, 3])
def test_roundtrip_partition_orders(porder):
    x = _pcm(512, 1, 16)
    d = decode_flac(
        encode_flac(x, 48000, 16, blocksize=256, mode="fixed", porder=porder)
    )
    _assert_exact(d, x, 48000, 16)


def test_roundtrip_rice2_and_escape():
    x = _pcm(512, 1, 24)
    d = decode_flac(encode_flac(x, 96000, 24, mode="fixed", rice2=True))
    _assert_exact(d, x, 96000, 24)
    d = decode_flac(encode_flac(x, 96000, 24, mode="fixed", escape=True, porder=1))
    _assert_exact(d, x, 96000, 24)


def test_roundtrip_wasted_bits():
    x = (_pcm(400, 1, 12) << 4)  # 16-bit samples with 4 zeroed LSBs
    d = decode_flac(encode_flac(x, 22050, 16, wasted=4))
    _assert_exact(d, x, 22050, 16)


def test_roundtrip_blocksize_codes_and_final_short_block():
    # table code (192), 8-bit code (200), 16-bit code (1000); the last
    # block of each stream is shorter than the rest
    for bs, n in [(192, 500), (200, 650), (1000, 2500), (576, 1300)]:
        x = _pcm(n, 1, 16, seed=bs)
        d = decode_flac(encode_flac(x, 44100, 16, blocksize=bs))
        _assert_exact(d, x, 44100, 16)


def test_roundtrip_uncommon_rate_and_variable_blocking():
    x = _pcm(700, 2, 16)
    d = decode_flac(encode_flac(x, 12345, 16, blocksize=256, variable=True))
    _assert_exact(d, x, 12345, 16)


def test_roundtrip_many_frames_multibyte_utf8_number():
    # >128 frames forces the 2-byte extended-UTF-8 frame number
    x = _pcm(192 * 130, 1, 8, seed=3)
    d = decode_flac(encode_flac(x, 8000, 8, blocksize=192))
    _assert_exact(d, x, 8000, 8)


def test_extra_metadata_blocks_skipped():
    x = _pcm(300, 1, 16)
    d = decode_flac(encode_flac(x, 8000, 16, extra_meta=True))
    _assert_exact(d, x, 8000, 16)


def test_golden_hand_assembled_constant_and_fixed1():
    """Independent of the encoder above: a 2-frame mono 8-bit stream
    hand-assembled bit by bit — frame 1 CONSTANT(5) x4, frame 2 FIXED
    order 1 with warmup 10 and rice(k=0) residuals [+1, -2, +1] ->
    samples [10, 11, 9, 10]."""
    w = _Bw()
    w.u(min(4, 8), 16); w.u(4, 16)  # min/max blocksize 4
    w.u(0, 24); w.u(0, 24)
    w.u(8000, 20); w.u(0, 3); w.u(7, 5)  # mono, 8-bit
    w.u(8, 36)
    body = w.bytes() + b"\x00" * 16  # md5 unset -> skipped
    stream = bytearray(b"fLaC") + bytes([0x80]) + len(body).to_bytes(3, "big") + body

    def frame(build_sub, frame_no):
        h = _Bw()
        h.u(0x3FFE, 14); h.u(0, 1); h.u(0, 1)
        h.u(6, 4)          # 8-bit blocksize-1 follows
        h.u(4, 4)          # rate code 4 = 8000
        h.u(0, 4)          # mono
        h.u(1, 3)          # 8-bit
        h.u(0, 1)
        h.u(frame_no, 8)   # utf8 < 0x80
        h.u(3, 8)          # blocksize-1
        hdr = h.bytes()
        b = _Bw()
        build_sub(b)
        b.align()
        f = hdr + bytes([_crc8(hdr)]) + b.bytes()
        return f + _crc16(f).to_bytes(2, "big")

    def sub_const(b):
        b.u(0, 1); b.u(0, 6); b.u(0, 1)
        b.s(5, 8)

    def sub_fixed1(b):
        b.u(0, 1); b.u(9, 6); b.u(0, 1)  # FIXED order 1
        b.s(10, 8)                        # warmup
        b.u(0, 2)                         # rice method 0
        b.u(0, 4)                         # partition order 0
        b.u(0, 4)                         # k = 0
        for z in (2, 3, 2):               # zigzag of +1, -2, +1
            b.unary(z)

    stream += frame(sub_const, 0) + frame(sub_fixed1, 1)
    d = decode_flac(bytes(stream))
    got = np.frombuffer(d["samples"], dtype=np.float32) * 128.0
    assert got.tolist() == [5, 5, 5, 5, 10, 11, 9, 10]
    assert d["n_frames"] == 8 and d["sample_rate"] == 8000


def test_md5_verified_and_tamper_detected():
    x = _pcm(300, 2, 16)
    b = bytearray(encode_flac(x, 8000, 16))
    decode_flac(bytes(b))  # md5 present and verified
    # flip one bit inside the md5 field (STREAMINFO bytes 8..42; md5 is
    # the last 16 bytes of the 34-byte block starting at offset 8)
    b[8 + 18] ^= 0x01
    with pytest.raises(ValueError, match="MD5|CRC|FLAC"):
        decode_flac(bytes(b))


def test_crc_tamper_detected():
    x = _pcm(300, 1, 16)
    good = encode_flac(x, 8000, 16, md5=False)
    # flip a bit in the last frame's CRC-16
    b = bytearray(good)
    b[-1] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac(bytes(b))


def test_not_flac_and_truncations_loud():
    x = _pcm(300, 1, 16)
    good = encode_flac(x, 8000, 16)
    with pytest.raises(ValueError, match="fLaC"):
        decode_flac(b"RIFF" + good[4:])
    for cut in (3, 10, 40, 60, len(good) - 3):
        with pytest.raises(ValueError):
            decode_flac(good[:cut])


def test_registry_and_audio_features(spark):
    """audio/flac dispatches through the multimodal registry and the
    Spark audio_features path end-to-end, matching the WAV decode of the
    same PCM bit-exactly."""
    from sequila_spark.operators.multimodal import audio_features
    from sequila_spark.sources.audio import decode_wav
    from tests.test_audio_codec import _wav

    x = _pcm(2000, 2, 16)
    flac = encode_flac(x, 16000, 16, stereo="mid_side")
    wav = _wav(1, 16, 16000, 2, x.astype("<i2").tobytes())
    d_f, d_w = decode_flac(flac), decode_wav(wav)
    assert d_f["samples"] == d_w["samples"]

    df = spark.createDataFrame(
        [(1, "audio/flac", bytearray(flac)), (2, "audio/wav", bytearray(wav))],
        "doc_id LONG, media_type STRING, payload BINARY",
    )
    rows = {r["doc_id"]: r for r in audio_features(df).collect()}
    assert rows[1]["n_frames"] == rows[2]["n_frames"] == 2000
    assert rows[1]["rms"] == rows[2]["rms"]
    assert rows[1]["peak"] == rows[2]["peak"]
    assert rows[1]["duration_s"] == pytest.approx(0.125)


def test_roundtrip_multichannel():
    """FLAC supports up to 8 independent channels (assignment codes 0-7);
    4- and 8-channel streams roundtrip sample-exact."""
    for ch in (4, 8):
        x = _pcm(400, ch, 16, seed=ch)
        d = decode_flac(encode_flac(x, 48000, 16))
        _assert_exact(d, x, 48000, 16)

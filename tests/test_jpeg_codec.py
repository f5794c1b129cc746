"""Native baseline JPEG decode (sources/jpeg.py) — a spec-faithful
encoder built here (exact float FDCT, canonical Huffman, real marker
segments, 0xFF stuffing, optional restart markers and 4:2:0 subsampling)
generates fixtures whose roundtrip behavior is PROVABLE: with all-ones
quant tables, blocks that are constant (per 8x8, or per 16x16 under
4:2:0) decode back EXACTLY (DC-only spectra quantize losslessly), and
arbitrary content is bounded by the coefficient-rounding envelope.  The
decoder also runs end-to-end through multimodal.resize_images on Spark."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sequila_spark.sources.jpeg import _IDCT_B, _ZIGZAG, decode_jpeg

# --- encoder ------------------------------------------------------------------

_DC_SYMS = bytes(range(12))
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12  # all 12 DC size symbols at 4 bits
_AC_SYMS = bytes(
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [n << 4 for n in range(1, 15)]  # EOBn (progressive EOB runs)
)
_AC_COUNTS = [0] * 7 + [len(_AC_SYMS)] + [0] * 8  # all AC symbols at 8 bits


def _canon_codes(counts, symbols):
    codes = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _canon_codes(_DC_COUNTS, _DC_SYMS)
_AC_CODES = _canon_codes(_AC_COUNTS, _AC_SYMS)

# 12-bit tables: DC categories reach 15 (T.81 F.1.2.1.1), AC sizes 14
_DC12_SYMS = bytes(range(16))
_DC12_COUNTS = [0, 0, 0, 0, 16] + [0] * 11  # 16 symbols at 5 bits
_AC12_SYMS = bytes(
    [0x00, 0xF0]
    + [(r << 4) | sz for r in range(16) for sz in range(1, 15)]
    + [n << 4 for n in range(1, 15)]
)
_AC12_COUNTS = [0] * 7 + [len(_AC12_SYMS)] + [0] * 8  # 240 at 8 bits
_DC12_CODES = _canon_codes(_DC12_COUNTS, _DC12_SYMS)
_AC12_CODES = _canon_codes(_AC12_COUNTS, _AC12_SYMS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)


def _fdct_quant(plane: np.ndarray, q: np.ndarray, center: float = 128.0) -> np.ndarray:
    """plane (H, W) uint -> (n_blocks, 64) int32 quantized coefficients,
    raster order within the block; H, W multiples of 8."""
    h, w = plane.shape
    f = plane.astype(np.float64) - center
    blocks = (
        f.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    coef = np.einsum("ux,nxy,vy->nuv", _IDCT_B, blocks, _IDCT_B)
    qr = np.zeros(64)
    qr[_ZIGZAG] = q  # q given in zigzag order
    return np.round(coef.reshape(-1, 64) / qr).astype(np.int32)


def _emit_block(wtr: _BitWriter, blk: np.ndarray, pred: int,
                dc_codes=_DC_CODES, ac_codes=_AC_CODES) -> int:
    dc = int(blk[0])
    diff = dc - pred
    s = abs(diff).bit_length()
    code, ln = dc_codes[s]
    wtr.put(code, ln)
    if s:
        wtr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    zz = blk[_ZIGZAG]
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            wtr.put(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        wtr.put(code, ln)
        wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        code, ln = ac_codes[0x00]
        wtr.put(code, ln)
    return dc


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _prep_components(planes, q, hv, subsample, center=128.0):
    """Pad planes to MCU coverage, subsample chroma when asked, and FDCT-
    quantize -> [(coef (n_blocks, 64) raster order, blocks_per_row), ...]."""
    h, w = planes[0].shape
    nc = len(planes)
    hmax = max(x for x, _ in hv[:nc])
    vmax = max(y for _, y in hv[:nc])

    def pad(p, mh, mw):
        ph = -(-p.shape[0] // mh) * mh
        pw = -(-p.shape[1] // mw) * mw
        out = np.empty((ph, pw), dtype=p.dtype)
        out[: p.shape[0], : p.shape[1]] = p
        out[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        out[:, p.shape[1] :] = out[:, p.shape[1] - 1 : p.shape[1]]
        return out

    comp_blocks = []
    for k in range(nc):
        p = planes[k]
        if subsample and nc == 3 and k > 0:
            pp = pad(p, 2, 2).astype(np.float64)
            p = np.round(
                (pp[0::2, 0::2] + pp[0::2, 1::2] + pp[1::2, 0::2] + pp[1::2, 1::2])
                / 4.0
            ).astype(planes[k].dtype)
        # pad the plane so it covers whole MCUs at this component's scale
        need_h = -(-h // (8 * vmax)) * 8 * hv[k][1]
        need_w = -(-w // (8 * hmax)) * 8 * hv[k][0]
        p = pad(p, 8, 8)
        if p.shape[0] < need_h or p.shape[1] < need_w:
            full = np.empty((need_h, need_w), dtype=p.dtype)
            full[: p.shape[0], : p.shape[1]] = p
            full[p.shape[0] :, : p.shape[1]] = p[-1:, :]
            full[:, p.shape[1] :] = full[:, p.shape[1] - 1 : p.shape[1]]
            p = full
        else:
            p = p[:need_h, :need_w]
        comp_blocks.append((_fdct_quant(p, q, center), p.shape[1] // 8))
    return comp_blocks, hmax, vmax


def encode_jpeg(
    planes: list[np.ndarray],
    q: np.ndarray | None = None,
    *,
    subsample: bool = False,
    restart_interval: int = 0,
    q16: bool = False,
    precision: int = 8,
) -> bytes:
    """Baseline JPEG encoder for fixtures.  ``planes`` = [gray] or
    [Y, Cb, Cr] full-resolution uint8 planes; with ``subsample`` the
    chroma planes are 2x2-mean downsampled (4:2:0).  ``q`` is one quant
    table in zigzag order (all components share it; default all-ones)."""
    if q is None:
        q = np.ones(64, dtype=np.int32)
    h, w = planes[0].shape
    nc = len(planes)
    hv = [(2, 2), (1, 1), (1, 1)] if (subsample and nc == 3) else [(1, 1)] * nc
    comp_blocks, hmax, vmax = _prep_components(
        planes, q, hv, subsample, center=float(1 << (precision - 1))
    )
    dc_codes, ac_codes = (
        (_DC12_CODES, _AC12_CODES) if precision == 12 else (_DC_CODES, _AC_CODES)
    )

    out = bytearray(b"\xff\xd8")
    if q16:
        body = bytes([0x10]) + np.asarray(q, dtype=">u2").tobytes()
    else:
        body = bytes([0x00]) + np.asarray(q, dtype=np.uint8).tobytes()
    out += _seg(0xDB, body)
    sof = struct.pack(">BHHB", precision, h, w, nc)
    for k in range(nc):
        sof += bytes([k + 1, (hv[k][0] << 4) | hv[k][1], 0])
    # 12-bit requires extended sequential (SOF1); baseline is 8-bit by spec
    out += _seg(0xC0 if precision == 8 else 0xC1, sof)
    if precision == 12:
        out += _seg(0xC4, bytes([0x00]) + bytes(_DC12_COUNTS) + _DC12_SYMS)
        out += _seg(0xC4, bytes([0x10]) + bytes(_AC12_COUNTS) + _AC12_SYMS)
    else:
        out += _seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMS)
        out += _seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS) + _AC_SYMS)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc]) + b"".join(bytes([k + 1, 0x00]) for k in range(nc)) + b"\x00\x3f\x00"
    out += _seg(0xDA, sos)

    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    wtr = _BitWriter()
    preds = [0] * nc
    rst = 0
    mcu_seen = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_seen and mcu_seen % restart_interval == 0:
                wtr.flush()
                wtr.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * nc
            for k in range(nc):
                coef, bw = comp_blocks[k]
                for by in range(hv[k][1]):
                    for bx in range(hv[k][0]):
                        idx = (my * hv[k][1] + by) * bw + mx * hv[k][0] + bx
                        preds[k] = _emit_block(
                            wtr, coef[idx], preds[k], dc_codes, ac_codes
                        )
            mcu_seen += 1
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_progressive(
    planes: list[np.ndarray],
    q: np.ndarray | None = None,
    *,
    subsample: bool = False,
    al: int = 1,
    ac_bands: tuple = ((1, 63),),
    precision: int = 8,
) -> bytes:
    """Progressive (SOF2) encoder for fixtures, mirroring libjpeg's scan
    discipline: DC first (interleaved, point transform ``al``), DC refine
    scans down to 0, then per-component AC first + AC refine scans per
    spectral band, with EOB-run accumulation and buffered correction
    bits.  Coefficients reaching the decoder are EXACTLY the baseline
    encoder's quantized values, so progressive-vs-baseline decode
    equality is a full-pipeline pin."""
    if q is None:
        q = np.ones(64, dtype=np.int32)
    h, w = planes[0].shape
    nc = len(planes)
    hv = [(2, 2), (1, 1), (1, 1)] if (subsample and nc == 3) else [(1, 1)] * nc
    comp_blocks, hmax, vmax = _prep_components(
        planes, q, hv, subsample, center=float(1 << (precision - 1))
    )
    dc_codes, ac_codes = (
        (_DC12_CODES, _AC12_CODES) if precision == 12 else (_DC_CODES, _AC_CODES)
    )
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + np.asarray(q, dtype=np.uint8).tobytes())
    sof = struct.pack(">BHHB", precision, h, w, nc)
    for k in range(nc):
        sof += bytes([k + 1, (hv[k][0] << 4) | hv[k][1], 0])
    out += _seg(0xC2, sof)
    if precision == 12:
        out += _seg(0xC4, bytes([0x00]) + bytes(_DC12_COUNTS) + _DC12_SYMS)
        out += _seg(0xC4, bytes([0x10]) + bytes(_AC12_COUNTS) + _AC12_SYMS)
    else:
        out += _seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + _DC_SYMS)
        out += _seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS) + _AC_SYMS)

    def sos(comp_ids, ss, se, ah, al_):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid + 1, 0x00])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al_]))

    # --- DC first: interleaved, point transform al ---
    out += sos(list(range(nc)), 0, 0, 0, al)
    wtr = _BitWriter()
    preds = [0] * nc
    for my in range(mcuy):
        for mx in range(mcux):
            for k in range(nc):
                coef, bw = comp_blocks[k]
                for by in range(hv[k][1]):
                    for bx in range(hv[k][0]):
                        idx = (my * hv[k][1] + by) * bw + mx * hv[k][0] + bx
                        v = int(coef[idx][0]) >> al  # arithmetic shift
                        diff = v - preds[k]
                        preds[k] = v
                        s = abs(diff).bit_length()
                        code, ln = dc_codes[s]
                        wtr.put(code, ln)
                        if s:
                            wtr.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    wtr.flush()
    out += wtr.out

    # --- DC refine scans: one appended bit per block per level ---
    for level in range(al - 1, -1, -1):
        out += sos(list(range(nc)), 0, 0, level + 1, level)
        wtr = _BitWriter()
        for my in range(mcuy):
            for mx in range(mcux):
                for k in range(nc):
                    coef, bw = comp_blocks[k]
                    for by in range(hv[k][1]):
                        for bx in range(hv[k][0]):
                            idx = (my * hv[k][1] + by) * bw + mx * hv[k][0] + bx
                            wtr.put((int(coef[idx][0]) >> level) & 1, 1)
        wtr.flush()
        out += wtr.out

    # non-interleaved AC scans run over the component's UNPADDED grid
    def ac_block_indices(k):
        coef, bw = comp_blocks[k]
        cw = -(-(w * hv[k][0]) // hmax)
        ch = -(-(h * hv[k][1]) // vmax)
        nw, nh = -(-cw // 8), -(-ch // 8)
        return [by * bw + bx for by in range(nh) for bx in range(nw)]

    # --- AC first scans: per component, per band, point transform al ---
    for k in range(nc):
        coef, _bw = comp_blocks[k]
        for lo, hi in ac_bands:
            out += sos([k], lo, hi, 0, al)
            wtr = _BitWriter()
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                if eobrun:
                    n = eobrun.bit_length() - 1
                    code, ln = ac_codes[n << 4]
                    wtr.put(code, ln)
                    if n:
                        wtr.put(eobrun - (1 << n), n)
                    eobrun = 0

            for idx in ac_block_indices(k):
                zzvals = coef[idx][_ZIGZAG]
                vals = [
                    (int(v) >> al) if v >= 0 else -((-int(v)) >> al)
                    for v in zzvals[lo : hi + 1]
                ]  # AC point transform shifts the MAGNITUDE (toward zero)
                if not any(vals):
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                last_nz = max(j for j, v in enumerate(vals) if v)
                for j, v in enumerate(vals):
                    if j > last_nz:
                        break
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]
                        wtr.put(code, ln)
                        run -= 16
                    s = abs(v).bit_length()
                    code, ln = ac_codes[(run << 4) | s]
                    wtr.put(code, ln)
                    wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < len(vals) - 1:
                    eobrun += 1  # trailing zeros -> this block ends in EOB
                    if eobrun == 0x7FFF:
                        flush_eob()
            flush_eob()
            wtr.flush()
            out += wtr.out

    # --- AC refine scans (libjpeg encode_mcu_AC_refine discipline) ---
    for level in range(al - 1, -1, -1):
        for k in range(nc):
            coef, _bw = comp_blocks[k]
            for lo, hi in ac_bands:
                out += sos([k], lo, hi, level + 1, level)
                wtr = _BitWriter()
                eobrun = 0
                pend: list[int] = []  # correction bits owed to EOB runs

                def flush_eob_r():
                    nonlocal eobrun, pend
                    if eobrun:
                        n = eobrun.bit_length() - 1
                        code, ln = ac_codes[n << 4]
                        wtr.put(code, ln)
                        if n:
                            wtr.put(eobrun - (1 << n), n)
                        for bit in pend:
                            wtr.put(bit, 1)
                        eobrun = 0
                        pend = []

                for idx in ac_block_indices(k):
                    zzvals = coef[idx][_ZIGZAG][lo : hi + 1]
                    absv = [abs(int(v)) >> level for v in zzvals]
                    eob_pos = -1
                    for j, t in enumerate(absv):
                        if t == 1:
                            eob_pos = j
                    run = 0
                    br: list[int] = []
                    for j, t in enumerate(absv):
                        if t == 0:
                            run += 1
                            continue
                        if t > 1:  # history: correction bit
                            br.append(t & 1)
                            continue
                        # newly nonzero at this level
                        while run > 15 and j <= eob_pos:
                            flush_eob_r()
                            code, ln = ac_codes[0xF0]
                            wtr.put(code, ln)
                            run -= 16
                            for bit in br:
                                wtr.put(bit, 1)
                            br = []
                        flush_eob_r()
                        code, ln = ac_codes[(run << 4) | 1]
                        wtr.put(code, ln)
                        wtr.put(1 if int(zzvals[j]) > 0 else 0, 1)
                        run = 0
                        for bit in br:
                            wtr.put(bit, 1)
                        br = []
                    if run > 0 or br:
                        eobrun += 1
                        pend.extend(br)
                        if eobrun == 0x7FFF:
                            flush_eob_r()
                flush_eob_r()
                wtr.flush()
                out += wtr.out

    out += b"\xff\xd9"
    return bytes(out)


def _ycbcr_to_rgb(y, cb, cr):
    y = y.astype(np.float64)
    cb = cb.astype(np.float64) - 128.0
    cr = cr.astype(np.float64) - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- tests --------------------------------------------------------------------


def _block_constant_image(rng, h, w, cell):
    vals = rng.integers(0, 256, size=(-(-h // cell), -(-w // cell)), dtype=np.uint8)
    return vals.repeat(cell, axis=0).repeat(cell, axis=1)[:h, :w]


def test_grayscale_constant_blocks_exact():
    """Per-8x8-constant content has a DC-only spectrum: with q=1 the
    roundtrip is bit-exact — pins marker walk, Huffman, dequant, IDCT."""
    rng = np.random.default_rng(5)
    img = _block_constant_image(rng, 32, 48, 8)
    d = decode_jpeg(encode_jpeg([img]))
    assert (d["width"], d["height"], d["channels"]) == (48, 32, 1)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(32, 48)
    assert np.array_equal(got, img)


def test_grayscale_arbitrary_content_bounded():
    """Arbitrary content at q=1: error is only coefficient rounding
    (<= 0.5/coef), whose IDCT envelope stays under ~4 + output rounding."""
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    d = decode_jpeg(encode_jpeg([img]))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(24, 24)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 5


def test_non_multiple_of_8_dimensions():
    rng = np.random.default_rng(7)
    img = _block_constant_image(rng, 19, 13, 8)
    d = decode_jpeg(encode_jpeg([img]))
    assert (d["width"], d["height"]) == (13, 19)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(19, 13)
    assert np.array_equal(got, img)


def test_color_444_exact_vs_conversion_golden():
    """YCbCr 4:4:4 with per-8x8-constant planes: coefficient path is
    exact, so the decoded RGB must equal the BT.601 conversion computed
    independently here."""
    rng = np.random.default_rng(8)
    y = _block_constant_image(rng, 16, 16, 8)
    cb = _block_constant_image(rng, 16, 16, 8)
    cr = _block_constant_image(rng, 16, 16, 8)
    d = decode_jpeg(encode_jpeg([y, cb, cr]))
    assert d["channels"] == 3
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(16, 16, 3)
    assert np.array_equal(got, _ycbcr_to_rgb(y, cb, cr))


def test_color_420_subsampled_exact_on_16x16_cells():
    """4:2:0: chroma is 2x2-mean downsampled; on per-16x16-constant
    planes the mean is exact and replication-upsampling restores it, so
    the decode equals the conversion golden exactly — pins the sampling-
    factor MCU interleave and the upsample path."""
    rng = np.random.default_rng(9)
    y = _block_constant_image(rng, 32, 32, 16)
    cb = _block_constant_image(rng, 32, 32, 16)
    cr = _block_constant_image(rng, 32, 32, 16)
    d = decode_jpeg(encode_jpeg([y, cb, cr], subsample=True))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(32, 32, 3)
    assert np.array_equal(got, _ycbcr_to_rgb(y, cb, cr))


def test_restart_markers():
    rng = np.random.default_rng(10)
    img = _block_constant_image(rng, 16, 64, 8)
    d = decode_jpeg(encode_jpeg([img], restart_interval=3))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(16, 64)
    assert np.array_equal(got, img)


def test_16bit_quant_table_and_lossy_quality():
    """A real (Annex-K-like) quant table through the 16-bit DQT path:
    lossy but bounded — and dimensions/channels survive."""
    rng = np.random.default_rng(11)
    img = _block_constant_image(rng, 24, 24, 8)
    q = np.array(
        [16, 11, 10, 16, 24, 40, 51, 61] + [60] * 56, dtype=np.int32
    )
    d = decode_jpeg(encode_jpeg([img], q=q, q16=True))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(24, 24)
    # constant blocks: only DC quantization error, <= q[0]/2 per block
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 8 // 2 + 1 + q[0] // 16


def test_corrupt_and_unsupported_are_loud():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    rng = np.random.default_rng(12)
    img = _block_constant_image(rng, 8, 8, 8)
    good = bytearray(encode_jpeg([img]))
    # flip SOF0 -> SOF3 (lossless sequential: genuinely unsupported;
    # SOF2 progressive is supported since the progressive-scan engine)
    i = bytes(good).index(b"\xff\xc0")
    good[i + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="0xc3"):
        decode_jpeg(bytes(good))
    with pytest.raises(ValueError):
        decode_jpeg(encode_jpeg([img])[:30])


def test_jpeg_through_spark_resize(spark):
    """End-to-end: a real baseline JPEG decoded + resized through
    multimodal.resize_images via the DEFAULT image/jpeg registry entry
    (default entries exist in every Python worker; only custom decoders
    need per-worker registration)."""
    from sequila_spark.operators import multimodal as MM

    rng = np.random.default_rng(13)
    y = _block_constant_image(rng, 16, 24, 8)
    cb = _block_constant_image(rng, 16, 24, 8)
    cr = _block_constant_image(rng, 16, 24, 8)
    payload = encode_jpeg([y, cb, cr])
    media = spark.createDataFrame(
        [(3, bytearray(payload), "image/jpeg", len(payload))],
        "doc_id long, payload binary, media_type string, byte_len int",
    )
    out = MM.resize_images(media, 6, 4).collect()
    assert (out[0]["width"], out[0]["height"], out[0]["channels"]) == (6, 4, 3)
    full = _ycbcr_to_rgb(y, cb, cr)
    yi = (np.arange(4) * 16) // 4
    xi = (np.arange(6) * 24) // 6
    golden = full[yi[:, None], xi[None, :], :]
    got = np.frombuffer(out[0]["pixels"], dtype=np.uint8).reshape(4, 6, 3)
    assert np.array_equal(got, golden)


def test_fill_bytes_before_markers_accepted():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker —
    real encoders emit such padding (code-review regression)."""
    rng = np.random.default_rng(14)
    img = _block_constant_image(rng, 8, 8, 8)
    good = encode_jpeg([img])
    # insert fill bytes before the DQT marker (right after SOI)
    padded = good[:2] + b"\xff\xff\xff" + good[2:]
    d = decode_jpeg(padded)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(8, 8)
    assert np.array_equal(got, img)


def test_oversize_dimensions_rejected_before_allocation():
    """The guard bounds PEAK allocation (float64 intermediates ~16x the
    output), not just the final pixel buffer."""
    rng = np.random.default_rng(15)
    img = _block_constant_image(rng, 8, 8, 8)
    good = bytearray(encode_jpeg([img]))
    i = bytes(good).index(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) h(2) w(2) -> patch h, w to 24000x24000
    struct.pack_into(">HH", good, i + 5, 24000, 24000)
    with pytest.raises(ValueError, match="implausible"):
        decode_jpeg(bytes(good))


# --- progressive (SOF2) ---------------------------------------------------


def test_progressive_equals_baseline_grayscale():
    """Progressive and baseline encodings carry the IDENTICAL quantized
    coefficients, so the decodes must be bit-equal — pins DC first/refine
    and AC first/refine incl. EOB runs and correction bits, on both a
    block-constant image (EOB-run heavy) and arbitrary content."""
    rng = np.random.default_rng(31)
    for img in (
        _block_constant_image(rng, 32, 40, 8),
        rng.integers(0, 256, size=(24, 24), dtype=np.uint8),
    ):
        base = decode_jpeg(encode_jpeg([img]))
        prog = decode_jpeg(encode_jpeg_progressive([img], al=1))
        assert prog["channels"] == 1
        assert prog["pixels"] == base["pixels"], img.shape


def test_progressive_equals_baseline_color_420_odd_dims():
    """4:2:0 progressive with dims not a multiple of 16: the DC scan is
    interleaved over padded MCUs while AC scans walk each component's
    UNPADDED grid — the path real progressive files exercise."""
    rng = np.random.default_rng(32)
    planes = [rng.integers(0, 256, size=(19, 13), dtype=np.uint8) for _ in range(3)]
    base = decode_jpeg(encode_jpeg(planes, subsample=True))
    prog = decode_jpeg(encode_jpeg_progressive(planes, subsample=True, al=1))
    assert prog["pixels"] == base["pixels"]


def test_progressive_spectral_bands_and_deeper_approximation():
    """Two spectral bands (1-5, 6-63) and a 2-level successive
    approximation (al=2: one first + two refine scans per band)."""
    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg([img]))
    prog = decode_jpeg(
        encode_jpeg_progressive([img], al=2, ac_bands=((1, 5), (6, 63)))
    )
    assert prog["pixels"] == base["pixels"]


def test_progressive_no_approximation_bands_only():
    """Spectral selection without successive approximation (al=0) — the
    simplest progressive shape some encoders emit."""
    rng = np.random.default_rng(34)
    planes = [rng.integers(0, 256, size=(16, 24), dtype=np.uint8) for _ in range(3)]
    base = decode_jpeg(encode_jpeg(planes))
    prog = decode_jpeg(
        encode_jpeg_progressive(planes, al=0, ac_bands=((1, 63),))
    )
    assert prog["pixels"] == base["pixels"]


def test_truncated_segment_header_raises_valueerror():
    """ADVICE r11: a payload whose fill-byte run ends within 2 bytes of
    EOF used to escape with struct.error from the length read; the codec
    contract is ValueError on any malformed input."""
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xff\xff\xdb")


def test_invalid_sos_progression_raises_valueerror():
    """ADVICE r11: corrupt progressive Ss/Se/Ah/Al (e.g. Se > 63) used to
    escape with IndexError from the AC-refine loop; the SOS parser must
    bound-check the progression fields (T.81 B.2.3)."""
    rng = np.random.default_rng(35)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    payload = bytearray(encode_jpeg_progressive([img]))
    # find each SOS (FFDA) and corrupt its Se byte to 255
    i = 0
    hit = False
    while True:
        j = payload.find(b"\xff\xda", i)
        if j < 0:
            break
        ns = payload[j + 4]
        se_pos = j + 4 + 1 + 2 * ns + 1
        if payload[se_pos] > 0:  # an AC scan: Se in 1..63
            payload[se_pos] = 255
            hit = True
            break
        i = j + 2
    assert hit, "no AC scan found in progressive fixture"
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))


def test_12bit_grayscale_constant_blocks_exact():
    """12-bit extended-sequential (SOF1): per-8x8-constant content is
    DC-only, so with q=1 the decode is exact at 12 bits; the output is
    the high byte (>>4), matching the 16-bit-PNG convention."""
    rng = np.random.default_rng(12)
    img = np.repeat(
        np.repeat(rng.integers(0, 4096, size=(4, 6), dtype=np.uint16), 8, 0),
        8, 1,
    )
    d = decode_jpeg(encode_jpeg([img], precision=12))
    assert (d["width"], d["height"], d["channels"]) == (48, 32, 1)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(32, 48)
    assert np.array_equal(got, (img >> 4).astype(np.uint8))


def test_12bit_grayscale_arbitrary_bounded():
    """Arbitrary 12-bit content at q=1: coefficient-rounding error only
    (IDCT envelope ~4 at 12-bit scale, well under one output LSB of 16)."""
    rng = np.random.default_rng(13)
    img = rng.integers(0, 4096, size=(24, 24), dtype=np.uint16)
    d = decode_jpeg(encode_jpeg([img], precision=12))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(24, 24)
    assert np.abs(got.astype(int) - (img >> 4).astype(int)).max() <= 1


def test_12bit_color_and_progressive():
    """12-bit YCbCr decodes through the same color path (scale-invariant
    BT.601 on the downscaled planes), and a 12-bit PROGRESSIVE stream
    decodes identically to its sequential twin (same quantized
    coefficients by construction)."""
    rng = np.random.default_rng(14)
    planes = [
        np.repeat(
            np.repeat(
                rng.integers(0, 4096, size=(3, 3), dtype=np.uint16), 8, 0
            ), 8, 1,
        )
        for _ in range(3)
    ]
    seq = decode_jpeg(encode_jpeg(planes, precision=12))
    prog = decode_jpeg(
        encode_jpeg_progressive(planes, precision=12, al=2)
    )
    assert seq["channels"] == 3
    assert seq["pixels"] == prog["pixels"]


def test_12bit_wide_dc_categories_roundtrip():
    """A black->white 12-bit step image forces DC diffs beyond the 8-bit
    category ceiling (11) — pins the widened T.81 F.1.2.1.1 DC range."""
    img = np.zeros((16, 32), dtype=np.uint16)
    img[:, 16:] = 4095  # DC diff = 8*4095 - 0 at the block boundary
    d = decode_jpeg(encode_jpeg([img], precision=12))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(16, 32)
    assert np.array_equal(got, (img >> 4).astype(np.uint8))


def test_baseline_sof0_must_be_8bit():
    rng = np.random.default_rng(15)
    img = rng.integers(0, 4096, size=(8, 8), dtype=np.uint16)
    b = bytearray(encode_jpeg([img], precision=12))
    i = b.find(b"\xff\xc1")
    b[i + 1] = 0xC0  # relabel SOF1 as baseline
    with pytest.raises(ValueError, match="baseline.*8-bit"):
        decode_jpeg(bytes(b))

"""Native baseline JPEG decode for the multimodal registry — zero new
dependencies.

Closes the biggest remaining media-codec stub (PARITY gap #3): baseline
sequential DCT JPEG (ITU-T T.81), the format virtually every scraped web
image uses.  Supported surface:

- SOI / APPn / COM / DQT (8- and 16-bit tables) / DHT / SOF0+SOF1 /
  SOS / DRI / RSTn / EOI marker walk;
- canonical Huffman decode of the entropy stream with 0xFF00 byte
  stuffing and restart-interval DC-predictor resets;
- 8x8 dequant + EXACT float IDCT (the T.81 Annex A.3.3 definition,
  evaluated as two NumPy tensor contractions over all blocks of a
  component at once — no fixed-point approximation error);
- grayscale (1 component) and YCbCr (3 components) with any h/v
  sampling factors up to 2 (4:4:4, 4:2:2, 4:4:0, 4:2:0), pixel-
  replication chroma upsampling, JFIF/BT.601 color conversion.

Progressive (SOF2) decodes too: multi-scan accumulation with spectral
selection, successive approximation (DC first/refine, AC first/refine
with EOB runs and correction bits, T.81 G.1.2), interleaved DC scans and
per-component unpadded block grids for non-interleaved AC scans.
12-bit sample precision decodes for extended-sequential (SOF1) and
progressive (SOF2) frames — wider DC categories (T.81 F.1.2.1.1 allows
0-15 at 12 bits), point transforms to 15, a 2^11 level shift — with the
output downscaled to the high 8 bits, the same convention the PNG
decoder applies to 16-bit samples.  Baseline (SOF0) is 8-bit BY SPEC;
arithmetic coding and hierarchical modes raise NotImplementedError by
name.  Returns the image contract
``{"width", "height", "channels", "pixels"}`` (pixels = row-major uint8,
RGB for color, 1 channel for grayscale).  Size fields are validated
before any allocation, mirroring image.py's guard.

The Huffman bit-walk is per-symbol Python (entropy decode is inherently
serial per scan segment); everything after the symbol stream — dequant,
zigzag, IDCT, upsample, color transform — is vectorized NumPy over all
blocks at once.
"""

from __future__ import annotations

import struct

import numpy as np

#: allocation guard: decoded RGB canvas must stay under 1 GiB
_MAX_PIXEL_BYTES = 1 << 30

#: zigzag order: index = scan position, value = position in the 8x8 block
_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# exact separable IDCT basis: B[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_IDCT_B = np.empty((8, 8))
for _u in range(8):
    _c = (0.5 / np.sqrt(2.0)) if _u == 0 else 0.5
    for _x in range(8):
        _IDCT_B[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


class _HuffTable:
    """Canonical JPEG Huffman table -> (maxcode/valptr) decode arrays
    (the T.81 F.2.2.3 DECODE procedure)."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.symbols = symbols
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            n = counts[ln - 1]
            self.valptr[ln] = k
            self.mincode[ln] = code
            self.maxcode[ln] = code + n - 1 if n else -1
            code = (code + n) << 1
            k += n


class _BitReader:
    """MSB-first entropy-stream reader: 0xFF00 unstuffs to 0xFF; any other
    marker ends the stream (RSTn are consumed by the caller)."""

    def __init__(self, b: bytes, i: int):
        self.b = b
        self.i = i
        self.acc = 0
        self.nbits = 0

    def at_marker(self) -> int | None:
        """Peek a marker at the current byte position (bit buffer empty)."""
        if self.i + 1 < len(self.b) and self.b[self.i] == 0xFF and self.b[self.i + 1] != 0:
            return self.b[self.i + 1]
        return None

    def align(self) -> None:
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.b
        while self.nbits <= 24:
            if self.i >= len(b):
                # past the end: pad with 1s (T.81 allows the final EOB to
                # rely on marker padding); a truly truncated stream still
                # fails the dimension checks downstream
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            byte = b[self.i]
            if byte == 0xFF:
                nxt = b[self.i + 1] if self.i + 1 < len(b) else 0xD9
                if nxt == 0x00:
                    self.i += 2
                else:  # a real marker: stop feeding, pad with 1s
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
            else:
                self.i += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def take(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, t: _HuffTable) -> int:
        code = self.take(1)
        for ln in range(1, 17):
            if t.maxcode[ln] >= code:
                return t.symbols[t.valptr[ln] + code - t.mincode[ln]]
            code = (code << 1) | self.take(1)
        raise ValueError("JPEG: invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if v < (1 << (s - 1)) else v


def decode_jpeg(b: bytes) -> dict:
    """Decode one baseline JPEG -> {width, height, channels, pixels}."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    comps: list[dict] = []
    w = h = 0
    restart_interval = 0
    progressive = False
    scanned = False

    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError(f"JPEG: expected marker at {i}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while i < len(b) and b[i] == 0xFF:
            i += 1
        if i >= len(b):
            raise ValueError("JPEG: truncated at fill bytes")
        m = b[i]
        i += 1
        if m == 0xD9:  # EOI
            break
        if m in (0x01,) or 0xD0 <= m <= 0xD7:
            continue  # parameterless
        if i + 2 > len(b):
            raise ValueError("JPEG: truncated segment header")
        (seg_len,) = struct.unpack_from(">H", b, i)
        seg = b[i + 2 : i + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("JPEG: truncated segment")
        i += seg_len
        if m == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq == 0:
                    tab = np.frombuffer(seg[j : j + 64], dtype=np.uint8).astype(np.int32)
                    j += 64
                else:
                    tab = np.frombuffer(seg[j : j + 128], dtype=">u2").astype(np.int32)
                    j += 128
                if len(tab) != 64:
                    raise ValueError("JPEG: truncated DQT")
                qt[tq] = tab
        elif m == 0xC4:  # DHT
            j = 0
            while j + 17 <= len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = list(seg[j + 1 : j + 17])
                n = sum(counts)
                symbols = seg[j + 17 : j + 17 + n]
                if len(symbols) != n:
                    raise ValueError("JPEG: truncated DHT")
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(counts, symbols)
                j += 17 + n
        elif m in (0xC0, 0xC1, 0xC2):  # baseline / ext. sequential / progressive
            progressive = m == 0xC2
            if len(seg) < 6:
                raise ValueError("JPEG: truncated SOF header")
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if len(seg) < 6 + 3 * nc:
                raise ValueError("JPEG: truncated SOF component list")
            if prec not in (8, 12):
                raise NotImplementedError(
                    f"JPEG precision {prec} (only 8 and 12)"
                )
            if prec == 12 and m == 0xC0:
                raise ValueError("JPEG baseline (SOF0) must be 8-bit")
            if nc not in (1, 3):
                raise NotImplementedError(f"JPEG with {nc} components")
            # the decode path holds float64 intermediates (coef blocks,
            # the einsum output, the stacked RGB) ~16x the final pixel
            # buffer — the guard bounds PEAK allocation, not just output
            if w == 0 or h == 0 or w * h * 3 * 16 > _MAX_PIXEL_BYTES:
                raise ValueError(f"implausible JPEG dimensions {w}x{h}")
            for k in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * k)
                hs, vs = hv >> 4, hv & 15
                if not (1 <= hs <= 2 and 1 <= vs <= 2):
                    raise NotImplementedError(f"JPEG sampling {hs}x{vs}")
                comps.append({"id": cid, "h": hs, "v": vs, "tq": tq})
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF marker 0x{m:02x} (baseline/progressive DCT only)"
            )
        elif m == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("JPEG: truncated DRI")
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xDA:  # SOS
            if not comps:
                raise ValueError("JPEG: SOS before SOF")
            if len(seg) < 1 or len(seg) < 4 + 2 * seg[0]:
                raise ValueError("JPEG: truncated SOS header")
            ns = seg[0]
            scan = []
            for k in range(ns):
                cs, tdta = seg[1 + 2 * k], seg[2 + 2 * k]
                matches = [c for c in comps if c["id"] == cs]
                if not matches:
                    raise ValueError(f"JPEG: scan references unknown component {cs}")
                comp = matches[0]
                comp["td"], comp["ta"] = tdta >> 4, tdta & 15
                scan.append(comp)
            ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 15
            # T.81 B.2.3: Ss/Se index the 64-entry zig-zag; Ah/Al are bit
            # positions (<=13 for 8-bit precision).  Unvalidated they escape
            # as IndexError deep in the AC-refine loop.
            albound = 13 if prec == 8 else 15
            if not (0 <= ss <= se <= 63) or ah > albound or al > albound:
                raise ValueError(
                    f"JPEG: invalid scan progression Ss={ss} Se={se} Ah={ah} Al={al}"
                )
            if not progressive:
                if len(scan) != len(comps):
                    raise NotImplementedError(
                        "JPEG sequential multi-scan (non-interleaved)"
                    )
                ss, se, ah, al = 0, 63, 0, 0
            elif len(scan) > 1 and ss != 0:
                raise ValueError("JPEG: interleaved progressive AC scan")
            if not scanned:
                _init_coefs(comps, qt, w, h)
                scanned = True
            i = _entropy_scan(
                b, i, scan, huff_dc, huff_ac, restart_interval,
                ss, se, ah, al, prec,
            )
        # APPn, COM: skipped
    if not scanned:
        raise ValueError("JPEG: no SOS marker")
    return _finish(comps, qt, w, h, prec)


def _init_coefs(comps, qt, w, h) -> None:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["bw"] = mcux * c["h"]  # blocks per row (incl. MCU padding)
        c["bh"] = mcuy * c["v"]
        c["mcux"], c["mcuy"] = mcux, mcuy
        # non-interleaved scans cover the UNPADDED per-component grid
        cw = -(-(w * c["h"]) // hmax)
        ch = -(-(h * c["v"]) // vmax)
        c["nw"] = -(-cw // 8)
        c["nh"] = -(-ch // 8)
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        if c["tq"] not in qt:
            raise ValueError(f"JPEG: missing quant table {c['tq']}")


def _entropy_scan(b, i, scan, huff_dc, huff_ac, restart_interval,
                  ss, se, ah, al, prec=8) -> int:
    """Decode one scan's entropy data (sequential full-band, progressive
    DC first/refine, AC first/refine with EOB runs — T.81 F.2 and G.1.2)
    into the components' coefficient arrays; returns the offset of the
    next marker."""
    r = _BitReader(b, i)
    zz = _ZIGZAG
    state = {"eobrun": 0}
    for c in scan:
        c["pred"] = 0

    def decode_block(c, blk):
        if ss == 0:
            td = huff_dc.get(c["td"])
            if ah == 0:
                if td is None:
                    raise ValueError("JPEG: missing DC Huffman table")
                s = r.huff(td)
                if s > (11 if prec == 8 else 15):  # T.81 F.1.2.1.1
                    raise ValueError("JPEG: bad DC size")
                diff = _extend(r.take(s), s) if s else 0
                c["pred"] += diff
                blk[0] = c["pred"] << al
            else:  # DC refine: one appended bit
                if r.take(1):
                    blk[0] |= 1 << al
            if se == 0:
                return
        ta = huff_ac.get(c["ta"])
        if ta is None:
            raise ValueError("JPEG: missing AC Huffman table")
        k = max(ss, 1)
        if ah == 0:  # AC first (sequential scans land here with al=0)
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
                return
            while k <= se:
                rs = r.huff(ta)
                rr, s = rs >> 4, rs & 15
                if s == 0:
                    if rr == 15:  # ZRL
                        k += 16
                        continue
                    if rr:  # EOBn: run of (1<<rr)+bits - 1 FURTHER blocks
                        state["eobrun"] = (1 << rr) - 1 + r.take(rr)
                    break  # EOB
                k += rr
                if k > se:
                    raise ValueError("JPEG: AC index overflow")
                blk[zz[k]] = _extend(r.take(s), s) << al
                k += 1
            return
        # AC refine (T.81 G.1.2.3 successive-approximation correction)
        p1, m1 = 1 << al, -1 << al
        if state["eobrun"] == 0:
            while k <= se:
                rs = r.huff(ta)
                rr, s = rs >> 4, rs & 15
                val = 0
                if s == 0:
                    if rr < 15:
                        state["eobrun"] = (1 << rr) + (r.take(rr) if rr else 0)
                        break
                    # ZRL: skip 16 zero-history positions (15 + landing)
                else:
                    if s != 1:
                        raise ValueError("JPEG: AC refine size != 1")
                    val = p1 if r.take(1) else m1
                while k <= se:
                    z = zz[k]
                    if blk[z] != 0:
                        if r.take(1) and (blk[z] & p1) == 0:
                            blk[z] += p1 if blk[z] >= 0 else m1
                    else:
                        if rr == 0:
                            break
                        rr -= 1
                    k += 1
                if val and k <= se:
                    blk[zz[k]] = val
                k += 1
        if state["eobrun"] > 0:
            # correction bits for the remaining nonzero history of this
            # block; the decrement covers it as the first EOB-run member
            while k <= se:
                z = zz[k]
                if blk[z] != 0:
                    if r.take(1) and (blk[z] & p1) == 0:
                        blk[z] += p1 if blk[z] >= 0 else m1
                k += 1
            state["eobrun"] -= 1

    def restart(unit_idx):
        if restart_interval and unit_idx and unit_idx % restart_interval == 0:
            r.align()
            mk = r.at_marker()
            if mk is not None and 0xD0 <= mk <= 0xD7:
                r.i += 2
            for c in scan:
                c["pred"] = 0
            state["eobrun"] = 0

    if len(scan) > 1:  # interleaved: MCU order over the scan's components
        mcux, mcuy = scan[0]["mcux"], scan[0]["mcuy"]
        unit = 0
        for my in range(mcuy):
            for mx in range(mcux):
                restart(unit)
                for c in scan:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            idx = (my * c["v"] + by) * c["bw"] + mx * c["h"] + bx
                            decode_block(c, c["coef"][idx])
                unit += 1
    else:  # non-interleaved: the component's own unpadded block grid
        c = scan[0]
        unit = 0
        for by in range(c["nh"]):
            for bx in range(c["nw"]):
                restart(unit)
                decode_block(c, c["coef"][by * c["bw"] + bx])
                unit += 1
    r.align()
    return r.i


def _finish(comps, qt, w, h, prec=8) -> dict:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    zz = _ZIGZAG

    # dequant + IDCT, all blocks of a component at once
    planes = []
    for c in comps:
        # DQT entries are in zigzag order like the coefficients; coef[] was
        # filled at raster positions zz[k], so scatter q the same way
        q = np.zeros(64, dtype=np.int64)
        q[zz] = qt[c["tq"]]
        # int64: a 12-bit coefficient (to +-32767) times a 16-bit quant
        # value overflows int32
        blocks = (
            (c["coef"].astype(np.int64) * q).astype(np.float64).reshape(-1, 8, 8)
        )
        # IDCT: out[x, y] = sum_u sum_v B[u, x] B[v, y] F[u, v]
        half, top = 1 << (prec - 1), (1 << prec) - 1
        pix = np.einsum("ux,nuv,vy->nxy", _IDCT_B, blocks, _IDCT_B)
        pix = np.clip(np.round(pix) + half, 0, top)
        # high-byte convention (like 16-bit PNG): output stays uint8
        pix = (pix.astype(np.uint16) >> (prec - 8)).astype(np.uint8)
        # stitch blocks -> plane
        bh, bw = c["bh"], c["bw"]
        plane = (
            pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution by pixel replication
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = plane.repeat(ry, axis=0).repeat(rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return {"width": w, "height": h, "channels": 1,
                "pixels": planes[0].tobytes()}
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    # color conversion runs on the already-downscaled 8-bit planes — the
    # BT.601 matrix is scale-invariant, so converting after the high-byte
    # reduction equals converting at 12 bits then reducing (to rounding)
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    rgb = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return {"width": w, "height": h, "channels": 3, "pixels": rgb.tobytes()}

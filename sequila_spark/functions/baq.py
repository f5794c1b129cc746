"""BAQ — Base Alignment Quality (Li, Bioinformatics 2011, 27(8):1157-8).

samtools mpileup applies BAQ by default (disabled only with ``-B``): each
read is profile-realigned against its reference window with a banded
glocal HMM, and every aligned base's quality is CAPPED by the phred-scaled
posterior that the base is truly aligned to its claimed position (bases
whose maximum-posterior state disagrees with the claimed diagonal drop to
0).  This module reimplements that behavior — the published algorithm and
the publicly documented htslib semantics (``sam_prob_realn`` /
``probaln_glocal``, non-extended mode), including its quirks:

* input phred qualities are floored at 3 for the emission model;
* the band width is ``min(max(l_ref, l_query), 10)`` raised to at least
  ``|l_ref - l_query|``;
* the reference window is the read's aligned span extended by half the
  *outer* band (7, or the cigar's net indel + 3) plus any soft-clip
  overhang on each side;
* reads whose cigar contains a reference skip (N) are left untouched;
* the cap applies only to M/=/X bases; the final phred is
  ``int(-4.343 * ln(1 - p_MAP) + .499)`` clamped to 99.

Matching the reference golden: ``tests/test_samtools_golden.py`` pins this
implementation (composed with the mate-overlap tweak) byte-exactly to
``samtools mpileup`` default-mode output on the multichrom MD BAM.

Scale: one read costs O(l_query * band) float64 ops — a few microseconds;
the engine applies it inside an Arrow-batched ``mapInPandas`` with a
per-executor contig cache, so it is map-only and shuffle-free.
"""

from __future__ import annotations

import math

__all__ = ["probaln_glocal", "baq_quals"]

_NT = {"A": 0, "C": 1, "G": 2, "T": 3, "a": 0, "c": 1, "g": 2, "t": 3}


def _code(ch: str) -> int:
    return _NT.get(ch, 4)


def probaln_glocal(
    ref: list[int],
    query: list[int],
    iqual: list[int],
    d: float = 1e-3,
    e: float = 0.1,
    maxbw: int = 10,
) -> tuple[list[int], list[int]]:
    """Banded glocal forward-backward + posterior decode.

    ``ref``/``query`` are 0-3 base codes (>=4 = ambiguous, emission 1).
    Returns ``(state, q)`` per query base: ``state[i] = k<<2 | t`` with
    ``k`` the 0-based ref offset of the max-posterior alignment and ``t``
    0 for match, 1 for insertion; ``q[i]`` the phred of that posterior.
    """
    l_ref, l_query = len(ref), len(query)
    if l_ref <= 0 or l_query <= 0:
        return [0] * l_query, [0] * l_query

    bw = l_ref if l_ref > l_query else l_query
    if bw > maxbw:
        bw = maxbw
    if bw < abs(l_ref - l_query):
        bw = abs(l_ref - l_query)
    bw2 = bw * 2 + 1

    width = bw2 * 3 + 6
    f = [[0.0] * width for _ in range(l_query + 1)]
    b = [[0.0] * width for _ in range(l_query + 1)]
    s = [0.0] * (l_query + 2)

    qual = [10.0 ** (-(q if q >= 3 else 3) / 10.0) for q in iqual]

    # transition matrix (glocal smoothing terms sM/sI as published)
    sM = sI = 1.0 / (2 * l_query + 2)
    m = [0.0] * 9
    m[0] = (1 - d - d) * (1 - sM)
    m[1] = m[2] = d * (1 - sM)
    m[3] = (1 - e) * (1 - sI)
    m[4] = e * (1 - sI)
    m[5] = 0.0
    m[6] = 1 - e
    m[7] = 0.0
    m[8] = e
    bM = (1 - d) / l_ref
    bI = d / l_ref

    EI = 0.25
    EM = 1.0 / 3.0

    def set_u(i: int, k: int) -> int:
        x = i - bw
        if x < 0:
            x = 0
        return (k - x + 1) * 3

    # --- forward ---
    f[0][set_u(0, 0)] = s[0] = 1.0
    # f[1]
    fi = f[1]
    beg, end = 1, l_ref if l_ref < bw + 1 else bw + 1
    ssum = 0.0
    for k in range(beg, end + 1):
        ek = (
            1.0
            if (ref[k - 1] > 3 or query[0] > 3)
            else (1.0 - qual[0] if ref[k - 1] == query[0] else qual[0] * EM)
        )
        u = set_u(1, k)
        fi[u] = ek * bM
        fi[u + 1] = EI * bI
        ssum += fi[u] + fi[u + 1]
    s[1] = ssum
    _beg, _end = set_u(1, beg), set_u(1, end) + 2
    for k in range(_beg, _end + 1):
        fi[k] /= ssum
    # f[2..l_query]
    for i in range(2, l_query + 1):
        fi, fi1 = f[i], f[i - 1]
        qli = qual[i - 1]
        qyi = query[i - 1]
        beg = max(1, i - bw)
        end = min(l_ref, i + bw)
        ssum = 0.0
        for k in range(beg, end + 1):
            ek = (
                1.0
                if (ref[k - 1] > 3 or qyi > 3)
                else (1.0 - qli if ref[k - 1] == qyi else qli * EM)
            )
            u = set_u(i, k)
            v11 = set_u(i - 1, k - 1)
            v10 = set_u(i - 1, k)
            v01 = set_u(i, k - 1)
            fi[u] = ek * (
                m[0] * fi1[v11] + m[3] * fi1[v11 + 1] + m[6] * fi1[v11 + 2]
            )
            fi[u + 1] = EI * (m[1] * fi1[v10] + m[4] * fi1[v10 + 1])
            fi[u + 2] = m[2] * fi[v01] + m[8] * fi[v01 + 2]
            ssum += fi[u] + fi[u + 1] + fi[u + 2]
        s[i] = ssum
        _beg, _end = set_u(i, beg), set_u(i, end) + 2
        for k in range(_beg, _end + 1):
            fi[k] /= ssum
    # f[l_query+1]
    ssum = 0.0
    for k in range(1, l_ref + 1):
        u = set_u(l_query, k)
        if u < 3 or u >= bw2 * 3 + 3:
            continue
        ssum += f[l_query][u] * sM + f[l_query][u + 1] * sI
    s[l_query + 1] = ssum

    # --- backward ---
    bi = b[l_query]
    for k in range(1, l_ref + 1):
        u = set_u(l_query, k)
        if u < 3 or u >= bw2 * 3 + 3:
            continue
        bi[u] = sM / s[l_query] / s[l_query + 1]
        bi[u + 1] = sI / s[l_query] / s[l_query + 1]
    for i in range(l_query - 1, 0, -1):
        bi, bi1 = b[i], b[i + 1]
        qli1 = qual[i]
        qyi1 = query[i]
        beg = max(1, i - bw)
        end = min(l_ref, i + bw)
        for k in range(end, beg - 1, -1):
            u = set_u(i, k)
            v11 = set_u(i + 1, k + 1)
            v10 = set_u(i + 1, k)
            v01 = set_u(i, k + 1)
            if k >= l_ref:
                ek = 0.0
            else:
                ek = (
                    1.0
                    if (ref[k] > 3 or qyi1 > 3)
                    else (1.0 - qli1 if ref[k] == qyi1 else qli1 * EM)
                ) * bi1[v11]
            bi[u] = ek * m[0] + EI * m[1] * bi1[v10 + 1] + m[2] * bi[v01 + 2]
            bi[u + 1] = ek * m[3] + EI * m[4] * bi1[v10 + 1]
            bi[u + 2] = ek * m[6] + m[8] * bi[v01 + 2]
        y = 1.0 / s[i]
        _beg, _end = set_u(i, beg), set_u(i, end) + 2
        for k in range(_beg, _end + 1):
            bi[k] *= y

    # --- MAP decode ---
    state = [0] * l_query
    q = [0] * l_query
    for i in range(1, l_query + 1):
        fi, bi = f[i], b[i]
        beg = max(1, i - bw)
        end = min(l_ref, i + bw)
        ssum = 0.0
        mx = 0.0
        max_k = -1
        for k in range(beg, end + 1):
            u = set_u(i, k)
            z = fi[u] * bi[u]
            if z > mx:
                mx, max_k = z, (k - 1) << 2 | 0
            ssum += z
            z = fi[u + 1] * bi[u + 1]
            if z > mx:
                mx, max_k = z, (k - 1) << 2 | 1
            ssum += z
        mx /= ssum
        state[i - 1] = max_k
        if mx >= 1.0:
            q[i - 1] = 99
        else:
            kk = int(-4.343 * math.log(1.0 - mx) + 0.499)
            q[i - 1] = 99 if kk > 99 else kk
    return state, q


_CIGAR_RE = None


def _cigar_ops(cigar: str):
    global _CIGAR_RE
    if _CIGAR_RE is None:
        import re

        _CIGAR_RE = re.compile(r"(\d+)([MIDNSHP=X])")
    return [(int(n), op) for n, op in _CIGAR_RE.findall(cigar)]


def baq_quals(
    seq: str,
    qual_phred: list[int],
    cigar: str,
    pos: int,
    ref_seq: str,
    ref_offset: int = 0,
) -> list[int]:
    """Per-read BAQ quality capping (non-extended, applied mode).

    ``pos`` is the 1-based leftmost aligned position; ``ref_seq`` the
    reference sequence for the read's contig starting at 1-based
    coordinate ``ref_offset + 1`` (pass the whole contig with offset 0,
    or a window).  Returns the capped phred array (same length as seq);
    reads with reference skips, or no aligned bases, return the input
    unchanged.
    """
    ops = _cigar_ops(cigar)
    if any(op == "N" for _, op in ops):
        return list(qual_phred)
    # aligned span: x ref (0-based), y query
    x = pos - 1
    y = 0
    xb = xe = yb = ye = -1
    for n, op in ops:
        if op in "M=X":
            if yb < 0:
                yb = y
            if xb < 0:
                xb = x
            ye = y + n
            xe = x + n
            x += n
            y += n
        elif op in "SI":
            y += n
        elif op == "D":
            x += n
    if xb < 0:
        return list(qual_phred)
    l_qseq = len(seq)
    bw = 7
    if abs((xe - xb) - (ye - yb)) > bw:
        bw = abs((xe - xb) - (ye - yb)) + 3
    xb -= yb + bw // 2
    if xb < 0:
        xb = 0
    xe += (l_qseq - ye) + bw // 2

    ref_lo = xb - ref_offset
    ref_hi = xe - ref_offset
    if ref_lo < 0:
        ref_lo = 0
    ref_codes = [_code(c) for c in ref_seq[ref_lo:ref_hi]]
    xb = ref_lo + ref_offset
    if not ref_codes:
        return list(qual_phred)
    query_codes = [_code(c) for c in seq]

    state, q = probaln_glocal(ref_codes, query_codes, qual_phred)

    bq = list(qual_phred)
    x = pos - 1
    y = 0
    for n, op in ops:
        if op in "M=X":
            for i in range(y, y + n):
                expected = x - xb + (i - y)
                if (state[i] & 3) != 0 or (state[i] >> 2) != expected:
                    bq[i] = 0
                elif q[i] < bq[i]:
                    bq[i] = q[i]
            x += n
            y += n
        elif op in "SI":
            y += n
        elif op == "D":
            x += n
    return bq

"""BAQ — Base Alignment Quality (Li, Bioinformatics 2011, 27(8):1157-8).

samtools mpileup applies BAQ by default (disabled only with ``-B``): each
read is profile-realigned against its reference window with a banded
glocal HMM, and every aligned base's quality is CAPPED by the phred-scaled
posterior that the base is truly aligned to its claimed position.  This
module reimplements the published algorithm and the publicly documented
htslib semantics (``sam_prob_realn`` / ``probaln_glocal``), including its
quirks:

* input phred qualities are floored at 3 for the emission model; the
  emission probabilities are computed in single precision (htslib stores
  them in ``float`` and its constants ``EM = 0.33333333333f``,
  ``EI = 0.25f`` are floats) — emulated here via float32 round-trips so
  the quantized phred outputs agree;
* the band width passed to the HMM is the one ``sam_prob_realn`` computes
  (7, raised to the cigar's net ref/query length difference + 3 when that
  exceeds 7) — NOT the library default of 10;
* the reference window is the read's aligned span extended by half the
  band plus any soft-clip overhang on each side, then shrunk by htslib's
  comma-SEQUENCED ``xb += excess/2, xe -= recomputed/2`` when it exceeds
  ``l_qseq + bw`` (left edge moves half the excess, right a quarter);
* reads whose cigar contains a reference skip (N) are left untouched;
* ``extended=True`` (the samtools mpileup DEFAULT — it calls
  ``sam_prob_realn(b, ref, len, 3)``, i.e. apply+extend) smooths the
  per-base caps within each M/=/X run: a base's cap is
  ``min(running-max-from-left, running-max-from-right)`` of the raw caps,
  so an isolated low-posterior base surrounded by confident bases is not
  zeroed.  ``extended=False`` is the plain mode: misaligned bases (MAP
  state off the claimed diagonal, or an insertion state) drop to 0.

The DataFrame integration is :func:`baq_realn_reads` — an Arrow-batched
``mapInPandas`` over the reads relation that rewrites the ``qual`` string
in place (map-only, shuffle-free; with a sibling ``.fai`` each worker
seeks out and caches ONLY the contigs its partitions touch — a
whole-genome eager parse per Python worker would multiply resident
memory by the executor's task slots).  ``pileup(..., baq=<fasta path>)`` composes it
ahead of the mate-overlap tweak, the same order as samtools (realign at
read load in ``mplp_func``, overlap tweak at pileup push);
``tests/test_samtools_golden.py`` pins the composition against samtools'
own default-mode output on the multichrom MD BAM.

Scale: one read costs O(l_query * band) float ops — tens of microseconds;
map-only over the reads relation, so it parallelizes embarrassingly and
adds no shuffle.  Reference parity anchor:
tests/pileup/SamtoolsTestSuite.scala:27-72 (fixture family).
"""

from __future__ import annotations

import math

import numpy as np

__all__ = ["probaln_glocal", "baq_quals", "baq_realn_reads"]

_NT = {"A": 0, "C": 1, "G": 2, "T": 3, "a": 0, "c": 1, "g": 2, "t": 3}


def _code(ch: str) -> int:
    return _NT.get(ch, 4)


# Emission probability tables indexed by raw phred, with htslib's float32
# storage baked in: qual[i] is a C float, EM a float constant, so the
# match emission is double(1.0 - (float)p) and the mismatch emission
# double((float)((float)p * (float)EM)).  No phred floor: a phred-2
# Illumina B-tail base gets emission 10^-0.2 = 0.63 (nearly uninformative),
# which is what reproduces samtools' own caps near low-quality read tails
# on the reference golden (a floor of 3 shifts end-of-read caps up by 2-3).
_EM32 = np.float32(0.33333333333)
_P_MATCH: list[float] = []
_P_MISM: list[float] = []
for _q in range(256):
    _qf = np.float32(10.0 ** (-_q / 10.0))
    _P_MATCH.append(1.0 - float(_qf))
    _P_MISM.append(float(np.float32(_qf * _EM32)))


def probaln_glocal(
    ref: list[int],
    query: list[int],
    iqual: list[int],
    d: float = 1e-3,
    e: float = 0.1,
    bw: int = 10,
) -> tuple[list[int], list[int]]:
    """Banded glocal forward-backward + posterior decode.

    ``ref``/``query`` are 0-3 base codes (>=4 = ambiguous, emission 1).
    ``bw`` is the caller's band parameter (htslib ``probaln_par_t.bw`` —
    ``sam_prob_realn`` passes its computed bandwidth, see baq_quals).
    Returns ``(state, q)`` per query base: ``state[i] = k<<2 | t`` with
    ``k`` the 0-based ref offset of the max-posterior alignment and ``t``
    0 for match, 1 for insertion; ``q[i]`` the phred of that posterior.
    """
    l_ref, l_query = len(ref), len(query)
    if l_ref <= 0 or l_query <= 0:
        return [0] * l_query, [0] * l_query

    maxbw = bw
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

    # per-base emissions (float32 rounding baked into the tables)
    pmat = [_P_MATCH[q if 0 <= q < 256 else 255] for q in iqual]
    pmis = [_P_MISM[q if 0 <= q < 256 else 255] for q in iqual]

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
            else (pmat[0] if ref[k - 1] == query[0] else pmis[0])
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
        pm_i = pmat[i - 1]
        px_i = pmis[i - 1]
        qyi = query[i - 1]
        beg = max(1, i - bw)
        end = min(l_ref, i + bw)
        ssum = 0.0
        for k in range(beg, end + 1):
            ek = (
                1.0
                if (ref[k - 1] > 3 or qyi > 3)
                else (pm_i if ref[k - 1] == qyi else px_i)
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
        pm_i1 = pmat[i]
        px_i1 = pmis[i]
        qyi1 = query[i]
        beg = max(1, i - bw)
        end = min(l_ref, i + bw)
        # htslib quirk, fitted against samtools' own default-mode golden: at
        # the FIRST query row the backward M-state excludes the same-row
        # M->D chain (a deletion immediately after the first aligned base
        # contributes no competing mass at that base) — without this, every
        # read-start cap in a locally repetitive context comes out 1-6
        # phred lower than samtools' output.
        m2_row = 0.0 if i == 1 else m[2]
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
                    else (pm_i1 if ref[k] == qyi1 else px_i1)
                ) * bi1[v11]
            bi[u] = ek * m[0] + EI * m[1] * bi1[v10 + 1] + m2_row * bi[v01 + 2]
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
            # htslib kprobaln quirk preserved: `k > 100? 99 : k` lets an
            # exact 100 through while clamping 101+ to 99
            q[i - 1] = 99 if kk > 100 else kk
    return state, q


def _cigar_ops(cigar: str):
    # one shared cigar parser across the package (overlap.py is its home)
    from sequila_spark.functions.overlap import cigar_ops

    return cigar_ops(cigar)


def baq_quals(
    seq: str,
    qual_phred: list[int],
    cigar: str,
    pos: int,
    ref_seq: str,
    ref_offset: int = 0,
    extended: bool = True,
) -> list[int]:
    """Per-read BAQ quality capping (``sam_prob_realn`` applied mode).

    ``pos`` is the 1-based leftmost aligned position; ``ref_seq`` the
    reference sequence for the read's contig starting at 1-based
    coordinate ``ref_offset + 1`` (pass the whole contig with offset 0,
    or a window).  ``extended`` selects htslib's extended BAQ — the
    samtools mpileup default (flag 3 = apply + extend).  Returns the
    capped phred array (same length as seq); reads with reference skips,
    or no aligned bases, return the input unchanged.
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
    if xe - xb - l_qseq > bw:
        # htslib sam_prob_realn's comma-SEQUENCED shrink:
        #   xb += (xe-xb-l_qseq-bw)/2, xe -= (xe-xb-l_qseq-bw)/2;
        # the second operand is evaluated AFTER xb moved, so the left
        # edge moves by half the excess and the right by a quarter —
        # NOT a symmetric half-shrink (which mis-ranks the
        # post-deletion posterior ramp on the multichrom golden's
        # 3M10D73M read by 1-3 phred).
        xb += (xe - xb - l_qseq - bw) // 2
        xe -= (xe - xb - l_qseq - bw) // 2

    ref_lo = xb - ref_offset
    ref_hi = xe - ref_offset
    if ref_lo < 0:
        ref_lo = 0
    ref_codes = [_code(c) for c in ref_seq[ref_lo:ref_hi]]
    xb = ref_lo + ref_offset
    if not ref_codes:
        return list(qual_phred)
    query_codes = [_code(c) for c in seq]

    state, q = probaln_glocal(ref_codes, query_codes, qual_phred, bw=bw)

    bq = list(qual_phred)
    x = pos - 1
    y = 0
    if extended:
        for n, op in ops:
            if op in "M=X":
                t = [
                    0
                    if (state[y + i] & 3) != 0 or (state[y + i] >> 2) != x - xb + i
                    else q[y + i]
                    for i in range(n)
                ]
                left = list(t)
                for i in range(1, n):
                    if left[i - 1] > left[i]:
                        left[i] = left[i - 1]
                rght = list(t)
                for i in range(n - 2, -1, -1):
                    if rght[i + 1] > rght[i]:
                        rght[i] = rght[i + 1]
                for i in range(n):
                    cap = left[i] if left[i] < rght[i] else rght[i]
                    if cap < bq[y + i]:
                        bq[y + i] = cap
                x += n
                y += n
            elif op in "SI":
                y += n
            elif op == "D":
                x += n
        return bq
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


# ---------------------------------------------------------------------------
# DataFrame integration

_FASTA_CACHE: dict[str, dict[str, str]] = {}  # full {contig: seq} maps
_FASTA_INDEX: dict[str, dict[str, tuple[str, int, int]]] = {}


def _fasta_contigs(path: str) -> dict[str, str]:
    """Contig-name-normalized {contig: sequence} map, cached per process.
    Parses the WHOLE file — driver-side tooling only; executors use
    _fasta_contig (lazy, indexed, LRU-bounded)."""
    m = _FASTA_CACHE.get(path)
    if m is None:
        from sequila_spark.functions.intervals import clean_contig_py
        from sequila_spark.sources.fasta import _parse

        if path.endswith((".gz", ".bgz")):
            import gzip

            with gzip.open(path, "rt") as fh:
                content = fh.read()
        else:
            with open(path) as fh:
                content = fh.read()
        m = {clean_contig_py(n): s for n, s in _parse(content)}
        _FASTA_CACHE[path] = m
    return m


def _fasta_contig(path: str, contig: str) -> str | None:
    """One contig's sequence, loaded lazily through the package's shared
    FASTA machinery (sources/vcf.py): byte spans from the .fai (or one
    O(1)-memory streaming scan when absent), BGZF random access through
    the block index, and an LRU contig cache — so an executor worker
    holds only the few contigs its partitions touch, never the whole
    genome per Python worker.  A stale/reflowed .fai whose offsets land
    in header text falls back to the ground-truth full parse instead of
    silently feeding wrong reference bases to the HMM."""
    full = _FASTA_CACHE.get(path)
    if full is not None:
        return full.get(contig)
    from sequila_spark.sources.vcf import fetch_contig_seq, load_fasta_region_index

    idx = _FASTA_INDEX.get(path)
    if idx is None:
        idx = load_fasta_region_index(path)
        _FASTA_INDEX[path] = idx
    span = idx.get(contig)
    if span is None:
        return None
    seq = fetch_contig_seq(path, span)
    if not seq or ">" in seq:
        return _fasta_contigs(path).get(contig)
    return seq


def baq_realn_reads(reads, fasta_path: str, extended: bool = True):
    """Rewrite the reads' ``qual`` column with BAQ-capped qualities
    (htslib ``sam_prob_realn`` applied per read), keeping every other
    column — an Arrow-batched ``mapInPandas``, map-only and shuffle-free.

    Skipped (left unchanged), mirroring samtools: unmapped reads, reads
    whose contig is absent from the FASTA, '*' cigars or quals, and reads
    whose cigar has a reference skip.  ``fasta_path`` must be readable on
    every executor (the standard genomics deployment: the reference FASTA
    is distributed to all nodes or on shared storage); it is parsed once
    per executor process and cached.
    """
    from sequila_spark import schemas as S

    cols = reads.columns
    for c in (S.CONTIG, S.START, S.CIGAR, S.FLAG, S.SEQUENCE, S.BASEQ):
        if c not in cols:
            raise ValueError(f"baq_realn_reads needs read column {c!r}")

    def fn(batches):
        for pdf in batches:
            quals = pdf[S.BASEQ].tolist()
            seqs = pdf[S.SEQUENCE].tolist()
            cigs = pdf[S.CIGAR].tolist()
            poss = pdf[S.START].tolist()
            flags = pdf[S.FLAG].tolist()
            ctgs = pdf[S.CONTIG].tolist()
            out = list(quals)
            for j in range(len(out)):
                qs = quals[j]
                cg = cigs[j]
                if (
                    qs is None
                    or cg is None
                    or qs == "*"
                    or cg == "*"
                    or (flags[j] & 4) != 0
                ):
                    continue
                ref = _fasta_contig(fasta_path, ctgs[j])
                if ref is None:
                    continue
                iq = [ord(ch) - 33 for ch in qs]
                bq = baq_quals(
                    seqs[j], iq, cg, int(poss[j]), ref, extended=extended
                )
                if bq != iq:
                    out[j] = "".join(chr(v + 33) for v in bq)
            pdf = pdf.copy()
            pdf[S.BASEQ] = out
            yield pdf

    return reads.mapInPandas(fn, reads.schema)

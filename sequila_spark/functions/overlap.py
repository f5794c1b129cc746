"""Mate-overlap quality tweak — htslib's exact streaming semantics.

samtools mpileup WITHOUT ``-x`` folds each overlapping mate pair's
evidence: where both mates align a base at the same reference position,
the first-encountered mate absorbs the pair's quality (bases agree:
``qa = min(qa+qb, 200), qb = 0``; disagree: the higher-quality base keeps
``int(0.8*q)``, the other drops to 0).  htslib implements this with a
qname hash at pileup-push time (``overlap_push`` / ``tweak_overlap_quality``
in sam.c) and a dual-cigar walk (``cigar_iref2iseq_set/next``) that this
module reproduces INCLUDING the walk's quirks, which are observable in
samtools' own output (pinned by tests/test_samtools_golden.py against the
reference's default-mode golden):

* an M-op entered mid-walk emits only its first ``len-1`` bases — the
  final base of a read whose cigar transitions ops inside the overlap is
  never tweaked;
* when a walker crosses a D/N it can overshoot the target reference
  position; the synchronization round consumes the landed base without
  tweaking it (the first aligned base after a mate's deletion keeps its
  quality);
* a read is registered for overlap only while its mate is still to
  arrive, and pairs whose insert is so wide they cannot overlap
  (``|tlen| >= 2*l_qseq`` with the mate starting at-or-after this read's
  end) are skipped entirely.

The core is pure-Python per pair (reads are tiny); the engine applies it
inside a qname-grouped ``applyInPandas`` (see operators/pileup.py) so the
only cost is one shuffle of the overlap-eligible reads keyed by qname.
"""

from __future__ import annotations

import re

_CIG_RE = re.compile(r"(\d+)([MIDNSHP=X])")


def cigar_ops(cigar: str) -> list[tuple[int, str]]:
    return [(int(n), op) for n, op in _CIG_RE.findall(cigar)]


class _CigWalk:
    """htslib cigar_iref2iseq_set/next — including the emission off-by-one
    on op transitions (an M op entered via next() yields len-1 bases)."""

    __slots__ = ("ops", "ci", "icig", "iseq", "iref")

    def __init__(self, ops: list[tuple[int, str]]):
        self.ops = ops
        self.ci = 0
        self.icig = 0
        self.iseq = 0
        self.iref = 0

    def set(self, pos: int) -> int:
        if pos < 0:
            return -1
        self.icig = 0
        self.iseq = 0
        self.iref = 0
        while self.ci < len(self.ops):
            n, op = self.ops[self.ci]
            if op == "S":
                self.ci += 1
                self.iseq += n
                self.icig = 0
                continue
            if op in "HP":
                self.ci += 1
                self.icig = 0
                continue
            if op in "M=X":
                pos -= n
                if pos < 0:
                    self.icig = n + pos
                    self.iseq += self.icig
                    self.iref += self.icig
                    return 0
                self.ci += 1
                self.iseq += n
                self.icig = 0
                self.iref += n
                continue
            if op == "I":
                self.ci += 1
                self.iseq += n
                self.icig = 0
                continue
            if op in "DN":
                pos -= n
                if pos < 0:
                    pos = 0
                self.ci += 1
                self.icig = 0
                self.iref += n
                continue
            return -1
        self.iseq = -1
        self.iref = -1
        return -1

    def next(self) -> int:
        while self.ci < len(self.ops):
            n, op = self.ops[self.ci]
            if op in "M=X":
                if self.icig >= n - 1:
                    self.icig = 0
                    self.ci += 1
                    continue
                self.iseq += 1
                self.icig += 1
                self.iref += 1
                return 0
            if op in "DN":
                self.ci += 1
                self.iref += n
                self.icig = 0
                continue
            if op in "IS":
                self.ci += 1
                self.iseq += n
                self.icig = 0
                continue
            if op in "HP":
                self.ci += 1
                self.icig = 0
                continue
            return -1
        self.iseq = -1
        self.iref = -1
        return -1


def tweak_overlap_quality(
    a_pos0: int,
    a_ops: list[tuple[int, str]],
    a_seq: str,
    a_qual: list[int],
    b_pos0: int,
    b_ops: list[tuple[int, str]],
    b_seq: str,
    b_qual: list[int],
) -> None:
    """Mutates a_qual/b_qual in place per htslib tweak_overlap_quality.
    ``a`` is the first-encountered mate (stream order), positions 0-based.
    """
    iref = b_pos0
    A = _CigWalk(a_ops)
    B = _CigWalk(b_ops)
    if A.set(iref - a_pos0) < 0:
        return
    if B.set(iref - b_pos0) < 0:
        return
    a_ret = b_ret = 0
    while True:
        while a_ret >= 0 and A.iref >= 0 and A.iref < iref - a_pos0:
            a_ret = A.next()
        if a_ret < 0:
            break
        if iref < A.iref + a_pos0:
            iref = A.iref + a_pos0
        while b_ret >= 0 and B.iref >= 0 and B.iref < iref - b_pos0:
            b_ret = B.next()
        if b_ret < 0:
            break
        if iref < B.iref + b_pos0:
            iref = B.iref + b_pos0
        iref += 1
        if A.iref + a_pos0 != B.iref + b_pos0:
            continue
        ai, bi = A.iseq, B.iseq
        if ai >= len(a_qual) or bi >= len(b_qual):
            break  # htslib "read issues?" guard — wild cigar fell off the end
        qa, qb = a_qual[ai], b_qual[bi]
        if a_seq[ai].upper() == b_seq[bi].upper():
            a_qual[ai] = qa + qb if qa + qb < 200 else 200
            b_qual[bi] = 0
        elif qa >= qb:
            a_qual[ai] = int(0.8 * qa)
            b_qual[bi] = 0
        else:
            b_qual[bi] = int(0.8 * qb)
            a_qual[ai] = 0


def overlap_stream_tweak(reads: list[dict]) -> None:
    """Apply the overlap tweak to a stream of read dicts (file order),
    mutating each read's ``qual`` list — the htslib olap_hash protocol:
    first eligible arrival registers (only if its mate is still to come),
    second same-qname arrival tweaks against it and clears the slot.

    Each dict needs: qname, flag, contig, rnext, pos (1-based), end
    (1-based inclusive), pnext (1-based), tlen, cigar, seq, qual (list).
    """
    stash: dict[str, dict] = {}
    for rd in reads:
        flag = rd["flag"]
        if not flag & 1 or flag & 8:
            continue
        if rd["rnext"] is not None and rd["rnext"] != rd["contig"]:
            continue
        l_qseq = len(rd["seq"])
        # htslib: mpos >= pos + l_qseq (query length, not cigar ref end)
        if abs(rd["tlen"]) >= 2 * l_qseq and rd["pnext"] >= rd["pos"] + l_qseq:
            continue
        if len(rd["qual"]) != l_qseq:
            continue  # '*' placeholder / malformed — nothing to tweak
        prev = stash.get(rd["qname"])
        if prev is None:
            # only register while the mate is still to arrive
            if rd["pnext"] >= rd["pos"] or rd["pnext"] + l_qseq > rd["pos"]:
                stash[rd["qname"]] = rd
        else:
            del stash[rd["qname"]]
            tweak_overlap_quality(
                prev["pos"] - 1,
                cigar_ops(prev["cigar"]),
                prev["seq"],
                prev["qual"],
                rd["pos"] - 1,
                cigar_ops(rd["cigar"]),
                rd["seq"],
                rd["qual"],
            )


def mate_overlap_tweak_reads(reads):
    """DataFrame transform: rewrite ``qual`` with htslib's mate-overlap
    tweak applied pair-wise — one shuffle of the overlap-ELIGIBLE reads
    keyed by (sample, qname), then an Arrow-batched ``applyInPandas``
    running the exact per-pair walk.  Ineligible reads (unpaired, mate
    unmapped/other contig, or the wide-insert skip) bypass the shuffle
    entirely — at scale this moves only the reads whose pair can interact,
    and per-READ rows rather than per-base rows (the previous design
    shuffled every aligned base; this is ~read-length times less I/O).

    Arrival order within a pair uses the codec's ``__ord`` file ordinal
    when present (htslib's stream order, exact for same-start mates);
    otherwise (pos, first-in-pair) — deterministic, and only observable
    for same-start overlapping mates.
    """
    from pyspark.sql import functions as F

    from sequila_spark import schemas as S
    from sequila_spark.functions.intervals import clean_contig

    needed = [
        S.QNAME, S.FLAG, S.CONTIG, S.START, S.END, S.CIGAR,
        S.RNEXT, S.PNEXT, S.TLEN, S.SEQUENCE, S.BASEQ,
    ]
    missing = [c for c in needed if c not in reads.columns]
    if missing:
        raise ValueError(f"mate_overlap needs read columns {missing}")

    paired = (F.col(S.FLAG).bitwiseAND(1) != 0) & (
        F.col(S.FLAG).bitwiseAND(8) == 0
    )
    same_ctg = (F.col(S.RNEXT) == "=") | (
        clean_contig(F.col(S.RNEXT)) == F.col(S.CONTIG)
    )
    # htslib overlap_push: "no overlap possible, unless some wild cigar" —
    # the guard uses QUERY length (pos + l_qseq), not the cigar ref end
    # (equal for all-M reads, different for indel/clipped ones)
    wide = (F.abs(F.col(S.TLEN)) >= 2 * F.length(S.SEQUENCE)) & (
        F.col(S.PNEXT) >= F.col(S.START) + F.length(S.SEQUENCE)
    )
    elig = (
        paired
        & F.coalesce(same_ctg, F.lit(False))
        & ~F.coalesce(wide, F.lit(False))
        & F.col(S.BASEQ).isNotNull()
        # '*' = quality absent (valid SAM) — nothing to tweak, and a
        # 1-char qual under a longer seq would index out of range
        & (F.col(S.BASEQ) != "*")
        & (F.length(S.BASEQ) == F.length(S.SEQUENCE))
        & (F.col(S.CIGAR) != "*")
    )
    eligible = reads.filter(elig)
    rest = reads.filter(~F.coalesce(elig, F.lit(False)))

    group_cols = [S.QNAME] + ([S.SAMPLE] if S.SAMPLE in reads.columns else [])
    has_ord = "__ord" in reads.columns
    ci = {c: i for i, c in enumerate(reads.columns)}

    def fn(pdf):
        if len(pdf) < 2:
            return pdf
        rows = list(pdf.itertuples(index=False))
        order = sorted(
            range(len(rows)),
            key=(
                (lambda j: rows[j][ci["__ord"]])
                if has_ord
                else (
                    lambda j: (
                        rows[j][ci[S.START]],
                        0 if rows[j][ci[S.FLAG]] & 64 else 1,
                    )
                )
            ),
        )
        quals = {j: [ord(c) - 33 for c in rows[j][ci[S.BASEQ]]] for j in order}
        stash = None
        for j in order:
            r = rows[j]
            pos, pnext = r[ci[S.START]], r[ci[S.PNEXT]]
            l_qseq = len(r[ci[S.SEQUENCE]])
            if stash is None:
                if pnext >= pos or pnext + l_qseq > pos:
                    stash = j
            else:
                p = rows[stash]
                tweak_overlap_quality(
                    p[ci[S.START]] - 1,
                    cigar_ops(p[ci[S.CIGAR]]),
                    p[ci[S.SEQUENCE]],
                    quals[stash],
                    pos - 1,
                    cigar_ops(r[ci[S.CIGAR]]),
                    r[ci[S.SEQUENCE]],
                    quals[j],
                )
                stash = None
        out = pdf.copy()
        new = list(pdf[S.BASEQ])
        for j, q in quals.items():
            new[j] = "".join(chr(v + 33) for v in q)
        out[S.BASEQ] = new
        return out

    adjusted = eligible.groupBy(*group_cols).applyInPandas(fn, reads.schema)
    return adjusted.unionByName(rest)

"""Driver-side (no Spark) parity harness for default-mode samtools pileup:
native BAM decode -> BAQ (functions/baq.py) -> mate-overlap tweak ->
per-position qual multisets vs the reference's samtools.pileup golden.
Fast iteration loop for the BAQ implementation; the Spark golden test
(tests/test_samtools_golden.py) is the real gate.

Usage: python tools/baq_harness.py [--no-baq] [--plain-baq] [--no-overlap]
"""

import re
import sys
from collections import Counter, defaultdict

sys.path.insert(0, "/root/repo")

from sequila_spark.functions.baq import baq_quals, _fasta_contigs
from sequila_spark.functions.intervals import clean_contig_py
from sequila_spark.sources.bamcodec import BgzfReader, read_bam_header, parse_records

MDBAM_DIR = "/root/reference/src/test/resources/multichrom/mdbam"
BAM = f"{MDBAM_DIR}/NA12878.multichrom.md.bam"
FASTA = ("/root/reference/src/test/resources/reference/"
         "Homo_sapiens_assembly18_chr1_chrM.small.fasta")
PILEUP_DEFAULT = f"{MDBAM_DIR}/samtools.pileup"


def clean_entries(bases, quals):
    out = []
    i = qi = 0
    n = len(bases)
    while i < n:
        ch = bases[i]
        if ch == "^":
            i += 2
            continue
        if ch == "$":
            i += 1
            continue
        if ch in "+-":
            m = re.match(r"[+-](\d+)", bases[i:])
            i += 1 + len(m.group(1)) + int(m.group(1))
            continue
        q = quals[qi]
        qi += 1
        if ch not in "*<>":
            out.append((ch, q))
        i += 1
    assert qi == len(quals), (bases, quals)
    return out


def load_golden():
    rows = {}
    with open(PILEUP_DEFAULT) as f:
        for line in f:
            c, pos, ref, _cov, bases, quals = line.rstrip("\n").split("\t")
            if quals.startswith('\\"'):
                quals = quals[1:]
            entries = clean_entries(bases, quals)
            if entries:
                rows[(clean_contig_py(c), int(pos))] = (ref.upper(), entries)
    return rows


CIG_RE = re.compile(r"(\d+)([MIDNSHP=X])")


def aligned_pairs(cigar, pos):
    """[(ref_pos 1-based, query_idx 0-based)] for M/=/X bases."""
    x, y = pos, 0
    out = []
    for m in CIG_RE.finditer(cigar):
        n, op = int(m.group(1)), m.group(2)
        if op in "M=X":
            out.extend((x + i, y + i) for i in range(n))
            x += n
            y += n
        elif op in "SI":
            y += n
        elif op in "DN":
            x += n
    return out


def main():
    no_baq = "--no-baq" in sys.argv
    plain = "--plain-baq" in sys.argv
    no_ov = "--no-overlap" in sys.argv

    contigs = _fasta_contigs(FASTA)
    stream = BgzfReader(open(BAM, "rb"))
    refs, _ = read_bam_header(stream)
    reads = []
    for ordn, r in enumerate(parse_records(stream, refs, with_tags=False)):
        qname, flag, contig, pos, pos_end, mapq, cigar, rnext, pnext, tlen, seq, qual, _ = r
        if flag & 1796 or cigar == "*" or not qual:
            continue
        reads.append(
            dict(
                qname=qname, flag=flag, contig=clean_contig_py(contig),
                pos=pos, end=pos_end, cigar=cigar,
                rnext=clean_contig_py(rnext), pnext=pnext, tlen=tlen,
                seq=seq, qual=[ord(c) - 33 for c in qual], ord=ordn,
            )
        )
    print(f"reads kept: {len(reads)}")

    if not no_baq:
        import time

        t0 = time.time()
        for rd in reads:
            ref = contigs.get(rd["contig"])
            if ref is None or rd["flag"] & 4:
                continue
            rd["qual"] = baq_quals(
                rd["seq"], rd["qual"], rd["cigar"], rd["pos"], ref,
                extended=not plain,
            )
        print(f"BAQ: {time.time() - t0:.1f}s")

    # per-base rows
    per_base = []  # (contig, pos, base_char, read_idx, query_idx)
    for idx, rd in enumerate(reads):
        for rp, qi in aligned_pairs(rd["cigar"], rd["pos"]):
            per_base.append((rd["contig"], rp, idx, qi))

    if not no_ov:
        from sequila_spark.functions.overlap import overlap_stream_tweak

        overlap_stream_tweak(reads)

    golden = load_golden()
    ours = defaultdict(Counter)
    for c, p, idx, qi in per_base:
        rd = reads[idx]
        base = rd["seq"][qi].upper()
        ref = golden.get((c, p))
        refb = ref[0] if ref else "?"
        if base == refb:
            b = refb
        else:
            b = base.lower() if rd["flag"] & 16 else base
        ours[(c, p)][(b, rd["qual"][qi])] += 1

    mism = 0
    examples = []
    for key, (ref, entries) in golden.items():
        gq = Counter()
        for b, q in entries:
            base = ref if b in ".," else b
            gq[(base, ord(q) - 33)] += 1
        if ours[key] != gq:
            mism += 1
            if len(examples) < 8:
                examples.append((key, gq - ours[key], ours[key] - gq))
    print(f"golden positions: {len(golden)}, mismatched: {mism}")
    for e in examples:
        print(" ", e)


if __name__ == "__main__":
    main()

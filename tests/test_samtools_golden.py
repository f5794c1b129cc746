"""Samtools mpileup golden parity — the reference's flagship pileup test
(tests/pileup/SamtoolsTestSuite.scala:27-72): SeQuiLa pileup over the
multichrom MD BAM must equal `samtools mpileup -x` output after converting
the mpileup strings to the common format
(converters/samtools/SamtoolsConverter.scala:18-140 semantics):

 - aligned-base coverage only: '*' (deletion) / '<' '>' (refskip) entries
   are dropped, i.e. samtools depth minus spanning deletions (DelTransfer);
 - '.'/',' fold into countRef; mismatch letters keep strand case;
 - +n/-n indel base runs belong to other positions and are removed;
 - quals: per aligned base, ref matches keyed by the upper ref base.

Here the WHOLE pipeline is ours: the BAM is decoded by the pure-Python
native codec, the FASTA by read_fasta_bases, and the pileup is the
CIGAR-aware operator with flag mask 1796 and samtools strand casing.
"""

import os
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

MDBAM_DIR = "/root/reference/src/test/resources/multichrom/mdbam"
BAM = f"{MDBAM_DIR}/NA12878.multichrom.md.bam"
# the FASTA the reference suite passes as referencePath (PileupTestBase.scala)
FASTA = (
    "/root/reference/src/test/resources/reference/"
    "Homo_sapiens_assembly18_chr1_chrM.small.fasta"
)
PILEUP = f"{MDBAM_DIR}/samtools_x.pileup"

pytestmark = pytest.mark.skipif(
    not os.path.exists(BAM), reason="reference mdbam fixtures not present"
)

MAX_QUAL = 93  # full phred+33 range — no binning/clamping in the comparison


def _clean_contig(c: str) -> str:
    c = re.sub(r"^chr", "", c)
    return "MT" if c == "M" else c


def _clean_entries(bases: str, quals: str):
    """[(base_char, qual_char)] for aligned bases at one position —
    removes ^X/$ marks and indel runs, drops '*' '<' '>' placeholders."""
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


@pytest.fixture(scope="module")
def golden():
    """(contig, pos) -> (ref, [(base, qual)]) with SamtoolsConverter
    cleaning applied; zero-aligned positions dropped."""
    rows = {}
    with open(PILEUP) as f:
        for line in f:
            c, pos, ref, _cov, bases, quals = line.rstrip("\n").split("\t")
            entries = _clean_entries(bases, quals)
            if entries:
                rows[(_clean_contig(c), int(pos))] = (ref.upper(), entries)
    return rows


@pytest.fixture(scope="module")
def ours(spark):
    from sequila_spark.operators.pileup import pileup
    from sequila_spark.sources import read_bam_native
    from sequila_spark.sources.fasta import read_fasta_bases

    reads = read_bam_native(spark, BAM, chunk=2_000_000)
    ref = read_fasta_bases(spark, FASTA)
    p = pileup(
        reads,
        ref=ref,
        alts=True,
        quals=True,
        max_qual=MAX_QUAL,
        flag_mask=1796,
        strand_case=True,
    )
    return {
        (r["contig"], r["pos_start"]): r
        for r in p.collect()
    }


def test_same_positions(golden, ours):
    assert set(ours) == set(golden)


def test_coverage_and_ref_match(golden, ours):
    for key, (ref, entries) in golden.items():
        r = ours[key]
        assert r["coverage"] == len(entries), key
        assert (r["ref"] or "").upper() == ref, key


def test_ref_nonref_and_alts_match(golden, ours):
    for key, (ref, entries) in golden.items():
        r = ours[key]
        n_ref = sum(1 for b, _ in entries if b in ".,")
        assert r["countRef"] == n_ref, key
        assert r["countNonRef"] == len(entries) - n_ref, key
        alts = Counter(b for b, _ in entries if b not in ".,")
        assert dict(r["alts"] or {}) == dict(alts), (key, r["alts"], alts)


def test_quals_match(golden, ours):
    for key, (ref, entries) in golden.items():
        gq = Counter()
        for b, q in entries:
            base = ref if b in ".," else b
            gq[(base, ord(q) - 33)] += 1
        oq = Counter()
        for base, hist in (ours[key]["quals"] or {}).items():
            folded = ref if base.upper() == ref else base
            for qual, cnt in enumerate(hist):
                if cnt:
                    oq[(folded, qual)] += cnt
        assert oq == gq, key


# ---- samtools DEFAULT mode (no -x): mate-overlap quality adjustment ----
#
# samtools.pileup in the same fixture dir is the identical mpileup command
# WITHOUT -x: base columns are identical to samtools_x.pileup (overlap
# handling never drops a base), only the quality strings differ — BAQ
# (sam_prob_realn, extended mode, against the fixture's own FASTA) caps
# each base's quality, then the first-encountered mate absorbs the pair's
# evidence per htslib tweak_overlap_quality.  pileup(mate_overlap=True,
# baq=...) must reproduce those quality multisets exactly; reads carry the
# codec's __ord file-order column so same-start mate ties break exactly as
# htslib's stream does.

PILEUP_DEFAULT = f"{MDBAM_DIR}/samtools.pileup"
# BAQ realigns against the reference samtools saw — the assembly18 small
# FASTA (pileup_commands.sh passes it as --fasta-ref).  The mdbam dir's own
# NA12878.multichrom.fasta is NOT it: its chrM is truncated by 7 leading
# bases, which would misalign every early-chrM read's BAQ window.


@pytest.fixture(scope="module")
def golden_overlap():
    rows = {}
    with open(PILEUP_DEFAULT) as f:
        for line in f:
            c, pos, ref, _cov, bases, quals = line.rstrip("\n").split("\t")
            # fixture artifact: exactly 7 lines have the qual string's
            # LEADING '"' CSV-escaped as '\"' (quals elsewhere contain
            # real backslash = phred 59 chars, so only the leading pair
            # is an escape)
            if quals.startswith('\\"'):
                quals = quals[1:]
            entries = _clean_entries(bases, quals)
            if entries:
                rows[(_clean_contig(c), int(pos))] = (ref.upper(), entries)
    return rows


@pytest.fixture(scope="module")
def ours_overlap(spark):
    from sequila_spark.operators.pileup import pileup
    from sequila_spark.sources import read_bam_native
    from sequila_spark.sources.fasta import read_fasta_bases

    reads = read_bam_native(spark, BAM, chunk=2_000_000, with_ordinal=True)
    ref = read_fasta_bases(spark, FASTA)
    p = pileup(
        reads,
        ref=ref,
        alts=True,
        quals=True,
        max_qual=MAX_QUAL,
        flag_mask=1796,
        strand_case=True,
        mate_overlap=True,
        baq=FASTA,
    )
    return {(r["contig"], r["pos_start"]): r for r in p.collect()}


def test_overlap_same_positions_and_counts(golden_overlap, ours_overlap):
    assert set(ours_overlap) == set(golden_overlap)
    for key, (ref, entries) in golden_overlap.items():
        r = ours_overlap[key]
        assert r["coverage"] == len(entries), key
        n_ref = sum(1 for b, _ in entries if b in ".,")
        assert r["countRef"] == n_ref, key
        alts = Counter(b for b, _ in entries if b not in ".,")
        assert dict(r["alts"] or {}) == dict(alts), key


def test_overlap_quals_match(golden_overlap, ours_overlap):
    mismatched = []
    for key, (ref, entries) in golden_overlap.items():
        gq = Counter()
        for b, q in entries:
            base = ref if b in ".," else b
            gq[(base, ord(q) - 33)] += 1
        oq = Counter()
        for base, hist in (ours_overlap[key]["quals"] or {}).items():
            folded = ref if base.upper() == ref else base
            for qual, cnt in enumerate(hist):
                if cnt:
                    oq[(folded, qual)] += cnt
        if oq != gq:
            mismatched.append((key, gq - oq, oq - gq))
    assert not mismatched, (len(mismatched), mismatched[:5])


def test_overlap_differs_from_x_somewhere(golden, golden_overlap):
    """Sanity: the two goldens genuinely differ (else the new test would
    be vacuous)."""
    diff = sum(
        1
        for k in golden
        if k in golden_overlap
        and sorted(q for _, q in golden[k][1])
        != sorted(q for _, q in golden_overlap[k][1])
    )
    assert diff > 100, diff

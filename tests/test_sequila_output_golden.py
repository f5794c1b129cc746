"""Direct engine-output parity: the reference ships its OWN pileup result
for the multichrom MD BAM (src/test/resources/pileup/sequila.csv — the
block-compressed CommonPileupFormat CSV written by PileupWriter).  Our
pileup + pileup_blocks over the same BAM/FASTA through the native codec
must reproduce it row for row: merged alt-free runs with concatenated ref,
singleton mismatch rows with strand-cased alts and per-base qual maps.
"""

import csv
import os
import re
from collections import Counter

import pytest

RES = "/root/reference/src/test/resources"
BAM = f"{RES}/multichrom/mdbam/NA12878.multichrom.md.bam"
FASTA = f"{RES}/reference/Homo_sapiens_assembly18_chr1_chrM.small.fasta"
CSV = f"{RES}/pileup/sequila.csv"

pytestmark = pytest.mark.skipif(not os.path.exists(CSV), reason="no sequila.csv")

_PAIR = re.compile(r"\(([A-Za-z]),(\d+)\)")


def _parse_alts(s):
    return {b: int(n) for b, n in _PAIR.findall(s)} if s else {}


def _parse_quals(s):
    """Scan "(A,((=,1), (C,2)))(c,((#,1)))" -> {A: {28:1, 34:2}, c: {2:1}}.
    Qual characters may themselves be ',', '(' or ')' (phred+33), so this
    is a positional scan, not a regex."""
    out = {}
    i = 0
    n_s = len(s)
    while i < n_s:
        assert s[i] == "("
        base = s[i + 1]
        assert s[i + 2] == ","
        i += 3
        assert s[i : i + 2] == "(("
        i += 2
        qmap = {}
        while True:
            q = s[i]
            assert s[i + 1] == ","
            i += 2
            j = s.index(")", i)
            qmap[ord(q) - 33] = int(s[i:j])
            i = j + 1
            if s[i] == ",":
                i += 2  # ", " then the next entry's '('
                assert s[i] == "("
                i += 1
            else:
                assert s[i] == ")"
                i += 1  # close the qual list
                break
        assert s[i] == ")"
        i += 1  # close the base section
        out[base] = qmap
    return out


@pytest.fixture(scope="module")
def golden():
    rows = {}
    with open(CSV) as f:
        # the reference wrote this with Spark's CSV sink (escape='\')
        reader = csv.reader(f, doublequote=False, escapechar="\\")
        for contig, start, end, ref, cov, alts, quals in reader:
            rows[(contig, int(start))] = (
                int(end),
                ref,
                int(cov),
                _parse_alts(alts),
                _parse_quals(quals),
            )
    return rows


@pytest.fixture(scope="module")
def ours(spark):
    from sequila_spark.operators.pileup import pileup, pileup_blocks
    from sequila_spark.sources import read_bam_native
    from sequila_spark.sources.fasta import read_fasta_bases

    reads = read_bam_native(spark, BAM, chunk=2_000_000)
    ref = read_fasta_bases(spark, FASTA)
    p = pileup(
        reads, ref=ref, alts=True, quals=True, max_qual=93,
        flag_mask=1796, strand_case=True,
    )
    return {(r["contig"], r["pos_start"]): r for r in pileup_blocks(p).collect()}


def test_block_structure_and_ref(golden, ours):
    assert set(ours) == set(golden)
    for key, (end, ref, cov, _alts, _quals) in golden.items():
        r = ours[key]
        assert r["pos_end"] == end, key
        assert (r["ref"] or "").upper() == ref.upper(), key
        assert r["coverage"] == cov, key


def test_alt_rows_match(golden, ours):
    n_alt = 0
    for key, (_end, ref, _cov, alts, quals) in golden.items():
        if not alts:
            continue
        n_alt += 1
        r = ours[key]
        assert dict(r["alts"] or {}) == alts, key
        got_q = {}
        for base, hist in (r["quals"] or {}).items():
            folded = ref if base.upper() == ref.upper() else base
            for q, c in enumerate(hist):
                if c:
                    got_q.setdefault(folded, {})[q] = got_q.get(folded, {}).get(q, 0) + c
        assert got_q == quals, key
    assert n_alt > 100  # the fixture has a real mismatch population


def test_merged_runs_have_no_alts(ours):
    multi = [r for r in ours.values() if r["pos_end"] > r["pos_start"]]
    assert multi and all(r["alts"] is None for r in multi)
    assert all(len(r["ref"]) == r["pos_end"] - r["pos_start"] + 1 for r in multi)

"""Indel-aware pileup goldens — CIGAR corner cases mirroring the reference's
ReadSummary edge handling (pileup/model/ReadSummary.scala:37-137,
pileup/model/Read.scala:56-69): soft clips at either end, insertions
(including read start/end), deletions, splices (N), hard clips/padding, and
qual-string alignment through query-consuming ops.

Reference genome for contig 1: ACGTACGTAC (positions 1-10), via the
deterministic expression below (matches tests/fixtures/test.fasta prefix).
"""

import pytest
from pyspark.sql import functions as F

from sequila_spark.operators.pileup import expand_bases, pileup

REF_SEQ = "ACGTACGTACGTACGTACGT"  # contig '1', positions 1..20


def ref_expr(contig, pos):
    return F.substring(F.lit(REF_SEQ), 1, 20).substr(pos.cast("int"), F.lit(1))


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "qname string, contig string, pos_start int, pos_end int, "
        "cigar string, seq string, qual string"
    )


# Each case: (read row, expected {pos: base}) — hand-walked per SAM spec.
CASES = [
    # gapless baseline
    (("g1", "1", 3, 6, "4M", "GTAC", "IIII"), {3: "G", 4: "T", 5: "A", 6: "C"}),
    # leading soft clip: first 2 seq chars skipped
    (("s1", "1", 5, 7, "2S3M", "TTACG", "IIIII"), {5: "A", 6: "C", 7: "G"}),
    # trailing soft clip
    (("s2", "1", 5, 7, "3M2S", "ACGTT", "IIIII"), {5: "A", 6: "C", 7: "G"}),
    # deletion: ref jumps, no base at deleted positions 5-6
    (("d1", "1", 3, 8, "2M2D2M", "GTGT", "IIII"), {3: "G", 4: "T", 7: "G", 8: "T"}),
    # splice N behaves like D
    (("n1", "1", 3, 8, "2M2N2M", "GTGT", "IIII"), {3: "G", 4: "T", 7: "G", 8: "T"}),
    # insertion mid-read: inserted bases consume query only
    (("i1", "1", 3, 6, "2M3I2M", "GTAAAAC", "IIIIIII"), {3: "G", 4: "T", 5: "A", 6: "C"}),
    # insertion at read start (after clip semantics: I consumes query only)
    (("i2", "1", 3, 4, "2I2M", "CCGT", "IIII"), {3: "G", 4: "T"}),
    # insertion at read end
    (("i3", "1", 3, 4, "2M2I", "GTCC", "IIII"), {3: "G", 4: "T"}),
    # hard clip + padding consume nothing
    (("h1", "1", 3, 6, "5H4M2P3H", "GTAC", "IIII"), {3: "G", 4: "T", 5: "A", 6: "C"}),
    # kitchen sink: 1S 1M 1I 1M 1D 1M 1S
    (
        ("k1", "1", 3, 6, "1S1M1I1M1D1M1S", "TGXTAC", "IIIIII"),
        {3: "G", 4: "T", 6: "A"},
    ),
]


@pytest.mark.parametrize("row,expected", CASES, ids=[c[0][0] for c in CASES])
def test_cigar_expansion_golden(spark, row, expected):
    out = expand_bases(_df(spark, [row]), use_cigar=True).collect()
    got = {r["pos"]: r["base"] for r in out}
    assert got == expected
    assert len(out) == len(expected)  # no duplicate/spurious rows


def test_qual_alignment_through_query_ops(spark):
    # quals must track the same query offsets as bases: 2S3M with
    # qual "!!ABC" -> positions 5,6,7 get quals A,B,C (phred 32,33,34)
    row = ("q1", "1", 5, 7, "2S3M", "TTACG", "!!ABC")
    out = expand_bases(_df(spark, [row]), with_quals=True, use_cigar=True).collect()
    got = {r["pos"]: (r["base"], r["qual"]) for r in out}
    assert got == {5: ("A", 32), 6: ("C", 33), 7: ("G", 34)}


def test_pileup_dense_sparse_agree_on_indels(spark):
    rows = [c[0] for c in CASES]
    df = _df(spark, rows)
    dense = pileup(df.drop("qual"), ref=None, alts=True)  # dense path (no ref expr)
    sparse = pileup(df, ref=ref_expr, alts=True)  # sparse-mismatch path
    d = {r["pos_start"]: (r["coverage"],) for r in dense.collect()}
    s = {r["pos_start"]: (r["coverage"],) for r in sparse.collect()}
    assert d == s  # same positions, same depth regardless of path


def test_sparse_path_case_folds_ref(spark):
    """A ref expression yielding lowercase bases must not classify every
    base as a mismatch: the sparse path folds BOTH sides (matching the
    dense path's case-insensitive comparison)."""
    rows = [c[0] for c in CASES]
    df = _df(spark, rows)

    def lower_ref(contig, pos):
        return F.lower(ref_expr(contig, pos))

    upper = pileup(df, ref=ref_expr, alts=True)
    lower = pileup(df, ref=lower_ref, alts=True)
    key = lambda df_: {
        r["pos_start"]: (r["coverage"], r["countRef"], r["countNonRef"])
        for r in df_.collect()
    }
    assert key(upper) == key(lower)


def test_pileup_indel_counts_golden(spark):
    rows = [c[0] for c in CASES]
    df = _df(spark, rows)
    out = pileup(df, ref=ref_expr, alts=True)
    got = {
        r["pos_start"]: (r["coverage"], r["countRef"], r["countNonRef"], dict(r["alts"]))
        for r in out.collect()
    }
    # overlay of all CASES' expected bases against ref ACGTACGT...
    from collections import Counter

    per_pos = Counter()
    mism = {}
    for _, expected in CASES:
        for pos, base in expected.items():
            per_pos[pos] += 1
            if base != REF_SEQ[pos - 1]:
                mism.setdefault(pos, Counter())[base] += 1
    for pos, cov in per_pos.items():
        nonref = sum(mism.get(pos, Counter()).values())
        assert got[pos] == (cov, cov - nonref, nonref, dict(mism.get(pos, {}))), pos
    assert set(got) == set(per_pos)


def test_strand_case_rendering(spark):
    # reverse-strand (flag 16) mismatches render lowercase; ref matches are
    # case-folded into countRef either way (SamtoolsConverter semantics)
    df = spark.createDataFrame(
        [
            ("f", 0, "1", 5, 7, "3M", "ACG", "III"),   # A@5 mismatch (ref A? pos5=A) ...
            ("r", 16, "1", 5, 7, "3M", "ATG", "III"),  # T@6 mismatch vs ref C
        ],
        "qname string, flag int, contig string, pos_start int, pos_end int, "
        "cigar string, seq string, qual string",
    )
    out = pileup(df, ref=ref_expr, alts=True, strand_case=True)
    by_pos = {r["pos_start"]: r for r in out.collect()}
    # pos 6: ref C; forward read has C (match), reverse has T -> alt key 't'
    assert by_pos[6]["countRef"] == 1
    assert dict(by_pos[6]["alts"]) == {"t": 1}
    # pos 5: both reads match ref A (one forward, one reverse) -> both countRef
    assert by_pos[5]["countRef"] == 2


def test_majority_ref_proxy(spark):
    # ref=None: proxy = most frequent base, ties -> lexicographically smallest
    df = _df(
        spark,
        [
            ("a", "1", 3, 3, "1M", "G", "I"),
            ("b", "1", 3, 3, "1M", "T", "I"),
            ("c", "1", 3, 3, "1M", "T", "I"),
            ("d", "1", 4, 4, "1M", "C", "I"),
            ("e", "1", 4, 4, "1M", "A", "I"),
        ],
    )
    out = {r["pos_start"]: r for r in pileup(df, ref=None, alts=True).collect()}
    assert out[3]["ref"] == "T" and out[3]["countRef"] == 2
    assert dict(out[3]["alts"]) == {"G": 1}
    assert out[4]["ref"] == "A"  # tie between A and C -> smallest
    assert out[4]["countNonRef"] == 1

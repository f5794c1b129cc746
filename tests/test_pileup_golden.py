"""Pileup golden-fixture tests — the reference's flagship technique
(tests/pileup/SamtoolsTestSuite.scala): a hand-computed pileup table for a
small read stack, plus partitioning invariance.

Read stack (contig 1, reference ACGTACGTAC from tests/fixtures/test.fasta):

  pos:        1234567890
  ref:        ACGTACGTAC
  r1 (1-8):   ACGTACGT        (all match)
  r2 (3-10):    GTTCGTAC      (pos 5: T vs ref A -> mismatch)
  r3 (3-6):     GTAC          (all match)
  r4 (6-9):        CGTA       (pos 6: C=C match, 7 G, 8 T... vs ref C G T A
                               at 6,7,8,9 -> all match)
"""

import os

import pytest
from pyspark.sql import functions as F

from sequila_spark.operators.pileup import pileup
from sequila_spark.sources import read_fasta_bases

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

READS = [
    ("r1", "1", 1, 8, "ACGTACGT"),
    ("r2", "1", 3, 10, "GTTCGTAC"),
    ("r3", "1", 3, 6, "GTAC"),
    ("r4", "1", 6, 9, "CGTA"),
]

# hand-computed: pos -> (ref, coverage, countRef, countNonRef, alts)
GOLDEN = {
    1: ("A", 1, 1, 0, {}),
    2: ("C", 1, 1, 0, {}),
    3: ("G", 3, 3, 0, {}),
    4: ("T", 3, 3, 0, {}),
    5: ("A", 3, 2, 1, {"T": 1}),
    6: ("C", 4, 4, 0, {}),
    7: ("G", 3, 3, 0, {}),
    8: ("T", 3, 3, 0, {}),
    9: ("A", 2, 2, 0, {}),
    10: ("C", 1, 1, 0, {}),
}


def _reads(spark, n_partitions=None):
    df = spark.createDataFrame(
        READS, "qname string, contig string, pos_start int, pos_end int, seq string"
    )
    return df.repartition(n_partitions) if n_partitions else df


def _check(rows):
    got = {
        r["pos_start"]: (
            r["ref"],
            r["coverage"],
            r["countRef"],
            r["countNonRef"],
            dict(r["alts"]),
        )
        for r in rows
    }
    assert got == GOLDEN


def test_pileup_matches_golden(spark):
    ref = read_fasta_bases(spark, f"{FIX}/test.fasta")
    _check(pileup(_reads(spark), ref=ref, alts=True).collect())


def test_pileup_partitioning_invariance(spark):
    """Reference pattern (SamtoolsTestSuite.scala:50-64): identical output
    with 1 partition and many partitions."""
    ref = read_fasta_bases(spark, f"{FIX}/test.fasta")
    _check(pileup(_reads(spark, 1), ref=ref, alts=True).collect())
    _check(pileup(_reads(spark, 16), ref=ref, alts=True).collect())


def test_pileup_sparse_golden(spark):
    """The sparse fast path (expression ref) against the same golden."""
    from sequila_spark import schemas as S

    bases = {("1", p): GOLDEN[p][0] for p in GOLDEN}

    def ref_expr(contig, pos):
        # fixture contig 1 is a strict ACGT cycle
        idx = ((pos - 1) % 4).cast("int")
        return F.lit("ACGT").substr(idx + 1, F.lit(1))

    rows = pileup(_reads(spark), ref=ref_expr, alts=True).collect()
    _check(rows)

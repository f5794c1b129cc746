"""Python UDTFs (Spark 4) — the modern SQL table-function surface.

The analyzer-level TVFs (coverage/pileup/bdg_grange) go through the
preprocessor in sequila_spark/sql.py because they take a *table name*; for
row-wise table functions, Spark 4's native Python UDTF mechanism applies and
registers directly:

  SELECT r.qname, b.* FROM reads r,
  LATERAL cigar_blocks(r.cigar, r.pos_start) b
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

_CIGAR_RE = re.compile(r"(\d+)([MIDNSHP=X])")
_CONSUMES_REF = set("MDN=X")
_EMITS = set("M=X")


@udtf(returnType="block_start: int, block_end: int, op: string")
class CigarBlocks:
    """Reference-consuming aligned blocks of a CIGAR string starting at
    pos_start (same semantics as operators.coverage.aligned_blocks /
    pileup/model/Read.scala:27-54)."""

    def eval(self, cigar: str, pos_start: int):
        if cigar is None or pos_start is None:
            return
        off = pos_start
        for m in _CIGAR_RE.finditer(cigar):
            n, op = int(m.group(1)), m.group(2)
            if op in _EMITS:
                yield (off, off + n - 1, op)
            if op in _CONSUMES_REF:
                off += n


@udtf(returnType="pos: int, base: string")
class ExpandSeq:
    """Per-base expansion of a gapless read (pos, base) — the row-wise
    building block of pileup, exposed to SQL."""

    def eval(self, seq: str, pos_start: int):
        if seq is None or pos_start is None:
            return
        for i, b in enumerate(seq):
            yield (pos_start + i, b.upper())


def register_udtfs(spark: SparkSession) -> None:
    spark.udtf.register("cigar_blocks", CigarBlocks)
    spark.udtf.register("expand_seq", ExpandSeq)

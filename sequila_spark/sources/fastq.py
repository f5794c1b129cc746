"""FASTQ data source.

Semantics match the reference's FASTQDataSource
(datasources/FASTQ/SequenceFragmentRelation.scala:26-111): 4-line records,
Illumina header parsed into instrument/run/flowcell/lane/tile/x/y/
filter_passed/control/index, sample_id from the file name.

FASTQ's record structure spans lines, so this reader uses
``rdd.zipWithIndex`` to group each 4-line record — one of the rare places
where per-partition imperative logic is genuinely required (the text format
itself is not splittable record-wise).  zipWithIndex is deterministic and
keeps data distributed; only per-partition counts hit the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sequila_spark import schemas as S

# @INSTRUMENT:RUN:FLOWCELL:LANE:TILE:X:Y[ READ:FILTER:CONTROL:INDEX]
_HEADER_RE = (
    r"^@([^:]+):(\d+):([^:]+):(\d+):(\d+):(\d+):(\d+)"
    r"(?:\s+(\d+):([YN]):(\d+):?(\S*))?"
)


def read_fastq(spark: SparkSession, path: str) -> DataFrame:
    sample = os.path.basename(path)
    for ext in (".fastq", ".fq", ".gz"):
        sample = sample.removesuffix(ext) if sample.endswith(ext) else sample

    lines = spark.sparkContext.textFile(path)
    recs = (
        lines.zipWithIndex()
        .map(lambda li: (li[1] // 4, (li[1] % 4, li[0])))
        .groupByKey()
        .map(lambda kv: tuple(v for _, v in sorted(kv[1])))
        .filter(lambda r: len(r) == 4)
    )
    df = recs.toDF(["header", "seq", "plus", "qual"])

    h = F.regexp_extract
    hdr = F.col("header")
    return df.select(
        F.lit(sample).alias(S.SAMPLE),
        h(hdr, _HEADER_RE, 1).alias(S.FASTQ_INSTRUMENT),
        h(hdr, _HEADER_RE, 2).cast("int").alias(S.FASTQ_RUN),
        h(hdr, _HEADER_RE, 3).alias(S.FASTQ_FLOWCELL),
        h(hdr, _HEADER_RE, 4).cast("int").alias(S.FASTQ_LANE),
        h(hdr, _HEADER_RE, 5).cast("int").alias(S.FASTQ_TILE),
        h(hdr, _HEADER_RE, 6).cast("int").alias(S.FASTQ_POS_X),
        h(hdr, _HEADER_RE, 7).cast("int").alias(S.FASTQ_POS_Y),
        (h(hdr, _HEADER_RE, 9) == "N").alias(S.FASTQ_FILTER),
        F.nullif(h(hdr, _HEADER_RE, 10), F.lit("")).cast("int").alias(S.FASTQ_CONTROL),
        F.nullif(h(hdr, _HEADER_RE, 11), F.lit("")).alias(S.FASTQ_INDEX_SEQ),
        F.col("seq").alias(S.SEQUENCE),
        F.col("qual").alias(S.BASEQ),
    )

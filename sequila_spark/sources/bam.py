"""BAM/CRAM alignment sources.

The reference reads BAM via hadoop-BAM/disq input formats
(datasources/BAM/AlignmentRelation.scala:298-393) — JVM libraries outside
engine core.  Spark-first policy (SURVEY.md §1.4): the engine operates on
alignment relations with the canonical schema; BAM decoding is an I/O shim:

 - ``read_alignments``: parquet-backed alignments (the recommended storage —
   columnar, partition-prunable by sample_id/contig, row-group skippable on
   (contig, pos_start) when sorted).  Equivalent to the reference's
   interval/sample pushdown (§2.2) falling out of parquet for free.
 - ``read_bam``/``read_cram``: decode via pysam when available (executor-side
   ``mapPartitions`` over BGZF chunk ranges), else raise with guidance.  The
   pysam path partitions by contig ranges, one iterator per partition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sequila_spark import schemas as S
from sequila_spark.functions.intervals import clean_contig


def write_alignments(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Recommended storage layout for alignment relations: parquet
    partitioned by sample_id and sorted within partitions by
    (contig, pos_start).  This is what makes the reference's custom
    optimizations fall out for free at scale:

      - `sample_id = 'X'` / IN (...)  -> partition-directory pruning
        (reference: glob-path rewrite, AlignmentRelation.scala:311-324)
      - contig/pos predicates          -> parquet row-group min/max skipping
        (reference: BAI/BGZF interval pushdown, AlignmentRelation.scala:310-368)
      - DISTINCT sample_id             -> partition listing, no data read
        (reference: scan elision, SequilaDataSourceStrategy.scala:38-54)
    """
    (
        df.repartition(S.SAMPLE, S.CONTIG)
        .sortWithinPartitions(S.CONTIG, S.START)
        .write.mode(mode)
        .partitionBy(S.SAMPLE)
        .parquet(path)
    )


def read_alignments(spark: SparkSession, path: str) -> DataFrame:
    """Parquet-backed alignment relation with canonical columns; contig
    normalization applied on read (AlignmentRelation.scala:233)."""
    df = spark.read.parquet(path)
    if S.CONTIG in df.columns:
        df = df.withColumn(S.CONTIG, clean_contig(F.col(S.CONTIG)))
    if S.SAMPLE not in df.columns:
        sample = os.path.basename(path).split(".")[0]
        df = df.withColumn(S.SAMPLE, F.lit(sample))
    return df


def _pysam_reader(path: str, ref_path: str | None, contig: str, start: int, end: int):
    import pysam  # noqa: F401 — gated import

    mode = "rc" if path.endswith(".cram") else "rb"
    kwargs = {"reference_filename": ref_path} if ref_path else {}
    with pysam.AlignmentFile(path, mode, **kwargs) as af:
        for read in af.fetch(contig, start, end):
            yield (
                read.query_name,
                read.flag,
                read.reference_name,
                (read.reference_start or 0) + 1,
                read.reference_end or 0,
                read.mapping_quality,
                read.cigarstring,
                read.query_sequence,
                read.qual if hasattr(read, "qual") else None,
            )


def read_bam(
    spark: SparkSession,
    path: str,
    ref_path: str | None = None,
    chunk: int = 10_000_000,
) -> DataFrame:
    """Decode BAM/CRAM via pysam on the executors, partitioned by genomic
    chunk (each task fetches one (contig, range) via the index — the same
    interval-chunking idea as the reference's BGZF splits)."""
    try:
        import pysam
    except ImportError as e:
        raise ImportError(
            "BAM/CRAM decoding needs pysam on driver and executors; "
            "store alignments as parquet and use read_alignments() instead"
        ) from e

    with pysam.AlignmentFile(path, "rc" if path.endswith(".cram") else "rb") as af:
        spans = [
            (name, s, min(s + chunk, length))
            for name, length in zip(af.references, af.lengths)
            for s in range(0, length, chunk)
        ]

    sample = os.path.basename(path).split(".")[0]
    rdd = spark.sparkContext.parallelize(spans, max(len(spans), 1)).flatMap(
        lambda span: _pysam_reader(path, ref_path, *span)
    )
    df = rdd.toDF(
        f"{S.QNAME} string, {S.FLAG} int, {S.CONTIG} string, {S.START} int, "
        f"{S.END} int, {S.MAPQ} int, {S.CIGAR} string, {S.SEQUENCE} string, "
        f"{S.BASEQ} string"
    )
    return df.select(
        F.lit(sample).alias(S.SAMPLE),
        "*",
    ).withColumn(S.CONTIG, clean_contig(F.col(S.CONTIG)))

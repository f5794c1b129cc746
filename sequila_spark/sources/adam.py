"""ADAM (parquet) alignment source.

Semantics match the reference's ADAMDataSource
(datasources/ADAM/ADAMRelation.scala:16-31): plain parquet read with ADAM
column names mapped to the canonical names (contigName -> contig,
start/end 0-based half-open -> 1-based inclusive pos_start/pos_end)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sequila_spark import schemas as S
from sequila_spark.functions.intervals import clean_contig

_RENAMES = {
    "readName": S.QNAME,
    "mappingQuality": S.MAPQ,
    "sequence": S.SEQUENCE,
    "qualityScores": S.BASEQ,
    "cigar": S.CIGAR,
}


def read_adam(spark: SparkSession, path: str) -> DataFrame:
    df = spark.read.parquet(path)
    for old, new in _RENAMES.items():
        if old in df.columns:
            df = df.withColumnRenamed(old, new)
    if "contigName" in df.columns:
        df = df.withColumn(S.CONTIG, clean_contig(F.col("contigName"))).drop("contigName")
    if "start" in df.columns:
        df = df.withColumn(S.START, (F.col("start") + 1).cast("int")).drop("start")
    if "end" in df.columns:
        df = df.withColumn(S.END, F.col("end").cast("int")).drop("end")
    return df

"""BED data source.

Semantics match the reference's BEDDataSource
(datasources/BED/BEDRelation.scala:18-57): tab-separated, ``track``/
``browser``/``#`` header lines skipped, 0-based half-open converted to
1-based inclusive (start + 1), contig normalized (chr1 -> 1), 9 optional
columns after the first three, item_rgb/block_sizes/block_starts parsed into
int arrays.

Implemented as a plain ``spark.read.text`` + native column expressions —
Catalyst handles pruning/pushdown; no custom relation machinery needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sequila_spark import schemas as S
from sequila_spark.functions.intervals import clean_contig


def _opt(col, cast: str | None = None):
    c = F.when(col == "", None).otherwise(col)
    return c.cast(cast) if cast else c


def _int_array(col):
    arr = F.split(F.regexp_replace(col, ",$", ""), ",")
    return F.when(
        (col.isNull()) | (col == ""), F.lit(None).cast("array<int>")
    ).otherwise(F.transform(arr, lambda x: x.cast("int")))


def read_bed(spark: SparkSession, path: str) -> DataFrame:
    lines = spark.read.text(path)
    rows = lines.where(
        ~F.col("value").startswith("track")
        & ~F.col("value").startswith("browser")
        & ~F.col("value").startswith("#")
        & (F.trim(F.col("value")) != "")
    )
    f = F.split(F.col("value"), "\t")

    def field(i: int):
        return F.when(F.size(f) > i, F.element_at(f, i + 1)).otherwise(F.lit(None))

    return rows.select(
        clean_contig(field(0)).alias(S.CONTIG),
        (field(1).cast("int") + 1).alias(S.START),  # 0-based -> 1-based
        field(2).cast("int").alias(S.END),
        _opt(field(3)).alias(S.BED_NAME),
        _opt(field(4), "int").alias(S.BED_SCORE),
        _opt(field(5)).alias(S.BED_STRAND),
        _opt(field(6), "int").alias(S.BED_THICK_START),
        _opt(field(7), "int").alias(S.BED_THICK_END),
        _int_array(field(8)).alias(S.BED_ITEM_RGB),
        _opt(field(9), "int").alias(S.BED_BLOCK_COUNT),
        _int_array(field(10)).alias(S.BED_BLOCK_SIZES),
        _int_array(field(11)).alias(S.BED_BLOCK_STARTS),
    )

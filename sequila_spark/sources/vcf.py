"""VCF data source.

Semantics match the reference's VCFDataSource
(datasources/VCF/VCFRelation.scala:25-45): canonical column names (contig,
pos_start, pos_end, ref, alt), contig normalization, alt as array.  The
reference delegates parsing to Glow; here the core VCF text layout is parsed
natively (Glow is used instead when importable, preserving the reference's
normalization options)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sequila_spark import schemas as S
from sequila_spark.functions.intervals import clean_contig


def read_vcf(
    spark: SparkSession,
    path: str,
    normalization_mode: str | None = None,
    ref_genome_path: str | None = None,
) -> DataFrame:
    try:  # optional Glow path (reference parity: VCFRelation.scala:25-45)
        import glow  # type: ignore  # noqa: F401

        df = spark.read.format("vcf").load(path)
        if normalization_mode:
            df = glow.transform(
                "normalize_variants", df, reference_genome_path=ref_genome_path
            )
        return df.select(
            clean_contig(F.col("contigName")).alias(S.CONTIG),
            (F.col("start") + 1).cast("int").alias(S.START),
            F.col("end").cast("int").alias(S.END),
            F.col("names").getItem(0).alias("id"),
            F.col("referenceAllele").alias(S.REF),
            F.col("alternateAlleles").alias(S.ALT),
            F.col("qual").cast("double"),
            F.lit(None).cast("string").alias("filter"),
            F.lit(None).cast("map<string,string>").alias("info"),
        )
    except ImportError:
        pass

    lines = spark.read.text(path)
    rows = lines.where(~F.col("value").startswith("#") & (F.trim("value") != ""))
    f = F.split(F.col("value"), "\t")

    def field(i: int):
        return F.when(F.size(f) > i, F.element_at(f, i + 1)).otherwise(F.lit(None))

    info_map = F.map_from_entries(
        F.transform(
            F.split(field(7), ";"),
            # flag entries (e.g. "DB") have no '=': value defaults to "" —
            # F.get is OOB-tolerant where getItem raises
            lambda kv: F.struct(
                F.split(kv, "=").getItem(0).alias("key"),
                F.coalesce(F.get(F.split(kv, "="), F.lit(1)), F.lit("")).alias("value"),
            ),
        )
    )
    return rows.select(
        clean_contig(field(0)).alias(S.CONTIG),
        field(1).cast("int").alias(S.START),
        (field(1).cast("int") + F.length(field(3)) - 1).cast("int").alias(S.END),
        F.nullif(field(2), F.lit(".")).alias("id"),
        field(3).alias(S.REF),
        F.split(field(4), ",").alias(S.ALT),
        F.nullif(field(5), F.lit(".")).cast("double").alias("qual"),
        F.nullif(field(6), F.lit(".")).alias("filter"),
        F.when(field(7).isNull() | (field(7) == "."), None)
        .otherwise(info_map)
        .alias("info"),
    )

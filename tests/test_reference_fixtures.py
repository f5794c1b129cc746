"""Source readers over the reference project's OWN test fixture files —
the strongest available parity check for format handling: BED (track
header, 12 columns), FASTQ (Illumina headers), VCF 4.1, ADAM parquet.
Tests skip when the reference tree is absent.
"""

import os

import pytest
from pyspark.sql import functions as F

RES = "/root/reference/src/test/resources"

pytestmark = pytest.mark.skipif(not os.path.isdir(RES), reason="no reference tree")


def test_bed_track_header_and_blocks(spark):
    from sequila_spark.sources import read_bed

    df = read_bed(spark, f"{RES}/bed/test.bed")
    rows = df.orderBy("pos_start").collect()
    # track line skipped; BED is 0-based half-open -> 1-based inclusive
    assert [r["pos_start"] for r in rows] == [1001, 2001]
    assert [r["pos_end"] for r in rows] == [5000, 6000]
    assert rows[0]["name"] == "cloneA" and rows[0]["strand"] == "+"
    assert rows[0]["block_count"] == 2
    assert rows[0]["block_sizes"] == [567, 488]
    assert {r["contig"] for r in rows} == {"22"}  # chr prefix cleaned


def test_bed_slice_minimal_columns(spark):
    from sequila_spark.sources import read_bed

    df = read_bed(spark, f"{RES}/NA12878.slice.bed")
    r = df.first()
    assert (r["contig"], r["pos_start"], r["pos_end"]) == ("1", 35, 29988)


def test_fastq_illumina_header(spark):
    from sequila_spark.sources import read_fastq

    df = read_fastq(spark, f"{RES}/fastq/NA12988.fastq")
    rows = df.collect()
    assert len(rows) == 1  # the fixture holds a single 4-line record
    r = rows[0]
    assert r["instrument_name"] == "EAS139"
    assert (r["run_id"], r["flowcell_id"], r["lane"], r["tile"]) == (136, "FC706VJ", 2, 2104)
    assert (r["pos_x"], r["pos_y"]) == (15343, 197393)
    assert r["seq"].startswith("GATTTGGGG") and len(r["seq"]) == len(r["qual"])


def test_vcf_41(spark):
    from sequila_spark.sources import read_vcf

    df = read_vcf(spark, f"{RES}/vcf/test.vcf")
    rows = {(r["contig"], r["pos_start"]): r for r in df.collect()}
    assert len(rows) == 5
    r = rows[("20", 14370)]
    assert r["ref"] == "G" and r["alt"] == ["A"] and r["id"] == "rs6054257"
    assert r["filter"] == "PASS"
    assert r["info"].get("DP") == "14"
    # multi-allelic site
    assert rows[("20", 1234567)]["alt"] == ["G", "GTCT"]


def test_adam_parquet_alignments(spark):
    from sequila_spark.sources import read_adam

    df = read_adam(spark, f"{RES}/NA12878.slice.adam")
    assert df.count() > 1000
    r = df.where(F.col("contig").isNotNull()).orderBy("pos_start").first()
    # same slice as the BAM: chr1 around position 34, 1-based after conversion
    assert r["contig"] == "1" and r["pos_start"] >= 34
    cols = set(df.columns)
    assert {"contig", "pos_start", "pos_end"} <= cols


def test_adam_features(spark):
    from sequila_spark.sources import read_adam

    df = read_adam(spark, f"{RES}/refFlat.adam")
    assert df.count() > 100
    assert {"contig", "pos_start", "pos_end"} <= set(df.columns)

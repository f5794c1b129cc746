"""CLI apps (sequila_spark.apps) — drive main(argv) end-to-end on small
fixtures, mirroring the reference's runnable apps."""

import os

from sequila_spark.apps import main

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _write_reads(spark, path):
    spark.createDataFrame(
        [
            ("s1", "r1", "1", 101, 150, 60),
            ("s1", "r2", "1", 120, 169, 60),
            ("s1", "r3", "2", 10, 59, 60),
        ],
        "sample_id string, qname string, contig string, pos_start int, pos_end int, mapq int",
    ).write.mode("overwrite").parquet(path)


def test_feature_counts_app(spark, tmp_path):
    reads = str(tmp_path / "reads.parquet")
    out = str(tmp_path / "fc_out")
    _write_reads(spark, reads)
    main(
        [
            "feature-counts",
            "--reads", reads,
            "--targets", f"{FIX}/test.bed",
            "--output", out,
            "--format", "parquet",
        ]
    )
    rows = {r["name"]: r["read_count"] for r in spark.read.parquet(out).collect()}
    # feat1 on contig 1 spans 101..200 -> overlaps r1 and r2
    assert rows["feat1"] == 2


def test_depth_of_coverage_app(spark, tmp_path):
    reads = str(tmp_path / "reads.parquet")
    out = str(tmp_path / "cov_out")
    _write_reads(spark, reads)
    main(
        [
            "depth-of-coverage",
            "--reads", reads,
            "--output", out,
            "--format", "tsv",
            "--single-file",
        ]
    )
    df = spark.read.option("delimiter", "\t").option("header", True).csv(out)
    rows = sorted(
        (r["contig"], int(r["pos_start"]), int(r["pos_end"]), int(r["coverage"]))
        for r in df.collect()
    )
    assert rows == [
        ("1", 101, 119, 1),
        ("1", 120, 150, 2),
        ("1", 151, 169, 1),
        ("2", 10, 59, 1),
    ]


def test_pileup_app(spark, tmp_path):
    reads = str(tmp_path / "reads.parquet")
    out = str(tmp_path / "pu_out")
    spark.createDataFrame(
        [("s1", "r1", "1", 1, 10, 60, "ACGTACGTAC")],
        "sample_id string, qname string, contig string, pos_start int, pos_end int, mapq int, seq string",
    ).write.mode("overwrite").parquet(reads)
    main(
        [
            "pileup",
            "--reads", reads,
            "--ref", f"{FIX}/test.fasta",
            "--output", out,
        ]
    )
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 10
    # fixture contig 1 is ACGTACGTAC... -> every base matches the reference
    assert all(r["countRef"] == 1 and r["countNonRef"] == 0 for r in rows)


def test_bam_input_and_bam_to_parquet(spark, tmp_path):
    """Apps accept raw BAM via the native codec; bam-to-parquet produces
    the partitioned layout read_alignments consumes."""
    import pytest

    bam = "/root/reference/src/test/resources/NA12878.slice.bam"
    if not os.path.exists(bam):
        pytest.skip("no reference BAM")
    store = str(tmp_path / "aln")
    main(["bam-to-parquet", "--reads", bam, "--output", store])
    from sequila_spark.sources import read_alignments

    assert read_alignments(spark, store).count() > 3000

    out = str(tmp_path / "cov_out")
    main([
        "depth-of-coverage", "--reads", bam, "--output", out,
        "--mode", "blocks", "--format", "parquet",
    ])
    cov = spark.read.parquet(out)
    assert cov.count() > 0 and cov.select("coverage").groupBy().max().first()[0] >= 1

"""Pileup converters + cross-tool comparison (the reference's converter
package and PileupComparison app) against the reference project's own
fixture files."""

import os

import pytest
from pyspark.sql import functions as F

from sequila_spark.converters import (
    compare_pileups,
    read_gatk_pileup,
    read_samtools_pileup,
    read_sequila_pileup,
)

RES = "/root/reference/src/test/resources"
GATK = f"{RES}/multichrom/mdbam/gatk.csv"
SAMTOOLS_X = f"{RES}/multichrom/mdbam/samtools_x.pileup"
SEQUILA = f"{RES}/pileup/sequila.csv"
GOLDEN = os.path.join(
    os.path.dirname(__file__), "..", "fixtures", "mdbam", "golden_pileup.parquet"
)

needs_ref = pytest.mark.skipif(not os.path.exists(GATK), reason="no reference fixtures")


@needs_ref
def test_gatk_converter_semantics(spark):
    df = read_gatk_pileup(spark, GATK).cache()
    rows = {(r["contig"], r["pos_start"]): r for r in df.collect()}
    # every line parses (file has 24894 lines, all with >=1 base)
    assert len(rows) == 24894
    # contig cleaning: chrM -> MT (DataQualityFuncs.cleanContig)
    assert all(c in ("1", "MT") for c, _ in rows)
    # spot-check a deep position: chrM 1006 'G' x61 + 'N' x1
    r = rows[("MT", 1006)]
    assert r["coverage"] == 62 and r["countRef"] == 61 and r["countNonRef"] == 1
    assert dict(r["alts"]) == {"G": 61, "N": 1}
    # single-base line: chrM 7 ref A bases 'A'
    r = rows[("MT", 7)]
    assert (r["coverage"], r["countRef"], r["countNonRef"]) == (1, 1, 0)
    assert dict(r["alts"]) == {"A": 1}  # GATK convention: all bases counted
    df.unpersist()


@needs_ref
def test_samtools_converter_matches_golden_fixture(spark):
    """read_samtools_pileup must reproduce fixtures/mdbam/golden_pileup
    (independently derived by tools/make_mdbam_fixture.py from the same
    file) — counts AND rendered alts at every position."""
    conv = read_samtools_pileup(spark, SAMTOOLS_X)
    golden = spark.read.parquet(GOLDEN)

    render = F.coalesce(
        F.array_join(
            F.transform(
                F.array_sort(F.map_entries("alts")),
                lambda e: F.concat(e["key"], F.lit(":"), e["value"].cast("string")),
            ),
            ",",
        ),
        F.lit(""),
    )
    a = {
        (r["contig"], r["pos_start"]): (
            r["coverage"], r["countRef"], r["countNonRef"], r["alts_str"]
        )
        for r in conv.select(
            "contig", "pos_start", "coverage", "countRef", "countNonRef",
            render.alias("alts_str"),
        ).collect()
    }
    b = {
        (r["contig"], r["pos"]): (
            r["coverage"], r["countRef"], r["countNonRef"], r["alts_str"]
        )
        for r in golden.collect()
    }
    assert a == b


@needs_ref
def test_sequila_converter_per_base_explode(spark):
    df = read_sequila_pileup(spark, SEQUILA).cache()
    # total rows = sum of block widths
    import csv

    with open(SEQUILA) as f:
        blocks = [row for row in csv.reader(f, doublequote=False, escapechar="\\")]
    expect_rows = sum(int(r[2]) - int(r[1]) + 1 for r in blocks)
    assert df.count() == expect_rows
    rows = {(r["contig"], r["pos_start"]): r for r in df.collect()}
    # multi-position block "1,36,37,CT,3" -> per-base refs C then T, cov 3
    assert rows[("1", 36)]["ref"] == "C" and rows[("1", 37)]["ref"] == "T"
    assert rows[("1", 36)]["coverage"] == 3 == rows[("1", 37)]["coverage"]
    # mismatch singleton "1,69,69,A,7,(c,1)" -> alts {c:1}, countRef 6
    r = rows[("1", 69)]
    assert dict(r["alts"]) == {"c": 1}
    assert (r["coverage"], r["countRef"], r["countNonRef"]) == (7, 6, 1)
    df.unpersist()


@needs_ref
def test_pileup_comparison_app(spark):
    """PileupComparison analog: the samtools conversion and the golden
    fixture (same underlying file, independent derivations) compare EQUAL;
    a perturbed input reports NOT EQUAL with the diff counts."""
    conv = read_samtools_pileup(spark, SAMTOOLS_X).select(
        "contig", "pos_start", "coverage", "countRef", "countNonRef", "alts"
    )
    golden = spark.read.parquet(GOLDEN).select(
        "contig",
        F.col("pos").alias("pos_start"),
        "coverage",
        "countRef",
        "countNonRef",
        F.map_from_entries(
            F.transform(
                F.filter(F.split("alts_str", ","), lambda p: p != ""),
                lambda p: F.struct(
                    F.split(p, ":")[0].alias("key"),
                    F.split(p, ":")[1].cast("int").alias("value"),
                ),
            )
        ).alias("alts"),
    )
    res = compare_pileups({"samtools": conv, "golden": golden})
    assert res[("samtools", "golden")] == "EQUAL"

    res = compare_pileups(
        {"samtools": conv, "broken": golden.where("pos_start <> 1006")},
        on=["contig", "pos_start", "coverage"],
    )
    assert res[("samtools", "broken")].startswith("NOT EQUAL")

"""One-shot fixture generator: export the reference project's real MD BAM
(+ FASTA + samtools golden pileup) as parquet under fixtures/mdbam/, so the
per-round driver gate hash-checks REAL-data pileup, not just the synthetic
views (VERDICT r2 item 8).

  reads.parquet         alignment relation decoded by the native codec
                        (tag_MD extracted as a typed column)
  ref_bases.parquet     (contig, pos, ref) from the FASTA
  golden_pileup.parquet per-position golden derived from `samtools mpileup
                        -x` output with the SamtoolsConverter cleaning
                        (converters/samtools/SamtoolsConverter.scala:18-140
                        semantics, same as tests/test_samtools_golden.py):
                        aligned-base coverage, './,' -> countRef, cased
                        mismatch letters -> alts, indel runs and '*<>'
                        entries dropped.

Run from the repo root:  python tools/make_mdbam_fixture.py
"""

import os
import re
import sys
from collections import Counter

RES = "/root/reference/src/test/resources"
BAM = f"{RES}/multichrom/mdbam/NA12878.multichrom.md.bam"
FASTA = f"{RES}/reference/Homo_sapiens_assembly18_chr1_chrM.small.fasta"
PILEUP = f"{RES}/multichrom/mdbam/samtools_x.pileup"
OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "mdbam")


def _clean_contig(c):
    c = re.sub(r"^chr", "", c)
    return "MT" if c == "M" else c


def _aligned_entries(bases):
    """Aligned base chars at one position, SamtoolsConverter cleaning."""
    out = []
    i, n = 0, len(bases)
    while i < n:
        ch = bases[i]
        if ch == "^":
            i += 2
            continue
        if ch == "$":
            i += 1
            continue
        if ch in "+-":
            m = re.match(r"[+-](\d+)", bases[i:])
            i += 1 + len(m.group(1)) + int(m.group(1))
            continue
        if ch not in "*<>":
            out.append(ch)
        i += 1
    return out


def golden_rows():
    rows = []
    with open(PILEUP) as f:
        for line in f:
            c, pos, ref, _cov, bases, _quals = line.rstrip("\n").split("\t")
            entries = _aligned_entries(bases)
            if not entries:
                continue
            n_ref = sum(1 for b in entries if b in ".,")
            alts = Counter(b for b in entries if b not in ".,")
            alts_str = ",".join(f"{b}:{alts[b]}" for b in sorted(alts))
            rows.append(
                (
                    _clean_contig(c),
                    int(pos),
                    ref.upper(),
                    len(entries),
                    n_ref,
                    len(entries) - n_ref,
                    alts_str,
                )
            )
    return rows


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from sequila_spark.sources import read_bam_native, with_typed_tags
    from sequila_spark.sources.fasta import read_fasta_bases

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    os.makedirs(OUT, exist_ok=True)

    reads = with_typed_tags(read_bam_native(spark, BAM), tags=["MD"])
    (
        reads.drop("tags")
        .repartition(1)
        .sortWithinPartitions("contig", "pos_start")
        .write.mode("overwrite")
        .parquet(f"{OUT}/reads.parquet")
    )
    read_fasta_bases(spark, FASTA).repartition(1).sortWithinPartitions(
        "contig", "pos"
    ).write.mode("overwrite").parquet(f"{OUT}/ref_bases.parquet")

    spark.createDataFrame(
        golden_rows(),
        "contig string, pos int, ref string, coverage int, "
        "countRef int, countNonRef int, alts_str string",
    ).repartition(1).sortWithinPartitions("contig", "pos").write.mode(
        "overwrite"
    ).parquet(f"{OUT}/golden_pileup.parquet")

    print("fixtures written to", os.path.abspath(OUT))


if __name__ == "__main__":
    main()

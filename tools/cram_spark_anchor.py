#!/usr/bin/env python3
"""GB-scale CRAM anchor THROUGH SPARK (VERDICT r12 task 4): decode the
4096-container / 13.0 M-record / 1.2 GB bigcram (tools/make_big_cram.py)
end-to-end — read_cram_native -> coverage(blocks) -> noop write — and
the same pipeline over the 17.1 M-read bigbam IN THE SAME SESSION, so
the CRAM/BAM rate ratio is measured inside one host-bandwidth window
(the r12 anchors showed cross-window ratios are banding-dominated).

Reference point: the reference engine's own CRAM-vs-BAM overhead band
is 2.5-4x (htslib; benchmarking.rst); the r12 in-process slice anchor
measured this codec at ~1.3x.  Done-bar here: CRAM reads/s/core >= 0.5x
the same-window BAM rate.

Usage: python tools/cram_spark_anchor.py [--cores 32] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

CRAM = os.path.join(REPO, "testdata_big", "bigcram", "NA12878.slice.cram")
BAMS = os.path.join(REPO, "testdata_big", "bigbam")
FASTA = "/root/reference/src/test/resources/NA12878.slice.fasta"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=os.cpu_count() or 8)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from sequila_spark.operators.coverage import coverage
    from sequila_spark.sources import read_bam_native
    from sequila_spark.sources.bam import read_cram_native

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(args.cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    def cram_cov():
        # reader-provenance auto-prune re-plans the decode to the
        # coverage column set (operators/pileup-style contract)
        return coverage(
            read_cram_native(spark, CRAM, ref_path=FASTA), mode="blocks"
        )

    bam_files = sorted(
        os.path.join(BAMS, f) for f in os.listdir(BAMS) if f.endswith(".bam")
    )

    def bam_cov():
        return coverage(
            read_bam_native(
                spark,
                bam_files,
                with_tags=False,
                columns=["sample_id", "contig", "pos_start", "pos_end"],
                with_blocks=True,
            ),
            mode="blocks",
        )

    n_cram = read_cram_native(spark, CRAM, ref_path=FASTA, columns=["flag"]).count()
    n_bam = read_bam_native(spark, bam_files, with_tags=False, columns=["sample_id", "flag"]).count()

    # warm both plan shapes, then interleave timed runs (same window)
    cram_cov().write.format("noop").mode("overwrite").save()
    bam_cov().write.format("noop").mode("overwrite").save()
    best_c = best_b = float("inf")
    for _ in range(args.runs):
        t0 = time.perf_counter()
        cram_cov().write.format("noop").mode("overwrite").save()
        best_c = min(best_c, time.perf_counter() - t0)
        t0 = time.perf_counter()
        bam_cov().write.format("noop").mode("overwrite").save()
        best_b = min(best_b, time.perf_counter() - t0)

    import bench

    calib = bench._cpu_calibration()
    rate_c = n_cram / best_c / args.cores
    rate_b = n_bam / best_b / args.cores
    out = {
        "cram": {
            "file": "bigcram 4096 containers, 1.23 GB",
            "records": n_cram,
            "decode_coverage_sec": round(best_c, 2),
            "reads_per_sec_per_core": int(rate_c),
        },
        "bam": {
            "file": "bigbam 32 files, 1.02 GB",
            "records": n_bam,
            "decode_coverage_sec": round(best_b, 2),
            "reads_per_sec_per_core": int(rate_b),
        },
        "cram_over_bam_rate": round(rate_c / rate_b, 3),
        "cores": args.cores,
        "cpu_calib_sec": calib,
        "note": (
            "interleaved same-session legs: the ratio is window-invariant "
            "even when absolute rates are banded; reference htslib "
            "CRAM-vs-BAM band is 2.5-4x overhead (ratio 0.25-0.4)"
        ),
    }
    s = json.dumps(out, indent=1)
    print(s)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(s + "\n")


if __name__ == "__main__":
    main()

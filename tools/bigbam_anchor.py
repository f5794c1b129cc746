#!/usr/bin/env python3
"""Real-BAM end-to-end anchor: native decode of the ~1 GB amplified
NA12878 BAM set -> depth-of-coverage blocks, wall-clocked on local[N].

Two measured legs (both full pipelines from the BAM bytes):
  decode+coverage  read_bam_native -> coverage(blocks) -> noop write
  decode+parquet   read_bam_native -> write_alignments layout

Prints one JSON line with reads/sec and per-core reads/sec for the
BASELINE.md comparison (reference single-node WES coverage blocks:
161.5M reads in 6m54s @ 1 core = 390k reads/s/core; 64 s @ 10 cores
= 252k reads/s/core; benchmarking.rst:535-539).

Usage: python tools/bigbam_anchor.py [--cores 32] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

BAMS = "/root/repo/testdata_big/bigbam"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=os.cpu_count() or 8)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--skip-parquet", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from sequila_spark.operators.coverage import coverage
    from sequila_spark.sources import read_bam_native

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .config("spark.sql.shuffle.partitions", str(args.cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "48g")
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UseParallelGC -XX:-DontCompileHugeMethods "
            "-XX:ReservedCodeCacheSize=512m",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    files = sorted(
        os.path.join(BAMS, f) for f in os.listdir(BAMS) if f.endswith(".bam")
    )
    total_bytes = sum(os.path.getsize(f) for f in files)

    def decode():
        return read_bam_native(spark, files, with_tags=False)

    def decode_cov():
        # Coverage needs positions + aligned blocks only: prune the decode
        # (mapInArrow is opaque to Catalyst column pruning, so the pushdown
        # is explicit — the htsjdk path the reference benchmarks against
        # decodes per-field lazily and never renders seq/qual either) and
        # take the M/=/X blocks vectorized from the raw cigar ops instead
        # of re-parsing cigar strings in SQL.
        return read_bam_native(
            spark,
            files,
            with_tags=False,
            columns=["sample_id", "contig", "pos_start", "pos_end"],
            with_blocks=True,
        )

    n_reads = decode().count()  # also warms codegen + page cache

    # Primary leg: the fused decode->coverage-events reader (events are
    # clipped + pre-aggregated inside the decode task — the same fusion
    # the reference's physical operator does), completed by
    # coverage_from_events.  The declarative coverage() over the pruned
    # row decode is kept as a second timed leg (parity pinned by tests).
    from sequila_spark.operators.coverage import coverage_from_events
    from sequila_spark.sources.bam import read_bam_coverage_events

    def fused_cov():
        return coverage_from_events(
            read_bam_coverage_events(spark, files), mode="blocks"
        )

    best_cov = float("inf")
    best_decl = float("inf")
    best_unfused = float("inf")
    # warm ALL plan shapes before any timed run (the legs compile
    # different codegen and shuffle stages).  Since round 11 the
    # declarative call AUTO-fuses on reader lineage (operators/coverage
    # fuse=None), so the declarative leg converges to the fused one; the
    # fuse=False leg keeps the honest unfused number on record.
    fused_cov().write.format("noop").mode("overwrite").save()
    coverage(decode_cov(), mode="blocks").write.format("noop").mode(
        "overwrite"
    ).save()
    coverage(decode_cov(), mode="blocks", fuse=False).write.format(
        "noop"
    ).mode("overwrite").save()
    for _ in range(args.runs):
        t0 = time.perf_counter()
        fused_cov().write.format("noop").mode("overwrite").save()
        best_cov = min(best_cov, time.perf_counter() - t0)
        t0 = time.perf_counter()
        coverage(decode_cov(), mode="blocks").write.format("noop").mode(
            "overwrite"
        ).save()
        best_decl = min(best_decl, time.perf_counter() - t0)
        t0 = time.perf_counter()
        coverage(decode_cov(), mode="blocks", fuse=False).write.format(
            "noop"
        ).mode("overwrite").save()
        best_unfused = min(best_unfused, time.perf_counter() - t0)

    best_pq = None
    if not args.skip_parquet:
        from sequila_spark.sources.bam import write_alignments

        t0 = time.perf_counter()
        write_alignments(
            decode(), "/root/repo/testdata_big/bigbam_parquet", assume_sorted=True
        )
        best_pq = round(time.perf_counter() - t0, 1)

    # host-window calibration (bench.py's anchors + the repo reference):
    # anchor numbers from a degraded window are flagged, not trusted
    from bench import _calib_deviation, _cpu_calibration, _dev_ok, _load_calib_ref

    calib = _cpu_calibration()
    ref = _load_calib_ref()
    dev = _calib_deviation(calib, ref) if ref else {}
    out = {
        "files": len(files),
        "gb": round(total_bytes / 1e9, 2),
        "reads": n_reads,
        "cores": args.cores,
        "decode_coverage_sec": round(best_cov, 1),
        "reads_per_sec": int(n_reads / best_cov),
        "reads_per_sec_per_core": int(n_reads / best_cov / args.cores),
        "decode_coverage_declarative_sec": round(best_decl, 1),
        "decode_coverage_unfused_sec": round(best_unfused, 1),
        "decode_parquet_sec": best_pq,
        "cpu_calib_sec": calib,
        "calib_ok": _dev_ok(dev) if ref else None,
        "calib_worst_dev_pct": dev,
        "baseline_wes_blocks": {
            "reads_per_sec_per_core_1c": 390_000,
            "reads_per_sec_per_core_10c": 252_000,
            "src": "benchmarking.rst:535-539",
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Amplify the reference's real NA12878 multichrom slice (22.6k reads,
2.6 MB BAM) into a ~1 GB multi-file BAM set for the real-data end-to-end
anchor (SCALE.md): each of COPIES window-copies shifts every read by
k*WINDOW on one long synthetic contig, preserving the real base/qual/cigar
distributions; SHARDS files are written with the native BAM writer
(sources/bam.py::write_bam), giving the decoder natural file-level
parallelism (the multi-file layout a scatter-gather pipeline produces).

Usage: python tools/make_big_bam.py [--out /root/repo/testdata_big/bigbam]
                                    [--copies 384] [--shards 32]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

WINDOW = 30_000  # > max source coordinate (chrM 16571), so copies are disjoint


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/testdata_big/bigbam")
    ap.add_argument("--copies", type=int, default=384)
    ap.add_argument("--shards", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from sequila_spark.sources.bam import write_bam

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = (
        spark.read.parquet("/root/repo/fixtures/mdbam/reads.parquet")
        .where((F.col("flag").bitwiseAND(4) == 0) & F.col("contig").isNotNull())
        .drop("tag_MD")
        .cache()
    )
    n_base = base.count()
    refs = [("big1", args.copies * WINDOW + WINDOW)]
    os.makedirs(args.out, exist_ok=True)

    per_shard = args.copies // args.shards
    t0 = time.time()
    for s in range(args.shards):
        ks = list(range(s * per_shard, (s + 1) * per_shard))
        df = base.crossJoin(
            spark.createDataFrame([(k,) for k in ks], "k int")
        ).select(
            F.col("sample_id"),
            F.concat_ws("_", "qname", F.col("k").cast("string")).alias("qname"),
            "flag",
            F.lit("big1").alias("contig"),
            (F.col("pos_start") + F.col("k") * WINDOW).cast("int").alias("pos_start"),
            (F.col("pos_end") + F.col("k") * WINDOW).cast("int").alias("pos_end"),
            "mapq",
            "cigar",
            F.lit("big1").alias("rnext"),
            (F.col("pnext") + F.col("k") * WINDOW).cast("int").alias("pnext"),
            "tlen",
            "seq",
            "qual",
        )
        write_bam(df, f"{args.out}/part-{s:03d}.bam", refs=refs, sort=True)
        print(f"shard {s}: {time.time() - t0:.0f}s", flush=True)

    total = sum(
        os.path.getsize(os.path.join(args.out, f))
        for f in os.listdir(args.out)
        if f.endswith(".bam")
    )
    print(
        f"wrote {args.shards} BAMs, {args.copies} copies x {n_base} reads "
        f"= {args.copies * n_base} reads, {total / 1e9:.2f} GB "
        f"in {time.time() - t0:.0f}s"
    )
    spark.stop()


if __name__ == "__main__":
    main()

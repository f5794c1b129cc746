#!/usr/bin/env python3
"""Leg decomposition of dedup_ngram_jaccard (VERDICT r13 task 2) — the
largest headline query after r13 tamed pileup_agg (3.7-4.0 s, 11-12% of
the headline).  Same method as PROFILE_pileup_agg_r13: interleaved
min-of-runs in ONE session (ratios survive host banding), each leg a
strict superset of the previous so deltas attribute marginal cost:

  shingles   — doc_shingles(): char-array build + shingle-hash transform
               + explode + (id, sh) distinct.  The corpus-volume floor.
  ranked     — + global rarity order: freq groupBy, join, per-doc
               row_number window, sizes join.
  cands      — + probe/index prefix filters, the prefix equi-join on sh,
               the positional-filter groupBy.
  full       — + exact-Jaccard verify (broadcast path) = the gate query.

Also prints the selectivity ladder (docs -> shingle rows -> prefix rows
-> join matches -> candidates -> verified pairs) — the numbers that
decide whether remaining time is volume floor or a pruning miss.

Usage: python tools/profile_ngram.py [--sf-dir /root/testdata/sf0.1]
           [--runs 3] [--threshold 0.8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--threshold", type=float, default=0.8)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from sequila_spark.operators import dedup as D

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    t = args.threshold

    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))

    def leg_shingles():
        return D.doc_shingles(docs)

    def leg_ranked():
        sh = D.doc_shingles(docs)
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
        freq = sh.groupBy("sh").agg(F.count("*").alias("f"))
        return (
            sh.join(freq, "sh")
            .withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("doc_id").orderBy(F.col("f"), F.col("sh"))
                ),
            )
            .join(sizes, "doc_id")
        )

    def leg_cands():
        # the internal pipeline up to (but excluding) verify: replicate
        # ngram_jaccard_pairs' candidate section (kept in sync by the
        # count assertions below)
        ranked = leg_ranked()
        probe = ranked.where(
            F.col("rk") <= F.floor((1.0 - t) * F.col("n") + 1e-9) + 1
        )
        two_t = 2.0 * t / (1.0 + t)
        index = ranked.where(
            F.col("rk") <= F.col("n") - F.ceil(F.lit(two_t) * F.col("n") - 1e-9) + 1
        )
        p = probe.select(
            F.col("doc_id").alias("id_p"), "sh",
            F.col("rk").alias("rk_p"), F.col("n").alias("n_p"),
        )
        i = index.select(
            F.col("doc_id").alias("id_i"), "sh",
            F.col("rk").alias("rk_i"), F.col("n").alias("n_i"),
        )
        matches = p.join(i, "sh").where(
            (
                (F.col("n_i") < F.col("n_p"))
                | ((F.col("n_i") == F.col("n_p")) & (F.col("id_i") < F.col("id_p")))
            )
            & (F.col("n_i") >= F.lit(t) * F.col("n_p") - 1e-9)
        )
        alpha = F.ceil(F.lit(t) / (1.0 + t) * (F.col("n_p") + F.col("n_i")) - 1e-9)
        return (
            matches.groupBy("id_p", "id_i")
            .agg(
                F.count("*").alias("__cnt"),
                F.max("rk_p").alias("__mrk_p"),
                F.max("rk_i").alias("__mrk_i"),
                F.first("n_p").alias("n_p"),
                F.first("n_i").alias("n_i"),
            )
            .where(
                F.col("__cnt")
                + F.least(
                    F.col("n_p") - F.col("__mrk_p"),
                    F.col("n_i") - F.col("__mrk_i"),
                )
                >= alpha
            )
            .select(
                F.least("id_p", "id_i").alias("id_1"),
                F.greatest("id_p", "id_i").alias("id_2"),
            )
        )

    def leg_ranked_collapsed():
        sh = D.doc_shingles_raw(docs).repartition(F.col("sh")).distinct()
        withf = sh.withColumn("f", F.count("*").over(Window.partitionBy("sh")))
        wdoc = Window.partitionBy("doc_id")
        return withf.select(
            "doc_id", "sh",
            F.row_number().over(wdoc.orderBy(F.col("f"), F.col("sh"))).alias("rk"),
            F.count("*").over(wdoc).alias("n"),
        )

    def leg_full_classic():
        return D.ngram_jaccard_pairs(docs, threshold=t, plan="classic")

    def leg_full_collapsed():
        return D.ngram_jaccard_pairs(docs, threshold=t, plan="collapsed")

    legs = {
        "shingles": leg_shingles,
        "ranked": leg_ranked,
        "ranked_collapsed": leg_ranked_collapsed,
        "cands": leg_cands,
        "full": leg_full_classic,
        "full_collapsed": leg_full_collapsed,
    }

    # warm each plan once, then interleave timed runs; rebuild the
    # DataFrame per run (re-collecting one object reuses shuffle stages)
    for fn in legs.values():
        fn().write.format("noop").mode("overwrite").save()
    best = {k: float("inf") for k in legs}
    for _ in range(args.runs):
        for k, fn in legs.items():
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best[k] = min(best[k], time.perf_counter() - t0)

    # selectivity ladder (uncached counts, one pass each)
    stats = {}
    stats["docs"] = docs.count()
    stats["chars"] = docs.selectExpr("sum(length(text))").collect()[0][0]
    sh = D.doc_shingles(docs).persist()
    stats["shingle_rows_distinct"] = sh.count()
    ranked = leg_ranked()
    stats["prefix_probe_rows"] = ranked.where(
        F.col("rk") <= F.floor((1.0 - t) * F.col("n") + 1e-9) + 1
    ).count()
    two_t = 2.0 * t / (1.0 + t)
    stats["prefix_index_rows"] = ranked.where(
        F.col("rk") <= F.col("n") - F.ceil(F.lit(two_t) * F.col("n") - 1e-9) + 1
    ).count()
    stats["candidates"] = leg_cands().count()
    stats["verified_pairs"] = leg_full_collapsed().count()
    sh.unpersist()

    import bench

    out = {
        "sf_dir": args.sf_dir,
        "threshold": t,
        "legs_sec_best": {k: round(v, 2) for k, v in best.items()},
        "marginal_sec": {
            "shingles": round(best["shingles"], 2),
            "rank_order": round(best["ranked"] - best["shingles"], 2),
            "prefix_join_cands": round(best["cands"] - best["ranked"], 2),
            "verify": round(best["full"] - best["cands"], 2),
        },
        "collapsed_vs_classic": {
            "ranked": round(best["ranked_collapsed"] / best["ranked"], 3),
            "full": round(best["full_collapsed"] / best["full"], 3),
        },
        "stats": stats,
        "cpu_calib_sec": bench._cpu_calibration(),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Leg decomposition of dedup_minhash_pairs (VERDICT r14 task 2) — the
largest non-floored headline query after r14 tamed ngram (3.16 s r13
flat, ~10% of the headline).  Same method as PROFILE_dedup_ngram_r14:
interleaved min-of-runs in ONE session (ratios survive host banding),
each leg a strict superset of the previous so deltas attribute marginal
cost:

  shingles_raw — doc_shingles_raw(): char-array build + shingle-hash
                 transform + explode, NO distinct (r14 plan).  The
                 corpus-volume floor.
  signatures   — + the 16-permutation min-hash groupBy(doc_id) agg
                 (map-side-combined partial minima).
  cands        — + LSH banding posexplode, the (band, bkey) self-join,
                 pair distinct.  Whether this re-runs the signature agg
                 per join side (ngram's r14 double-execution pathology)
                 or ReuseExchange collapses it shows up as the delta
                 here vs 2x the signatures leg.
  full         — + exact-Jaccard verify (broadcast path: collect_set ->
                 toPandas -> broadcast -> mapInPandas) = the gate query.

Also prints the selectivity ladder (docs -> shingle rows -> band rows ->
candidate pairs -> verified pairs) and the executed plan's Exchange /
ReusedExchange counts for the cands leg — the numbers that decide
whether remaining time is volume floor or duplicated work.

Usage: python tools/profile_minhash.py [--sf-dir /root/testdata/sf0.1]
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
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
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

    def leg_shingles_raw():
        return D.doc_shingles_raw(docs)

    def leg_signatures():
        return D.minhash_signatures(
            docs, _shingles=D.doc_shingles_raw(docs)
        )

    def leg_cands():
        return D.lsh_candidate_pairs(leg_signatures())

    def leg_full():
        return D.minhash_dedup_pairs(docs, threshold=t)

    legs = {
        "shingles_raw": leg_shingles_raw,
        "signatures": leg_signatures,
        "cands": leg_cands,
        "full": leg_full,
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

    # physical shape of the candidate join: does the signature agg run
    # once (ReusedExchange) or once per join side?
    cdf = leg_cands()
    cdf.write.format("noop").mode("overwrite").save()
    plan = cdf._jdf.queryExecution().executedPlan().toString()
    shape = {
        "exchanges": plan.count("Exchange hashpartitioning"),
        "reused_exchanges": plan.count("ReusedExchange"),
        "hash_aggregates": plan.count("HashAggregate"),
        "objagg": plan.count("ObjectHashAggregate")
        + plan.count("SortAggregate"),
    }

    stats = {}
    stats["docs"] = docs.count()
    stats["chars"] = docs.selectExpr("sum(length(text))").collect()[0][0]
    stats["shingle_rows_raw"] = leg_shingles_raw().count()
    stats["band_rows"] = stats["docs"] * D.BANDS
    stats["candidates"] = leg_cands().count()
    stats["verified_pairs"] = leg_full().count()

    import bench

    out = {
        "sf_dir": args.sf_dir,
        "threshold": t,
        "legs_sec_best": {k: round(v, 2) for k, v in best.items()},
        "cands_plan_shape": shape,
        "selectivity": stats,
        "calibration": bench._cpu_calibration(),
    }
    print(json.dumps(out, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()

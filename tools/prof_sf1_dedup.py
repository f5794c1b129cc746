#!/usr/bin/env python3
"""Leg decomposition at sf1 for the dedup/similarity queries whose
BENCH_sf1 r15 readings regressed vs r14 (ngram 22->102/161 s, minhash
37->70/132 s, ann_lsh 3.3->17 s): time each pipeline leg twice (cold,
warm) in ONE bench-conf session so the slow leg is attributed before any
fix is attempted (guide section 1: measure first).

Usage: SPARK_GRAFT_SF_DIR=/tmp/testdata/sf1 python tools/prof_sf1_dedup.py
           [ngram minhash ann]
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/testdata/sf1")

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def _session():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("prof_sf1_dedup")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UseParallelGC -XX:-DontCompileHugeMethods "
            "-XX:ReservedCodeCacheSize=512m",
        )
        .getOrCreate()
    )


def t(spark, label, df, runs=2):
    out = []
    for i in range(runs):
        spark.sparkContext.setJobDescription(f"{label}#{i}")
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        out.append(round(time.perf_counter() - t0, 3))
    print(f"{label:44s} {out}", flush=True)
    return out


def tcall(label, fn, runs=2):
    out = []
    for i in range(runs):
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 3))
    print(f"{label:44s} {out}", flush=True)
    return out


def main() -> None:
    which = set(sys.argv[1:]) or {"ngram", "minhash", "ann"}
    spark = _session()
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    res: dict[str, dict] = {}

    docs = entry._docs(spark, SF_DIR)

    if "ngram" in which:
        from sequila_spark.operators import dedup as D

        r = res["ngram"] = {}
        sh_raw = D.doc_shingles_raw(docs)
        r["raw_count"] = tcall("ngram raw shingle count()", lambda: sh_raw.count())
        n_raw = sh_raw.count()
        r["n_raw"] = n_raw
        print("  raw shingle rows:", n_raw, "budget:", D._verify_bcast_row_budget())
        # candidate pipeline exactly as ngram_jaccard_pairs builds it,
        # stopped before the verify
        from pyspark.sql import Window

        sh = sh_raw.repartition(F.col("sh")).distinct()
        withf = sh.withColumn("f", F.count("*").over(Window.partitionBy("sh")))
        wdoc = Window.partitionBy("doc_id")
        ranked = withf.select(
            "doc_id", "sh",
            F.row_number().over(wdoc.orderBy(F.col("f"), F.col("sh"))).alias("rk"),
            F.count("*").over(wdoc).alias("n"),
        )
        thr = 0.8
        probe = ranked.where(
            F.col("rk") <= F.floor((1.0 - thr) * F.col("n") + 1e-9) + 1
        ).persist()
        r["probe_count"] = tcall("ngram probe materialize+count()", lambda: probe.count())
        two_t = 2.0 * thr / (1.0 + thr)
        index = probe.where(
            F.col("rk") <= F.col("n") - F.ceil(F.lit(two_t) * F.col("n") - 1e-9) + 1
        )
        p = probe.select(F.col("doc_id").alias("id_p"), "sh", F.col("rk").alias("rk_p"), F.col("n").alias("n_p"))
        i_ = index.select(F.col("doc_id").alias("id_i"), "sh", F.col("rk").alias("rk_i"), F.col("n").alias("n_i"))
        matches = p.join(i_, "sh").where(
            ((F.col("n_i") < F.col("n_p")) | ((F.col("n_i") == F.col("n_p")) & (F.col("id_i") < F.col("id_p"))))
            & (F.col("n_i") >= F.lit(thr) * F.col("n_p") - 1e-9)
        )
        r["matches_count"] = tcall("ngram matches count()", lambda: matches.count())
        r["n_matches"] = matches.count()
        alpha = F.ceil(F.lit(thr) / (1.0 + thr) * (F.col("n_p") + F.col("n_i")) - 1e-9)
        cands = (
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
                + F.least(F.col("n_p") - F.col("__mrk_p"), F.col("n_i") - F.col("__mrk_i"))
                >= alpha
            )
            .select(F.least("id_p", "id_i").alias("id_1"), F.greatest("id_p", "id_i").alias("id_2"))
        )
        r["cands_count"] = tcall("ngram cands count()", lambda: cands.count())
        r["n_cands"] = cands.count()
        print("  matches rows:", r["n_matches"], "cands:", r["n_cands"])
        probe.unpersist()
        # full query, both verify modes
        r["full_broadcast"] = t(
            spark, "ngram FULL verify=broadcast",
            D.ngram_jaccard_pairs(docs, threshold=0.8, verify="broadcast"),
        )
        r["full_join"] = t(
            spark, "ngram FULL verify=join",
            D.ngram_jaccard_pairs(docs, threshold=0.8, verify="join"),
        )
        r["full_auto"] = t(
            spark, "ngram FULL verify=auto (bench query)",
            D.ngram_jaccard_pairs(docs, threshold=0.8),
        )

    if "minhash" in which:
        from sequila_spark.operators import dedup as D

        r = res["minhash"] = {}
        x = F.col("sh") % D.MINHASH_P
        raw = D.doc_shingles_raw(docs)
        combined = raw.groupBy("doc_id").agg(
            *[
                (F.min((D.PERM_A[i] * x + D.PERM_B[i]) % D.MINHASH_P)).cast("long").alias(f"mh{i}")
                for i in range(D.NUM_PERM)
            ],
            F.array_sort(F.collect_set("sh")).alias("shset"),
        )
        r["combined_agg"] = tcall("minhash COMBINED 129-agg count()", lambda: combined.count())
        sigs_only = raw.groupBy("doc_id").agg(
            *[
                (F.min((D.PERM_A[i] * x + D.PERM_B[i]) % D.MINHASH_P)).cast("long").alias(f"mh{i}")
                for i in range(D.NUM_PERM)
            ]
        )
        r["sigs_only_agg"] = tcall("minhash SIGS-only 128-agg count()", lambda: sigs_only.count())
        sets_only = raw.groupBy("doc_id").agg(
            F.array_sort(F.collect_set("sh")).alias("shset")
        )
        r["sets_only_agg"] = tcall("minhash SETS-only collect_set count()", lambda: sets_only.count())
        r["full_broadcast"] = t(
            spark, "minhash FULL verify=broadcast (bench query)",
            D.minhash_dedup_pairs(docs, threshold=0.8, verify="broadcast"),
        )

    if "ann" in which:
        from sequila_spark.operators import similarity as S

        r = res["ann"] = {}
        embs = entry._embs(spark, SF_DIR)
        queries_df = embs.where(F.col("vec_id") % 50 == 0)
        buckets = S._buckets_batch(None, None)
        ct = embs.select(
            F.col("vec_id").alias("neighbor_id"),
            S.quantized(F.col("embedding")).alias("cv"),
            buckets(F.col("embedding")).alias("bs"),
        ).select("neighbor_id", "cv", "bs", F.posexplode("bs").alias("table", "bucket"))
        probes = S._probe_buckets_batch(S.N_PLANES, S.N_TABLES, 0)
        qt = (
            queries_df.select(
                F.col("vec_id").alias("query_id"),
                S.quantized(F.col("embedding")).alias("qv"),
                probes(F.col("embedding")).alias("pbs"),
            )
            .select("query_id", "qv", "pbs", F.posexplode("pbs").alias("pos", "bucket"))
            .select("query_id", "qv", "pbs", (F.col("pos") / 1).cast("int").alias("table"), "bucket")
        )
        joined = ct.join(F.broadcast(qt), ["table", "bucket"]).where(
            F.col("query_id") != F.col("neighbor_id")
        )
        r["collisions"] = tcall("ann collision count()", lambda: joined.count())
        r["n_collisions"] = joined.count()
        print("  collisions:", r["n_collisions"])
        r["full"] = t(
            spark, "ann FULL (bench query)",
            S.ann_topk_lsh(embs, queries_df, k=5),
        )

    with open("/tmp/prof_sf1_dedup.json", "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: {kk: vv for kk, vv in v.items() if not kk.startswith("n_")} for k, v in res.items()}))
    spark.stop()


if __name__ == "__main__":
    main()

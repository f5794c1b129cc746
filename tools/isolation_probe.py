#!/usr/bin/env python3
"""Isolated-executor scale-out probe for the Python-verify-bound queries
(VERDICT r8 #6): is the 25-37% local[32] efficiency of
dedup_minhash_pairs / dedup_ngram_jaccard / text_features one-JVM
resource sharing, or a real plan limit?

Four legs, same machine, same sf1 inputs, same shuffle.partitions=cores:

  local[4]                 — 4 threads, ONE shared JVM heap/GC
  local-cluster[4,1,4096]  — same 4 cores as 4 ISOLATED executor JVMs
  local[32]                — 32 threads, one JVM (the SCALE.md table leg)
  local-cluster[4,8,6144]  — same 32 cores as 4 isolated JVMs x 8

What each comparison isolates:
  * local[4] vs local-cluster[4,1]: JVM isolation at fixed core count —
    heap/GC contention, not bandwidth (both share the machine's bus).
  * local[32] vs local-cluster[4,8]: ditto at saturation.
  * 4-core legs vs 32-core legs, per-task inflation: the REST stage
    metrics give SUM(executorRunTime) per query — if the same plan's
    total task time INFLATES with concurrency, tasks are stalling on a
    shared hardware resource (memory bandwidth); if it stays flat while
    wall stops dropping, the plan has a serial/skewed section.

Per query per leg: wall (min of RUNS), sum executorRunTime/CpuTime,
jvmGcTime from the UI REST API.  Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = ["dedup_minhash_pairs", "dedup_ngram_jaccard", "text_features"]
LEGS = {
    "local4": ("local[4]", 4),
    "cluster4x1": ("local-cluster[4,1,4096]", 4),
    "local32": ("local[32]", 32),
    "cluster4x8": ("local-cluster[4,8,6144]", 32),
}
RUNS = 2


def rest(app_url: str, path: str):
    with urllib.request.urlopen(app_url + path, timeout=15) as r:
        return json.load(r)


def run_leg(leg: str, sf_dir: str) -> None:
    master, cores = LEGS[leg]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(master)
        .config("spark.sql.shuffle.partitions", str(cores))
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedJobs", "5000")
        .config("spark.ui.retainedStages", "5000")
        .config("spark.driver.memory", "8g")
        .config("spark.executorEnv.PYTHONPATH", REPO)
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    app_url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"

    import __spark_entry__ as E

    qs = E.queries()
    out: dict[str, dict] = {}
    for name in QUERIES:
        best, group_best = None, None
        for r in range(RUNS):
            group = f"{name}#{r}"
            sc.setJobGroup(group, group)
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            sc.setJobGroup("idle", "idle")
            if best is None or wall < best:
                best, group_best = wall, group
        jobs = [j for j in rest(app_url, "/jobs") if j.get("jobGroup") == group_best]
        sids = sorted({s for j in jobs for s in j["stageIds"]})
        run_ms = cpu_ms = gc_ms = 0
        for sid in sids:
            for st in rest(app_url, f"/stages/{sid}"):
                if st["status"] != "COMPLETE":
                    continue
                run_ms += st["executorRunTime"]
                cpu_ms += st["executorCpuTime"] // 1_000_000
                gc_ms += st["jvmGcTime"]
        out[name] = {
            "wall_sec": round(best, 2),
            "task_run_sec": round(run_ms / 1000, 1),
            "task_cpu_sec": round(cpu_ms / 1000, 1),
            "gc_sec": round(gc_ms / 1000, 1),
        }
        print(f"# {leg} {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"leg": leg, "master": master, "cores": cores, "queries": out}))
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", default=None, choices=list(LEGS))
    ap.add_argument("--sf-dir", default="/root/repo/testdata_big/sf1")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.leg:
        run_leg(args.leg, args.sf_dir)
        return

    results = {}
    for leg in LEGS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--leg", leg,
             "--sf-dir", args.sf_dir],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        sys.stderr.write(proc.stderr[-2000:])
        if proc.returncode != 0:
            results[leg] = {"err": proc.stderr[-800:]}
            continue
        results[leg] = json.loads(proc.stdout.strip().splitlines()[-1])
    line = json.dumps(results)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()

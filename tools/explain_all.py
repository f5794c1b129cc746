#!/usr/bin/env python3
"""Capture .explain("formatted") for every declared query into
plans/<tag>/<query>_<suffix>.txt (r15 optimization-round deliverable).

Usage: python tools/explain_all.py <suffix> [query ...]
  suffix: e.g. 'before' / 'after'
  query:  optional subset; default = all of queries().

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS, SPARK_GRAFT_PLANS_TAG (default r15).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
TAG = os.environ.get("SPARK_GRAFT_PLANS_TAG", "r15")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("sequila_spark_explain")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(here, "plans", TAG)
    os.makedirs(outdir, exist_ok=True)

    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")

    qmap = entrymod.queries()
    names = [n for n in qmap if not only or n in only]
    for name in names:
        try:
            df = qmap[name](spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # keep going; record the failure
            txt = f"EXPLAIN FAILED: {exc!r}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        print(f"{name}: {len(txt)} chars", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

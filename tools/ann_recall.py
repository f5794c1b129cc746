#!/usr/bin/env python3
"""ANN recall instrumentation (VERDICT r13 task 5) — RECALL_r14.json.

The `similarity_ann_lsh` / `similarity_ivf` driver gates pin exact hash
equality at small scale; at 100 TB the exactness gate cannot run — the
operators' REAL contract is recall@k vs brute force as a function of the
tuning knobs.  This sweeps:

* hyperplane LSH over (n_planes, n_tables), measuring recall@k against
  the `cosine_topk` brute-force truth AND the candidate fraction each
  configuration scores (the quantity the approximation buys), and
  verifying the documented closed form
  recall = 1 - (1 - p^planes)^tables, p = 1 - theta/pi
  (operators/similarity.py:24-26) empirically: the prediction is
  evaluated PER TRUTH PAIR at its actual cosine and averaged — not a
  single-theta estimate.

* IVF over (n_lists, n_probes), measuring recall@k and the scanned
  fraction (occupancy of the probed lists / corpus size), the quantity
  nprobe trades against recall.

Queries mirror the driver gate (vec_id % 50 == 0).  Runs at sf1 by
default (20k vectors x 64 dims, 400 queries).

Usage: python tools/ann_recall.py [--sf-dir /tmp/testdata/sf1]
           [--k 10] [--out RECALL_r14.json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LSH_GRID = [(4, 4), (4, 8), (6, 4), (6, 8), (6, 16), (8, 8), (8, 16)]
IVF_GRID = [(16, 1), (16, 2), (16, 4), (16, 8), (64, 2), (64, 4), (64, 8), (64, 16)]


def truth_sets(rows):
    """{query_id: {neighbor_id: cosine}} from collected top-k rows."""
    t: dict = {}
    for r in rows:
        t.setdefault(r["query_id"], {})[r["neighbor_id"]] = r["cosine"]
    return t


def recall_against(truth: dict, rows) -> float:
    got: dict = {}
    for r in rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = sum(
        len(set(nbrs) & got.get(q, set())) for q, nbrs in truth.items()
    )
    total = sum(len(nbrs) for nbrs in truth.values())
    return hits / total


def predicted_lsh_recall(truth: dict, planes: int, tables: int) -> float:
    """The documented closed form, averaged over the actual truth-pair
    cosines: P(retrieved) = 1-(1-p^planes)^tables, p = 1 - theta/pi."""
    probs = []
    for nbrs in truth.values():
        for cos in nbrs.values():
            theta = math.acos(max(-1.0, min(1.0, cos)))
            p = 1.0 - theta / math.pi
            probs.append(1.0 - (1.0 - p**planes) ** tables)
    return sum(probs) / len(probs)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/testdata/sf1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default="RECALL_r14.json")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from sequila_spark.operators import similarity as SIM

    spark = (
        SparkSession.builder.master(f"local[{os.cpu_count() or 8}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    embs = spark.read.parquet(
        os.path.join(args.sf_dir, "embeddings.parquet")
    ).persist()
    queries = embs.where(F.col("vec_id") % 50 == 0).persist()
    n_corpus, n_queries = embs.count(), queries.count()
    print(f"# corpus {n_corpus}, queries {n_queries}", file=sys.stderr)

    t0 = time.time()
    truth_rows = SIM.cosine_topk(embs, queries, k=args.k).collect()
    truth = truth_sets(truth_rows)
    sec_truth = round(time.time() - t0, 1)
    print(f"# brute-force truth in {sec_truth}s", file=sys.stderr)

    lsh_results = []
    for planes, tables in LSH_GRID:
        t0 = time.time()
        rows = SIM.ann_topk_lsh(
            embs, queries, k=args.k, n_planes=planes, n_tables=tables
        ).collect()
        sec = round(time.time() - t0, 1)
        # candidate fraction: distinct (query, neighbor) bucket collisions
        # per query over the corpus size — what the LSH prunes down to
        b = SIM._buckets_batch(planes, tables)
        ct = embs.select(
            F.col("vec_id").alias("neighbor_id"),
            F.posexplode(b(F.col("embedding"))).alias("table", "bucket"),
        )
        qt = queries.select(
            F.col("vec_id").alias("query_id"),
            F.posexplode(b(F.col("embedding"))).alias("table", "bucket"),
        )
        n_cand = (
            ct.join(F.broadcast(qt), ["table", "bucket"])
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id")
            .distinct()
            .count()
        )
        r = {
            "planes": planes,
            "tables": tables,
            "recall": round(recall_against(truth, rows), 4),
            "predicted_recall": round(
                predicted_lsh_recall(truth, planes, tables), 4
            ),
            "cand_frac": round(n_cand / (n_queries * (n_corpus - 1)), 4),
            "sec": sec,
        }
        lsh_results.append(r)
        print(f"# lsh {r}", file=sys.stderr)

    ivf_results = []
    for n_lists, n_probes in IVF_GRID:
        t0 = time.time()
        rows = SIM.ivf_topk(
            embs, queries, k=args.k, n_lists=n_lists, n_probes=n_probes
        ).collect()
        sec = round(time.time() - t0, 1)
        r = {
            "n_lists": n_lists,
            "n_probes": n_probes,
            "recall": round(recall_against(truth, rows), 4),
            # each query scans the probed lists' occupancy; with balanced
            # lists that is ~ n_probes/n_lists of the corpus
            "scan_frac_nominal": round(n_probes / n_lists, 4),
            "sec": sec,
        }
        ivf_results.append(r)
        print(f"# ivf {r}", file=sys.stderr)

    artifact = {
        "sf_dir": args.sf_dir,
        "k": args.k,
        "n_corpus": n_corpus,
        "n_queries": n_queries,
        "sec_truth": sec_truth,
        "lsh": lsh_results,
        "ivf": ivf_results,
        "operating_point": {
            "lsh": {"planes": SIM.N_PLANES, "tables": SIM.N_TABLES},
            "ivf": {"n_lists": SIM.IVF_LISTS, "n_probes": SIM.IVF_PROBES},
        },
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"out": args.out, "lsh_points": len(lsh_results),
                      "ivf_points": len(ivf_results)}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Generalized interleaved commit A/B for one bench query — the
tools/ab_embedding.py pattern (A B A B ..., each leg a fresh
single-session `SPARK_GRAFT_BENCH_ONLY=<q> bench.py` from a detached git
worktree of that commit, calibration anchors recorded per leg) with the
two commits and the query taken from the command line.

Used in r15 to adjudicate per-query bench deltas whose commit-time
in-session A/B disagrees with the cross-session bench (window banding vs
real regression).

Usage: python tools/ab_commits.py --a <commit> --b <commit>
           --query dedup_ngram_jaccard [--rounds 3] [--out AB.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def ensure_worktree(commit: str, path: str) -> None:
    if os.path.exists(os.path.join(path, "bench.py")):
        return
    subprocess.run(
        ["git", "worktree", "add", "--detach", path, commit],
        cwd=REPO, check=True, capture_output=True,
    )


def run_leg(path: str, query: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_BENCH_ONLY"] = query
    env["SPARK_GRAFT_BENCH_SESSIONS"] = "1"
    env["PYTHONPATH"] = path
    p = subprocess.run(
        [sys.executable, "bench.py"], cwd=path, env=env,
        capture_output=True, text=True, timeout=900,
    )
    line = [
        ln for ln in p.stdout.strip().splitlines()
        if ln.startswith("{") and '"queries"' in ln
    ]
    if not line:
        raise RuntimeError(f"no bench JSON from {path}:\n{p.stdout[-2000:]}"
                           f"\n{p.stderr[-2000:]}")
    d = json.loads(line[-1])
    return {
        "sec": d["queries"][query],
        "calib": {k: d.get(k) for k in ("cpu_calib_sec", "calib_ok",
                                        "calib_worst_dev_pct") if k in d},
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="commit A (old)")
    ap.add_argument("--b", required=True, help="commit B (new)")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--query", required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    wa = f"/tmp/ab_{args.a[:7]}"
    wb = f"/tmp/ab_{args.b[:7]}"
    ensure_worktree(args.a, wa)
    ensure_worktree(args.b, wb)

    legs: list[dict] = []
    for i in range(args.rounds):
        for tag, path in (("A", wa), ("B", wb)):
            leg = run_leg(path, args.query)
            leg["leg"] = f"{tag}#{i}"
            legs.append(leg)
            print(f"# {leg}", file=sys.stderr, flush=True)

    a = [leg["sec"] for leg in legs if leg["leg"].startswith("A")]
    b = [leg["sec"] for leg in legs if leg["leg"].startswith("B")]
    out = {
        "query": args.query,
        "a_commit": args.a,
        "b_commit": args.b,
        "a_secs": a,
        "b_secs": b,
        "a_best": min(a),
        "b_best": min(b),
        "ratio_best": round(min(b) / min(a), 3),
        "legs": legs,
        "interpretation": (
            "ratio ~1.0 => cross-session delta was host-window banding; "
            "ratio >= 1.15 in the same window => real regression"
        ),
    }
    s = json.dumps(out, indent=1)
    print(s)
    if args.out:
        with open(args.out, "w") as f:
            f.write(s + "\n")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Interleaved A/B adjudication of the dedup_embedding r12->r13 drift
(VERDICT r13 task 3) — AB_EMBED_r14.json.

`dedup_embedding` moved 1.62 -> 1.84-1.94 s across r12->r13 in BOTH the
driver and local windows with zero changes to dedup.py and no plan
fingerprint change.  Cross-window comparisons are banding-dominated (the
repo's two-anchor doctrine), so this tool runs the r12-end and r13-end
checkouts INTERLEAVED in one host window — the same session pattern as
tools/cram_spark_anchor.py: A B A B A B, each leg a fresh process
running `SPARK_GRAFT_BENCH_ONLY=dedup_embedding bench.py` from a git
worktree of that commit, with both calibration anchors recorded per leg.

If the interleaved ratio is ~1.0, the drift was window banding (the r13
runs simply landed in slower windows); if the r13 legs are consistently
slower in the SAME window, the cause is real and needs bisecting.

Usage: python tools/ab_embedding.py [--rounds 3] [--out AB_EMBED_r14.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

A_COMMIT = "e42485b"  # round 12 end (BENCH_r12 code)
B_COMMIT = "40c2732"  # round 13 end (BENCH_r13 code)


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
    # one session per leg — the A/B interleave ACROSS legs supplies the
    # repetition; 3 sessions per leg would triple the window length and
    # weaken the same-window property the interleave exists for
    env["SPARK_GRAFT_BENCH_SESSIONS"] = "1"
    env["PYTHONPATH"] = path
    # each leg appends to ITS OWN bench_history inside the worktree — the
    # repo's append-only history stays untouched by A/B probes
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
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--query", default="dedup_embedding")
    ap.add_argument("--out", default="AB_EMBED_r14.json")
    args = ap.parse_args()

    wa, wb = "/tmp/ab_r12", "/tmp/ab_r13"
    ensure_worktree(A_COMMIT, wa)
    ensure_worktree(B_COMMIT, wb)

    legs: list[dict] = []
    for i in range(args.rounds):
        for tag, path in (("r12", wa), ("r13", wb)):
            leg = run_leg(path, args.query)
            leg["leg"] = f"{tag}#{i}"
            legs.append(leg)
            print(f"# {leg}", file=sys.stderr, flush=True)

    a = [leg["sec"] for leg in legs if leg["leg"].startswith("r12")]
    b = [leg["sec"] for leg in legs if leg["leg"].startswith("r13")]
    out = {
        "query": args.query,
        "a_commit": A_COMMIT,
        "b_commit": B_COMMIT,
        "r12_secs": a,
        "r13_secs": b,
        "r12_best": min(a),
        "r13_best": min(b),
        "ratio_best": round(min(b) / min(a), 3),
        "legs": legs,
        "interpretation": (
            "ratio ~1.0 => the r12->r13 drift was host-window banding; "
            "ratio >= 1.15 in the same window => real regression, bisect"
        ),
    }
    s = json.dumps(out, indent=1)
    print(s)
    with open(args.out, "w") as f:
        f.write(s + "\n")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Paired flat-window bench A/B: poll the CPU anchors and, when the window
is flat (same gates as bench_watch), run SINGLE-SESSION full benches of an
OLD checkout and the CURRENT repo interleaved in that one window
(O N N O O N ... round-alternating), recording the calibration between
legs.  Per-query medians + ratios land in --out.

This is the attribution instrument for a round whose host bands ±2x: a
paired same-window A/B at whole-bench granularity, immune to the
cross-session drift that makes two separate absolute benches incomparable.

Usage: python tools/bench_pair_watch.py --old-dir /tmp/r16_base \
           [--rounds 3] [--poll 150] [--max-hours 4] [--out BENCH_r16_pair.json]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def calib() -> dict:
    import bench

    return bench._cpu_calibration()


def run_leg(cwd: str) -> dict | None:
    env = dict(
        os.environ,
        SPARK_GRAFT_BENCH_SESSIONS="1",
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "32"),
    )
    p = subprocess.run(
        [sys.executable, "bench.py"], cwd=cwd, env=env,
        capture_output=True, text=True, timeout=1800,
    )
    for ln in reversed(p.stdout.strip().splitlines()):
        if ln.startswith("{") and '"queries"' in ln:
            return json.loads(ln)
    return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--old-dir", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--poll", type=int, default=150)
    ap.add_argument("--md5-band", type=float, default=15.0)
    ap.add_argument("--memcpy-band", type=float, default=30.0)
    ap.add_argument("--max-hours", type=float, default=4.0)
    ap.add_argument("--out", default="BENCH_r16_pair.json")
    args = ap.parse_args()

    ref = json.load(open(os.path.join(REPO, "CALIB_REF.json")))
    t_end = time.time() + args.max_hours * 3600
    while time.time() < t_end:
        c = calib()
        md5_dev = (c["md5_256mb"] / ref["md5_256mb"] - 1) * 100
        mem_dev = (c["memcpy_1gb"] / ref["memcpy_1gb"] - 1) * 100
        flat = abs(md5_dev) <= args.md5_band and mem_dev <= args.memcpy_band
        print(
            f"# calib md5 {md5_dev:+.1f}% memcpy {mem_dev:+.1f}% "
            f"{'FLAT - pairing' if flat else 'banded'}",
            file=sys.stderr, flush=True,
        )
        if not flat:
            time.sleep(args.poll)
            continue
        legs: list[dict] = []
        calibs = [c]
        out = {"admitting_calib": c, "legs": legs, "calibs_between": calibs}
        for rnd in range(args.rounds):
            order = ("old", "new") if rnd % 2 == 0 else ("new", "old")
            for kind in order:
                cwd = args.old_dir if kind == "old" else REPO
                r = run_leg(cwd)
                legs.append({"kind": kind, "round": rnd, "result": r})
                print(
                    f"# round {rnd} {kind}: "
                    f"{r.get('value') if r else 'FAILED'}",
                    file=sys.stderr, flush=True,
                )
                time.sleep(5)
                calibs.append(calib())
                with open(os.path.join(REPO, args.out), "w") as f:
                    json.dump(out, f, indent=1)
        # aggregate: per-query median across legs of each kind
        med = {}
        for kind in ("old", "new"):
            rs = [l["result"] for l in legs if l["kind"] == kind and l["result"]]
            names = set.intersection(*[set(r["queries"]) for r in rs]) if rs else set()
            med[kind] = {
                n: round(statistics.median(r["queries"][n] for r in rs), 3)
                for n in sorted(names)
            }
        common = set(med["old"]) & set(med["new"])
        out["median_old"] = med["old"]
        out["median_new"] = med["new"]
        out["total_old"] = round(sum(med["old"].values()), 3)
        out["total_new"] = round(sum(med["new"].values()), 3)
        out["per_query_ratio_new_over_old"] = {
            n: round(med["new"][n] / med["old"][n], 3)
            for n in sorted(common)
            if med["old"][n]
        }
        out["total_ratio"] = (
            round(out["total_new"] / out["total_old"], 3)
            if out["total_old"] else None
        )
        with open(os.path.join(REPO, args.out), "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps({
            "total_old": out["total_old"], "total_new": out["total_new"],
            "total_ratio": out["total_ratio"],
        }))
        return
    print(json.dumps({"fired": False}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Flat-window watcher for the sf0.1 headline bench — the anchor_watch
pattern applied to bench.py: poll the CPU calibration every --poll
seconds and launch a full bench run ONLY when the window is flat by the
two-anchor doctrine (md5 within ±--md5-band % of CALIB_REF AND memcpy
within +--memcpy-band % of its clean-window floor).  Each fired run's
JSON line is appended to --out (newest last) together with the
calibration that admitted it, so banded rounds can still land one
comparable flat-window number if the host recovers.

Usage: python tools/bench_watch.py [--out BENCH_r14_flatwatch.json]
           [--poll 180] [--max-attempts 2] [--max-hours 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def calib() -> dict:
    import bench

    return bench._cpu_calibration()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--poll", type=int, default=180)
    ap.add_argument("--md5-band", type=float, default=15.0)
    ap.add_argument("--memcpy-band", type=float, default=30.0)
    ap.add_argument("--max-attempts", type=int, default=2)
    ap.add_argument("--max-hours", type=float, default=3.0)
    ap.add_argument("--out", default="BENCH_r14_flatwatch.json")
    args = ap.parse_args()

    ref = json.load(open(os.path.join(REPO, "CALIB_REF.json")))
    t_end = time.time() + args.max_hours * 3600
    attempts: list[dict] = []
    fired = 0
    while time.time() < t_end and fired < args.max_attempts:
        c = calib()
        md5_dev = (c["md5_256mb"] / ref["md5_256mb"] - 1) * 100
        mem_dev = (c["memcpy_1gb"] / ref["memcpy_1gb"] - 1) * 100
        flat = abs(md5_dev) <= args.md5_band and mem_dev <= args.memcpy_band
        print(
            f"# calib md5 {md5_dev:+.1f}% memcpy {mem_dev:+.1f}% "
            f"{'FLAT - firing' if flat else 'banded'}",
            file=sys.stderr, flush=True,
        )
        if not flat:
            time.sleep(args.poll)
            continue
        fired += 1
        attempt = {
            "admitting_calib": c,
            "md5_dev_pct": round(md5_dev, 1),
            "memcpy_dev_pct": round(mem_dev, 1),
            "result": None,
            "rc": None,
        }
        try:
            p = subprocess.run(
                [sys.executable, "bench.py"], cwd=REPO, capture_output=True,
                text=True, timeout=3600,
            )
            attempt["rc"] = p.returncode
            lines = [
                ln for ln in p.stdout.strip().splitlines()
                if ln.startswith("{") and '"queries"' in ln
            ]
            if lines:
                attempt["result"] = json.loads(lines[-1])
        except subprocess.TimeoutExpired:
            attempt["error"] = "bench timeout (3600s)"
        except (json.JSONDecodeError, OSError) as e:
            attempt["error"] = f"{type(e).__name__}: {e}"
        attempts.append(attempt)
        with open(os.path.join(REPO, args.out), "w") as f:
            json.dump({"attempts": attempts}, f, indent=1)
        r = attempt["result"] or {}
        print(
            f"# fired #{fired}: total {r.get('value')} calib_ok "
            f"{r.get('calib_ok')}", file=sys.stderr, flush=True,
        )
        if r.get("calib_ok"):
            break
    print(json.dumps({"fired": fired, "out": args.out}))


if __name__ == "__main__":
    main()

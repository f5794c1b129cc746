#!/usr/bin/env python3
"""Flat-window watcher for the BIGBAM anchor (VERDICT r12 task 1).

The r12 anchor attempts were all bandwidth-banded (memcpy +14..193 %).
Instead of burning attempts blind, poll the CPU calibration every
--poll seconds and launch the full anchor ONLY when the window is flat
by PARITY's delta doctrine: md5 within +/-15 % of CALIB_REF and memcpy
within +/---memcpy-band % (default 20).  Each fired attempt appends to
--out (attempts list, newest last) so the session keeps every datapoint
like BIGBAM_ANCHOR_r12.json did.  Stops after --max-attempts fired or
--max-hours elapsed.
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
    ap.add_argument("--memcpy-band", type=float, default=20.0)
    ap.add_argument("--md5-band", type=float, default=15.0)
    ap.add_argument("--max-attempts", type=int, default=3)
    ap.add_argument("--max-hours", type=float, default=4.0)
    ap.add_argument("--out", default=os.path.join(REPO, "BIGBAM_ANCHOR_r13.json"))
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    ref = json.load(open(os.path.join(REPO, "CALIB_REF.json")))
    t_end = time.time() + args.max_hours * 3600
    attempts = []
    if os.path.exists(args.out):
        try:
            attempts = json.load(open(args.out)).get("attempts", [])
        except Exception:
            pass
    fired = 0
    while time.time() < t_end and fired < args.max_attempts:
        c = calib()
        d_md5 = (c["md5_256mb"] / ref["md5_256mb"] - 1) * 100
        d_mem = (c["memcpy_1gb"] / ref["memcpy_1gb"] - 1) * 100
        flat = abs(d_md5) <= args.md5_band and abs(d_mem) <= args.memcpy_band
        print(
            f"calib md5 {d_md5:+.1f}% memcpy {d_mem:+.1f}% -> "
            f"{'FIRE' if flat else 'wait'}",
            flush=True,
        )
        if flat:
            fired += 1
            p = subprocess.run(
                [
                    sys.executable,
                    os.path.join(HERE, "bigbam_anchor.py"),
                    "--runs",
                    str(args.runs),
                    "--skip-parquet",
                ],
                capture_output=True,
                text=True,
                timeout=1800,
            )
            line = (p.stdout.strip().splitlines() or ["{}"])[-1]
            try:
                res = json.loads(line)
            except json.JSONDecodeError:
                res = {"error": p.stderr[-500:]}
            res["pre_calib_dev_pct"] = {
                "md5": round(d_md5, 1),
                "memcpy": round(d_mem, 1),
            }
            attempts.append(res)
            with open(args.out, "w") as fh:
                json.dump(
                    {
                        "fixture": "testdata_big/bigbam (32 files, 1.02 GB, "
                        "17,108,736 reads)",
                        "attempts": attempts,
                    },
                    fh,
                    indent=1,
                )
            print(json.dumps(res)[:400], flush=True)
            # stop early on a flat >=160k result
            if (
                res.get("calib_ok")
                and res.get("reads_per_sec_per_core", 0) >= 160_000
            ):
                print("target met; stopping", flush=True)
                return
        time.sleep(args.poll)
    print("watcher done", flush=True)


if __name__ == "__main__":
    main()

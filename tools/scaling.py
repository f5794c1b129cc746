#!/usr/bin/env python3
"""Build the scaling table for SCALE.md from per-SF bench JSON files.

Usage:
    python tools/scaling.py BENCH_sf0.1.json BENCH_sf0.3.json BENCH_sf1.json

Each input is one bench.py output line ({"queries": {name: sec}, "sf": ...}).
Prints a markdown table of per-query wall time at each scale factor plus the
observed scaling exponent between the smallest and largest SF
(log(t_hi/t_lo) / log(sf_hi/sf_lo)) — ~1.0 is linear; local-mode fixed
overhead (session, task launch, Python worker reuse) pulls small-SF times up
and the exponent DOWN, so sublinear exponents mean "overhead-dominated at
the low end", not magic.
"""

from __future__ import annotations

import json
import math
import sys


def main() -> None:
    runs = []
    for path in sys.argv[1:]:
        with open(path) as f:
            d = json.load(f)
        runs.append((float(d["sf"]), d["queries"], path))
    runs.sort()
    if len(runs) < 2:
        raise SystemExit("need at least two bench files")

    sfs = [sf for sf, _, _ in runs]
    names = [n for n in runs[0][1] if all(n in q for _, q, _ in runs)]
    lo_sf, hi_sf = sfs[0], sfs[-1]

    hdr = "| query | " + " | ".join(f"sf{sf:g} (s)" for sf in sfs) + " | exponent |"
    sep = "|---" * (len(sfs) + 2) + "|"
    print(hdr)
    print(sep)
    rows = []
    for n in names:
        ts = [q[n] for _, q, _ in runs]
        exp = math.log(ts[-1] / ts[0]) / math.log(hi_sf / lo_sf)
        rows.append((exp, n, ts))
    for exp, n, ts in sorted(rows, reverse=True):
        cells = " | ".join(f"{t:.2f}" for t in ts)
        print(f"| {n} | {cells} | {exp:.2f} |")
    tot = [sum(q[n] for n in names) for _, q, _ in runs]
    exp = math.log(tot[-1] / tot[0]) / math.log(hi_sf / lo_sf)
    cells = " | ".join(f"{t:.2f}" for t in tot)
    print(f"| **total** | {cells} | {exp:.2f} |")


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Build the local[N] parallel-efficiency table for SCALE.md.

Usage:
    python tools/scaleout.py fixtures/scaleout/sf1_c4.json \
        fixtures/scaleout/sf1_c8.json fixtures/scaleout/sf1_c16.json \
        fixtures/scaleout/sf1_c32.json

Each input is one bench.py output line produced with SPARK_GRAFT_CPUS=N
(the core count is recovered from the filename's ``_c<N>`` suffix).
Prints a markdown table: per-query wall time at each core count, the
speedup from the smallest to the largest core count, and the parallel
efficiency (speedup / ideal).  Reference anchor for the shape of this
table: the reference's own scale-out chart
(docs/source/benchmarking/benchmarking.rst:634-642).
"""

from __future__ import annotations

import json
import re
import sys


def main() -> None:
    runs = []
    for path in sys.argv[1:]:
        m = re.search(r"_c(\d+)\.json$", path)
        if not m:
            raise SystemExit(f"cannot parse core count from {path!r}")
        with open(path) as f:
            d = json.load(f)
        runs.append((int(m.group(1)), d["queries"], d["value"]))
    runs.sort()
    if len(runs) < 2:
        raise SystemExit("need at least two bench files")

    cores = [c for c, _, _ in runs]
    lo, hi = cores[0], cores[-1]
    ideal = hi / lo
    names = [n for n in runs[0][1] if all(n in q for _, q, _ in runs)]

    hdr = (
        "| query | "
        + " | ".join(f"{c}c (s)" for c in cores)
        + f" | speedup {lo}→{hi}c | efficiency |"
    )
    print(hdr)
    print("|---" * (len(cores) + 3) + "|")

    def row(name: str, times: list[float]) -> None:
        sp = times[0] / times[-1]
        print(
            f"| {name} | "
            + " | ".join(f"{t:.2f}" for t in times)
            + f" | {sp:.2f}x | {100 * sp / ideal:.0f}% |"
        )

    for name in sorted(names, key=lambda n: -runs[-1][1][n]):
        row(name, [q[name] for _, q, _ in runs])
    row("**total**", [v for _, _, v in runs])


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Record the clean-window CPU calibration anchors to CALIB_REF.json.

Run on an otherwise-idle host.  Takes the MIN of several probe rounds
(the min is the cleanest observable window; any load only inflates the
timings) and refuses to overwrite an existing reference with slower
values unless --force is given — the reference must stay the clean
baseline, not drift with whatever window this script last saw.

bench.py gates its official artifact against these values (±15% on the
md5 and memcpy anchors) and stamps ``calib_ok`` into the bench JSON.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from bench import _cpu_calibration  # noqa: E402

REF = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "CALIB_REF.json")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    rounds = [_cpu_calibration() for _ in range(args.rounds)]
    best = {k: min(r[k] for r in rounds) for k in rounds[0]}
    print("rounds:", json.dumps(rounds), file=sys.stderr)

    prev = None
    if os.path.exists(REF):
        with open(REF) as fh:
            prev = json.load(fh)
    if prev and not args.force:
        slower = {k: v for k, v in best.items() if k in prev and v > prev[k] * 1.05}
        if slower:
            print(
                f"refusing to raise the clean baseline ({slower} vs {prev}); "
                "re-run on an idle host or pass --force",
                file=sys.stderr,
            )
            raise SystemExit(1)
        best = {k: min(v, prev.get(k, v)) for k, v in best.items()}

    with open(REF, "w") as fh:
        json.dump(best, fh, indent=1)
    print(json.dumps(best))


if __name__ == "__main__":
    main()

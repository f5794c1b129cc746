#!/usr/bin/env python3
"""Merge partial sweep outputs (one interrupted run + reruns of the
remainder) into a single sweep artifact, preserving per-query methods and
timings.  Later files win on query-name collisions (reruns supersede the
failed first attempt).

Usage: python tools/merge_sweep.py OUT.json SFDIR PART1.json PART2.json ...
PART1 may be a bare {name: result} dict (parsed from a crashed run's log)
or a full {"summary":..., "queries":...} artifact.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    out_path, sf_dir, *parts = sys.argv[1:]
    queries: dict[str, dict] = {}
    for p in parts:
        with open(p) as f:
            d = json.load(f)
        queries.update(d.get("queries", d))
    def _passes(v: dict) -> bool:
        return bool(
            v.get("rows_match")
            and v.get("schema_match") is not False
            and v.get("hash_match") is not False
        )

    n_pass = sum(1 for v in queries.values() if _passes(v))
    artifact = {
        "summary": {"sf_dir": sf_dir, "pass": n_pass, "total": len(queries)},
        "queries": queries,
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"{out_path}: {n_pass}/{len(queries)} pass")
    for name, v in queries.items():
        if not _passes(v):
            print("  FAIL:", name, str(v.get("err"))[:120])


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Scale a driver testdata directory K-fold for large-scale sweeps.

The driver ships sf0.001/0.01/0.1; the 100x-the-gate sweep (VERDICT r5 #1)
needs sf1.  This derives it from sf0.1 as K=10 key-shifted copies with
referential integrity preserved — dimension tables (region/nation) stay
single-copy; every fact key is offset by ``copy * key_space`` so joins see
10x the rows at the same selectivity, positions/coverage get 10x deeper
(read positions derive from orderkeys, which differ per copy), and
windows/sessions get 10x the events.

Two columns need more than a key shift:

* ``documents.text`` — a verbatim copy would make every doc a 10-way exact
  duplicate, turning the near-dup workload quadratic-in-K and unrealistic.
  Copies c>0 get a per-copy vocabulary (every word suffixed ``qc``), which
  keeps each copy's internal dup/near-dup family structure EXACTLY that of
  sf0.1 (pair counts scale linearly) while cross-copy Jaccard collapses
  far below any threshold.
* ``embeddings.embedding`` — verbatim copies would produce exact cosine
  ties in ANN top-k (tie-order fragility, degenerate neighbor structure).
  Copy c rotates the vector by c positions: norms and within-copy geometry
  preserved, cross-copy neighbors decorrelated, fully deterministic in
  both engines.

Deterministic, no RNG.  Usage:
    python tools/gen_sf.py [--src /root/testdata/sf0.1] \
        [--out /tmp/testdata/sf1] [--k 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

# fact tables: {table: {key_column: key_space}} — offsets per copy
KEY_SPACES = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {
        "l_orderkey": 150_000,
        "l_partkey": 20_000,
        "l_suppkey": 1_000,
    },
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
    "embeddings": {"vec_id": 2_000},
}
DIMS = ["region", "nation"]


def scaled_select(table: str, cols: list[str], c: int, k_src: dict[str, int]) -> str:
    exprs = []
    for col in cols:
        if col in k_src:
            exprs.append(f'("{col}" + {c} * {k_src[col]}) AS "{col}"')
        elif table == "documents" and col == "text" and c > 0:
            exprs.append(
                "array_to_string(list_transform(string_split(text, ' '), "
                f"w -> w || 'q{c}'), ' ') AS text"
            )
        elif table == "documents" and col == "n_chars" and c > 0:
            # recomputed from the transformed text (kept consistent below
            # via an outer SELECT; placeholder replaced there)
            exprs.append("n_chars")
        elif table == "embeddings" and col == "embedding" and c > 0:
            r = c % 64
            exprs.append(
                f"list_concat(embedding[{r + 1}:64], embedding[1:{r}]) "
                "AS embedding"
            )
        else:
            exprs.append(f'"{col}"')
    return ", ".join(exprs)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/testdata/sf1")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    con = duckdb.connect()
    for table in DIMS + list(KEY_SPACES):
        src = f"{args.src}/{table}.parquet"
        dst = f"{args.out}/{table}.parquet"
        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
        ]
        if table in DIMS:
            con.execute(f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)")
        else:
            k_src = KEY_SPACES[table]
            parts = []
            for c in range(args.k):
                sel = f"SELECT {scaled_select(table, cols, c, k_src)} FROM '{src}'"
                if table == "documents" and c > 0:
                    # n_chars tracks the transformed text
                    outer = ", ".join(
                        "length(text) AS n_chars" if col == "n_chars" else f'"{col}"'
                        for col in cols
                    )
                    sel = f"SELECT {outer} FROM ({sel})"
                parts.append(sel)
            union = " UNION ALL ".join(parts)
            con.execute(f"COPY ({union}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows", flush=True)


if __name__ == "__main__":
    main()

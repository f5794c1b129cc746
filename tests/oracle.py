"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a Spark query and its oracle SQL side by side, normalizes both result
sets (columns sorted by name, values canonicalized, rows sorted) and compares
row-count + value-hash.  Used by tests/test_oracle_parity.py so every
queries()/oracle_sql() pair is verified locally before the driver sees it.
"""

from __future__ import annotations

import hashlib
import math
import os

import duckdb

from sequila_spark.testdata import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # The oracle runs in the same process as the Spark driver; uncapped,
    # DuckDB assumes it owns the whole machine (default limit is 80% of
    # RAM) and a per-base-expansion oracle at sf1 OOM-kills the process
    # (observed: 122 GB anon-rss).  Cap it and let it spill to disk.
    # The cap itself adapts to the host (min of 24GB and ~60% of physical
    # RAM) so a smaller machine is not pushed past its real memory;
    # SPARK_GRAFT_DUCK_MEM overrides for harness experiments.
    cap_gb = os.environ.get("SPARK_GRAFT_DUCK_MEM")
    if cap_gb is None:
        try:
            page = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
            cap_gb = str(min(24, max(1, int(page * 0.6 / 2**30))))
        except (ValueError, OSError):
            cap_gb = "24"
    con.execute(f"SET memory_limit='{cap_gb}GB'")
    con.execute("SET temp_directory='/tmp/duck_spill'")
    con.execute("SET max_temp_directory_size='60GB'")
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, dict):
        return "{" + ",".join(f"{_canon(k)}:{_canon(v[k])}" for k in sorted(v, key=str)) + "}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def normalize(rows: list[tuple], colnames: list[str]) -> tuple[int, str]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("\x01".join(_canon(r[i]) for i in order) for r in rows)
    digest = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return len(rows), digest


def compare(spark, sf_dir: str, query_fn, sql: str, name: str = "?"):
    sdf = query_fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connection(sf_dir)
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    n_s, h_s = normalize(spark_rows, spark_cols)
    n_d, h_d = normalize(duck_rows, duck_cols)
    assert n_s == n_d, f"{name}: row count spark={n_s} duck={n_d}"
    assert h_s == h_d, f"{name}: value hash mismatch ({n_s} rows)"
    return n_s

#!/usr/bin/env python3
"""10x-scale correctness sweep: every `queries()` entry vs its DuckDB oracle
at an arbitrary scale factor (default sf0.1 — 10x the driver's sf0.01 gate).

Usage:  python tools/sweep.py [--sf-dir /root/testdata/sf0.1] [--out SWEEP.json]

For each query the sweep records rows_match / schema_match / hash_match using
the same normalization as the driver replica in tests/oracle.py.  Results
larger than --hash-cap rows are compared on row count + schema only (hashing
multi-million-row results driver-side is a test-harness cost, not an engine
path).  `dedup_clusters` — whose recursive-CTE oracle exceeds DuckDB's
temp-disk budget at sf0.1 — is instead verified against a pure-Python
union-find over the (independently DuckDB-verified) near-dup pair list, plus
structural invariants: labels constant along every edge, rep_id = min(id) of
its group, and the output node set exactly the pair-endpoint set.  That chain
is exact: pairs are oracle-checked, and union-find is an independent
implementation of connected components.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check_clusters_invariants(spark, sf_dir: str) -> dict:
    """Exact engine-side verification of dedup_clusters without the
    recursive-CTE oracle: DuckDB-verified pairs -> Python union-find ->
    exact label comparison, plus the structural invariants."""
    import __spark_entry__ as E

    pairs_df = E.queries()["dedup_minhash_pairs"](spark, sf_dir)
    pairs = [(r[0], r[1]) for r in pairs_df.select("id_1", "id_2").collect()]
    out = {
        (r["id"]): r["rep_id"]
        for r in E.queries()["dedup_clusters"](spark, sf_dir).collect()
    }

    # independent connected components: union-find with path compression
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected: dict[int, int] = {}
    for node in parent:
        expected[node] = find(node)

    nodes = set()
    for a, b in pairs:
        nodes.add(a)
        nodes.add(b)

    inv = {
        "n_pairs": len(pairs),
        "n_nodes": len(nodes),
        "node_set_exact": set(out) == nodes,
        "edge_consistent": all(out.get(a) == out.get(b) for a, b in pairs),
        "labels_exact_match_unionfind": out == expected,
    }
    # rep_id = min(id) of its group
    groups: dict[int, list[int]] = {}
    for node, rep in out.items():
        groups.setdefault(rep, []).append(node)
    inv["rep_is_group_min"] = all(rep == min(members) for rep, members in groups.items())
    ok = all(v for k, v in inv.items() if isinstance(v, bool))
    return {
        "rows_match": ok,
        "schema_match": True,
        "hash_match": ok,
        "spark_rows": len(out),
        "oracle_rows": len(expected),
        "err": None if ok else f"invariant failure: {inv}",
        "method": "unionfind_invariants",
        "invariants": {k: v for k, v in inv.items()},
    }


# Types whose engine-native CAST-to-string is identical in Spark and DuckDB,
# making the distributed hash below a faithful value comparison.  Floats are
# excluded (formatting differs); every wide query in this suite is int/string.
_DIST_HASHABLE = {"tinyint", "smallint", "int", "bigint", "string", "boolean"}
_SEP = "\x1f"
_NULLTOK = "\x02NULL"
_SUM_P = 1_000_000_007


def duckdb_minhash_pairs_phased(sdf, sf_dir: str, n_slices: int = 25) -> dict:
    """sf1-scale external oracle for dedup_minhash_pairs.  The one-shot
    oracle's exact-Jaccard stage is an ALL-PAIRS shingle self-join, which
    blows DuckDB's temp-disk budget at sf1 (observed 55.8 GiB) — the same
    failure class as dedup_clusters' recursive CTE at sf0.1.  The SAME
    arithmetic (shingle exprs, PERM_A/B mod-P minhash, band keys, 0.8
    threshold — every constant from operators.dedup) runs here in three
    tractable phases instead:

      1. per-doc-slice signature computation (doc-independent, so slicing
         by doc_id range is exact),
      2. ONE global band equi-join over the collected signature table
         (|docs| x BANDS rows — KBs),
      3. exact Jaccard restricted to the banding's candidate pairs
         (the whole point of LSH: candidates are few), instead of all
         pairs.

    The chain is exact, not approximate: phases 2-3 see the identical
    signature/shingle relations the one-shot oracle would build."""
    from sequila_spark.operators import dedup as DD
    from tests.oracle import duck_connection, normalize

    _, duck_shingles = DD.shingle_hash_exprs("text")
    P = DD.MINHASH_P
    con = duck_connection(sf_dir)
    sig_cols = ", ".join(f"mh{i} BIGINT" for i in range(DD.NUM_PERM))
    mh_cols = ", ".join(
        f"MIN(({DD.PERM_A[i]} * (sh % {P}) + {DD.PERM_B[i]}) % {P}) AS mh{i}"
        for i in range(DD.NUM_PERM)
    )
    con.execute(f"CREATE TEMP TABLE sig (doc_id BIGINT, {sig_cols})")
    lo_hi = con.execute(
        "SELECT MIN(doc_id), MAX(doc_id) + 1 FROM documents"
    ).fetchone()
    lo_all, hi_all = int(lo_hi[0]), int(lo_hi[1])
    step = max(1, (hi_all - lo_all + n_slices - 1) // n_slices)
    for lo in range(lo_all, hi_all, step):
        hi = min(lo + step, hi_all)
        con.execute(f"""
            INSERT INTO sig
            WITH sh AS (
              SELECT DISTINCT doc_id, UNNEST({duck_shingles}) AS sh
              FROM documents WHERE doc_id >= {lo} AND doc_id < {hi}
            )
            SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id
        """)
    band_selects = " UNION ALL ".join(
        "SELECT {b} AS band, {key} AS bkey, doc_id FROM sig".format(
            b=b,
            key=" || ',' || ".join(
                f"CAST(mh{b * DD.ROWS_PER_BAND + r} AS STRING)"
                for r in range(DD.ROWS_PER_BAND)
            ),
        )
        for b in range(DD.BANDS)
    )
    # candidates stay IN DuckDB: at sf1 the banding yields ~8.4M pairs
    # (one bucket holds 2,972 docs), and both the round-trip through
    # Python executemany and the ONE-SQL exact-Jaccard over all pairs
    # (shingle-join intermediate ~billions of rows) blew the temp-disk
    # budget.  Verification runs in bounded ROW_NUMBER chunks instead —
    # identical arithmetic, bounded spill, exactness preserved.
    con.execute(f"""
        CREATE TEMP TABLE cand AS
        WITH bands AS ({band_selects})
        SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
    """)
    n_cand = int(con.execute("SELECT COUNT(*) FROM cand").fetchone()[0])
    con.execute(f"""
        CREATE TEMP TABLE sh_c AS
        SELECT DISTINCT doc_id, UNNEST({duck_shingles}) AS sh
        FROM documents
        WHERE doc_id IN (
            SELECT id_1 FROM cand UNION SELECT id_2 FROM cand
        )
    """)
    con.execute(
        "CREATE TEMP TABLE sizes AS "
        "SELECT doc_id, COUNT(*) AS n FROM sh_c GROUP BY doc_id"
    )
    con.execute(
        "CREATE TEMP TABLE candn AS SELECT id_1, id_2, "
        "ROW_NUMBER() OVER (ORDER BY id_1, id_2) - 1 AS rn FROM cand"
    )
    duck_rows: list[tuple] = []
    chunk = 100_000
    for lo in range(0, max(n_cand, 1), chunk):
        duck_rows.extend(con.execute(f"""
            WITH cd AS (
              SELECT id_1, id_2 FROM candn
              WHERE rn >= {lo} AND rn < {lo + chunk}
            ),
            shared AS (
              SELECT cd.id_1, cd.id_2, COUNT(*) AS nshared
              FROM cd
              JOIN sh_c a ON a.doc_id = cd.id_1
              JOIN sh_c b ON b.doc_id = cd.id_2 AND b.sh = a.sh
              GROUP BY cd.id_1, cd.id_2
            )
            SELECT s.id_1, s.id_2,
                   CAST(s.nshared AS DOUBLE) / (s1.n + s2.n - s.nshared)
                       AS jaccard
            FROM shared s
            JOIN sizes s1 ON s1.doc_id = s.id_1
            JOIN sizes s2 ON s2.doc_id = s.id_2
            WHERE CAST(s.nshared AS DOUBLE) / (s1.n + s2.n - s.nshared) >= 0.8
        """).fetchall())
    con.close()
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]
    n_s, h_s = normalize(spark_rows, spark_cols)
    n_d, h_d = normalize(duck_rows, ["id_1", "id_2", "jaccard"])
    return {
        "rows_match": n_s == n_d,
        "schema_match": sorted(spark_cols) == ["id_1", "id_2", "jaccard"],
        "hash_match": h_s == h_d,
        "spark_rows": n_s,
        "oracle_rows": n_d,
        "n_band_candidates": n_cand,
        "err": None,
        "method": "duckdb_phased_sig_band_candverify",
    }


def _spark_hash_agg(sdf, same_engine: bool = False) -> tuple | None:
    """(count, bit_xor, sum mod p) over per-row md5 of the name-sorted,
    canonicalized columns — one distributed agg, no driver materialization.
    None when a column type's string rendering is engine-ambiguous.

    ``same_engine`` lifts the type restriction: for the Spark-vs-Spark
    plan crosscheck both sides render through the identical CAST, so any
    type is faithful as long as its VALUES are deterministic (the dedup
    jaccard doubles are exact-integer ratios — one IEEE division — so
    both plans produce bit-identical doubles)."""
    if not same_engine and any(
        f.dataType.simpleString() not in _DIST_HASHABLE for f in sdf.schema.fields
    ):
        return None
    cols = sorted(sdf.columns)
    s_canon = "concat_ws('{sep}', {parts})".format(
        sep=_SEP,
        parts=", ".join(
            f"coalesce(cast(`{c}` as string), '{_NULLTOK}')" for c in cols
        ),
    )
    s_h = f"cast(conv(substr(md5({s_canon}), 1, 15), 16, 10) as bigint)"
    row = (
        sdf.selectExpr(f"{s_h} as h")
        .selectExpr(
            "count(*) as n", "bit_xor(h) as x", f"sum(h % {_SUM_P}L) as s"
        )
        .collect()[0]
    )
    return (int(row["n"]), row["x"], row["s"])


def spark_crosscheck(sdf, adf) -> dict:
    """Value-fidelity check with NO external oracle: the primary plan's
    result vs an independent-plan variant of the same query (see
    __spark_entry__.crosscheck_queries), both reduced to the same
    order-independent distributed hash.  Used where the result set is too
    large for DuckDB to materialize single-node — the point at which the
    oracle engine, not this engine, is the scaling bottleneck."""
    t0 = time.time()
    primary = _spark_hash_agg(sdf, same_engine=True)
    t_primary = round(time.time() - t0, 1)
    t0 = time.time()
    alt = _spark_hash_agg(adf, same_engine=True)
    t_alt = round(time.time() - t0, 1)
    if primary is None or alt is None:
        return {
            "rows_match": False,
            "schema_match": sorted(sdf.columns) == sorted(adf.columns),
            "hash_match": False,
            "spark_rows": None,
            "oracle_rows": None,
            "err": "crosscheck: non-hashable column type",
        }
    return {
        "rows_match": primary[0] == alt[0],
        "schema_match": sorted(sdf.columns) == sorted(adf.columns),
        "hash_match": primary == alt,
        "spark_rows": primary[0],
        "oracle_rows": alt[0],
        "err": None,
        "method": "spark_plan_crosscheck_full_hash",
        "sec_primary_plan": t_primary,
        "sec_alt_plan": t_alt,
    }


def distributed_hash_check(sdf, sql: str, sf_dir: str) -> dict | None:
    """Full value-fidelity comparison WITHOUT collecting the result: both
    engines canonicalize each row (name-sorted columns joined on an
    unprintable separator, NULLs tokenized), md5 it, take the top 60 bits as
    a bigint, and aggregate (count, bit_xor, sum mod p) — order-independent
    and computed where the data lives.  Spark side stays one distributed agg
    (no driver materialization); DuckDB side wraps the oracle SQL.  Returns
    None when a column type's string rendering could differ between engines
    (floats/timestamps) — caller falls back to rows+schema."""
    from tests.oracle import duck_connection

    srow = _spark_hash_agg(sdf)
    if srow is None:
        return None
    cols = sorted(sdf.columns)

    d_canon = "concat_ws(chr(31), {parts})".format(
        parts=", ".join(
            f"coalesce(CAST(\"{c}\" AS VARCHAR), chr(2) || 'NULL')" for c in cols
        )
    )
    d_h = f"CAST('0x' || substr(md5({d_canon}), 1, 15) AS BIGINT)"
    con = duck_connection(sf_dir)
    try:
        drow = con.execute(
            f"SELECT count(*) AS n, bit_xor(h) AS x, sum(h % {_SUM_P}) AS s "
            f"FROM (SELECT {d_h} AS h FROM ({sql}) __oracle) __hashed"
        ).fetchone()
    finally:
        con.close()

    s_n, s_x, s_s = srow
    match = (
        s_n == int(drow[0])
        and (s_x is None) == (drow[1] is None)
        and (s_x is None or int(s_x) == int(drow[1]))
        and (s_s is None or int(s_s) == int(drow[2]))
    )
    return {
        "rows_match": s_n == int(drow[0]),
        "hash_match": match,
        "spark_rows": s_n,
        "oracle_rows": int(drow[0]),
        "err": None,
        "method": "distributed_full_hash",
    }


# Contig-sliced external oracle: the join trio's sf1 result sets (3.3/2.6/8.1
# billion rows) exceed what single-node DuckDB can hash-aggregate in one go,
# but every output row belongs to exactly one contig, so the oracle runs once
# per contig slice and the order-independent hash components merge exactly
# (count: sum, bit_xor: xor, sum-mod-p: modular sum).  Each entry: the
# predicate appended to the oracle SQL per slice, and the marker of the main
# SELECT (everything before it is the CTE prologue, reused to enumerate the
# contig domain).
# (slice predicate template, SELECT marker splitting prologue from the
#  final query, table whose DISTINCT contigs enumerate the slices)
_SLICE_SPECS = {
    "range_join_pairs": (" WHERE r.contig = '{c}'", "SELECT r.qname", "reads"),
    "range_join_minoverlap": (" WHERE r.contig = '{c}'", "SELECT r.qname", "reads"),
    "range_join_maxgap": (" WHERE r.contig = '{c}'", "SELECT r.qname", "reads"),
    "range_join_semi": (" AND t.contig = '{c}'", "SELECT t.target_id", "reads"),
    "range_join_long": (" WHERE l.contig = '{c}'", "SELECT l.qname", "longreads"),
}


def duckdb_sliced_hash_check(sdf, sql: str, sf_dir: str, name: str) -> dict | None:
    """Full value-fidelity vs the EXTERNAL DuckDB oracle for results too
    large for one oracle pass: per-contig oracle slices, each reduced to the
    same order-independent (count, bit_xor, sum mod p) digest as the Spark
    side, merged across slices."""
    from tests.oracle import duck_connection

    spec = _SLICE_SPECS.get(name)
    if spec is None:
        return None
    pred_tpl, select_marker, contig_table = spec
    srow = _spark_hash_agg(sdf)
    if srow is None:
        return None
    cols = sorted(sdf.columns)
    d_canon = "concat_ws(chr(31), {parts})".format(
        parts=", ".join(
            f"coalesce(CAST(\"{c}\" AS VARCHAR), chr(2) || 'NULL')" for c in cols
        )
    )
    d_h = f"CAST('0x' || substr(md5({d_canon}), 1, 15) AS BIGINT)"

    cut = sql.rfind(select_marker)
    if cut < 0:
        return None
    prologue = sql[:cut]
    con = duck_connection(sf_dir)
    try:
        contigs = [
            r[0]
            for r in con.execute(
                prologue
                + f" SELECT DISTINCT contig FROM {contig_table} ORDER BY 1"
            ).fetchall()
        ]
        n_tot, x_tot, s_tot = 0, 0, 0
        slice_secs = []
        for c in contigs:
            sliced = sql + pred_tpl.format(c=c)
            t0 = time.time()
            n, x, s = con.execute(
                f"SELECT count(*) AS n, bit_xor(h) AS x, sum(h % {_SUM_P}) AS s "
                f"FROM (SELECT {d_h} AS h FROM ({sliced}) __oracle) __hashed"
            ).fetchone()
            slice_secs.append(round(time.time() - t0, 1))
            n_tot += int(n)
            if x is not None:
                x_tot ^= int(x)
                s_tot += int(s)  # raw sum of (h % p): exact across slices
    finally:
        con.close()

    s_n, s_x, s_s = srow
    match = (
        s_n == n_tot
        and int(s_x or 0) == x_tot
        and int(s_s or 0) == s_tot
    )
    return {
        "rows_match": s_n == n_tot,
        "hash_match": match,
        "spark_rows": s_n,
        "oracle_rows": n_tot,
        "err": None,
        "method": "duckdb_external_oracle_contig_sliced_hash",
        "slices": len(contigs),
        "slice_secs": slice_secs,
    }


def duckdb_windowed_digest_check(
    sdf, spec: dict, sf_dir: str, window_bases: int
) -> dict:
    """External-oracle value fidelity for the pileup-family per-contig
    DIGESTS at scale factors where one oracle pass exhausts single-node
    DuckDB: the oracle runs once per (contig, base-window) slice — each
    slice expands only its own bases — and the digest rows merge
    additively across disjoint windows (every position belongs to exactly
    one window, and every digest column is a COUNT/SUM over positions).
    The merged oracle rows are compared to Spark's collected result by
    EXACT VALUE (the digest is <= one row per contig), stronger than the
    hash comparisons used for wide results."""
    from tests.oracle import duck_connection

    spark_rows = {}
    cols = sdf.columns
    for r in sdf.collect():
        spark_rows[r[0]] = tuple(int(v) for v in r[1:])

    con = duck_connection(sf_dir)
    acc: dict[str, list[int]] = {}
    n_windows = 0
    slice_secs = []
    try:
        extents = con.execute(spec["extent_sql"]).fetchall()
        for contig, lo, hi in extents:
            lo, hi = int(lo), int(hi)
            for wlo in range(lo, hi + 1, window_bases):
                whi = min(wlo + window_bases - 1, hi)
                t0 = time.time()
                rows = con.execute(spec["window_sql"](contig, wlo, whi)).fetchall()
                slice_secs.append(round(time.time() - t0, 1))
                n_windows += 1
                for row in rows:
                    a = acc.setdefault(row[0], [0] * (len(row) - 1))
                    for j, v in enumerate(row[1:]):
                        a[j] += int(v)
    finally:
        con.close()

    oracle_rows = {c: tuple(v) for c, v in acc.items()}
    match = spark_rows == oracle_rows
    mism = None
    if not match:
        keys = set(spark_rows) | set(oracle_rows)
        mism = {
            c: {"spark": spark_rows.get(c), "oracle": oracle_rows.get(c)}
            for c in sorted(keys)
            if spark_rows.get(c) != oracle_rows.get(c)
        }
    return {
        "rows_match": set(spark_rows) == set(oracle_rows),
        "schema_match": True,  # fixed digest schema, names pinned in the SQL
        "hash_match": match,
        "spark_rows": len(spark_rows),
        "oracle_rows": len(oracle_rows),
        "err": None if match else f"digest mismatch: {mism}"[:500],
        "method": "duckdb_external_oracle_windowed_digest_exact_values",
        "windows": n_windows,
        "window_bases": window_bases,
        "columns": cols,
        "slice_secs_max": max(slice_secs, default=0.0),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--hash-cap", type=int, default=5_000_000)
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument(
        "--crosscheck",
        default=None,
        help="comma-separated query names verified against their "
        "independent-plan variant (crosscheck_queries) instead of DuckDB — "
        "for result sets the single-node oracle cannot materialize",
    )
    ap.add_argument(
        "--duck-sliced",
        default=None,
        help="comma-separated query names verified against the EXTERNAL "
        "DuckDB oracle run per contig slice (exact hash merge) — for "
        "result sets too large for one oracle pass",
    )
    ap.add_argument(
        "--duck-windowed",
        default=None,
        help="comma-separated digest query names verified against the "
        "EXTERNAL DuckDB oracle run per (contig, base-window) slice with "
        "additive digest merge (pileup family at sf1)",
    )
    ap.add_argument("--window-bases", type=int, default=2_000_000)
    ap.add_argument(
        "--phased-minhash",
        action="store_true",
        help="verify dedup_minhash_pairs against the PHASED DuckDB oracle "
        "(per-slice signatures + global band join + candidate-only exact "
        "Jaccard) — for scales where the one-shot all-pairs oracle blows "
        "the temp-disk budget (sf1)",
    )
    ap.add_argument(
        "--master",
        default=None,
        help="Spark master override — e.g. local-cluster[4,8,6144] to run "
        "the whole gate with ISOLATED executor JVMs + separate Python "
        "workers (flushes one-JVM assumptions in Python-global caches: "
        "plan-probe memos, broadcast registries, LSH plane matrices)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as E
    from tests.oracle import duck_connection, normalize

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spark = (
        SparkSession.builder.master(
            args.master or f"local[{os.cpu_count() or 8}]"
        )
        .appName("sequila_sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SWEEP_DRIVER_MEM", "8g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.executorEnv.PYTHONPATH", repo)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qmap = E.queries()
    oracles = E.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    dsliced = set(args.duck_sliced.split(",")) if args.duck_sliced else set()
    unknown_ds = dsliced - set(_SLICE_SPECS)
    if unknown_ds:
        raise SystemExit(f"no slice spec for: {sorted(unknown_ds)}")
    dwindowed = set(args.duck_windowed.split(",")) if args.duck_windowed else set()
    wspecs = E.windowed_digest_oracles() if dwindowed else {}
    unknown_w = dwindowed - set(wspecs)
    if unknown_w:
        raise SystemExit(f"no windowed digest spec for: {sorted(unknown_w)}")
    xcheck = set(args.crosscheck.split(",")) if args.crosscheck else set()
    xmap = E.crosscheck_queries() if xcheck else {}
    unknown = xcheck - set(xmap)
    if unknown:
        raise SystemExit(f"no crosscheck variant for: {sorted(unknown)}")
    results: dict[str, dict] = {}

    for name, fn in qmap.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            if name in dsliced:
                res = duckdb_sliced_hash_check(
                    fn(spark, args.sf_dir), oracles[name], args.sf_dir, name
                )
                if res is None:
                    raise RuntimeError("sliced oracle not applicable")
                res["schema_match"] = True  # names checked by the hash canon
                results[name] = res
                results[name]["sec"] = round(time.time() - t0, 1)
                print(f"{name}: {results[name]}", flush=True)
                continue
            if name in dwindowed:
                results[name] = duckdb_windowed_digest_check(
                    fn(spark, args.sf_dir), wspecs[name], args.sf_dir,
                    args.window_bases,
                )
                results[name]["sec"] = round(time.time() - t0, 1)
                print(f"{name}: {results[name]}", flush=True)
                continue
            if name in xcheck:
                results[name] = spark_crosscheck(
                    fn(spark, args.sf_dir), xmap[name](spark, args.sf_dir)
                )
                results[name]["sec"] = round(time.time() - t0, 1)
                print(f"{name}: {results[name]}", flush=True)
                continue
            if name == "dedup_clusters":
                results[name] = check_clusters_invariants(spark, args.sf_dir)
                results[name]["sec"] = round(time.time() - t0, 1)
                print(f"{name}: {results[name]}", flush=True)
                continue
            if name == "dedup_minhash_pairs" and args.phased_minhash:
                results[name] = duckdb_minhash_pairs_phased(
                    fn(spark, args.sf_dir), args.sf_dir
                )
                results[name]["sec"] = round(time.time() - t0, 1)
                print(f"{name}: {results[name]}", flush=True)
                continue
            sdf = fn(spark, args.sf_dir)
            spark_cols = sdf.columns
            n_spark = sdf.count()
            sql = oracles.get(name)
            if sql is None:
                results[name] = {
                    "rows_match": n_spark >= 0,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": n_spark,
                    "oracle_rows": None,
                    "err": None,
                    "method": "rows_only_no_oracle",
                }
            else:
                con = duck_connection(args.sf_dir)
                # plan-only: column names without executing the query
                duck_cols = [
                    r[0] for r in con.execute(f"DESCRIBE {sql}").fetchall()
                ]
                schema_match = sorted(spark_cols) == sorted(duck_cols)
                if n_spark <= args.hash_cap:
                    duck_rows = con.execute(sql).fetchall()
                    spark_rows = [tuple(r) for r in sdf.collect()]
                    n_s, h_s = normalize(spark_rows, spark_cols)
                    n_d, h_d = normalize(duck_rows, duck_cols)
                    results[name] = {
                        "rows_match": n_s == n_d,
                        "schema_match": schema_match,
                        "hash_match": h_s == h_d,
                        "spark_rows": n_s,
                        "oracle_rows": n_d,
                        "err": None,
                        "method": "full_hash",
                    }
                else:
                    dist = distributed_hash_check(sdf, sql, args.sf_dir)
                    if dist is not None:
                        dist["schema_match"] = schema_match
                        results[name] = dist
                    else:
                        con2 = duck_connection(args.sf_dir)
                        n_duck = con2.execute(
                            f"SELECT count(*) FROM ({sql}) __q"
                        ).fetchone()[0]
                        con2.close()
                        results[name] = {
                            "rows_match": n_spark == n_duck,
                            "schema_match": schema_match,
                            "hash_match": None,
                            "spark_rows": n_spark,
                            "oracle_rows": n_duck,
                            "err": None,
                            "method": "rows_schema_only_above_hash_cap",
                        }
                con.close()
        except Exception as e:  # noqa: BLE001 — sweep must record, not die
            results[name] = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": f"{type(e).__name__}: {e}"[:500],
            }
        results[name]["sec"] = round(time.time() - t0, 1)
        print(f"{name}: {results[name]}", flush=True)

    n_pass = sum(
        1
        for r in results.values()
        if r["rows_match"] and r.get("schema_match") is not False and r.get("hash_match") is not False
    )
    summary = {"sf_dir": args.sf_dir, "pass": n_pass, "total": len(results)}
    print(json.dumps(summary), flush=True)
    out = args.out or "SWEEP.json"
    with open(out, "w") as fh:
        json.dump({"summary": summary, "queries": results}, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with the noop writer (full execution, no driver
collect).  Wall time excludes session startup; a warmup query primes the JVM.

Variance protocol (round 7): a single JVM session's numbers carry
session-level state — JIT/OSR luck, code-cache layout, page cache, host
thermal — measured at up to ±20% on the TOTAL (r5 spread 30.2-41.2 s for an
identical build; the r6 artifact shipped a +20% swing undiagnosed).  The
harness therefore runs SPARK_GRAFT_BENCH_SESSIONS (default 3) fresh JVM
sessions sequentially, each itself taking min-of-converged-runs per query,
and reports the per-query MEDIAN across sessions.  The JSON carries every
session's per-query numbers plus the session-total spread, so a swing is
visible in the artifact instead of silently becoming the round's number.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
# one history file per harness run (bench_history/ is append-only across
# runs; within a run the after-every-session rewrite updates in place)
_RUN_STAMP = time.strftime("run_%Y%m%dT%H%M%SZ", time.gmtime()) + (
    "_sf" + os.environ.get("SPARK_GRAFT_SF_DIR", "sf0.1").rsplit("sf", 1)[-1].rstrip("/") + ".json"
)

# Headline set: the flagship operators, heaviest first, plus the queries
# whose plans were rearchitected for scale (so regressions stay visible
# round over round).
BENCH_QUERIES = [
    # real-data codec throughput FIRST (fixed-size input — a regression
    # guard on the native CRAM decoder): measured late in the sequence it
    # absorbs ~3x contamination from the Arrow-heavy queries' accumulated
    # Python-worker state, which is JVM-session noise, not codec speed
    "cram_decode",
    "feature_counts",
    "range_join_pairs",
    "range_join_maxgap",
    "range_join_long",
    "coverage_blocks",
    "coverage_windows",
    "pileup_agg",
    "pileup_quals_slice",
    "pileup_indels_slice",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_embedding",
    "similarity_topk",
    "similarity_ann_lsh",
    "similarity_ivf",
    "text_features",
    "events_window_agg",
    "events_asof",
]


def _query_def_hash(fn) -> str:
    """Hash of a bench query's DEFINITION (docstring-stripped AST of its
    source), so the artifact pins what each headline number measured.
    The gate slot list may rotate between rounds (r11: the CIGAR-walk
    query was folded into ``coverage_blocks``, doubling its work) — with
    this stamp a round-over-round ratio on a changed definition is
    attributed ``def_changed`` instead of masquerading as a regression."""
    import ast
    import hashlib
    import inspect
    import textwrap

    try:
        src = textwrap.dedent(inspect.getsource(fn))
        tree = ast.parse(src)
        for node in ast.walk(tree):
            if isinstance(
                node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.Module)
            ) and (
                node.body
                and isinstance(node.body[0], ast.Expr)
                and isinstance(node.body[0].value, ast.Constant)
                and isinstance(node.body[0].value.value, str)
            ):
                node.body = node.body[1:] or [ast.Pass()]
        return hashlib.md5(ast.dump(tree).encode()).hexdigest()[:10]
    except (OSError, TypeError, SyntaxError):
        return "unavailable"


def _plan_fp(df) -> str:
    """Stable fingerprint of a query's physical plan: md5 of
    :func:`_plan_text`.  A flagged per_query_calibrated ratio with an
    UNCHANGED fingerprint is host banding; a CHANGED fingerprint is a
    plan regression suspect — the distinction the r10 similarity_ivf
    question needed (VERDICT r10 'What's wrong' #2)."""
    import hashlib

    s = _plan_text(df)
    if s is None:
        return "unavailable"
    return hashlib.md5(s.encode()).hexdigest()[:10]


def _normalize_plan_text(s: str) -> str:
    """Scrub every session-volatile token from a formatted-explain string:
    exprIds, plan ids, formatted-mode operator numbering, codegen ids,
    AQE finality, input paths/sizes/row counts, lambda-variable counters
    and common-expr ids (both SESSION-GLOBAL in Spark — ``lambda x_120``
    vs ``x_126`` for the identical plan was the r11/r12 cross-session
    fingerprint "disagreement").  Pinned by tests/test_bench_fp.py so
    the next Spark-internal counter leak fails in pytest, not in a
    cross-session flag storm (this is the third such patch in three
    rounds)."""
    import re

    s = re.sub(r"#\d+L?", "#x", s)
    s = re.sub(r"\[plan_id=\d+\]", "", s)
    s = re.sub(r"\(\d+\)", "(n)", s)  # formatted-mode operator numbering
    s = re.sub(r"codegen id : \d+", "codegen id : n", s)
    s = re.sub(r"isFinalPlan=\w+", "", s)
    s = re.sub(r"Location: .*", "Location: _", s)
    s = re.sub(r"size=\S+", "size=_", s)
    s = re.sub(r"rowCount=\S+", "rowCount=_", s)
    s = re.sub(r"lambda [A-Za-z]+_\d+", "lambda v", s)
    s = re.sub(r"_common_expr_\d+", "_common_expr_n", s)
    return s


def _plan_text(df) -> str | None:
    """Normalized formatted-explain text (see :func:`_normalize_plan_text`).
    Kept as TEXT alongside the hash so a cross-session fingerprint
    disagreement can record its differing lines as the cause instead of
    an opaque hash pair (VERDICT r11 task 3)."""
    try:
        jvm = df.sparkSession._jvm
        s = df._jdf.queryExecution().explainString(
            jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    except Exception:
        return None
    return _normalize_plan_text(s)


def run_session() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("sequila_spark_bench")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        # Throughput GC for a batch workload (ParallelGC settled pileup_agg
        # at ~6 s vs 7.3 s under G1 and removed pause outliers), plus JIT
        # settings for Spark's generated code: whole-stage codegen emits
        # methods past HotSpot's huge-method bytecode limit, and whether
        # the interpreter-stuck variant got OSR-compiled varied per JVM
        # session — observed as one pileup-family query randomly pinned at
        # 2-3x its steady state for a whole bench run.  Compiling huge
        # methods (plus headroom in the code cache) removes that mode.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+UseParallelGC -XX:-DontCompileHugeMethods "
            "-XX:ReservedCodeCacheSize=512m",
        )
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    names = [n for n in BENCH_QUERIES if n in qmap]
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = set(only.split(","))
        names = [n for n in names if n in keep]

    # Warmup: prime JVM/codegen with the smallest sf — PER QUERY, because
    # whole-stage codegen compiles per plan: running each query once at
    # sf0.001 puts its generated code through C2 before any timed run, which
    # cuts the 3-5-run convergence tail (measured: pileup_agg first sf0.1
    # run 38 s un-warmed vs ~12 s warmed; steady state ~6 s either way).
    for n in names:
        try:
            qmap[n](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    # Steady-state measurement: each query runs RUNS times and reports the
    # best — the first execution is dominated by whole-stage-codegen
    # compilation and JVM JIT (measured 2-3x the settled time), which is
    # amortized noise on any long-lived cluster.  Cold times are recorded
    # alongside for transparency.
    # Default 3 runs: with min-of-2, single-machine noise (GC, page cache,
    # thermal) moved round-over-round totals by ±10% on untouched queries —
    # a third warm run on the fast queries kills that noise floor for ~40 s
    # of bench time.  Queries already >10 s settle for 2 runs (their noise
    # is proportionally small and a 3rd run is expensive).
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    times: dict[str, float] = {}
    cold: dict[str, float] = {}
    plan_fp: dict[str, str] = {}
    plan_txt: dict[str, str] = {}
    def _gc():
        # settle the JVM between queries: garbage from the previous
        # query's shuffles otherwise triggers GC storms mid-measurement
        # (observed 4x swings on the largest-shuffle query)
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    query_def = {n: _query_def_hash(qmap[n]) for n in names}
    for name in names:
        best = float("inf")
        measured = []
        # extend up to 3 extra runs while the best is still dropping >8%
        # per run: codegen-heavy queries (measured on pileup) need 3-5
        # runs before whole-stage-codegen + Python worker JIT settles,
        # and stopping earlier records warmup, not steady state
        target = runs
        i = 0
        while i < target:
            _gc()
            t0 = time.perf_counter()
            qmap[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            if i == 0:
                cold[name] = round(dt, 3)
            measured.append(dt)
            prev_best = best
            best = min(best, dt)
            improved = i == 0 or best < 0.92 * prev_best
            if dt > 120:  # genuinely long query: one measurement, keep
                break  # total bounded (a 60s cap once recorded a one-off
                # GC/machine-noise first run as the query's score)
            if i >= 1 and best > 10 and not improved:
                # slow query that has CONVERGED: further runs are expensive
                # and its noise is proportionally small.  (A plain >10s
                # break once froze pileup_agg at 12 s when its steady state
                # was 6 s — still mid-JIT on run 2.)
                break
            if i == target - 1 and target < runs + 3 and i > 0 and improved:
                target += 1
            i += 1
        # adaptive extra run when the measurements disagree wildly (GC /
        # machine-state noise): one more attempt, still bounded
        if len(measured) >= 2 and max(measured) > 2 * min(measured) and best <= 60:
            _gc()
            t0 = time.perf_counter()
            qmap[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
        # fingerprint AFTER the measured runs: by now every persist the
        # query materializes is cached and AQE has executed, so the plan a
        # fresh dataframe resolves to is the query's steady state — the
        # pre-run fingerprint captured whichever caches happened to exist
        # at that point in the session, which made the dedup/similarity
        # family disagree across sessions (VERDICT r11 task 3)
        try:
            txt = _plan_text(qmap[name](spark, SF_DIR))
        except Exception:
            txt = None
        if txt is None:
            plan_fp[name] = "unavailable"
        else:
            import hashlib

            plan_fp[name] = hashlib.md5(txt.encode()).hexdigest()[:10]
            plan_txt[name] = txt

    plans_out = os.environ.get("SPARK_GRAFT_PLANS_OUT")
    if plans_out:
        # normalized explain TEXTS for the parent's disagreement diff —
        # never in the stdout JSON (several KB per query)
        try:
            with open(plans_out, "w") as fh:
                json.dump(plan_txt, fh)
        except OSError:
            pass

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "cold_runs": cold,
                "plan_fp": plan_fp,
                "query_def": query_def,
                "runs": runs,
                "agg": "min",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


def _cpu_calibration() -> dict:
    """Spark-independent single-core throughput probe, recorded alongside
    the bench numbers: round-over-round TOTAL drift that tracks these
    numbers is HOST drift (sandbox placement, noisy neighbors, thermal),
    not plan regressions.  Measured r5->r7: every query including the
    pure-Python CRAM decode moved by the same ~1.1-1.35x factor."""
    import hashlib
    import time as _t

    import numpy as np

    t0 = _t.perf_counter()
    h = hashlib.md5()
    blk = bytes(range(256)) * 4096  # 1 MiB
    for _ in range(256):
        h.update(blk)
    md5_s = _t.perf_counter() - t0

    rng = np.random.default_rng(7)
    a = rng.random((1536, 1536))
    _ = a @ a  # BLAS thread-pool warmup, outside the timed region
    t0 = _t.perf_counter()
    for _ in range(6):
        a = a @ a
        a /= np.abs(a).max()
    blas_s = _t.perf_counter() - t0

    # single-threaded bandwidth probe: unlike the matmul (BLAS thread-pool
    # placement makes it swing 0.3-0.6 s on an identical host), a copy
    # into a PREALLOCATED, warmed destination is stable enough to gate on
    # — it tracks the memory-bandwidth dimension the matmul was added for
    # (r8: co-tenant bandwidth throttle slowed Arrow stages 8x while md5
    # stayed flat).  A fresh-allocation copy (buf.copy()) was tried first
    # and swings 5x within one process: it measures page-zeroing under
    # memory pressure, not the bus.  Min of 3 rounds for the same reason.
    buf = np.zeros(16 << 20, dtype=np.float64)  # 128 MiB
    buf.fill(1.0)
    dst = np.empty_like(buf)
    np.copyto(dst, buf)  # warm the destination pages
    memcpy_s = min(
        _timed(lambda: [np.copyto(dst, buf) for _ in range(8)])
        for _ in range(3)
    )
    return {
        "md5_256mb": round(md5_s, 3),
        "matmul_1536_x6": round(blas_s, 3),
        "memcpy_1gb": round(memcpy_s, 3),
    }


def _timed(fn) -> float:
    import time as _t

    t0 = _t.perf_counter()
    fn()
    return _t.perf_counter() - t0


# Anchors the calibration GATE checks with per-anchor tolerances (matmul
# stays informational only — its BLAS thread-pool placement variance
# exceeds any useful threshold).  md5 is tight (single-core compute is
# stable on a calm host); memcpy is loose because CALIB_REF records the
# clean-window MIN while calm ambient readings band 1-2x above it
# minute-to-minute on this shared host (measured 0.07-0.14 s within one
# calm hour) — the gate targets the real failure modes (r8: md5 +85%,
# bandwidth throttle 8x = +700%), not ambient jitter.
_GATED_ANCHORS = {"md5_256mb": 0.15, "memcpy_1gb": 1.50}


def _load_calib_ref() -> dict | None:
    """Repo-recorded clean-window anchor values (tools/calibrate.py writes
    them; absent -> the gate reports calib_ok=null instead of judging)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "CALIB_REF.json")
    try:
        with open(path) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return None


def _calib_deviation(calib: dict, ref: dict) -> dict:
    return {
        k: round(100.0 * (calib[k] / ref[k] - 1.0), 1)
        for k in _GATED_ANCHORS
        if k in calib and k in ref
    }


def _dev_ok(dev: dict) -> bool:
    """All gated anchors within their per-anchor tolerance."""
    return all(abs(v) <= 100.0 * _GATED_ANCHORS[k] for k, v in dev.items())


def _dev_badness(dev: dict) -> float:
    """Worst tolerance-NORMALIZED deviation (1.0 == exactly at the gate)."""
    return max(
        (abs(v) / (100.0 * _GATED_ANCHORS[k]) for k, v in dev.items()),
        default=0.0,
    )


def _calibrate_gated(ref: dict | None, tries: int = 4, wait_s: int = 45):
    """Measure the CPU anchors; when a repo reference exists and a gated
    anchor exceeds its tolerance, WAIT and re-measure (the round-8 artifact
    was captured in a degraded host window — md5 0.773 vs clean 0.417 —
    and shipped as the official number; this gate makes that impossible to
    do silently).  Returns (calib, ok_or_None, deviations)."""
    import time as _t

    best = None
    best_dev = None
    for attempt in range(tries):
        calib = _cpu_calibration()
        if ref is None:
            return calib, None, {}
        dev = _calib_deviation(calib, ref)
        if best is None or _dev_badness(dev) < _dev_badness(best_dev):
            best, best_dev = calib, dev
        if _dev_ok(dev):
            return calib, True, dev
        print(
            f"# calibration attempt {attempt + 1}/{tries} degraded: {dev} "
            f"(host window busy — waiting {wait_s}s)",
            file=sys.stderr,
        )
        if attempt < tries - 1:
            _t.sleep(wait_s)
    return best, False, best_dev


def _load_prev_round(sf) -> tuple[str, dict] | None:
    """Latest committed BENCH_r{N}.json / BENCH_r{N}_local.json with
    per-query numbers, a gated md5 anchor reading, and the same sf — the
    baseline for the per-query calibrated regression block.  Within one
    round the builder-committed ``_local`` detail artifact wins (the slim
    driver headline no longer carries plan fingerprints or def hashes).
    Returns (filename, parsed) or None."""
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    best = None
    for fn in os.listdir(here):
        m = re.fullmatch(r"BENCH_r(\d+)(_local)?\.json", fn)
        if not m:
            continue
        try:
            with open(os.path.join(here, fn)) as fh:
                d = json.load(fh)
        except (OSError, ValueError):
            continue
        if isinstance(d.get("parsed"), dict):
            d = d["parsed"]  # driver artifact wraps the stdout line
        if (
            d.get("sf") == sf
            and d.get("queries")
            and d.get("cpu_calib_sec", {}).get("md5_256mb")
        ):
            rnd = int(m.group(1))
            # rank: newer round first; within a round, richer detail first
            rank = (rnd, 1 if d.get("plan_fp") else 0)
            if best is None or rank > best[0]:
                best = (rank, fn, d)
    return (best[1], best[2]) if best else None


def _per_query_calibrated(
    med: dict, calib: dict, sf, plan_fp: dict, query_def: dict | None = None
) -> dict | None:
    """Per-query ratio vs the previous round, NORMALIZED by the md5 host
    anchor (ratio_vs_prev / md5_ratio): >1 means the query got slower
    beyond what host drift explains.  Ratios > 1.15 are flagged — the
    calibration gate validates the WINDOW but cannot see a single-query
    plan regression; this block can.  Each flagged query is auto-
    attributed: definition hash changed vs the prior artifact ->
    'def_changed' (the number measures different WORK — not comparable,
    r11's coverage_blocks); else plan fingerprint changed ->
    'plan_changed' (regression suspect); unchanged -> 'host' (banding);
    prior artifact lacks fingerprints -> 'unknown'."""
    if not calib or not calib.get("md5_256mb"):
        return None
    prev = _load_prev_round(sf)
    if prev is None:
        return None
    fn, d = prev
    md5_ratio = calib["md5_256mb"] / d["cpu_calib_sec"]["md5_256mb"]
    ratios = {
        n: round((med[n] / d["queries"][n]) / md5_ratio, 2)
        for n in med
        if d["queries"].get(n)
    }
    flagged = sorted(n for n, r in ratios.items() if r > 1.15)
    prev_fp = d.get("plan_fp") or {}
    prev_def = d.get("query_def") or {}
    def_changed = sorted(
        n
        for n in ratios
        if query_def
        and prev_def
        and query_def.get(n)
        and prev_def.get(n)
        and query_def[n] != prev_def[n]
    )
    attribution = {}
    for n in flagged:
        if n in def_changed:
            attribution[n] = "def_changed"
            continue
        cur = (plan_fp or {}).get(n)
        old = prev_fp.get(n)
        if not cur or not old or "unavailable" in (cur, old):
            attribution[n] = "unknown"
        else:
            attribution[n] = "plan_changed" if cur != old else "host"
    return {
        "vs": fn,
        "md5_ratio": round(md5_ratio, 3),
        "ratios": ratios,
        "flagged_gt_1p15": flagged,
        "flag_attribution": attribution,
        "def_changed": def_changed,
    }


def main() -> None:
    """Orchestrate N fresh JVM sessions (subprocesses of this script) and
    print the median-of-sessions aggregate as the ONE bench JSON line."""
    import statistics
    import subprocess

    sessions = int(os.environ.get("SPARK_GRAFT_BENCH_SESSIONS", "3"))
    if sessions <= 1 or os.environ.get("SPARK_GRAFT_BENCH_CHILD") == "1":
        run_session()
        return

    import tempfile

    calib_ref = _load_calib_ref()
    calib, calib_ok, calib_dev = _calibrate_gated(calib_ref)
    calibs = [calib]
    per_session: list[dict] = []
    session_plans: list[dict] = []
    plans_dir = tempfile.mkdtemp(prefix="bench_plans_")
    for i in range(sessions):
        plans_path = os.path.join(plans_dir, f"plans_{i}.json")
        env = dict(
            os.environ,
            SPARK_GRAFT_BENCH_CHILD="1",
            SPARK_GRAFT_PLANS_OUT=plans_path,
        )
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
        )
        line = None
        for out_line in reversed(proc.stdout.strip().splitlines()):
            if out_line.startswith("{"):
                line = out_line
                break
        if line is None:
            print(
                f"session {i} produced no JSON (rc={proc.returncode}):\n"
                + proc.stderr[-2000:],
                file=sys.stderr,
            )
            continue
        per_session.append(json.loads(line))
        try:
            with open(plans_path) as fh:
                session_plans.append(json.load(fh))
        except (OSError, ValueError):
            session_plans.append({})
        print(
            f"# session {i}: total {per_session[-1]['value']} s",
            file=sys.stderr,
        )
        # re-measure the anchors after every session: a window that turns
        # degraded MID-run must show up in the artifact, not just a clean
        # pre-run probe (r8's 27.6% session spread was exactly this).
        # Settle first and take the better of two probes — measuring in
        # the wake of a 32-thread JVM teardown samples kernel cleanup, not
        # the window (observed: one-off md5 +36% readings that a 5 s
        # settle + re-probe don't reproduce)
        import time as _time

        _time.sleep(5)
        c1 = _cpu_calibration()
        if calib_ref is not None and not _dev_ok(_calib_deviation(c1, calib_ref)):
            _time.sleep(5)
            c2 = _cpu_calibration()
            if _dev_badness(_calib_deviation(c2, calib_ref)) < _dev_badness(
                _calib_deviation(c1, calib_ref)
            ):
                c1 = c2
        calibs.append(c1)
        if calib_ref is not None:
            devs = [_calib_deviation(c, calib_ref) for c in calibs]
            calib_ok = all(_dev_ok(d) for d in devs)
            calib_dev = {
                k: max((d.get(k, 0.0) for d in devs), key=abs)
                for k in _GATED_ANCHORS
            }
        # aggregate-so-far after EVERY session: the last stdout JSON line
        # is always a valid artifact even if the harness is cut off.
        # The line stays COMPACT (the r7 artifact embedded every session's
        # per-query dict and overflowed the driver's tail capture —
        # "parsed": null); full session detail goes to bench_sessions.json.
        names = [
            n
            for n in per_session[0]["queries"]
            if all(n in s["queries"] for s in per_session)
        ]
        dropped = sorted(
            {n for s in per_session for n in s["queries"]} - set(names)
        )
        if dropped:
            # a query that crashed in one session would otherwise vanish
            # from the headline total silently, making round-over-round
            # totals incomparable without warning
            print(f"# WARNING dropped from aggregate: {dropped}", file=sys.stderr)
        med = {
            n: round(statistics.median(s["queries"][n] for s in per_session), 3)
            for n in names
        }
        totals = [round(sum(s["queries"][n] for n in names), 3) for s in per_session]
        # consensus plan fingerprint: identical across sessions for a
        # deterministic build.  On disagreement record the MODAL fp (so
        # next round's attribution can still compare) and list the
        # dissenters under plan_fp_disagreement — "varies" alone made the
        # instrument blind exactly when it was needed.
        fps = [s.get("plan_fp") or {} for s in per_session]
        plan_fp = {}
        fp_disagreement: dict[str, list] = {}
        for n in names:
            vals = [f.get(n) for f in fps if f.get(n)]
            uniq = set(vals)
            if not vals:
                plan_fp[n] = "unavailable"
            elif len(uniq) == 1:
                plan_fp[n] = vals[0]
            else:
                # sorted() makes the count tie-break deterministic
                plan_fp[n] = max(sorted(uniq), key=vals.count)
                fp_disagreement[n] = sorted(uniq)
        query_def = per_session[0].get("query_def") or {}
        # The stdout headline stays SLIM: the driver tail-captures 2000
        # chars, and the r11 line (fingerprints + per-query ratios +
        # calib_ref inline) overflowed it — "parsed": null, a whole
        # round's perf evidence unreadable.  Everything attribution-sized
        # (plan_fp, query_def, ratios, disagreement detail) lives ONLY in
        # the bench_history/ detail artifact; the headline carries the
        # numbers plus short flag-name lists.
        summary = {
            "metric": "headline_queries_total_runtime",
            "value": round(sum(med.values()), 3),
            "unit": "sec",
            "queries": med,
            "sessions": len(per_session),
            "session_totals": totals,
            "spread_pct": round(
                100.0 * (max(totals) - min(totals)) / min(totals), 1
            ),
            "agg": "median_of_sessions__min_of_converged_runs",
            "cpu_calib_sec": calib,
            "calib_ok": calib_ok,
            "calib_worst_dev_pct": calib_dev,
            "sf": per_session[0]["sf"],
        }
        if dropped:
            summary["dropped_queries"] = dropped
        detail = {
            **summary,
            "plan_fp": plan_fp,
            "query_def": query_def,
            "calib_ref": calib_ref,
            "session_queries": [s["queries"] for s in per_session],
            "session_cold_runs": [s.get("cold_runs") for s in per_session],
        }
        if fp_disagreement:
            detail["plan_fp_disagreement"] = fp_disagreement
            summary["fp_disagree"] = sorted(fp_disagreement)
            # self-diagnosis: record the actual differing explain lines
            # per disagreeing query (VERDICT r11 task 3 — "each entry
            # carries an explicit recorded cause")
            import difflib

            causes: dict[str, list[str]] = {}
            for qn in fp_disagreement:
                texts = [p.get(qn) for p in session_plans]
                texts = [t for t in texts if t]
                base = texts[0] if texts else None
                other = next((t for t in texts[1:] if t != base), None)
                if base is None or other is None:
                    causes[qn] = ["explain text unavailable"]
                    continue
                diff = [
                    ln
                    for ln in difflib.unified_diff(
                        base.splitlines(), other.splitlines(), lineterm="", n=0
                    )
                    if ln.startswith(("+", "-"))
                    and not ln.startswith(("+++", "---"))
                ]
                causes[qn] = diff[:12]
            detail["plan_fp_disagreement_cause"] = causes
        pqc = _per_query_calibrated(
            med, calib, summary["sf"], plan_fp, query_def
        )
        if pqc is not None:
            detail["per_query_calibrated"] = pqc
            summary["pqc_vs"] = pqc["vs"]
            # stable shape: always a list (capped at 8 so a whole-window
            # banding storm — r11: 15/19 flagged — can't overflow the
            # 2000-char tail) plus an exact count; consumers never branch
            # on type
            flg = pqc["flagged_gt_1p15"]
            summary["pqc_flagged"] = flg[:8]
            summary["pqc_flagged_count"] = len(flg)
            if pqc["def_changed"]:
                summary["def_changed"] = pqc["def_changed"]
        here = os.path.dirname(os.path.abspath(__file__))
        try:
            # append-only per-run detail: the per-query comparison needs it
            # round over round (the r9 artifact overwrote the r8 per-query
            # detail, losing the calibrated-ratio baseline)
            os.makedirs(os.path.join(here, "bench_history"), exist_ok=True)
            with open(
                os.path.join(here, "bench_history", _RUN_STAMP), "w"
            ) as fh:
                json.dump(detail, fh, indent=1)
            # bench_sessions.json is a POINTER now — the full detail used
            # to be rewritten here every run, churning 300+-line diffs per
            # commit while bench_history already held the real record
            with open(os.path.join(here, "bench_sessions.json"), "w") as fh:
                json.dump(
                    {"latest": os.path.join("bench_history", _RUN_STAMP)},
                    fh,
                    indent=1,
                )
        except OSError as exc:
            print(f"# bench history not written: {exc}", file=sys.stderr)
        print(json.dumps(summary), flush=True)

    if not per_session:
        raise SystemExit("all bench sessions failed")


if __name__ == "__main__":
    main()

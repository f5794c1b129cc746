"""Deterministic sampling / dataset splitting for training-data pipelines.

Split assignment must be a pure function of the record id — stable across
runs, cluster sizes, and engines (so held-out sets never leak when the
pipeline is re-run on grown data).  The bucket is integer arithmetic over
the md5 hex digest (md5 is the one hash both Spark and DuckDB implement
identically — see the oracle gate), so every assignment is
DuckDB-checkable: no rand(), no engine-specific hash functions.

Map-side only: no shuffle, linear scaling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 10_000

_HEXV = "(CASE WHEN ascii({c}) >= 97 THEN ascii({c}) - 87 ELSE ascii({c}) - 48 END)"


def hash_bucket_sql(id_expr: str, buckets: int = N_BUCKETS) -> str:
    """Portable SQL: bucket in [0, buckets) from the first 6 hex chars of
    md5(id).  Identical text runs in Spark SQL and DuckDB."""
    h = f"md5(CAST({id_expr} AS STRING))"
    terms = " + ".join(
        _HEXV.format(c=f"substr({h}, {i + 1}, 1)") + f" * {16 ** i}" for i in range(6)
    )
    return f"CAST(({terms}) % {buckets} AS INT)"


def hash_bucket(id_col: Column, buckets: int = N_BUCKETS) -> Column:
    h = F.md5(id_col.cast("string"))
    val = F.lit(0)
    for i in range(6):
        c = F.ascii(F.substring(h, i + 1, 1))
        val = val + F.when(c >= 97, c - 87).otherwise(c - 48) * (16 ** i)
    return (val % buckets).cast("int")


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    buckets: int = N_BUCKETS,
) -> DataFrame:
    """Add a ``split`` column assigning each row to a named split with the
    given fractions (must sum to <= 1; remainder falls into the last
    split).  Assignment is by id-hash bucket ranges — deterministic and
    disjoint."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    b = hash_bucket(F.col(id_col), buckets)
    bounds = []
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac
        bounds.append((name, int(round(acc * buckets))))
    expr = None
    prev = 0
    for name, hi in bounds[:-1]:
        cond = b < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        prev = hi
    last = bounds[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def sample_fraction(
    df: DataFrame, id_col: str, fraction: float, buckets: int = N_BUCKETS
) -> DataFrame:
    """Deterministic downsample: keep rows whose hash bucket falls under
    fraction.  Re-running on appended data keeps previous members."""
    return df.where(hash_bucket(F.col(id_col), buckets) < int(round(fraction * buckets)))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default: float = 0.0,
    buckets: int = N_BUCKETS,
) -> DataFrame:
    """Domain-mixing sampler: keep each stratum (domain/source/language) at
    its own rate — per-id deterministic, so mixtures are reproducible and
    grow-safe.  Strata missing from ``fractions`` keep ``default``.
    Map-side only (the fractions map compiles into a literal CASE)."""
    b = hash_bucket(F.col(id_col), buckets)
    thr = None
    for name, frac in fractions.items():
        hi = F.lit(int(round(frac * buckets)))
        thr = F.when(F.col(strata_col) == name, hi) if thr is None else thr.when(
            F.col(strata_col) == name, hi
        )
    thr = (
        F.lit(int(round(default * buckets)))
        if thr is None
        else thr.otherwise(int(round(default * buckets)))
    )
    return df.where(b < thr)


def mix_domains(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    weights: dict[str, float],
    buckets: int = N_BUCKETS,
) -> DataFrame:
    """Sample to a TARGET MIXTURE: keep the largest total T such that
    every domain d can supply weights[d] * T rows, i.e. T = min_d
    count_d / w_d, then keep each domain at rate w_d * T / count_d.
    Unlike stratified_sample (caller-chosen per-domain rates) the rates
    here are computed from the data — the standard "mix web/code/books
    at 70/20/10" training-data op.  A domain named in ``weights`` but
    absent from the data makes the exact mixture infeasible -> empty
    result (count 0 -> T = 0), loud rather than silently re-weighted.
    Domains not in ``weights`` are dropped.

    Distributed shape: one tiny groupBy(strata) count, a scalar min over
    it, and a broadcast join of the per-domain thresholds back onto the
    fact table — the fact table itself is filtered map-side, never
    shuffled.  Per-row keep decisions reuse the deterministic md5 bucket,
    so output is reproducible, grow-safe, and DuckDB-checkable."""
    if not weights:
        raise ValueError("weights must be non-empty")
    bad = {k: v for k, v in weights.items() if v <= 0}
    if bad:
        raise ValueError(f"weights must be positive: {bad}")
    spark = df.sparkSession
    wdf = spark.createDataFrame(
        [(k, float(v)) for k, v in weights.items()], "__stratum string, __w double"
    )
    counts = (
        df.groupBy(F.col(strata_col).alias("__stratum"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .join(wdf, "__stratum", "right")  # absent domain -> __n null -> 0
        .select(
            "__stratum",
            "__w",
            F.coalesce(F.col("__n"), F.lit(0)).alias("__n"),
        )
    )
    # T via an unpartitioned window over the ALREADY-AGGREGATED counts
    # (<= #domains rows): one single-partition exchange of a KB-sized
    # relation, instead of a second scan of the fact table for a separate
    # agg (the counts subtree would otherwise be evaluated twice)
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    thresholds = counts.withColumn(
        "__t", F.min(F.col("__n") / F.col("__w")).over(w_all)
    ).select(
        "__stratum",
        # try_divide: an absent domain has __n = 0 (and forces __t = 0 for
        # everyone); its own null threshold keeps nothing, ANSI-safely
        F.floor(
            F.try_divide(F.col("__w") * F.col("__t"), F.col("__n")) * buckets
            + F.lit(0.5)
        )
        .cast("int")
        .alias("__thr"),
    )
    out = df.join(
        F.broadcast(thresholds),
        df[strata_col] == thresholds["__stratum"],
        "inner",
    )
    return out.where(hash_bucket(F.col(id_col), buckets) < F.col("__thr")).drop(
        "__stratum", "__thr"
    )

"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k (queries × corpus — the query side is
small, so this is a broadcast join).  Scale path: hyperplane-LSH bucketing,
where only same-bucket pairs are scored — candidate generation becomes an
equi-join on the bucket key and the cross product never materializes.

Determinism (oracle-checkable): embeddings are quantized to integers
(floor(x * 1e6) after exact float->double widening), dot products and norms
are exact integer sums, and the final cosine is a fixed sequence of IEEE
double ops — bit-identical in Spark and DuckDB.  Ranking ties break on
neighbor id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT_SCALE = 1_000_000
# multi-table hyperplane LSH: recall 1-(1-p^PLANES)^TABLES for per-plane
# agreement p = 1 - theta/pi; 6 planes x 8 tables gives ~0.9 recall at
# cosine 0.8 while pruning most of the corpus per query.
N_PLANES = 6
N_TABLES = 8
_PLANE_MOD = 1_000_003


def quantized(col):
    """array<float> -> array<bigint>, q_i = floor(double(x_i) * 1e6)."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * QUANT_SCALE).cast("long"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def _norm2(a):
    return F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by quantized cosine; excludes self.
    Output: (query_id, neighbor_id, rank, cosine).  The query relation is
    broadcast — corpus is scanned once, no shuffle of the corpus."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        quantized(F.col(vec_col)).alias("cv"),
        _norm2(quantized(F.col(vec_col))).alias("cn"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        quantized(F.col(vec_col)).alias("qv"),
        _norm2(quantized(F.col(vec_col))).alias("qn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qv"), F.col("cv")).cast("double")
                / (F.sqrt(F.col("qn").cast("double")) * F.sqrt(F.col("cn").cast("double")))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int"), "cosine")
    )


def cosine_dup_pairs(
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_1, id_2, cosine) with
    id_1 < id_2 and cosine >= threshold.  Brute-force self-join baseline —
    at corpus scale, generate candidates with the multi-table LSH buckets
    (ann_topk_lsh) and verify with this exact score."""
    e = corpus.select(
        F.col(id_col).alias("id"),
        quantized(F.col(vec_col)).alias("v"),
        _norm2(quantized(F.col(vec_col))).alias("n2"),
    )
    a = e.select(F.col("id").alias("id_1"), F.col("v").alias("v1"), F.col("n2").alias("n1"))
    b = e.select(F.col("id").alias("id_2"), F.col("v").alias("v2"), F.col("n2").alias("n2"))
    return (
        a.join(b, F.col("id_1") < F.col("id_2"))
        .select(
            "id_1",
            "id_2",
            (
                _dot(F.col("v1"), F.col("v2")).cast("double")
                / (F.sqrt(F.col("n1").cast("double")) * F.sqrt(F.col("n2").cast("double")))
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def plane_coef(plane: int, dim: int):
    """Deterministic pseudo-random hyperplane coefficient in
    [-(P-1)/2, (P-1)/2]: ((plane*997 + dim) * 2654435761) mod P - (P-1)/2."""
    return ((plane * 997 + dim) * 2654435761) % _PLANE_MOD - (_PLANE_MOD - 1) // 2


def lsh_bucket(vec_col, table: int) -> F.Column:
    """Hyperplane-LSH bucket id for one table: bit p = 1 iff
    dot(plane_{table,p}, v) > 0 over the quantized vector.  Plane
    coefficients are generated inline from (global plane index, dim) —
    pure integer arithmetic, portable and deterministic."""
    qv = quantized(vec_col)
    half = (_PLANE_MOD - 1) // 2

    def coef_lambda(g: int):
        return lambda x, i: x * (((F.lit(g * 997) + i) * 2654435761) % _PLANE_MOD - half)

    bucket = F.lit(0)
    for p in range(N_PLANES):
        dot = F.aggregate(
            F.zip_with(qv, F.sequence(F.lit(0), F.size(qv) - 1), coef_lambda(table * N_PLANES + p)),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(0)
    return bucket.cast("long")


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = union over N_TABLES of same-bucket
    pairs (each an equi-join on the bucket key — the cross product never
    materializes), exact-rank on candidates.  Recall is probabilistic;
    tested against cosine_topk."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        quantized(F.col(vec_col)).alias("cv"),
        _norm2(quantized(F.col(vec_col))).alias("cn"),
        *[lsh_bucket(F.col(vec_col), t).alias(f"bkt{t}") for t in range(N_TABLES)],
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        quantized(F.col(vec_col)).alias("qv"),
        _norm2(quantized(F.col(vec_col))).alias("qn"),
        *[lsh_bucket(F.col(vec_col), t).alias(f"bkt{t}") for t in range(N_TABLES)],
    )
    cand = None
    for t in range(N_TABLES):
        qt = q.select(
            "query_id",
            F.lit(t).alias("table"),
            F.col(f"bkt{t}").alias("bucket"),
        )
        ct = c.select(
            "neighbor_id",
            F.lit(t).alias("table"),
            F.col(f"bkt{t}").alias("bucket"),
        )
        pairs = qt.join(ct, ["table", "bucket"]).select("query_id", "neighbor_id")
        cand = pairs if cand is None else cand.unionByName(pairs)
    cand = cand.where(F.col("query_id") != F.col("neighbor_id")).distinct()

    scored = (
        cand.join(q.select("query_id", "qv", "qn"), "query_id")
        .join(c.select("neighbor_id", "cv", "cn"), "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qv"), F.col("cv")).cast("double")
                / (F.sqrt(F.col("qn").cast("double")) * F.sqrt(F.col("cn").cast("double")))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.col("rank").cast("int"), "cosine")
    )

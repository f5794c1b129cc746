"""A/B v2: use the declared query's own input lineage (_embs with _spread)."""
import sys, time, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F, Window
spark = (SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "32g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import sequila_spark.operators.similarity as S
import __spark_entry__ as em

SF = "/tmp/testdata/sf1"
embs = em._embs(spark, SF)
qdf = embs.where(F.col("vec_id") % 50 == 0)

def build(cos_kind):
    e = embs.select(F.col("vec_id").alias("id"), S.quantized(F.col("embedding")).alias("v"))
    index, cents = S._ivf_build(e, 16, 0, False)
    cents = cents.select("list_id", F.col("c"))
    q = qdf.select(F.col("vec_id").alias("query_id"), S.quantized(F.col("embedding")).alias("qv"))
    probes = (q.crossJoin(S._centroid_arr(cents))
        .select("query_id", "qv",
                F.explode(F.slice(F.array_sort(S._dists(F.col("qv"), F.col("_cents"))), 1, 4)).alias("p"))
        .select("query_id", "qv", F.col("p.list_id").alias("list_id")))
    if cos_kind == "new":
        cosine = F.try_divide(
            S._dot(F.col("qv"), F.col("cv")).cast("double"),
            F.sqrt(S._norm2(F.col("qv")).cast("double"))
            * F.sqrt(S._norm2(F.col("cv")).cast("double")))
    else:
        cos = S._cosine_batch()
        cosine = cos(F.col("qv"), F.col("cv"))
    scored = (F.broadcast(probes)
        .join(index.select("list_id", F.col("id").alias("neighbor_id"), F.col("v").alias("cv")), "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cosine.alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", F.col("rank").cast("int"), "cosine"))

res = {"new": [], "old": []}
for rnd in range(4):
    for kind in ("new", "old") if rnd % 2 == 0 else ("old", "new"):
        t0 = time.perf_counter()
        build(kind).write.format("noop").mode("overwrite").save()
        res[kind].append(round(time.perf_counter() - t0, 3))
        print(rnd, kind, res[kind][-1], flush=True)
print(json.dumps({"legs": res, "min_new": min(res["new"]), "min_old": min(res["old"]),
                  "ratio_new_over_old": round(min(res["new"]) / min(res["old"]), 3)}))

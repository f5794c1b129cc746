"""Bucketed (co-located) joins: pre-bucketing both sides of the binned
range join on the join keys removes the shuffle from every subsequent join —
the storage-level optimization for repeated annotation joins at scale."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def warehouse(spark):
    # default spark-warehouse dir (static conf); tables dropped after
    yield spark
    for t in ("b_reads", "b_targets"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_equi_join_has_no_shuffle(warehouse, tmp_path):
    spark = warehouse
    reads = spark.createDataFrame(
        [(f"r{i}", str(i % 3), i * 10 + 1, i * 10 + 50) for i in range(500)],
        "qname string, contig string, pos_start int, pos_end int",
    )
    targets = spark.createDataFrame(
        [(f"t{i}", str(i % 3), i * 40 + 1, i * 40 + 200) for i in range(100)],
        "target_id string, contig string, pos_start int, pos_end int",
    )
    (
        reads.write.mode("overwrite")
        .bucketBy(8, "contig")
        .sortBy("contig", "pos_start")
        .saveAsTable("b_reads")
    )
    (
        targets.write.mode("overwrite")
        .bucketBy(8, "contig")
        .sortBy("contig", "pos_start")
        .saveAsTable("b_targets")
    )

    r = spark.table("b_reads")
    t = spark.table("b_targets").withColumnsRenamed(
        {"pos_start": "t_start", "pos_end": "t_end"}
    )
    joined = r.join(t, "contig").where(
        (F.col("pos_start") <= F.col("t_end")) & (F.col("pos_end") >= F.col("t_start"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located storage: the contig equi-join plans without an Exchange
    assert "Exchange" not in plan or "BroadcastExchange" in plan
    # correctness unchanged vs unbucketed
    from sequila_spark.operators.range_join import range_join

    expect = range_join(reads, targets).count()
    got = joined.count()
    assert got == expect

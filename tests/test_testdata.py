"""The closed-form seq/qual builder must equal the per-character lambda
definition exactly (the DuckDB oracles use the per-character form)."""

from sequila_spark import testdata as TD


def test_fast_seq_builder_equals_lambda_form(spark, sf_small):
    spark.read.parquet(f"{sf_small}/lineitem.parquet").createOrReplaceTempView("lineitem")
    fast = spark.sql(TD.reads_with_seq_sql("spark")).select("qname", "seq", "qual")
    slow = spark.sql(TD.reads_with_seq_sql("spark_lambda")).select("qname", "seq", "qual")
    a = {r["qname"]: (r["seq"], r["qual"]) for r in fast.collect()}
    b = {r["qname"]: (r["seq"], r["qual"]) for r in slow.collect()}
    assert a == b

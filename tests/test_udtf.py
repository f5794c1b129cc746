"""Python UDTF surface (Spark 4): cigar_blocks / expand_seq in LATERAL SQL."""


def test_cigar_blocks_udtf(spark):
    rows = spark.sql(
        "SELECT * FROM cigar_blocks('10M5D8M3S', 100)"
    ).collect()
    got = [(r["block_start"], r["block_end"], r["op"]) for r in rows]
    assert got == [(100, 109, "M"), (115, 122, "M")]


def test_expand_seq_udtf_lateral(spark):
    spark.createDataFrame(
        [("r1", "acg", 7)], "qname string, seq string, pos_start int"
    ).createOrReplaceTempView("udtf_reads")
    rows = spark.sql(
        "SELECT r.qname, b.pos, b.base FROM udtf_reads r, LATERAL expand_seq(r.seq, r.pos_start) b"
    ).collect()
    got = sorted((r["qname"], r["pos"], r["base"]) for r in rows)
    assert got == [("r1", 7, "A"), ("r1", 8, "C"), ("r1", 9, "G")]


def test_cigar_blocks_null_safe(spark):
    assert spark.sql("SELECT * FROM cigar_blocks(NULL, 5)").count() == 0

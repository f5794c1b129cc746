"""Pileup map post-processing functions (functions/maps.py), semantics per
pileup/udfs/{Quality,Alt,Coverage}Functions.scala."""

from pyspark.sql import functions as F

from sequila_spark.functions import maps as M


def _df(spark):
    return spark.createDataFrame(
        [
            (
                {"A": 3, "C": 1},
                {"A": [0, 2, 1], "C": [1, 0, 0]},
                4,
            )
        ],
        "alts map<string,int>, quals map<string,array<int>>, cov int",
    )


def test_altmap_to_str(spark):
    r = _df(spark).select(M.altmap_to_str(F.col("alts")).alias("s")).first()
    assert r["s"] == "A:3|C:1"


def test_alts_to_char_identity(spark):
    r = _df(spark).select(M.alts_to_char(F.col("alts")).alias("m")).first()
    assert dict(r["m"]) == {"A": 3, "C": 1}


def test_quals_to_map_drops_zeros_chr33(spark):
    r = _df(spark).select(M.quals_to_map(F.col("quals")).alias("m")).first()
    m = {k: dict(v) for k, v in r["m"].items()}
    # index 1 -> chr(34) = '"', index 2 -> chr(35) = '#'; zeros dropped
    assert m["A"] == {'"': 2, "#": 1}
    assert m["C"] == {"!": 1}


def test_to_charmap(spark):
    r = _df(spark).select(M.to_charmap(F.col("quals")).alias("m")).first()
    assert set(r["m"].keys()) == {"A", "C"}


def test_quals_to_cov_invariant(spark):
    df = _df(spark)
    r = df.select(M.quals_to_cov(F.col("quals"), F.col("cov")).alias("c")).first()
    assert r["c"] == 4  # 0+2+1 + 1+0+0
    r2 = df.select(
        M.quals_to_cov(F.lit(None).cast("map<string,array<int>>"), F.col("cov")).alias("c")
    ).first()
    assert r2["c"] == 4  # null quals -> fall back to cov


def test_qualsmap_to_str(spark):
    r = _df(spark).select(M.qualsmap_to_str(F.col("quals")).alias("s")).first()
    assert r["s"] == "A:1=2,2=1|C:0=1"


def test_cov_equals(spark):
    r = _df(spark).select(M.cov_equals(F.col("cov"), F.lit(4)).alias("e")).first()
    assert r["e"] is True


def test_sql_map_functions(spark):
    row = spark.sql(
        "SELECT altmap_to_str(map('G', 5, 'T', 2)) AS a,"
        " quals_to_cov(map('A', array(1, 2)), 99) AS qc,"
        " bdg_cov_equals(3, 3) AS ce,"
        " qualsmap_to_str(map('A', array(0, 7))) AS qs"
    ).first()
    assert row["a"] == "G:5|T:2"
    assert row["qc"] == 3
    assert row["ce"] is True
    assert row["qs"] == "A:1=7"


def test_sql_map_function_registry_complete(spark):
    """Every UDF in the reference's UDFRegister has a SQL-callable
    counterpart (utils/UDFRegister.scala:12-41)."""
    row = spark.sql(
        "SELECT alts_to_char(map('A', 2)) AS a,"
        " quals_to_char(map('C', array(1))) AS qc,"
        " quals_to_map(map('A', array(0, 3))) AS qm,"
        " to_charmap(map('G', array(2))) AS tc,"
        " unclean_contig('MT') AS u1, bdg_unclean_contig('7') AS u2"
    ).first()
    assert dict(row["a"]) == {"A": 2}
    assert dict(row["qc"]) == {"C": [1]}
    assert {k: dict(v) for k, v in row["qm"].items()} == {"A": {'"': 3}}
    assert {k: dict(v) for k, v in row["tc"].items()} == {"G": {"!": 2}}
    assert row["u1"] == "chrM" and row["u2"] == "chr7"

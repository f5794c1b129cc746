"""Interval function semantics pinned to the reference's own test
expectations (tests/rangejoins/GRangesTestSuite.scala:157-330, base
interval (11873, 14409)) — through both the native column API and the
registered SQL surface."""

import pytest
from pyspark.sql import functions as F

from sequila_spark.functions import intervals as IV

S, E = 11873, 14409


def _one(spark, col):
    return spark.range(1).select(col.alias("iv")).first()["iv"]


def _iv(spark, col):
    r = _one(spark, col)
    return (r["pos_start"], r["pos_end"])


def test_shift(spark):
    assert _iv(spark, IV.shift(F.lit(S), F.lit(E), F.lit(5))) == (11878, 14414)


@pytest.mark.parametrize(
    "fix,expected",
    [("center", (11870, 14411)), ("start", (11873, 14414)), ("end", (11868, 14409))],
)
def test_resize(spark, fix, expected):
    assert _iv(spark, IV.resize(F.lit(S), F.lit(E), F.lit(5), fix)) == expected


@pytest.mark.parametrize(
    "w,from_start,both,expected",
    [
        (5, True, False, (11868, 11872)),
        (5, False, False, (14410, 14414)),
        (5, True, True, (11868, 11877)),
        (5, False, True, (14405, 14414)),
        (-5, True, False, (11873, 11877)),
        (-5, False, False, (14405, 14409)),
    ],
)
def test_flank(spark, w, from_start, both, expected):
    got = _iv(spark, IV.flank(F.lit(S), F.lit(E), F.lit(w), F.lit(from_start), F.lit(both)))
    assert got == expected


def test_promoters(spark):
    assert _iv(spark, IV.promoters(F.lit(S), F.lit(E), F.lit(2000), F.lit(200))) == (
        S - 2000,
        S + 199,
    )


def test_reflect(spark):
    # newStart = 2*bS + (bE-bS) - end
    bs, be = 11000, 15000
    ns = 2 * bs + (be - bs) - E
    assert _iv(spark, IV.reflect(F.lit(S), F.lit(E), F.lit(bs), F.lit(be))) == (
        ns,
        ns + E - S,
    )


def test_overlap_length(spark):
    assert _one(spark, IV.overlap_length(F.lit(1), F.lit(10), F.lit(5), F.lit(30))) == 6
    # disjoint -> negative
    assert _one(spark, IV.overlap_length(F.lit(1), F.lit(10), F.lit(20), F.lit(30))) < 0


@pytest.mark.parametrize(
    "raw,clean",
    [
        ("chr1", "1"),
        ("chr22", "22"),
        ("chrX", "X"),
        ("chrM", "MT"),
        ("chrMT", "MT"),
        ("M", "MT"),
        ("chrUn_gl000220", "Un_gl000220"),
        ("7", "7"),
    ],
)
def test_clean_contig(spark, raw, clean):
    assert _one(spark, IV.clean_contig(F.lit(raw))) == clean


def test_sql_surface(spark):
    row = spark.sql(
        "SELECT shift(11873, 14409, 5) AS s, bdg_resize(11873, 14409, 5, 'center') AS r,"
        " flank(11873, 14409, 5, true, true) AS f, overlaplength(1, 10, 5, 30) AS o,"
        " bdg_reflect(11873, 14409, 11000, 15000) AS rf, clean_contig('chrM') AS c"
    ).first()
    assert (row["s"]["pos_start"], row["s"]["pos_end"]) == (11878, 14414)
    assert (row["r"]["pos_start"], row["r"]["pos_end"]) == (11870, 14411)
    assert (row["f"]["pos_start"], row["f"]["pos_end"]) == (11868, 11877)
    assert row["o"] == 6
    assert row["c"] == "MT"


def test_sql_promoters_negative_raises(spark):
    import pyspark.errors

    with pytest.raises(Exception, match="Upstream and downstream"):
        spark.sql("SELECT promoters(10, 20, -1, 5)").collect()


def test_merge_intervals_semantics(spark):
    from sequila_spark.functions.intervals import merge_intervals

    df = spark.createDataFrame(
        [
            ("1", 10, 20), ("1", 15, 30),   # overlap -> one island
            ("1", 31, 40),                  # touching -> merges
            ("1", 45, 50),                  # gap 4 -> separate (max_gap=0)
            ("2", 5, 9),
        ],
        "contig string, pos_start int, pos_end int",
    )
    got = {
        (r["contig"], r["pos_start"]): (r["pos_end"], r["n_intervals"])
        for r in merge_intervals(df).collect()
    }
    assert got == {("1", 10): (40, 3), ("1", 45): (50, 1), ("2", 5): (9, 1)}
    # max_gap bridges gaps up to g (gap 4 merges at g=4, not at g=3)
    g4 = {(r["contig"], r["pos_start"]): (r["pos_end"], r["n_intervals"])
          for r in merge_intervals(df, max_gap=4).collect()}
    assert g4 == {("1", 10): (50, 4), ("2", 5): (9, 1)}
    g3 = {(r["contig"], r["pos_start"]) for r in merge_intervals(df, max_gap=3).collect()}
    assert ("1", 45) in g3


def test_merge_intervals_chunk_stitching(spark):
    """Islands spanning many chunks must stitch into one row (tiny
    chunk_size forces cross-chunk runs, including empty chunks under a
    long interval)."""
    from sequila_spark.functions.intervals import merge_intervals

    df = spark.createDataFrame(
        [("1", 1, 5000), ("1", 5001, 5200), ("1", 4000, 9000), ("1", 20000, 20010)],
        "contig string, pos_start int, pos_end int",
    )
    got = sorted(
        (r["pos_start"], r["pos_end"], r["n_intervals"])
        for r in merge_intervals(df, chunk_size=100).collect()
    )
    assert got == [(1, 9000, 3), (20000, 20010, 1)]

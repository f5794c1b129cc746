"""Range-join semantics: boundary cases, option semantics, strategy
equivalence (binned must equal nested-loop on every input), and join-type
extensions."""

import pytest
from pyspark.sql import functions as F

from sequila_spark.operators.range_join import range_join


def _df(spark, rows, prefix):
    return spark.createDataFrame(
        rows, f"{prefix}_id string, contig string, pos_start int, pos_end int"
    ).withColumnsRenamed({f"{prefix}_id": f"{prefix}_id"})


def mk(spark, rows):
    return spark.createDataFrame(rows, "id string, contig string, pos_start int, pos_end int")


def pairs(df):
    return sorted((r["id"], r["id_r"]) for r in df.select("id", "id_r").collect())


def test_basic_overlap_and_boundaries(spark):
    left = mk(spark, [("a", "1", 100, 200)])
    right = mk(
        spark,
        [
            ("touch_left", "1", 50, 100),    # end == left start -> overlap (inclusive)
            ("touch_right", "1", 200, 250),  # start == left end -> overlap
            ("inside", "1", 150, 160),
            ("covering", "1", 50, 300),
            ("adjacent_left", "1", 50, 99),  # gap of 0 bases -> NO overlap
            ("adjacent_right", "1", 201, 250),
            ("other_contig", "2", 100, 200),
        ],
    )
    got = pairs(range_join(left, right))
    assert got == [
        ("a", "covering"),
        ("a", "inside"),
        ("a", "touch_left"),
        ("a", "touch_right"),
    ]


def test_min_overlap(spark):
    left = mk(spark, [("a", "1", 100, 200)])
    right = mk(
        spark,
        [
            ("ov10", "1", 191, 300),  # overlap 10
            ("ov9", "1", 192, 300),   # overlap 9
        ],
    )
    got = pairs(range_join(left, right, min_overlap=10))
    assert got == [("a", "ov10")]


def test_max_gap(spark):
    left = mk(spark, [("a", "1", 100, 200)])
    right = mk(
        spark,
        [
            # widening by g matches when r.start - l.end <= g
            ("sep100", "1", 300, 400),  # 300 - 200 = 100 -> matches
            ("sep101", "1", 301, 400),  # 101 -> no match
            ("far", "1", 500, 520),
        ],
    )
    got = pairs(range_join(left, right, max_gap=100))
    assert got == [("a", "sep100")]


def test_bin_spanning_dedup(spark):
    # overlap spans many bins: must produce exactly ONE output pair
    left = mk(spark, [("a", "1", 1, 50_000)])
    right = mk(spark, [("b", "1", 2, 49_999)])
    out = range_join(left, right, bin_size=1000)
    assert out.count() == 1


def test_no_contig_join(spark):
    left = mk(spark, [("a", "1", 100, 200)])
    right = mk(spark, [("b", "9", 150, 250)])
    got = range_join(left, right, on_contig=None)
    assert got.count() == 1  # contig ignored


@pytest.mark.parametrize("how,expected", [("left_semi", ["a"]), ("left_anti", ["c"])])
def test_semi_anti(spark, how, expected):
    left = mk(spark, [("a", "1", 100, 200), ("c", "1", 900, 950)])
    right = mk(spark, [("b", "1", 150, 250)])
    got = sorted(r["id"] for r in range_join(left, right, how=how).collect())
    assert got == expected


def test_semi_rowid_broadcast_hint(spark, monkeypatch, tmp_path):
    """The composed variants broadcast-hint the matched-rowid relation when
    the LEFT side's planner stats bound it small.  matched_ids' own size
    estimate inherits the inner join's multiplied row estimate, so only the
    hint (or an AQE runtime rescue) can pick the broadcast — assert the
    STATIC plan choice with auto-broadcast disabled, and that withholding
    the hint (budget 0) changes the plan but not the rows.  The left side
    must be scan-backed: a createDataFrame LogicalRDD reports unknown
    (max) size, for which the gate correctly declines the hint."""
    import sequila_spark.operators.range_join as rj

    mk(spark, [("a", "1", 100, 200), ("c", "1", 900, 950)]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "left.parquet"))
    left = spark.read.parquet(str(tmp_path / "left.parquet"))
    right = mk(spark, [("b", "1", 150, 250)])

    def static_plan(df):
        return df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        hinted = range_join(left, right, how="left_semi")
        plan = static_plan(hinted)
        assert "BroadcastHashJoin LeftSemi" in plan, plan
        rows_hinted = sorted(r["id"] for r in hinted.collect())

        monkeypatch.setattr(rj, "_ROWID_BCAST_MAX_LEFT_BYTES", 0)
        plain = range_join(left, right, how="left_semi")
        plan0 = static_plan(plain)
        assert "BroadcastHashJoin LeftSemi" not in plan0, plan0
        rows_plain = sorted(r["id"] for r in plain.collect())
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)

    assert rows_hinted == rows_plain == ["a"]


def test_left_outer(spark):
    left = mk(spark, [("a", "1", 100, 200), ("c", "1", 900, 950)])
    right = mk(spark, [("b", "1", 150, 250)])
    out = range_join(left, right, how="left_outer").collect()
    by_id = {r["id"]: r for r in out}
    assert len(out) == 2
    assert by_id["a"]["id_r"] == "b"
    assert by_id["c"]["id_r"] is None


def test_strategy_equivalence_random(spark):
    # deterministic pseudo-random intervals; binned == nested_loop
    left = spark.range(300).select(
        F.concat(F.lit("L"), "id").alias("id"),
        (F.col("id") % 3).cast("string").alias("contig"),
        (1 + (F.col("id") * 7919) % 10_000).cast("int").alias("pos_start"),
    ).withColumn("pos_end", (F.col("pos_start") + (F.col("pos_start") * 31 % 900)).cast("int"))
    right = spark.range(200).select(
        F.concat(F.lit("R"), "id").alias("id"),
        (F.col("id") % 3).cast("string").alias("contig"),
        (1 + (F.col("id") * 6271) % 10_000).cast("int").alias("pos_start"),
    ).withColumn("pos_end", (F.col("pos_start") + (F.col("pos_start") * 17 % 1500)).cast("int"))

    for kwargs in ({}, {"min_overlap": 50}, {"max_gap": 200}, {"bin_size": 123}):
        b = pairs(range_join(left, right, **kwargs))
        n = pairs(range_join(left, right, strategy="nested_loop", **kwargs))
        assert b == n, f"strategy divergence for {kwargs}"


def test_bin_cap_routes_wide_intervals(spark):
    """A multi-megabase interval (nanopore alignment / whole-gene
    annotation) must not explode into hundreds of bin rows: with the
    default bin_cap it routes through the nested-loop branch, and results
    stay identical to the pure nested-loop join."""
    left = mk(
        spark,
        [
            ("nano", "1", 1_000, 1_201_000),   # 1.2 Mb: 241 bins at 5 kb
            ("s1", "1", 5_000, 5_400),
            ("s2", "1", 900_000, 900_300),
            ("s3", "2", 5_000, 5_400),
        ],
    )
    right = mk(
        spark,
        [
            ("gene", "1", 800_000, 2_100_000),  # wide on the right side too
            ("t1", "1", 5_100, 5_600),
            ("t2", "1", 1_150_000, 1_160_000),
            ("t3", "2", 1_000_000, 1_000_500),
        ],
    )
    capped = range_join(left, right)
    nested = range_join(left, right, strategy="nested_loop", bin_cap=None)
    assert pairs(capped) == pairs(nested)
    # capped plan = 3-branch union (binned core + two broadcast side
    # branches for the wide rows — with a contig key those plan as
    # broadcast-hash joins, not even nested loops)
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan and plan.count("Join") >= 3
    # disabling the cap keeps the old single-branch binned plan
    uncapped = range_join(left, right, bin_cap=None)
    assert pairs(uncapped) == pairs(nested)
    assert "Union" not in uncapped._jdf.queryExecution().executedPlan().toString()
    # composed join types go through the same capped core
    semi = range_join(left, right, how="left_semi")
    assert sorted(r["id"] for r in semi.collect()) == ["nano", "s1", "s2"]


def test_max_width_prunes_long_branches(spark):
    """Short-read data must get the plain single-branch binned plan: the
    max_width probe (default 'auto') sees no over-wide row and skips both
    nested-loop branches, so there is no Union and no extra input scans."""
    left = mk(spark, [(f"L{i}", "1", 1 + i * 101, 150 + i * 101) for i in range(50)])
    right = mk(spark, [(f"R{i}", "1", 1 + i * 97, 300 + i * 97) for i in range(50)])
    auto = range_join(left, right)
    assert "Union" not in auto._jdf.queryExecution().executedPlan().toString()
    # an explicit small hint does the same with no probe job
    hinted = range_join(left, right, max_width=400)
    assert "Union" not in hinted._jdf.queryExecution().executedPlan().toString()
    # max_width=None restores the round-2 always-branch plan
    forced = range_join(left, right, max_width=None)
    assert "Union" in forced._jdf.queryExecution().executedPlan().toString()
    assert pairs(auto) == pairs(hinted) == pairs(forced) == pairs(
        range_join(left, right, strategy="nested_loop")
    )


def test_max_width_one_sided_branch(spark):
    """When only one side contains over-wide rows, only that side's branch
    is built (one Union, not two) and results still match nested-loop."""
    left = mk(
        spark,
        [("nano", "1", 1_000, 2_000_000), ("s1", "1", 5_000, 5_400)],
    )
    right = mk(spark, [(f"R{i}", "1", 1 + i * 9_000, 500 + i * 9_000) for i in range(100)])
    out = range_join(left, right)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Union") == 1
    assert pairs(out) == pairs(range_join(left, right, strategy="nested_loop"))
    # hint path: a bound that only the gap-widened right side can exceed
    gap = range_join(left, right, max_width=600_000, max_gap=30_000)
    assert pairs(gap) == pairs(
        range_join(left, right, strategy="nested_loop", max_gap=30_000)
    )


def test_partitioning_invariance(spark):
    """Reference test pattern §5.2: identical results regardless of input
    partitioning."""
    left = mk(spark, [(f"L{i}", str(i % 2), 1 + i * 7 % 400, 60 + i * 7 % 400) for i in range(120)])
    right = mk(spark, [(f"R{i}", str(i % 2), 1 + i * 13 % 400, 90 + i * 13 % 400) for i in range(60)])
    one = pairs(range_join(left.coalesce(1), right.coalesce(1)))
    many = pairs(range_join(left.repartition(16), right.repartition(16)))
    assert one == many


def test_max_width_probe_memoized(spark):
    """The auto probe memoizes per (session, analyzed plan, columns): the
    same inputs joined repeatedly run the statistics job once per side."""
    from sequila_spark.operators import range_join as RJ

    left = mk(spark, [(f"L{i}", "1", 1 + i * 101, 150 + i * 101) for i in range(20)])
    right = mk(spark, [(f"R{i}", "1", 1 + i * 97, 300 + i * 97) for i in range(20)])
    RJ._PROBE_CACHE.clear()
    before = RJ._PROBE_RUNS
    first = range_join(left, right)
    assert RJ._PROBE_RUNS == before + 2  # one probe per side
    second = range_join(left, right, min_overlap=5)
    assert RJ._PROBE_RUNS == before + 2  # no re-probe on identical inputs
    assert pairs(first) == pairs(range_join(left, right, strategy="nested_loop"))
    assert RJ._PROBE_RUNS == before + 2  # nested_loop never probes
    assert second.count() >= 0


def test_max_width_probe_skips_expensive_lineage(spark):
    """A side whose lineage is not a plain scan/filter/projection (here: an
    Aggregate) is never executed for statistics — the probe declines and
    that side's long branch is built unconditionally (max_width=None
    behavior), so auto mode cannot double expensive work."""
    from pyspark.sql import functions as F

    from sequila_spark.operators import range_join as RJ

    left = mk(spark, [(f"L{i}", "1", 1 + i * 101, 150 + i * 101) for i in range(20)])
    base = mk(spark, [(f"R{i}", "1", 1 + (i % 7) * 97, 300 + i * 97) for i in range(40)])
    # expensive computed relation: an aggregation over the base intervals
    right = base.groupBy("contig", "pos_start").agg(
        F.max("pos_end").alias("pos_end"), F.count("*").alias("n")
    )
    RJ._PROBE_CACHE.clear()
    before = RJ._PROBE_RUNS
    out = range_join(left, right)
    assert RJ._PROBE_RUNS == before + 1  # left probed; right skipped
    # the skipped side falls back to always-building its long branch
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Union" in plan

    def keyset(df):
        return sorted(
            (r["id"], r["pos_start_r"], r["pos_end_r"]) for r in df.collect()
        )

    assert keyset(out) == keyset(range_join(left, right, strategy="nested_loop"))
    # persisting the expensive side makes the probe cheap again
    right_cached = right.persist()
    try:
        right_cached.count()
        range_join(left, right_cached)
        assert RJ._PROBE_RUNS == before + 2  # now probed (reads the cache)
    finally:
        right_cached.unpersist()


def test_max_width_probe_invalidates_on_rewritten_data(spark, tmp_path):
    """A semantically identical plan over REWRITTEN files must re-probe:
    the cache key includes the file-listing snapshot, so a dataset
    overwritten with wider intervals cannot return the stale (smaller)
    max width and silently prune the long branch."""
    from sequila_spark.operators import range_join as RJ

    path = str(tmp_path / "iv")
    mk(spark, [("A", "1", 10, 60)]).write.mode("overwrite").parquet(path)
    left = mk(spark, [("L", "1", 1, 1_000_000)])
    RJ._PROBE_CACHE.clear()
    before = RJ._PROBE_RUNS
    r1 = range_join(left, spark.read.parquet(path))
    assert r1.count() == 1 and RJ._PROBE_RUNS == before + 2
    # overwrite with a much wider interval; same schema, same plan shape
    mk(spark, [("B", "1", 10, 500_000)]).write.mode("overwrite").parquet(path)
    r2 = range_join(left, spark.read.parquet(path))
    assert RJ._PROBE_RUNS == before + 3  # right side re-probed
    assert r2.count() == 1  # wide interval still matches: long branch built

"""Property-based tests (hypothesis): the binned range join must agree with
a plain Python brute-force oracle on arbitrary interval sets, and interval
functions must match their Scala-semantics reference implementations."""

from hypothesis import given, settings, strategies as st

from sequila_spark.operators.range_join import range_join

interval = st.tuples(
    st.integers(min_value=-100, max_value=10_000),
    st.integers(min_value=0, max_value=2_000),
    st.sampled_from(["1", "2"]),
)


def _mk(spark, rows, prefix):
    data = [
        (f"{prefix}{i}", contig, start, start + length)
        for i, (start, length, contig) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "id string, contig string, pos_start int, pos_end int"
    )


def _brute(left, right, min_overlap=1, max_gap=0):
    out = set()
    for i, (ls, ll, lc) in enumerate(left):
        le = ls + ll
        for j, (rs, rl, rc) in enumerate(right):
            re = rs + rl
            ws, we = rs - max_gap, re + max_gap
            if lc == rc and ls <= we and le >= ws:
                if min(le, we) - max(ls, ws) + 1 >= min_overlap:
                    out.add((f"L{i}", f"R{j}"))
    return out


@settings(max_examples=15, deadline=None)
@given(
    left=st.lists(interval, min_size=0, max_size=12),
    right=st.lists(interval, min_size=0, max_size=12),
    min_overlap=st.sampled_from([1, 5, 100]),
    max_gap=st.sampled_from([0, 7, 1000]),
    bin_size=st.sampled_from([3, 100, 5000]),
)
def test_range_join_matches_bruteforce(spark, left, right, min_overlap, max_gap, bin_size):
    ldf = _mk(spark, left, "L")
    rdf = _mk(spark, right, "R")
    got = {
        (r["id"], r["id_r"])
        for r in range_join(
            ldf, rdf, min_overlap=min_overlap, max_gap=max_gap, bin_size=bin_size
        )
        .select("id", "id_r")
        .collect()
    }
    assert got == _brute(left, right, min_overlap, max_gap)


def _resize_ref(start, end, k, fix):
    if fix == "start":
        return (start, end + k)
    if fix == "end":
        return (start - k, end)
    width = end - start
    center = start + _tz(width, 2)
    left_pad = _tz(k, 2) + (0 if k % 2 == 0 else 1)
    return (center - (_tz(width, 2) + left_pad), center + (_tz(width, 2) + _tz(k, 2)))


def _tz(a, b):
    # Scala Int division truncates toward zero
    return -(-a // b) if (a < 0) ^ (b < 0) else a // b


@settings(max_examples=10, deadline=None)
@given(
    start=st.integers(min_value=1, max_value=100_000),
    length=st.integers(min_value=0, max_value=10_000),
    k=st.integers(min_value=0, max_value=999),
    fix=st.sampled_from(["start", "end", "center"]),
)
def test_resize_property(spark, start, length, k, fix):
    from pyspark.sql import functions as F

    from sequila_spark.functions.intervals import resize

    end = start + length
    got = spark.range(1).select(
        resize(F.lit(start), F.lit(end), F.lit(k), fix).alias("iv")
    ).first()["iv"]
    assert (got["pos_start"], got["pos_end"]) == _resize_ref(start, end, k, fix)


@settings(max_examples=12, deadline=None)
@given(
    reads=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=400),  # pos_start
            st.integers(min_value=0, max_value=150),  # length - 1
            st.sampled_from(["1", "2"]),
        ),
        min_size=1,
        max_size=25,
    ),
    chunk_size=st.sampled_from([7, 64, 1_000_000]),
)
def test_coverage_blocks_match_bruteforce(spark, reads, chunk_size):
    """The clip-at-chunk coverage (arbitrary chunk sizes, boundary merges
    included) must reproduce a per-position brute force on ANY read set:
    maximal equal-coverage runs, cov > 0, 1-based inclusive."""
    from collections import Counter

    from sequila_spark.operators.coverage import coverage

    df = spark.createDataFrame(
        [(c, s, s + l) for (s, l, c) in reads],
        "contig string, pos_start int, pos_end int",
    )
    got = sorted(
        map(
            tuple,
            coverage(
                df, use_cigar=False, chunk_size=chunk_size
            ).collect(),
        )
    )

    depth: Counter = Counter()
    for s, l, c in reads:
        for p in range(s, s + l + 1):
            depth[(c, p)] += 1
    expect = []
    for c in sorted({k[0] for k in depth}):
        positions = sorted(p for (cc, p) in depth if cc == c)
        run_start = None
        prev_p = None
        prev_cov = None
        for p in positions:
            cov = depth[(c, p)]
            if run_start is None:
                run_start, prev_p, prev_cov = p, p, cov
            elif p == prev_p + 1 and cov == prev_cov:
                prev_p = p
            else:
                expect.append((c, run_start, prev_p, prev_cov))
                run_start, prev_p, prev_cov = p, p, cov
        if run_start is not None:
            expect.append((c, run_start, prev_p, prev_cov))
    assert got == sorted(expect)

"""Regression guard for bench.py's plan-fingerprint normalization.

Three rounds in a row a Spark session-global counter leaked into the
formatted explain text and caused cross-session fingerprint
"disagreements" (r10: exprIds/plan ids, r11: AQE finality + operator
numbering, r12: lambda-variable and _common_expr counters).  This test
renders pairs of synthetic explain texts that differ ONLY in such
volatile tokens and asserts the normalized forms are identical — so the
next leak is caught here, not in a cross-session flag storm at bench
time.  No SparkSession needed: the normalizer is pure text.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import _normalize_plan_text  # noqa: E402


def _assert_equal_normalized(a: str, b: str) -> None:
    na, nb = _normalize_plan_text(a), _normalize_plan_text(b)
    assert na == nb, f"normalized plans differ:\n{na!r}\n{nb!r}"


def test_lambda_counter_scrubbed():
    # the exact r11/r12 leak: session-global lambda-variable counter
    a = "(4) Project [transform(embedding#12, lambda x_120#1841) AS e#9]"
    b = "(7) Project [transform(embedding#55, lambda x_126#2207) AS e#3]"
    _assert_equal_normalized(a, b)


def test_common_expr_counter_scrubbed():
    a = "Project [_common_expr_0#101 AS a#1, _common_expr_3#102 AS b#2]"
    b = "Project [_common_expr_7#885 AS a#9, _common_expr_9#886 AS b#4]"
    _assert_equal_normalized(a, b)


def test_expr_ids_and_plan_ids_scrubbed():
    a = "BroadcastExchange HashedRelation [plan_id=123]\n+- Filter (id#4L > 1)"
    b = "BroadcastExchange HashedRelation [plan_id=987]\n+- Filter (id#71L > 1)"
    _assert_equal_normalized(a, b)


def test_operator_numbering_and_codegen_ids_scrubbed():
    a = "(1) Scan parquet [codegen id : 1]\n(2) HashAggregate [codegen id : 2]"
    b = "(3) Scan parquet [codegen id : 4]\n(4) HashAggregate [codegen id : 7]"
    _assert_equal_normalized(a, b)


def test_aqe_finality_and_scan_stats_scrubbed():
    a = (
        "AdaptiveSparkPlan isFinalPlan=false\n"
        "Location: InMemoryFileIndex [file:/tmp/a.parquet]\n"
        "Statistics(size=1.2 MiB, rowCount=6.00E+4)"
    )
    b = (
        "AdaptiveSparkPlan isFinalPlan=true\n"
        "Location: InMemoryFileIndex [file:/run/b.parquet]\n"
        "Statistics(size=9.9 MiB, rowCount=1.00E+6)"
    )
    _assert_equal_normalized(a, b)


def test_composite_real_shape():
    # all leak classes at once, in a realistically-shaped fragment
    a = (
        "(12) Project [codegen id : 3]\n"
        "Output [2]: [aggregate(blocks#310, 0, lambda acc_44#991, "
        "lambda x_45#992) AS depth#311, _common_expr_2#993 AS c#312]\n"
        "(13) Exchange hashpartitioning(contig#4, 32) [plan_id=201] "
        "isFinalPlan=false"
    )
    b = (
        "(2) Project [codegen id : 9]\n"
        "Output [2]: [aggregate(blocks#17, 0, lambda acc_98#41, "
        "lambda x_99#42) AS depth#18, _common_expr_6#43 AS c#19]\n"
        "(3) Exchange hashpartitioning(contig#9, 32) [plan_id=77] "
        "isFinalPlan=true"
    )
    _assert_equal_normalized(a, b)


def test_real_plan_difference_survives():
    # normalization must NOT erase genuine plan differences
    a = "(1) SortMergeJoin [contig#1], [contig#2], Inner"
    b = "(1) BroadcastHashJoin [contig#1], [contig#2], Inner"
    assert _normalize_plan_text(a) != _normalize_plan_text(b)

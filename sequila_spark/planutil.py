"""Planner-statistics helpers shared by the budget-gated broadcast hints
(range_join composed-variant rowid gate, similarity vector re-attach gate).

Extracted per r15 ADVICE: the two operators carried byte-identical
try/except optimizedPlan-stats gates differing only in budget constant,
inviting drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_stats(df: DataFrame) -> tuple[int | None, int | None]:
    """(sizeInBytes, rowCount) from the OPTIMIZED plan's statistics — costs
    no job; parquet-backed lineages estimate bytes from (compressed) file
    size.  ``rowCount`` is present only when the plan can derive it (CBO
    stats, LocalRelation, limits) — ``None`` otherwise.  Returns
    ``(None, None)`` when the JVM statistics are unreachable (callers then
    withhold their hint and let the planner/AQE decide — fail-safe)."""
    try:
        st = df._jdf.queryExecution().optimizedPlan().stats()
        size = int(st.sizeInBytes())
    except Exception:
        return None, None
    rows: int | None = None
    try:
        opt = st.rowCount()
        if opt.isDefined():
            rows = int(opt.get().longValue())
    except Exception:
        rows = None
    return size, rows

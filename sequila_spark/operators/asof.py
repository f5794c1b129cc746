"""As-of join — for each left row, the latest right row with
right.ts <= left.ts (optionally within a tolerance), per key.

Spark has no native as-of join.  The scalable formulation here is the
union-and-window technique: tag both sides, union on (key, ts), and carry
the most recent right-side value forward with a last_value window — one
shuffle on the key, no per-group pandas, no broadcast of either side.  The
window partitions by key; at 100 TB key cardinality provides parallelism
(for a single hot key, pre-bucket by time range first).

DuckDB validates this against its native ASOF JOIN in the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    tolerance: int | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """Left as-of join.  ``tolerance`` (same unit as ts_col when numeric,
    microseconds for timestamps) drops matches older than left.ts - tol.
    Right columns (except key/ts) come back prefixed."""
    payload = [c for c in right.columns if c not in (on, ts_col)]

    l_tag = left.select(
        F.col(on).alias("__k"),
        F.col(ts_col).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__l"),
        F.lit(None).cast(
            right.select(F.struct(*payload).alias("s")).schema["s"].dataType
        ).alias("__r"),
        F.lit(None).cast("long").alias("__rt"),
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.col(ts_col).alias("__t"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__l"),
        F.struct(*payload).alias("__r"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("__rt")
        if dict(right.dtypes)[ts_col].startswith("timestamp")
        else F.col(ts_col).cast("long").alias("__rt"),
    )

    # right rows sort before left rows at equal ts (side 0 < 1), so
    # last_value picks up same-instant right rows — ASOF <= semantics.
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = l_tag.unionByName(r_tag).select(
        "*",
        F.last("__r", ignorenulls=True).over(w).alias("__rlast"),
        F.last("__rt", ignorenulls=True).over(w).alias("__rtlast"),
    )
    out = merged.where(F.col("__side") == 1)
    if tolerance is not None:
        lts = (
            F.unix_micros(F.col("__t").cast("timestamp"))
            if dict(left.dtypes)[ts_col].startswith("timestamp")
            else F.col("__t").cast("long")
        )
        keep = F.col("__rtlast").isNotNull() & (lts - F.col("__rtlast") <= tolerance)
        out = out.withColumn("__rlast", F.when(keep, F.col("__rlast")))

    cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    cols += [F.col(f"__rlast.{c}").alias(f"{right_prefix}{c}") for c in payload]
    return out.select(*cols)

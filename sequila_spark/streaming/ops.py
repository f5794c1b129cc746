"""Structured-streaming operators.

The reference is batch-only (SURVEY.md §2.9 — nothing to port); this module
is the planned extension: streaming variants of the engine's aggregations
plus the standard event-pipeline operators (windowed aggs, sessionization,
custom stateful ops).  Every streaming transformation has a batch-equivalent
formulation (same expressions), so correctness is pinned by the batch DuckDB
oracles and the streaming tests only need to assert batch==stream.

Scale notes: watermarks bound state; session windows use Spark's native
``session_window`` (state pruned per watermark); the custom stateful
operator uses ``applyInPandasWithState`` with per-group state only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

SESSION_GAP_S = 1800


def _ts_to_micros(df: DataFrame) -> DataFrame:
    """Canonicalize ``ts`` to us-precision TimestampType regardless of how
    the parquet writer encoded it: timestamp[us] passes through; parquet
    NANOS surfaces as LongType under ``nanosAsLong`` and is truncated with
    integer arithmetic (``div 1000``) so Spark and DuckDB agree exactly."""
    if isinstance(df.schema["ts"].dataType, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch events relation with us-precision ts."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return _ts_to_micros(spark.read.parquet(f"{sf_dir}/events.parquet"))


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream over the events table (one-file parquet source — in
    production this is Kafka/Kinesis; the transformations are identical)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    return _ts_to_micros(
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
        .where(F.col("event_id").isNotNull())
    )


def windowed_event_agg(
    events: DataFrame, window: str = "1 hour", exact_users: bool = False
) -> DataFrame:
    """Tumbling-window aggregate per event_type.  Works on both batch and
    streaming inputs (add a watermark upstream for append-mode streams).
    value is fixed-point-quantized so sums are exact integers (deterministic
    under any aggregation order).  exact_users swaps the streaming-friendly
    approx_count_distinct for an exact distinct (batch/oracle use)."""
    qvalue = F.floor(F.col("value").cast("double") * 1000).cast("long")
    users = (
        F.countDistinct("user_id").alias("n_users")
        if exact_users
        else F.approx_count_distinct("user_id").alias("n_users")
    )
    return (
        events.groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(qvalue).cast("long").alias("sum_value_milli"),
            users,
        )
        .select(
            F.unix_timestamp(F.col("win.start")).alias("win_start_s"),
            F.unix_timestamp(F.col("win.end")).alias("win_end_s"),
            "event_type",
            "n_events",
            "sum_value_milli",
            F.col("n_users").cast("long").alias("n_users"),
        )
    )


def windowed_read_counts(reads: DataFrame, window_bp: int = 10_000) -> DataFrame:
    """Genomic analog of a tumbling-window agg: per (contig, fixed bp
    window) read start counts — the streaming-friendly coverage proxy (full
    event-based coverage needs ordered prefix sums, which streaming gets per
    watermark-closed window instead)."""
    win = F.floor((F.col("pos_start") - 1) / window_bp).cast("long")
    return reads.groupBy(F.col("contig"), win.alias("win")).agg(
        F.count("*").cast("long").alias("n_reads")
    )


def sessionize(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Batch sessionization: a session breaks when the gap to the previous
    event of the same user exceeds gap_s.  Output one row per session.
    Ordering ties broken by event_id (deterministic)."""
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    gap_us = gap_s * 1_000_000
    with_break = events.select(
        "user_id", "event_id", us.alias("ts_us")
    ).withColumn(
        "is_new",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w)) > gap_us, 1
        ).otherwise(0),
    )
    with_sid = with_break.withColumn(
        "session_no",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        with_sid.groupBy("user_id", "session_no")
        .agg(
            F.min("ts_us").alias("min_us"),
            F.max("ts_us").alias("max_us"),
            F.count("*").cast("long").alias("n_events"),
        )
        .select(
            "user_id",
            F.col("session_no").cast("long").alias("session_no"),
            # integer division: double /1e6 could round across a second edge
            F.expr("min_us div 1000000").alias("session_start_s"),
            F.expr("max_us div 1000000").alias("session_end_s"),
            "n_events",
        )
    )


def sessionize_stream(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Streaming sessionization via native session_window + watermark —
    state is pruned as the watermark advances."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", f"{gap_s} seconds").alias("sw"), "user_id")
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.unix_timestamp(F.col("sw.start")).alias("session_start_s"),
            F.col("n_events"),
        )
    )


_STATE_SCHEMA = T.StructType([T.StructField("total", T.LongType())])
_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("total_events", T.LongType()),
    ]
)


def stream_exact_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication: keep the first occurrence of each key
    within the watermark horizon (``dropDuplicatesWithinWatermark`` — state
    is pruned as the watermark advances, so memory is bounded by the
    duplicate-arrival window, not the stream length).  The batch
    formulation of the same contract is ``dropDuplicates(keys)``.  This is
    the streaming half of a training-data ingest pipeline's exact dedup
    (the batch half is operators/dedup.exact_duplicates)."""
    keys = keys or ["event_id"]
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running event count via
    applyInPandasWithState (the engine's template for arbitrary stateful
    streaming logic — state is one counter per key)."""
    import pandas as pd

    def fn(key, pdf_iter, state):
        (user_id,) = key
        total = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [user_id], "total_events": [total]})

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf="NoTimeout",
    )

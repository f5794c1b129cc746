"""Structured-streaming operators: stream results must equal the batch
formulation (which is itself DuckDB-oracle-checked via the driver queries)."""

import pytest
from pyspark.sql import functions as F


def _run_stream(df, name, output_mode="complete"):
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_windowed_event_agg_stream_equals_batch(spark, sf_small):
    from sequila_spark.streaming.ops import (
        read_events,
        read_events_stream,
        windowed_event_agg,
    )

    stream = windowed_event_agg(read_events_stream(spark, sf_small))
    _run_stream(stream, "win_agg")
    got = {
        (r["win_start_s"], r["event_type"]): (r["n_events"], r["sum_value_milli"])
        for r in spark.sql("SELECT * FROM win_agg").collect()
    }
    batch = windowed_event_agg(read_events(spark, sf_small))
    expect = {
        (r["win_start_s"], r["event_type"]): (r["n_events"], r["sum_value_milli"])
        for r in batch.collect()
    }
    assert got == expect
    assert len(got) > 0


def test_session_window_stream(spark, sf_small):
    from sequila_spark.streaming.ops import read_events_stream, sessionize_stream

    stream = sessionize_stream(read_events_stream(spark, sf_small))
    _run_stream(stream, "sessions")
    rows = spark.sql("SELECT * FROM sessions").collect()
    assert len(rows) > 0
    assert all(r["n_events"] >= 1 for r in rows)


def test_stateful_running_totals(spark, sf_small):
    from sequila_spark.streaming.ops import (
        read_events,
        read_events_stream,
        running_user_totals_stream,
    )

    stream = running_user_totals_stream(read_events_stream(spark, sf_small))
    _run_stream(stream, "totals", output_mode="update")
    got = {
        r["user_id"]: r["total_events"]
        for r in spark.sql(
            "SELECT user_id, max(total_events) AS total_events FROM totals GROUP BY user_id"
        ).collect()
    }
    expect = {
        r["user_id"]: r["n"]
        for r in read_events(spark, sf_small)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == expect


def test_stream_exact_dedup_equals_batch(spark, sf_small):
    """Watermark-bounded streaming dedup must keep exactly one row per key
    — same distinct key set as the batch dropDuplicates contract, no key
    lost or duplicated."""
    from sequila_spark.streaming.ops import (
        read_events,
        read_events_stream,
        stream_exact_dedup,
    )

    # duplicate the stream source to create real duplicates
    ev = read_events_stream(spark, sf_small)
    dup = stream_exact_dedup(ev.unionByName(ev), keys=["event_id"])
    _run_stream(dup, "dedup_stream", output_mode="append")
    got = spark.sql("SELECT event_id, count(*) AS n FROM dedup_stream GROUP BY event_id")
    counts = {r["event_id"]: r["n"] for r in got.collect()}
    assert counts and set(counts.values()) == {1}
    batch_keys = {
        r["event_id"]
        for r in stream_exact_dedup(read_events(spark, sf_small)).select("event_id").collect()
    }
    assert set(counts) == batch_keys


def test_batch_sessionize_properties(spark, sf_small):
    from sequila_spark.streaming.ops import read_events, sessionize

    sessions = sessionize(read_events(spark, sf_small)).collect()
    assert len(sessions) > 0
    # sessions of one user don't overlap and are ordered by session_no
    by_user = {}
    for r in sessions:
        by_user.setdefault(r["user_id"], []).append(r)
    for user, ss in by_user.items():
        ss.sort(key=lambda r: r["session_no"])
        for a, b in zip(ss, ss[1:]):
            assert a["session_end_s"] < b["session_start_s"]


def test_windowed_read_counts_stream_equals_batch(spark, sf_small, tmp_path):
    """Genomic windowed counts driven as a stream (reads written to a
    parquet dir, file-streamed back) must equal the batch formulation."""
    from sequila_spark import testdata as TD
    from sequila_spark.streaming.ops import windowed_read_counts

    reads = TD.reads(spark, sf_small)
    path = str(tmp_path / "reads_stream")
    reads.write.mode("overwrite").parquet(path)
    stream = (
        spark.readStream.schema(reads.schema).format("parquet").load(path)
    )
    q = (
        windowed_read_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_reads")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["contig"], r["win"]): r["n_reads"]
        for r in spark.sql("SELECT * FROM win_reads").collect()
    }
    expect = {
        (r["contig"], r["win"]): r["n_reads"]
        for r in windowed_read_counts(reads).collect()
    }
    assert got == expect and len(got) > 0


def test_append_mode_watermark_emits_closed_windows(spark, tmp_path):
    """Append-mode windowed agg with a watermark: windows are emitted only
    once the watermark passes their end, and late rows beyond the watermark
    are dropped — the bounded-state contract."""
    import os
    import pandas as pd

    src = str(tmp_path / "stream_src")
    os.makedirs(src, exist_ok=True)
    base = 1_700_000_000  # epoch seconds

    def write_batch(name, rows):
        pd.DataFrame(
            {
                "event_id": range(len(rows)),
                "ts": pd.to_datetime([base + r for r in rows], unit="s").astype(
                    "datetime64[us]"
                ),
                "value": [1.0] * len(rows),
            }
        ).to_parquet(f"{src}/{name}.parquet")

    # batch 1: events inside window [0, 60); batch 2: an event far in the
    # future (advances watermark past window 1) plus one very late event.
    write_batch("b1", [5, 10, 20])
    schema = "event_id long, ts timestamp, value double"
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(schema).format("parquet").load(src)
    agg = (
        stream.withWatermark("ts", "30 seconds")
        .groupBy(F.window("ts", "60 seconds").alias("win"))
        .agg(F.count("*").alias("n"))
        .select(F.unix_timestamp("win.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_out")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r["ws"]: r["n"] for r in spark.sql("SELECT * FROM wm_out").collect()}
        assert first == {}  # watermark has not passed window 1 yet

        write_batch("b2", [500])  # advances the watermark past window 1
        q.processAllAvailable()
        second = {r["ws"]: r["n"] for r in spark.sql("SELECT * FROM wm_out").collect()}
        assert second == {base - base % 60: 3}  # window 1 closed and emitted

        write_batch("b3", [2, 600])  # ts=+2 is now behind the watermark
        q.processAllAvailable()
        third = {r["ws"]: r["n"] for r in spark.sql("SELECT * FROM wm_out").collect()}
    finally:
        q.stop()

    # the late row was dropped: window 1's emitted count is unchanged (no
    # re-emission — append mode emits each window once); ts=+500's window
    # also closed when the watermark passed it.
    w1 = base - base % 60
    assert third == {w1: 3, w1 + 480: 1}

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


def _neardup_docs():
    """Crafted corpus: 1001/1002 near-identical (1-char edit), 1003 an
    exact duplicate of 1001, 1005/1006 a second near-dup family, the rest
    unrelated."""
    base = "the quick brown fox jumps over the lazy dog while the band plays on " * 3
    other = "completely different content about spark structured streaming state " * 3
    return [
        (1001, base),
        (1002, base[:-5] + "X" + base[-4:]),
        (1003, base),
        (1004, other),
        (1005, other + " tail"),
        (1006, other + " tail!"),
        (1007, "short text"),
        (1008, "unrelated words entirely disjoint vocabulary example row"),
    ]


def _neardup_set(rows):
    return {(r["band"], r["id_1"], r["id_2"], round(r["jaccard"], 12)) for r in rows}


def test_stream_lsh_neardup_equals_batch(spark, tmp_path):
    """Single micro-batch replay: the stateful bucket operator must emit
    exactly the batch formulation's verified anchor pairs."""
    from sequila_spark.streaming.ops import stream_lsh_neardup

    docs = spark.createDataFrame(_neardup_docs(), "doc_id long, text string")
    d = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(d)

    batch = stream_lsh_neardup(spark.read.parquet(d), threshold=0.5)
    expect = _neardup_set(batch.collect())
    assert expect, "crafted corpus must produce near-dup pairs"
    assert {(p[1], p[2]) for p in expect} >= {(1001, 1002), (1001, 1003), (1005, 1006)}

    stream = stream_lsh_neardup(
        spark.readStream.schema(docs.schema).parquet(d), threshold=0.5
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("neardup1")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _neardup_set(spark.sql("SELECT * FROM neardup1").collect())
    assert got == expect


def test_stream_lsh_neardup_state_across_batches(spark, tmp_path):
    """Two micro-batches: docs arriving in the second batch must verify
    against anchors remembered in state from the first."""
    import time

    from sequila_spark.streaming.ops import stream_lsh_neardup

    rows = _neardup_docs()
    by_id = {r[0]: r for r in rows}
    # split each near-dup family across the two batches so verification in
    # batch 2 must hit anchors remembered from batch 1
    first = [by_id[1001], by_id[1004], by_id[1005]]
    second = [by_id[i] for i in (1002, 1003, 1006, 1007, 1008)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    d = tmp_path / "docs2"
    d.mkdir()
    spark.createDataFrame(first, docs.schema).coalesce(1).write.parquet(
        str(d / "f1.parquet")
    )
    time.sleep(1.1)  # file-source ordering is by modification time
    spark.createDataFrame(second, docs.schema).coalesce(1).write.parquet(
        str(d / "f2.parquet")
    )

    stream = stream_lsh_neardup(
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", "1")
        .parquet(str(d / "*")),
        threshold=0.5,
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("neardup2")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _neardup_set(spark.sql("SELECT * FROM neardup2").collect())
    expect = _neardup_set(
        stream_lsh_neardup(spark.read.parquet(str(d / "*")), threshold=0.5).collect()
    )
    assert got == expect
    assert {(p[1], p[2]) for p in got} >= {(1001, 1002), (1005, 1006)}


def test_band_rows_non_ascii_parity_with_batch_minhash(spark):
    """The streaming signature path (numpy) must produce exactly the batch
    operator's band keys on non-ASCII text, where the shingle Horner hash
    overflows int64 (131^6 * CJK codepoint) and goes negative — Spark's %
    is Java-truncated (sign of the dividend) while numpy's % is floored,
    so this pins the np.fmod choice in streaming._band_rows."""
    from sequila_spark.operators.dedup import (
        BANDS,
        ROWS_PER_BAND,
        minhash_signatures,
    )
    from sequila_spark.streaming.ops import _band_rows

    rows = [
        (1, "中文文本去重测试，流式与批式签名必须一致。中文文本去重测试。"),
        (2, "中文文本去重测试，流式与批式签名必须一致。中文文本去重测试！"),
        (3, "données dupliquées — détection de quasi-doublons en continu"),
        (4, "ascii only control row for the same pipeline and bands"),
        (5, "中文" * 20),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sig = minhash_signatures(docs).collect()
    expect = set()
    for r in sig:
        for band in range(BANDS):
            key = ",".join(
                str(r[f"mh{band * ROWS_PER_BAND + i}"]) for i in range(ROWS_PER_BAND)
            )
            expect.add((band, key, r["doc_id"]))

    got = {
        (r["band"], r["bkey"], r["doc_id"])
        for r in _band_rows(docs, "doc_id", "text").collect()
    }
    assert got == expect


def test_stream_lsh_neardup_state_ttl_reanchors(spark, tmp_path):
    """With state_ttl_ms set, an idle bucket's anchor expires: a near-dup
    arriving after the TTL does NOT pair with the pre-expiry anchor, but
    re-anchors the bucket and pairs with later arrivals.

    Processing-time timeouts make Spark schedule a no-data micro-batch per
    trigger forever (FlatMapGroupsWithStateExec.shouldRunAnotherBatch), so
    ``processAllAvailable()`` never returns on this query — the test paces
    with a real trigger and polls query progress for input-row counts
    instead."""
    import time

    from sequila_spark.streaming.ops import stream_lsh_neardup

    rows = _neardup_docs()
    by_id = {r[0]: r for r in rows}
    schema = "doc_id long, text string"
    d = tmp_path / "docs_ttl"
    d.mkdir()

    def write_batch(name, ids):
        spark.createDataFrame([by_id[i] for i in ids], schema).coalesce(1).write.parquet(
            str(d / name)
        )

    def await_inputs(q, n, deadline_s=60):
        """Poll until the query has consumed ``n`` input rows in total."""
        t0 = time.time()
        while time.time() - t0 < deadline_s:
            if q.exception() is not None:
                raise q.exception()
            total = sum(p["numInputRows"] for p in (q.recentProgress or []))
            if total >= n:
                return
            time.sleep(0.2)
        raise AssertionError(f"stream never consumed {n} rows")

    def await_state_drop(q, below, deadline_s=90):
        """Poll until the stateful operator holds < ``below`` state rows —
        i.e. the processing-time TTL actually fired and removed the
        expired anchors.  Deterministic replacement for the old fixed
        ``sleep(ttl + 3)``, which under concurrent-load stalls could
        return before the timeout batch ran (the one recorded flake,
        PARITY.md r13)."""
        t0 = time.time()
        while time.time() - t0 < deadline_s:
            if q.exception() is not None:
                raise q.exception()
            ops = (q.lastProgress or {}).get("stateOperators") or []
            if ops and ops[0].get("numRowsTotal", 1 << 60) < below:
                return
            time.sleep(0.3)
        raise AssertionError(f"state never dropped below {below} rows")

    # TTL must dwarf inter-batch latency under LOAD (trigger 200 ms + file
    # discovery + progress-poll lag, all of which stretch under a
    # concurrent sweep): 1002's re-anchor has to survive until 1003's
    # batch, so the margin is ~100x the quiet-host batch latency
    ttl_ms = 20_000
    write_batch("f1.parquet", [1001])          # anchors the base-family buckets
    stream = stream_lsh_neardup(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
        .parquet(str(d / "*")),
        threshold=0.5,
        state_ttl_ms=ttl_ms,
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("neardup_ttl")
        .trigger(processingTime="200 milliseconds")
        .option("checkpointLocation", str(tmp_path / "ck_ttl"))
        .start()
    )
    try:
        await_inputs(q, 1)
        n_anchored = None
        t0 = time.time()
        while time.time() - t0 < 30:          # 1001's buckets land in state
            ops = (q.lastProgress or {}).get("stateOperators") or []
            if ops and ops[0].get("numRowsTotal", 0) > 0:
                n_anchored = ops[0]["numRowsTotal"]
                break
            time.sleep(0.3)
        assert n_anchored, "anchor batch never registered state rows"
        await_state_drop(q, 1)                 # TTL fired: 1001's buckets gone
        write_batch("f3.parquet", [1002])      # near-dup of 1001 — bucket empty,
        await_inputs(q, 2)                     # so 1002 re-anchors (no pair)
        write_batch("f4.parquet", [1003])      # exact dup of 1001 — pairs w/ 1002
        await_inputs(q, 3)
        t0 = time.time()
        while time.time() - t0 < 30:
            got = _neardup_set(spark.sql("SELECT * FROM neardup_ttl").collect())
            if {(p[1], p[2]) for p in got} & {(1002, 1003), (1001, 1003)}:
                break
            time.sleep(0.2)
    finally:
        q.stop()

    pairs = {(p[1], p[2]) for p in got}
    assert (1001, 1002) not in pairs, "expired anchor must not pair"
    assert (1001, 1003) not in pairs
    assert (1002, 1003) in pairs, "bucket must re-anchor at 1002 after expiry"


def test_stream_lsh_neardup_event_time_ttl_replay(spark, tmp_path):
    """Event-time TTL (ttl_mode='event'): state expires when the WATERMARK
    passes (bucket's last event time + TTL) — the contract a replayed or
    backfilled stream needs.  This replay runs in seconds of wall clock but
    its event times span ~10 minutes; with a 60 s event-time TTL the
    anchor set at 10:00:00 must be gone once the watermark (driven by an
    unrelated 10:10:00 row) passes 10:01:00, so a near-dup arriving later
    in event time re-anchors instead of pairing.  Under the
    processing-time variant nothing would expire here (the whole replay
    fits inside the TTL in wall-clock terms), which is exactly the gap
    this mode closes."""
    from sequila_spark.streaming.ops import stream_lsh_neardup

    by_id = {r[0]: r for r in _neardup_docs()}
    schema = "doc_id long, text string, ts timestamp"
    d = tmp_path / "docs_evttl"
    d.mkdir()

    def write_batch(name, items):
        spark.createDataFrame(
            [(i, by_id[i][1], ts) for i, ts in items], schema
        ).coalesce(1).write.parquet(str(d / name))

    import datetime as dt

    t = lambda s: dt.datetime(2026, 1, 1, 10, 0, 0) + dt.timedelta(seconds=s)  # noqa: E731

    write_batch("f1.parquet", [(1001, t(0))])  # anchors at event time 10:00:00
    stream = stream_lsh_neardup(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d / "*")),
        threshold=0.5,
        state_ttl_ms=60_000,
        ttl_mode="event",
        ts_col="ts",
        watermark="10 seconds",
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("neardup_evttl")
        .option("checkpointLocation", str(tmp_path / "ck_evttl"))
        .start()
    )
    try:
        q.processAllAvailable()
        # unrelated row 10 min later: advances the watermark to ~10:09:50,
        # far past the bucket's 10:01:00 timeout -> expiry fires
        write_batch("f2.parquet", [(1008, t(600))])
        q.processAllAvailable()
        # near-dup of 1001, event time after the expiry: must re-anchor
        write_batch("f3.parquet", [(1002, t(605))])
        q.processAllAvailable()
        # exact dup of 1001: pairs with the new anchor 1002, never 1001
        write_batch("f4.parquet", [(1003, t(610))])
        q.processAllAvailable()
        got = _neardup_set(spark.sql("SELECT * FROM neardup_evttl").collect())
    finally:
        q.stop()

    pairs = {(p[1], p[2]) for p in got}
    assert (1001, 1002) not in pairs, "event-time-expired anchor must not pair"
    assert (1001, 1003) not in pairs
    assert (1002, 1003) in pairs, "bucket must re-anchor at 1002 after expiry"


def test_stream_lsh_neardup_event_time_ttl_no_expiry_keeps_pairs(spark, tmp_path):
    """Same replay, event gaps WITHIN the TTL: nothing expires and the
    output equals the processing-time/no-TTL behavior (1001 stays anchor)."""
    from sequila_spark.streaming.ops import stream_lsh_neardup

    by_id = {r[0]: r for r in _neardup_docs()}
    schema = "doc_id long, text string, ts timestamp"
    d = tmp_path / "docs_evttl2"
    d.mkdir()

    import datetime as dt

    t = lambda s: dt.datetime(2026, 1, 1, 10, 0, 0) + dt.timedelta(seconds=s)  # noqa: E731

    def write_batch(name, items):
        spark.createDataFrame(
            [(i, by_id[i][1], ts) for i, ts in items], schema
        ).coalesce(1).write.parquet(str(d / name))

    write_batch("f1.parquet", [(1001, t(0))])
    stream = stream_lsh_neardup(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d / "*")),
        threshold=0.5,
        state_ttl_ms=3_600_000,  # 1h event-time TTL >> 10 min replay span
        ttl_mode="event",
        ts_col="ts",
        watermark="10 seconds",
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("neardup_evttl2")
        .option("checkpointLocation", str(tmp_path / "ck_evttl2"))
        .start()
    )
    try:
        q.processAllAvailable()
        write_batch("f2.parquet", [(1008, t(600))])
        q.processAllAvailable()
        write_batch("f3.parquet", [(1002, t(605))])
        q.processAllAvailable()
        got = _neardup_set(spark.sql("SELECT * FROM neardup_evttl2").collect())
    finally:
        q.stop()

    pairs = {(p[1], p[2]) for p in got}
    assert (1001, 1002) in pairs, "anchor within TTL must still pair"


def _neardup_vecs():
    """Vectors with planted near-dup families: 2001/2002/2003 nearly
    parallel, 2005/2006 nearly parallel in another direction, rest far."""
    import math

    dim = 16
    base = [math.sin(i + 1) for i in range(dim)]
    tilt = [v + (0.01 if i == 0 else 0.0) for i, v in enumerate(base)]
    other = [math.cos(2 * i + 1) for i in range(dim)]
    other2 = [v + (0.02 if i == 3 else 0.0) for i, v in enumerate(other)]
    far = [(1.0 if i == j else 0.0) for j in range(3) for i in range(dim)]
    rows = [
        (2001, base),
        (2002, tilt),
        (2003, base),
        (2005, other),
        (2006, other2),
    ]
    rows += [(2010 + j, far[j * dim : (j + 1) * dim]) for j in range(3)]
    return rows


def _vec_neardup_set(rows):
    return {(r["table"], r["id_1"], r["id_2"], round(r["cosine"], 12)) for r in rows}


def test_stream_embedding_neardup_equals_batch(spark, tmp_path):
    """Single micro-batch replay: the stateful (table, bucket) operator
    must emit exactly the batch formulation's verified anchor pairs."""
    from sequila_spark.streaming.ops import stream_embedding_neardup

    embs = spark.createDataFrame(_neardup_vecs(), "vec_id long, embedding array<float>")
    d = str(tmp_path / "vecs")
    embs.coalesce(1).write.parquet(d)

    batch = stream_embedding_neardup(spark.read.parquet(d), threshold=0.9)
    expect = _vec_neardup_set(batch.collect())
    assert expect, "crafted vectors must produce near-dup pairs"
    assert {(p[1], p[2]) for p in expect} >= {(2001, 2002), (2001, 2003), (2005, 2006)}

    stream = stream_embedding_neardup(
        spark.readStream.schema(embs.schema).parquet(d), threshold=0.9
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("vneardup1")
        .option("checkpointLocation", str(tmp_path / "vck1"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _vec_neardup_set(spark.sql("SELECT * FROM vneardup1").collect())
    assert got == expect


def test_stream_embedding_neardup_state_across_batches(spark, tmp_path):
    """Vectors arriving in the second micro-batch must verify against
    anchors remembered in state from the first."""
    import time

    from sequila_spark.streaming.ops import stream_embedding_neardup

    rows = _neardup_vecs()
    by_id = {r[0]: r for r in rows}
    first = [by_id[2001], by_id[2005]]
    second = [r for r in rows if r[0] not in (2001, 2005)]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    d = tmp_path / "vecs2"
    d.mkdir()
    spark.createDataFrame(first, embs.schema).coalesce(1).write.parquet(
        str(d / "f1.parquet")
    )
    time.sleep(1.1)  # file-source ordering is by modification time
    spark.createDataFrame(second, embs.schema).coalesce(1).write.parquet(
        str(d / "f2.parquet")
    )

    stream = stream_embedding_neardup(
        spark.readStream.schema(embs.schema).option("maxFilesPerTrigger", "1")
        .parquet(str(d / "*")),
        threshold=0.9,
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("vneardup2")
        .option("checkpointLocation", str(tmp_path / "vck2"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _vec_neardup_set(spark.sql("SELECT * FROM vneardup2").collect())
    expect = _vec_neardup_set(
        stream_embedding_neardup(spark.read.parquet(str(d / "*")), threshold=0.9).collect()
    )
    assert got == expect
    assert {(p[1], p[2]) for p in got} >= {(2001, 2002), (2005, 2006)}


def test_vec_bucket_rows_parity_with_batch_lsh(spark):
    """The streaming bucket path (per-row numpy) must produce exactly the
    batch operator's (table, bucket) keys for every vector."""
    from sequila_spark.operators.similarity import _buckets_batch
    from sequila_spark.streaming.ops import _vec_bucket_rows

    embs = spark.createDataFrame(_neardup_vecs(), "vec_id long, embedding array<float>")
    stream_keys = {
        (r["vec_id"], r["table"], r["bucket"])
        for r in _vec_bucket_rows(embs, "vec_id", "embedding").collect()
    }
    buckets = _buckets_batch()
    batch_keys = {
        (r["vec_id"], r["table"], r["bucket"])
        for r in embs.select(
            "vec_id", F.posexplode(buckets(F.col("embedding"))).alias("table", "bucket")
        ).collect()
    }
    assert stream_keys == batch_keys


def test_stream_embedding_neardup_event_time_ttl_replay(spark, tmp_path):
    """Event-time TTL for the vector operator: the anchor set at 10:00:00
    with a 60 s event-time TTL must be expired once the watermark (driven
    by an unrelated 10:10:00 row) passes 10:01:00, so a near-parallel
    vector arriving later in event time re-anchors instead of pairing."""
    from sequila_spark.streaming.ops import stream_embedding_neardup

    by_id = {r[0]: r for r in _neardup_vecs()}
    schema = "vec_id long, embedding array<float>, ts timestamp"
    d = tmp_path / "vecs_evttl"
    d.mkdir()

    def write_batch(name, items):
        spark.createDataFrame(
            [(i, by_id[i][1], ts) for i, ts in items], schema
        ).coalesce(1).write.parquet(str(d / name))

    import datetime as dt

    t = lambda s: dt.datetime(2026, 1, 1, 10, 0, 0) + dt.timedelta(seconds=s)  # noqa: E731

    write_batch("f1.parquet", [(2001, t(0))])  # anchors at event time 10:00:00
    stream = stream_embedding_neardup(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(d / "*")),
        threshold=0.9,
        state_ttl_ms=60_000,
        ttl_mode="event",
        ts_col="ts",
        watermark="10 seconds",
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("vneardup_evttl")
        .option("checkpointLocation", str(tmp_path / "vck_evttl"))
        .start()
    )
    try:
        q.processAllAvailable()
        # unrelated far vector 10 min later advances the watermark past the
        # bucket's 10:01:00 timeout -> expiry fires
        write_batch("f2.parquet", [(2010, t(600))])
        q.processAllAvailable()
        # near-dup of 2001 after the expiry: must re-anchor, not pair
        write_batch("f3.parquet", [(2002, t(605))])
        q.processAllAvailable()
        # identical vector to 2001: pairs with the new anchor 2002, not 2001
        write_batch("f4.parquet", [(2003, t(610))])
        q.processAllAvailable()
        got = _vec_neardup_set(spark.sql("SELECT * FROM vneardup_evttl").collect())
    finally:
        q.stop()

    pairs = {(p[1], p[2]) for p in got}
    assert (2001, 2002) not in pairs, "event-time-expired anchor must not pair"
    assert (2001, 2003) not in pairs
    assert (2002, 2003) in pairs, "bucket must re-anchor at 2002 after expiry"


def test_window_coverage_stream_equals_batch_and_coverage(spark, sf_small, tmp_path):
    """Streaming fixed-window coverage == the batch run of the same
    expressions == coverage(mode='windows') re-derived sums (the
    per-position/per-read counting identity)."""
    from sequila_spark import testdata as TD
    from sequila_spark.operators.coverage import coverage
    from sequila_spark.streaming.ops import window_coverage

    reads = TD.reads(spark, sf_small)
    path = str(tmp_path / "reads_cov_stream")
    reads.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(reads.schema).format("parquet").load(path)
    q = (
        window_coverage(stream, window_bp=10_000, use_cigar=False)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_cov")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["contig"], r["pos_start"]): (r["sum_bp"], r["n_blocks"], r["mean_cov_milli"])
        for r in spark.sql("SELECT * FROM win_cov").collect()
    }
    batch = {
        (r["contig"], r["pos_start"]): (r["sum_bp"], r["n_blocks"], r["mean_cov_milli"])
        for r in window_coverage(reads, window_bp=10_000, use_cigar=False).collect()
    }
    assert got == batch and len(got) > 0
    # identity vs the batch per-base operator: mean * w == sum_bp
    cov = {
        (r["contig"], r["pos_start"]): round(r["coverage"] * 10_000)
        for r in coverage(
            reads, mode="windows", window_size=10_000, use_cigar=False
        ).collect()
    }
    got_sums = {k: v[0] for k, v in got.items() if v[0] > 0}
    cov_nonzero = {k: v for k, v in cov.items() if v > 0}
    assert got_sums == cov_nonzero


def test_window_coverage_watermark_drops_late_reads(spark, tmp_path):
    """Event-time windowed coverage with a watermark: closed windows emit
    once; a read arriving behind the watermark is dropped (bounded-state
    late-data contract)."""
    import os

    import pandas as pd

    src = str(tmp_path / "cov_src")
    os.makedirs(src, exist_ok=True)
    base = 1_700_000_000

    def write_batch(name, rows):
        # rows: (ts_offset_s, contig, pos_start, pos_end)
        import numpy as np

        pd.DataFrame(
            {
                "ts": pd.to_datetime(
                    [base + r[0] for r in rows], unit="s"
                ).astype("datetime64[us]"),
                "contig": [r[1] for r in rows],
                "pos_start": np.array([r[2] for r in rows], dtype=np.int32),
                "pos_end": np.array([r[3] for r in rows], dtype=np.int32),
            }
        ).to_parquet(f"{src}/{name}.parquet")

    from sequila_spark.streaming.ops import window_coverage

    schema = "ts timestamp, contig string, pos_start int, pos_end int"
    write_batch("b1", [(5, "1", 100, 199), (10, "1", 150, 249)])
    stream = spark.readStream.schema(schema).format("parquet").load(src)
    out = window_coverage(
        stream,
        window_bp=1_000,
        time_window="60 seconds",
        watermark="30 seconds",
        use_cigar=False,
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("cov_wm")
        .option("checkpointLocation", str(tmp_path / "ck_cov"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM cov_wm").count() == 0  # window open
        write_batch("b2", [(500, "2", 10, 19)])  # advances watermark
        q.processAllAvailable()
        closed = {
            (r["twin_start_s"], r["contig"], r["pos_start"]): r["sum_bp"]
            for r in spark.sql("SELECT * FROM cov_wm").collect()
        }
        w1 = base - base % 60
        assert closed == {(w1, "1", 1): 200}  # 100+100 covered bases
        # a read behind the watermark is dropped, not re-emitted
        write_batch("b3", [(2, "1", 100, 199), (700, "3", 10, 19)])
        q.processAllAvailable()
        final = {
            (r["twin_start_s"], r["contig"], r["pos_start"]): r["sum_bp"]
            for r in spark.sql("SELECT * FROM cov_wm").collect()
        }
    finally:
        q.stop()
    w2 = (base + 500) - (base + 500) % 60
    assert final == {(w1, "1", 1): 200, (w2, "2", 1): 10}


def test_window_mismatches_stream_equals_batch_and_pileup_md(spark, tmp_path):
    """Streaming per-window mismatch counts (MD sparse path) == the batch
    run of the same expressions == aggregates re-derived from pileup_md
    (per-window count_nonref sums and per-base alts sums)."""
    from collections import defaultdict

    from sequila_spark.operators.pileup import pileup_md
    from sequila_spark.streaming.ops import window_mismatches

    reads = spark.read.parquet("fixtures/mdbam/reads.parquet")
    path = str(tmp_path / "mm_stream")
    reads.write.mode("overwrite").parquet(path)
    stream = spark.readStream.schema(reads.schema).format("parquet").load(path)
    q = (
        window_mismatches(stream, window_bp=10_000)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_mm")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    def keyed(rows):
        return {
            (r["contig"], r["pos_start"]): (
                r["n_mismatches"], r["alt_a"], r["alt_c"], r["alt_g"],
                r["alt_t"], r["alt_other"],
            )
            for r in rows
        }

    got = keyed(spark.sql("SELECT * FROM win_mm").collect())
    batch = keyed(window_mismatches(reads, window_bp=10_000).collect())
    assert got == batch and len(got) > 0

    # independent derivation: pileup_md's per-position alts, re-binned
    per_win = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    order = {"A": 1, "C": 2, "G": 3, "T": 4}
    for r in pileup_md(reads, alts=True).collect():
        if r["countNonRef"] == 0:
            continue
        k = (r["contig"], ((r["pos_start"] - 1) // 10_000) * 10_000 + 1)
        per_win[k][0] += r["countNonRef"]
        for b, c in (r["alts"] or {}).items():
            per_win[k][order.get(b.upper(), 5)] += c
    assert got == {k: tuple(v) for k, v in per_win.items()}


def test_window_mismatches_watermark_drops_late_reads(spark, tmp_path):
    """Event-time windowed mismatch counts: closed windows emit once; a
    read behind the watermark is dropped (bounded-state contract) — the
    same late-data behavior window_coverage pins."""
    import os

    import pandas as pd

    src = str(tmp_path / "mm_src")
    os.makedirs(src, exist_ok=True)
    base = 1_700_000_000

    def write_batch(name, rows):
        # rows: (ts_offset_s, contig, pos_start, cigar, seq, md)
        import numpy as np

        pd.DataFrame(
            {
                "ts": pd.to_datetime(
                    [base + r[0] for r in rows], unit="s"
                ).astype("datetime64[us]"),
                "contig": [r[1] for r in rows],
                "pos_start": np.array([r[2] for r in rows], dtype=np.int32),
                "cigar": [r[3] for r in rows],
                "seq": [r[4] for r in rows],
                "tag_MD": [r[5] for r in rows],
            }
        ).to_parquet(f"{src}/{name}.parquet")

    from sequila_spark.streaming.ops import window_mismatches

    schema = (
        "ts timestamp, contig string, pos_start int, cigar string, "
        "seq string, tag_MD string"
    )
    # 10M read at pos 101: MD '4A5' -> one mismatch at pos 105, alt = seq[4]
    write_batch("b1", [
        (5, "1", 101, "10M", "AAAACAAAAA", "4A5"),   # alt C at 105
        (10, "1", 101, "10M", "AAAAGAAAAA", "4A5"),  # alt G at 105
    ])
    stream = spark.readStream.schema(schema).format("parquet").load(src)
    out = window_mismatches(
        stream, window_bp=1_000, time_window="60 seconds",
        watermark="30 seconds",
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("mm_wm")
        .option("checkpointLocation", str(tmp_path / "ck_mm"))
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM mm_wm").count() == 0  # window open
        write_batch("b2", [(500, "2", 11, "5M", "TTCTT", "2G2")])
        q.processAllAvailable()
        closed = {
            (r["twin_start_s"], r["contig"], r["pos_start"]): (
                r["n_mismatches"], r["alt_c"], r["alt_g"],
            )
            for r in spark.sql("SELECT * FROM mm_wm").collect()
        }
        w1 = base - base % 60
        assert closed == {(w1, "1", 1): (2, 1, 1)}
        # behind the watermark: dropped, never re-emitted
        write_batch("b3", [
            (2, "1", 101, "10M", "AAAATAAAAA", "4A5"),
            (700, "3", 21, "5M", "GGGAG", "3C1"),
        ])
        q.processAllAvailable()
        final = {
            (r["twin_start_s"], r["contig"], r["pos_start"]): (
                r["n_mismatches"], r["alt_c"], r["alt_g"],
            )
            for r in spark.sql("SELECT * FROM mm_wm").collect()
        }
    finally:
        q.stop()
    w2 = (base + 500) - (base + 500) % 60
    assert final == {(w1, "1", 1): (2, 1, 1), (w2, "2", 1): (1, 1, 0)}


def test_sampling_filters_stream_equals_batch(spark, sf_small, tmp_path):
    """The sampling family (hash_split / sample_fraction /
    stratified_sample) is stateless map-side filtering on md5 buckets, so
    the SAME functions work unchanged on a streaming DataFrame — pinned
    batch==stream here.  (mix_domains needs a global count, so its
    streaming story is 'compute thresholds in batch, apply the filter on
    the stream' — exercised via stratified_sample with the rates
    mix_domains derives.)"""
    from sequila_spark.operators.sampling import (
        hash_split,
        sample_fraction,
        stratified_sample,
    )

    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    d = str(tmp_path / "docs")
    docs.write.parquet(d)
    stream = spark.readStream.schema(docs.schema).parquet(d)

    out = sample_fraction(
        stratified_sample(
            hash_split(stream, "doc_id", {"train": 0.8, "test": 0.2}),
            "doc_id",
            "source",
            {"src0": 1.0, "src1": 0.5},
        ),
        "doc_id",
        0.9,
    ).select("doc_id", "split", "source")
    _run_stream(out, "sampled_stream", output_mode="append")
    got = {
        (r["doc_id"], r["split"], r["source"])
        for r in spark.sql("SELECT * FROM sampled_stream").collect()
    }
    batch = sample_fraction(
        stratified_sample(
            hash_split(docs, "doc_id", {"train": 0.8, "test": 0.2}),
            "doc_id",
            "source",
            {"src0": 1.0, "src1": 0.5},
        ),
        "doc_id",
        0.9,
    ).select("doc_id", "split", "source")
    expect = {(r["doc_id"], r["split"], r["source"]) for r in batch.collect()}
    assert got == expect
    assert 0 < len(got) < docs.count()

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


def window_coverage(
    reads: DataFrame,
    *,
    window_bp: int = 10_000,
    time_window: str | None = None,
    watermark: str | None = None,
    use_cigar: bool | None = None,
) -> DataFrame:
    """Fixed-genomic-window coverage computable INCREMENTALLY on a read
    stream (SURVEY §2.9's streaming coverage extension).

    Identity that makes coverage streamable: per genomic window, the sum of
    per-base coverage equals the sum of per-READ aligned-block overlaps
    with the window (count base-events by position or by read — same
    multiset).  The left side needs ordered prefix sums (batch
    ``coverage(mode='windows')``); the right side is a plain commutative
    aggregate, so Structured Streaming can fold reads into (window) groups
    incrementally, with watermark-bounded state.  Per group:

      sum_bp          total covered base-events (exact long)
      n_blocks        contributing (aligned block x window) rows — a read
                      with several M-blocks spanning several windows
                      contributes one per (block, window), NOT one
      mean_cov_milli  1000 * sum_bp div window_bp (exact integer)

    ``time_window`` adds a tumbling EVENT-TIME dimension over the ``ts``
    column (emit per arrival window); ``watermark`` (e.g. ``'30 seconds'``)
    bounds state and drops reads later than the delay, the standard
    late-data contract — pinned by test_streaming.  CIGAR semantics come
    from operators.coverage.aligned_blocks (M/=/X consume reference), so
    D/N gaps contribute nothing, exactly like the batch operator.

    Batch==stream: the same expressions run on a batch relation; tests pin
    the streamed result against the batch run AND against
    ``coverage(mode='windows')`` re-derived sums."""
    from sequila_spark.operators.coverage import aligned_blocks

    if watermark:
        reads = reads.withWatermark("ts", watermark)
    blk = aligned_blocks(reads, use_cigar=use_cigar)
    win_lo = F.floor((F.col("__sq_bs") - 1) / window_bp).cast("long")
    win_hi = F.floor((F.col("__sq_be") - 1) / window_bp).cast("long")
    per = blk.select(
        *([F.col("ts")] if time_window else []),
        F.col("contig"),
        F.col("__sq_bs").alias("bs"),
        F.col("__sq_be").alias("be"),
        F.explode(F.sequence(win_lo, win_hi)).alias("gwin"),
    )
    wstart = (F.col("gwin") * window_bp + 1).cast("int")
    wend = ((F.col("gwin") + 1) * window_bp).cast("int")
    ov = F.least(F.col("be"), wend) - F.greatest(F.col("bs"), wstart) + 1
    keys = (
        [F.window("ts", time_window).alias("twin")] if time_window else []
    ) + [F.col("contig"), F.col("gwin")]
    agg = per.groupBy(*keys).agg(
        F.sum(ov).cast("long").alias("sum_bp"),
        F.count("*").cast("long").alias("n_blocks"),
    )
    time_cols = (
        [
            F.unix_timestamp(F.col("twin.start")).alias("twin_start_s"),
            F.unix_timestamp(F.col("twin.end")).alias("twin_end_s"),
        ]
        if time_window
        else []
    )
    return agg.select(
        *time_cols,
        "contig",
        wstart.alias("pos_start"),
        wend.alias("pos_end"),
        "sum_bp",
        "n_blocks",
        F.expr(f"sum_bp * 1000 div {window_bp}").alias("mean_cov_milli"),
    )


def window_mismatches(
    reads: DataFrame,
    *,
    window_bp: int = 10_000,
    time_window: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Fixed-genomic-window MISMATCH counts computable incrementally on a
    read stream — the streaming pileup(+alts) analog, completing the
    genomic streaming surface next to window_coverage.

    The per-read mismatch extraction is the MD-tag sparse path
    (operators.pileup.mismatches_from_md — MDTagParser.scala:24-53
    semantics: MD walk yields offsets + declared reference base, CIGAR
    blocks map them to genomic positions and alt bases).  It is MAP-ONLY,
    so each mismatch row lands in its (contig, genomic window) group and
    the aggregate is plain commutative counting — exactly the shape
    Structured Streaming folds incrementally with watermark-bounded state.

    Output per (time window?, contig, genomic window): ``n_mismatches``
    plus fixed per-alt-base counts (``alt_a/c/g/t/other`` — fixed columns,
    not a map, so the aggregate stays streaming-composable).

    ``time_window`` adds the tumbling EVENT-TIME dimension over ``ts``;
    ``watermark`` bounds state and drops reads later than the delay —
    same contract as window_coverage, pinned by test_streaming."""
    from sequila_spark.operators.pileup import mismatches_from_md

    if watermark:
        reads = reads.withWatermark("ts", watermark)
    mm = mismatches_from_md(
        reads, passthrough=("ts",) if time_window else ()
    )
    gwin = F.floor((F.col("pos") - 1) / window_bp).cast("long")
    keys = (
        [F.window("ts", time_window).alias("twin")] if time_window else []
    ) + [F.col("contig"), gwin.alias("gwin")]
    base = F.upper(F.col("base"))

    def cnt(b: str):
        return F.sum((base == b).cast("long")).alias(f"alt_{b.lower()}")

    agg = mm.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n_mismatches"),
        cnt("A"),
        cnt("C"),
        cnt("G"),
        cnt("T"),
        F.sum((~base.isin("A", "C", "G", "T")).cast("long")).alias(
            "alt_other"
        ),
    )
    time_cols = (
        [
            F.unix_timestamp(F.col("twin.start")).alias("twin_start_s"),
            F.unix_timestamp(F.col("twin.end")).alias("twin_end_s"),
        ]
        if time_window
        else []
    )
    return agg.select(
        *time_cols,
        "contig",
        (F.col("gwin") * window_bp + 1).cast("int").alias("pos_start"),
        ((F.col("gwin") + 1) * window_bp).cast("int").alias("pos_end"),
        "n_mismatches",
        "alt_a",
        "alt_c",
        "alt_g",
        "alt_t",
        "alt_other",
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


# --- streaming near-duplicate detection (MinHash + LSH) ----------------------

_NEARDUP_OUT = T.StructType(
    [
        T.StructField("band", T.IntegerType()),
        T.StructField("id_1", T.LongType()),
        T.StructField("id_2", T.LongType()),
        T.StructField("jaccard", T.DoubleType()),
    ]
)
_NEARDUP_STATE = T.StructType(
    [
        T.StructField("anchor", T.LongType()),
        T.StructField("shset", T.ArrayType(T.LongType())),
    ]
)


def _py_shingle_set(text):
    """numpy replica of operators.dedup.doc_shingles for ONE document —
    same Horner polynomial over character codes, same short-text (single
    zero-padded shingle) behavior, distinct values sorted."""
    import numpy as np

    from sequila_spark.operators.dedup import SHINGLE_K, _COEFS

    codes = np.array([ord(c) for c in text], dtype=np.int64)
    n = len(codes)
    m = max(n - SHINGLE_K + 1, 1)
    acc = np.zeros(m, dtype=np.int64)
    for j, c in enumerate(_COEFS):
        idx = np.arange(m) + j
        if n:
            vals = np.where(idx < n, codes[np.minimum(idx, n - 1)], 0)
        else:
            vals = np.zeros(m, dtype=np.int64)
        acc += c * vals
    return np.unique(acc)


def _band_rows(
    docs: DataFrame, id_col: str, text_col: str, ts_col: str | None = None
) -> DataFrame:
    """(band, bkey, doc_id, shset[, ts]) — one row per (doc, band), the
    shingle set carried alongside so the bucket operator can verify
    candidates in-stream.  Map-only (no shuffle): signatures are computed
    per row with the same fixed permutations as the batch operator.
    ``ts_col`` carries the event-time column through (event-time TTL)."""
    import numpy as np
    import pandas as pd

    from sequila_spark.operators.dedup import (
        BANDS,
        MINHASH_P,
        PERM_A,
        PERM_B,
        ROWS_PER_BAND,
    )

    a = np.array(PERM_A, dtype=np.int64)
    b = np.array(PERM_B, dtype=np.int64)

    def gen(batches):
        for pdf in batches:
            out = {"band": [], "bkey": [], "doc_id": [], "shset": []}
            if ts_col is not None:
                out["ts"] = []
            tss = pdf[ts_col] if ts_col is not None else pdf[id_col]
            for did, text, ts in zip(pdf[id_col], pdf[text_col], tss):
                if text is None:
                    continue  # null text never joins (batch parity)
                sh = _py_shingle_set(text)
                # np.fmod, NOT %: Spark's remainder is Java-truncated
                # (sign of the dividend), numpy's % is Python-floored
                # (sign of the divisor).  Shingle hashes go negative via
                # int64 wraparound on non-ASCII text (131^6 * codepoint
                # overflows), so floored % would diverge from the batch
                # operator's signatures there.  fmod == Java % exactly.
                x = np.fmod(sh, MINHASH_P)
                mh = np.fmod(a[:, None] * x[None, :] + b[:, None], MINHASH_P).min(
                    axis=1
                )
                for band in range(BANDS):
                    key = ",".join(
                        str(int(v))
                        for v in mh[band * ROWS_PER_BAND : (band + 1) * ROWS_PER_BAND]
                    )
                    out["band"].append(band)
                    out["bkey"].append(key)
                    out["doc_id"].append(int(did))
                    out["shset"].append(sh)
                    if ts_col is not None:
                        out["ts"].append(ts)
            yield pd.DataFrame(out)

    fields = [
        T.StructField("band", T.IntegerType()),
        T.StructField("bkey", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("shset", T.ArrayType(T.LongType())),
    ]
    if ts_col is not None:
        fields.append(T.StructField("ts", T.TimestampType()))
    return docs.mapInPandas(gen, schema=T.StructType(fields))


def stream_lsh_neardup(
    docs: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    text_col: str = "text",
    state_ttl_ms: int | None = None,
    ttl_mode: str = "processing",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Streaming near-duplicate detection: MinHash band buckets keyed by
    (band, bkey), per-bucket state = the anchor (smallest doc_id seen) and
    its shingle set; each arriving doc is verified against the anchor with
    EXACT Jaccard (sorted-array searchsorted merge — the same arithmetic
    as operators.dedup._verify_jaccard) and emitted as
    (band, id_1=anchor, id_2, jaccard) when it clears the threshold.

    State per bucket is one id + one shingle set (a few KB) — bounded by
    the number of distinct buckets, not the stream length.  For unbounded
    streams pass ``state_ttl_ms``: buckets idle longer than the TTL are
    dropped (ProcessingTimeTimeout) and the next doc to hit the bucket
    re-anchors it — trading cross-epoch recall for bounded state, the
    standard streaming-dedup contract.  Pair ``state_ttl_ms`` with a real
    trigger interval (``.trigger(processingTime=...)``): Spark evaluates
    processing-time timeouts by scheduling a no-data micro-batch every
    trigger (FlatMapGroupsWithStateExec.shouldRunAnotherBatch), so the
    default as-fast-as-possible trigger busy-loops empty batches — and
    ``processAllAvailable()`` never returns on such a query.  Under
    id-ordered
    arrival (and within any single micro-batch, which is sorted here) the
    output equals the batch formulation exactly; out-of-order arrival
    across micro-batches can only anchor a bucket at a larger id — pairs
    remain valid near-dups against that anchor.

    ``ttl_mode='event'`` keys the TTL to EVENT time instead of the wall
    clock: state expires when the stream's watermark passes (bucket's last
    event time + TTL).  That is what a replayed or backfilled stream needs
    — a week-long replay finishing in minutes would expire nothing under
    ProcessingTimeTimeout, and a paused stream would expire everything.
    Requires ``ts_col`` (event-time column on ``docs``) and ``watermark``
    (delay string, e.g. '10 seconds'); the watermark is applied here, after
    the band explode, because mapInPandas does not propagate event-time
    metadata.  The timeout timestamp is clamped above the current watermark
    (late-but-admitted rows could otherwise set an already-expired timeout,
    which Spark rejects).

    On a BATCH DataFrame this returns the equivalent batch formulation
    (bucket-anchor candidates verified with exact Jaccard), so tests pin
    stream == batch.
    """
    import numpy as np
    import pandas as pd

    if ttl_mode not in ("processing", "event"):
        raise ValueError(f"unknown ttl_mode: {ttl_mode!r}")
    event_ttl = ttl_mode == "event" and state_ttl_ms is not None and docs.isStreaming
    if event_ttl:
        if watermark is None:
            raise ValueError("ttl_mode='event' needs a watermark delay string")
        if ts_col not in docs.columns:
            raise ValueError(f"ttl_mode='event' needs event-time column {ts_col!r}")
        tagged = _band_rows(docs, id_col, text_col, ts_col=ts_col).withWatermark(
            "ts", watermark
        )
    else:
        tagged = _band_rows(docs, id_col, text_col)

    if not docs.isStreaming:
        w = Window.partitionBy("band", "bkey")
        cand = (
            tagged.withColumn("anchor", F.min("doc_id").over(w))
            .where(F.col("doc_id") != F.col("anchor"))
        )
        anchor_sets = tagged.select(
            "band", "bkey", F.col("doc_id").alias("anchor"),
            F.col("shset").alias("anchor_set"),
        )
        joined = cand.join(anchor_sets, ["band", "bkey", "anchor"])

        def verify(batches):
            for pdf in batches:
                n = len(pdf)
                jac = np.empty(n, dtype=np.float64)
                for i in range(n):
                    xa = np.asarray(pdf["shset"].iloc[i], dtype=np.int64)
                    ya = np.asarray(pdf["anchor_set"].iloc[i], dtype=np.int64)
                    if len(xa) > len(ya):
                        xa, ya = ya, xa
                    idx = np.searchsorted(ya, xa)
                    idx[idx == len(ya)] = len(ya) - 1
                    c = int(np.count_nonzero(ya[idx] == xa))
                    jac[i] = c / (len(xa) + len(ya) - c)
                keep = jac >= threshold
                yield pd.DataFrame(
                    {
                        "band": pdf["band"].to_numpy()[keep],
                        "id_1": pdf["anchor"].to_numpy()[keep],
                        "id_2": pdf["doc_id"].to_numpy()[keep],
                        "jaccard": jac[keep],
                    }
                )

        return joined.mapInPandas(verify, schema=_NEARDUP_OUT)

    def fn(key, pdf_iter, state):
        band, _bkey = key
        if state_ttl_ms is not None and state.hasTimedOut:
            # idle bucket expired: drop the anchor; the next arrival
            # re-anchors the bucket from scratch
            state.remove()
            return
        if state.exists:
            anchor_id, anchor_set = state.get
            anchor_set = np.asarray(anchor_set, dtype=np.int64)
        else:
            anchor_id, anchor_set = None, None
        rows = pd.concat(list(pdf_iter), ignore_index=True).sort_values("doc_id")
        out = {"band": [], "id_1": [], "id_2": [], "jaccard": []}
        for did, shset in zip(rows["doc_id"], rows["shset"]):
            s = np.asarray(shset, dtype=np.int64)
            if anchor_id is None:
                anchor_id, anchor_set = int(did), s
                continue
            if did == anchor_id:
                continue
            xa, ya = (s, anchor_set) if len(s) <= len(anchor_set) else (anchor_set, s)
            idx = np.searchsorted(ya, xa)
            idx[idx == len(ya)] = len(ya) - 1
            c = int(np.count_nonzero(ya[idx] == xa))
            jac = c / (len(xa) + len(ya) - c)
            lo, hi = (int(did), anchor_id) if did < anchor_id else (anchor_id, int(did))
            if did < anchor_id:  # out-of-order arrival: re-anchor at the min
                anchor_id, anchor_set = int(did), s
            if jac >= threshold:
                out["band"].append(band)
                out["id_1"].append(lo)
                out["id_2"].append(hi)
                out["jaccard"].append(jac)
        state.update((int(anchor_id), [int(v) for v in anchor_set]))
        if state_ttl_ms is not None:
            if event_ttl:
                # expire when the WATERMARK passes last-event-time + TTL;
                # clamp above the current watermark — a late-but-admitted
                # batch could otherwise compute an already-passed timeout,
                # which Spark rejects as an error
                max_ts_ms = int(rows["ts"].max().value // 1_000_000)
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(max_ts_ms + state_ttl_ms, wm + 1))
            else:
                state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(out)

    if state_ttl_ms is None:
        timeout_conf = "NoTimeout"
    elif event_ttl:
        timeout_conf = "EventTimeTimeout"
    else:
        timeout_conf = "ProcessingTimeTimeout"
    return tagged.groupBy("band", "bkey").applyInPandasWithState(
        fn,
        outputStructType=_NEARDUP_OUT,
        stateStructType=_NEARDUP_STATE,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


_VEC_NEARDUP_OUT = T.StructType(
    [
        T.StructField("table", T.IntegerType()),
        T.StructField("id_1", T.LongType()),
        T.StructField("id_2", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ]
)
_VEC_NEARDUP_STATE = T.StructType(
    [
        T.StructField("anchor_id", T.LongType()),
        T.StructField("anchor_qv", T.ArrayType(T.LongType())),
    ]
)


def _vec_bucket_rows(
    embs: DataFrame, id_col: str, vec_col: str, ts_col: str | None = None
) -> DataFrame:
    """(table, bucket, vec_id, qv[, ts]) — one row per (vector, LSH table),
    the quantized vector carried alongside so the bucket operator can
    verify candidates in-stream.  Map-only (no shuffle); the bucket
    arithmetic is EXACTLY operators.similarity._buckets_batch (int64
    hyperplane matmul), so stream buckets equal batch buckets."""
    import numpy as np
    import pandas as pd

    from sequila_spark.operators.similarity import (
        N_PLANES,
        N_TABLES,
        QUANT_SCALE,
        _PLANE_MOD,
    )

    if not isinstance(
        embs.schema[id_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType),
    ):
        raise ValueError(
            f"embedding near-dup needs an integral {id_col!r} column "
            f"(state/output schemas are long), got "
            f"{embs.schema[id_col].dataType.simpleString()!r}"
        )
    half = (_PLANE_MOD - 1) // 2
    plane_cache: dict[int, tuple] = {}  # (planes, weights) per dim

    def _planes(dim: int):
        ent = plane_cache.get(dim)
        if ent is None:
            g = np.arange(N_TABLES * N_PLANES, dtype=np.int64)[:, None]
            d = np.arange(dim, dtype=np.int64)[None, :]
            planes = ((g * 997 + d) * 2654435761) % _PLANE_MOD - half
            weights = np.tile(1 << np.arange(N_PLANES, dtype=np.int64), N_TABLES)
            ent = (planes, weights)
            plane_cache[dim] = ent
        return ent

    def gen(batches):
        for pdf in batches:
            out = {"table": [], "bucket": [], "vec_id": [], "qv": []}
            if ts_col is not None:
                out["ts"] = []
            tss = pdf[ts_col] if ts_col is not None else pdf[id_col]
            for vid, vec, ts in zip(pdf[id_col], pdf[vec_col], tss):
                if vec is None or len(vec) == 0:
                    continue  # null/empty vectors never bucket (batch parity)
                q = np.floor(np.asarray(vec, dtype=np.float64) * QUANT_SCALE).astype(
                    np.int64
                )
                if not q.any():
                    # a zero-norm vector can never clear any threshold
                    # (cosine 0/0 -> NULL), but it hashes to bucket 0 in
                    # EVERY table — admitted, it could become the anchor
                    # of all those buckets and mute them until TTL
                    continue
                planes, weights = _planes(len(q))
                bits = (planes @ q) > 0  # (T*P,)
                buckets = (bits.astype(np.int64) * weights).reshape(
                    N_TABLES, N_PLANES
                ).sum(axis=1)
                for t in range(N_TABLES):
                    out["table"].append(t)
                    out["bucket"].append(int(buckets[t]))
                    out["vec_id"].append(int(vid))
                    out["qv"].append(q)
                    if ts_col is not None:
                        out["ts"].append(ts)
            yield pd.DataFrame(out)

    fields = [
        T.StructField("table", T.IntegerType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("vec_id", T.LongType()),
        T.StructField("qv", T.ArrayType(T.LongType())),
    ]
    if ts_col is not None:
        fields.append(T.StructField("ts", T.TimestampType()))
    return embs.mapInPandas(gen, schema=T.StructType(fields))


def _cos_int(a, b) -> float:
    """Exact-int64 dot / float64 norm product — the same op sequence as the
    batch engines; returns None for a zero-norm operand (SQL NULL
    semantics: the pair fails any threshold)."""
    import numpy as np

    dot = float(np.dot(a, b))
    den = float(np.sqrt(float(np.dot(a, a)))) * float(np.sqrt(float(np.dot(b, b))))
    return dot / den if den > 0 else None


def stream_embedding_neardup(
    embs: DataFrame,
    threshold: float = 0.8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    state_ttl_ms: int | None = None,
    ttl_mode: str = "processing",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Streaming embedding-cosine near-duplicate detection — the vector
    sibling of stream_lsh_neardup: hyperplane-LSH buckets keyed by
    (table, bucket), per-bucket state = the anchor (smallest vec_id seen)
    and its quantized vector; each arriving vector is verified against the
    anchor with the EXACT integer cosine (same arithmetic as
    operators.similarity) and emitted as (table, id_1=anchor, id_2,
    cosine) when it clears the threshold.

    State per bucket is one id + one int64 vector (dim·8 bytes) — bounded
    by the number of distinct (table, bucket) keys (≤ T·2^PLANES), not the
    stream length.  TTL semantics (``state_ttl_ms``, ``ttl_mode='event'``
    + ``watermark``) are identical to stream_lsh_neardup, including the
    watermark clamp.  On a BATCH DataFrame this returns the equivalent
    batch formulation, so tests pin stream == batch.

    Ordering caveat: exact stream == batch parity assumes vec_ids arrive
    in NON-DECREASING order per bucket (within a micro-batch rows are
    sorted, so any single-batch stream qualifies).  When a LATER
    micro-batch delivers a smaller id, the bucket re-anchors at the new
    minimum — the late row is compared against the old anchor, but rows
    that already passed through are NOT re-verified against the new one,
    so some (new_anchor, earlier_id) pairs the batch formulation emits
    are missing from the stream output.  This is the standard streaming
    trade-off (re-verification would need unbounded per-bucket state);
    use the batch operator (operators.similarity.cosine_dup_pairs) when
    exact pair parity over unordered data matters."""
    import numpy as np
    import pandas as pd

    if ttl_mode not in ("processing", "event"):
        raise ValueError(f"unknown ttl_mode: {ttl_mode!r}")
    event_ttl = ttl_mode == "event" and state_ttl_ms is not None and embs.isStreaming
    if event_ttl:
        if watermark is None:
            raise ValueError("ttl_mode='event' needs a watermark delay string")
        if ts_col not in embs.columns:
            raise ValueError(f"ttl_mode='event' needs event-time column {ts_col!r}")
        tagged = _vec_bucket_rows(embs, id_col, vec_col, ts_col=ts_col).withWatermark(
            "ts", watermark
        )
    else:
        tagged = _vec_bucket_rows(embs, id_col, vec_col)

    if not embs.isStreaming:
        w = Window.partitionBy("table", "bucket")
        cand = (
            tagged.withColumn("anchor", F.min("vec_id").over(w))
            .where(F.col("vec_id") != F.col("anchor"))
        )
        anchor_vecs = tagged.select(
            "table", "bucket", F.col("vec_id").alias("anchor"),
            F.col("qv").alias("anchor_qv"),
        )
        joined = cand.join(anchor_vecs, ["table", "bucket", "anchor"])

        def verify(batches):
            # one NumPy batch computation per Arrow chunk — the exact same
            # op sequence as the scalar _cos_int (int64 dots, float64
            # norm-product, elementwise IEEE division), so results stay
            # bit-identical to the streaming path it pins
            for pdf in batches:
                if not len(pdf):
                    yield pd.DataFrame(
                        {"table": [], "id_1": [], "id_2": [], "cosine": []}
                    )
                    continue
                V = np.stack([np.asarray(x, dtype=np.int64) for x in pdf["qv"]])
                A = np.stack(
                    [np.asarray(x, dtype=np.int64) for x in pdf["anchor_qv"]]
                )
                dots = np.einsum("ij,ij->i", V, A).astype(np.float64)
                den = np.sqrt(
                    np.einsum("ij,ij->i", V, V).astype(np.float64)
                ) * np.sqrt(np.einsum("ij,ij->i", A, A).astype(np.float64))
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos = dots / den
                keep = (den > 0) & (cos >= threshold)
                yield pd.DataFrame(
                    {
                        "table": pdf["table"].to_numpy()[keep],
                        "id_1": pdf["anchor"].to_numpy()[keep],
                        "id_2": pdf["vec_id"].to_numpy()[keep],
                        "cosine": cos[keep],
                    }
                )

        return joined.mapInPandas(verify, schema=_VEC_NEARDUP_OUT)

    def fn(key, pdf_iter, state):
        table, _bucket = key
        if state_ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            anchor_id, anchor_qv = state.get
            anchor_qv = np.asarray(anchor_qv, dtype=np.int64)
        else:
            anchor_id, anchor_qv = None, None
        rows = pd.concat(list(pdf_iter), ignore_index=True).sort_values("vec_id")
        out = {"table": [], "id_1": [], "id_2": [], "cosine": []}
        for vid, qv in zip(rows["vec_id"], rows["qv"]):
            v = np.asarray(qv, dtype=np.int64)
            if anchor_id is None:
                anchor_id, anchor_qv = int(vid), v
                continue
            if vid == anchor_id:
                continue
            cos = _cos_int(v, anchor_qv)
            lo, hi = (
                (int(vid), anchor_id) if vid < anchor_id else (anchor_id, int(vid))
            )
            if vid < anchor_id:  # out-of-order arrival: re-anchor at the min
                anchor_id, anchor_qv = int(vid), v
            if cos is not None and cos >= threshold:
                out["table"].append(int(table))
                out["id_1"].append(lo)
                out["id_2"].append(hi)
                out["cosine"].append(cos)
        state.update((int(anchor_id), [int(x) for x in anchor_qv]))
        if state_ttl_ms is not None:
            if event_ttl:
                max_ts_ms = int(rows["ts"].max().value // 1_000_000)
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(max_ts_ms + state_ttl_ms, wm + 1))
            else:
                state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(out)

    if state_ttl_ms is None:
        timeout_conf = "NoTimeout"
    elif event_ttl:
        timeout_conf = "EventTimeTimeout"
    else:
        timeout_conf = "ProcessingTimeTimeout"
    return tagged.groupBy("table", "bucket").applyInPandasWithState(
        fn,
        outputStructType=_VEC_NEARDUP_OUT,
        stateStructType=_VEC_NEARDUP_STATE,
        outputMode="append",
        timeoutConf=timeout_conf,
    )

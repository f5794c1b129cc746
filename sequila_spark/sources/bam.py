"""BAM/CRAM alignment sources.

The reference reads BAM via hadoop-BAM/disq input formats
(datasources/BAM/AlignmentRelation.scala:298-393) — JVM libraries outside
engine core.  Spark-first policy (SURVEY.md §1.4): the engine operates on
alignment relations with the canonical schema; BAM decoding is an I/O shim:

 - ``read_alignments``: parquet-backed alignments (the recommended storage —
   columnar, partition-prunable by sample_id/contig, row-group skippable on
   (contig, pos_start) when sorted).  Equivalent to the reference's
   interval/sample pushdown (§2.2) falling out of parquet for free.
 - ``read_bam``/``read_cram``: decode via pysam when available (executor-side
   ``mapPartitions`` over BGZF chunk ranges), else raise with guidance.  The
   pysam path partitions by contig ranges, one iterator per partition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sequila_spark import schemas as S
from sequila_spark.functions.intervals import clean_contig


def write_alignments(
    df: DataFrame, path: str, mode: str = "overwrite", assume_sorted: bool = False
) -> None:
    """Recommended storage layout for alignment relations: parquet
    partitioned by sample_id and sorted within partitions by
    (contig, pos_start).  This is what makes the reference's custom
    optimizations fall out for free at scale:

      - `sample_id = 'X'` / IN (...)  -> partition-directory pruning
        (reference: glob-path rewrite, AlignmentRelation.scala:311-324)
      - contig/pos predicates          -> parquet row-group min/max skipping
        (reference: BAI/BGZF interval pushdown, AlignmentRelation.scala:310-368)
      - DISTINCT sample_id             -> partition listing, no data read
        (reference: scan elision, SequilaDataSourceStrategy.scala:38-54)
    """
    # Range-partition by (sample, contig, pos) rather than hashing
    # (sample, contig): hash partitioning collapses a single-contig
    # dataset (one WGS chromosome, an amplified fixture) into ONE writer
    # task — measured 5x slower on the 17M-read single-contig anchor —
    # while ranges spread a contig across tasks AND keep each output
    # file's (contig, pos) row-group min/max spans tight for skipping.
    #
    # ``assume_sorted=True`` skips the shuffle+sort entirely: rows from
    # read_bam_native/read_cram_native are ALREADY (contig, pos_start)-
    # ordered within each task (coordinate-sorted input, one genomic span
    # per task, each span single-sample), so writing partitions as-is
    # preserves every layout guarantee above — each output file covers
    # its span's tight (contig, pos) range — without re-moving the
    # (wide: seq/qual) rows through a full shuffle.  Only pass it for
    # relations with that per-partition order.
    if assume_sorted:
        df.write.mode(mode).partitionBy(S.SAMPLE).parquet(path)
    else:
        (
            df.repartitionByRange(S.SAMPLE, S.CONTIG, S.START)
            .sortWithinPartitions(S.CONTIG, S.START)
            .write.mode(mode)
            .partitionBy(S.SAMPLE)
            .parquet(path)
        )


def read_alignments(
    spark: SparkSession, path: str, typed_tags: bool = False
) -> DataFrame:
    """Parquet-backed alignment relation with canonical columns; contig
    normalization applied on read (AlignmentRelation.scala:233).
    ``typed_tags=True`` appends the typed ``tag_*`` columns when the store
    carries a ``tags`` map (lazy projection — see with_typed_tags)."""
    df = spark.read.parquet(path)
    if S.CONTIG in df.columns:
        df = df.withColumn(S.CONTIG, clean_contig(F.col(S.CONTIG)))
    if S.SAMPLE not in df.columns:
        sample = os.path.basename(path).split(".")[0]
        df = df.withColumn(S.SAMPLE, F.lit(sample))
    return with_typed_tags(df) if typed_tags and "tags" in df.columns else df


def _pysam_reader(path: str, ref_path: str | None, contig: str, start: int, end: int):
    """Yield reads OWNED by the half-open chunk [start, end): pysam fetch
    returns every read overlapping the range, so a read spanning two chunks
    would be emitted by both tasks — each read is kept only by the chunk
    containing its reference_start (owner-by-start rule; the reference
    assigns each read to exactly one split,
    datasources/BAM/AlignmentRelation.scala:298-393)."""
    import pysam  # noqa: F401 — gated import

    mode = "rc" if path.endswith(".cram") else "rb"
    kwargs = {"reference_filename": ref_path} if ref_path else {}
    with pysam.AlignmentFile(path, mode, **kwargs) as af:
        for read in af.fetch(contig, start, end):
            if not (start <= (read.reference_start or 0) < end):
                continue
            yield (
                read.query_name,
                read.flag,
                read.reference_name,
                (read.reference_start or 0) + 1,
                read.reference_end or 0,
                read.mapping_quality,
                read.cigarstring,
                read.query_sequence,
                read.qual if hasattr(read, "qual") else None,
            )


def list_samples(path: str) -> list[str]:
    """DISTINCT sample_id WITHOUT reading any data — the reference's scan
    elision (SequilaDataSourceStrategy.scala:38-54, TableFuncs.scala:39-49
    answer it from file names).  Works on BAM globs/directories (file-name
    stems) and on write_alignments parquet stores (sample_id=... partition
    directories)."""
    import glob as _glob

    if os.path.isdir(path):
        parts = sorted(
            e.split("=", 1)[1]
            for e in os.listdir(path)
            if e.startswith(f"{S.SAMPLE}=") and os.path.isdir(os.path.join(path, e))
        )
        if parts:
            return parts
        files = sorted(_glob.glob(os.path.join(path, "*.bam")))
    elif any(ch in path for ch in "*?["):
        files = sorted(_glob.glob(path))
    else:
        files = [path]
    return sorted({os.path.basename(p).split(".")[0] for p in files})


def with_typed_tags(df: DataFrame, tags: list[str] | None = None) -> DataFrame:
    """Project the generic ``tags`` map into the reference's typed ``tag_*``
    columns (Alignment.avsc; AlignmentRelation.scala:228-261 extracts one
    column per tag) — ``tag_MD``, ``tag_NM`` (int), etc., with the Avro-
    declared types from ``schemas.TAG_TYPES``.

    This is a pure projection: Catalyst prunes unselected tag columns, so
    ``df.select('tag_MD')`` still reads only the map — the 52 columns cost
    nothing until referenced.  ``tags`` restricts the projection to the
    named tags (without the ``tag_`` prefix)."""
    if "tags" not in df.columns:
        raise ValueError("relation has no 'tags' map column")
    names = list(tags) if tags is not None else sorted(S.TAG_TYPES)
    tag_cols = [
        F.col("tags")[t].cast(S.TAG_TYPES.get(t, "string")).alias(f"tag_{t}")
        for t in names
    ]
    return df.select("*", *tag_cols)


def write_bam(
    df: DataFrame,
    path: str,
    refs: list[tuple[str, int]] | None = None,
    header_text: str = "",
    sort: bool = True,
    sharded: bool = False,
    shard_dir: str | None = None,
    index: bool = False,
) -> None:
    """Write an alignment relation as a BAM file with the native codec
    (closes SURVEY §2.1's last row — the reference wraps
    outputformats/BAMOutputFormat.scala around hadoop-BAM).

    Each partition compresses its records into headerless BGZF fragments
    (BGZF is concatenation-safe: every block is a complete gzip member);
    the driver stitches header + fragments + EOF marker.  With
    ``sort=True`` rows are range-partitioned and sorted by (header ref_id,
    pos_start) — the spec's coordinate order, which follows the @SQ
    sequence order (not contig-string lexicographic: '10' sorts after '9',
    and null-contig/unknown rows go last, where the spec places unmapped
    records).

    Two assembly modes, BOTH memory-bounded on the driver:

    - ``sharded=False`` (default): fragments are compressed in parallel
      into an executor-disk-persisted RDD, then STREAMED to the driver
      one partition at a time (``toLocalIterator``) and appended to the
      file — the driver never holds more than one partition's fragment
      (the reference's analogous single-file path is the coalesce(1)
      CSV penalty, benchmarking.rst:611-617, which serializes the
      *compute*; here only the final byte append is serial).
    - ``sharded=True`` (scale path): each task writes its fragment as a
      shard file under ``shard_dir`` (default ``path + '.shards'`` — must
      be storage every executor AND the driver can reach, e.g. NFS/
      object-store mount on a real cluster), then the driver streams the
      shards into the final file with bounded (single-block) memory.
      BGZF needs no re-framing, so concatenation is byte-exact — which
      also means the driver stitch is pure I/O: on object stores the same
      shard list can instead be handed to a server-side compose/multipart
      API (header object + shards in numeric order + EOF object) so no
      byte ever flows through the driver; the serial local stream here is
      the filesystem fallback of that plan, not the design.

    ``refs`` defaults to the observed contigs with max(pos_end) as length.

    ``index=True`` additionally writes a spec-complete ``.bai`` (binning +
    linear + samtools pseudo-bin) alongside — built IN PARALLEL: each
    partition tracks its records' virtual offsets while encoding (a
    per-partition BaiBuilder summary, a few KB), and the driver merges
    summaries with each fragment's byte shift applied.  No second pass
    over the data, and the indexed file immediately chunk-decodes in
    parallel through read_bam_native (requires ``sort=True``).
    """
    from sequila_spark.sources import bamcodec as B

    if refs is None:
        refs = [
            (r[0], int(r[1]))
            for r in df.where(F.col(S.CONTIG).isNotNull())
            .groupBy(S.CONTIG)
            .agg(F.max(S.END).cast("int"))
            .orderBy(S.CONTIG)
            .collect()
        ]
    ref_ids = {name: i for i, (name, _) in enumerate(refs)}

    cols = [S.QNAME, S.FLAG, S.CONTIG, S.START, S.END, S.MAPQ, S.CIGAR,
            S.RNEXT, S.PNEXT, S.TLEN, S.SEQUENCE, S.BASEQ, "tags"]
    out = df
    for c in cols:
        if c not in out.columns:
            out = out.withColumn(
                c, F.lit(None).cast("map<string,string>" if c == "tags" else "string")
            )
    out = out.select(*cols)
    if sort:
        rid_map = F.create_map(
            *[F.lit(x) for name, rid in ref_ids.items() for x in (name, rid)]
        )
        rid = F.when(
            F.col(S.CONTIG).isNull(), F.lit(2**31 - 1)
        ).otherwise(F.coalesce(rid_map[F.col(S.CONTIG)], F.lit(2**31 - 2)))
        out = (
            out.withColumn("__sq_rid", rid)
            .repartitionByRange("__sq_rid", S.START)
            .sortWithinPartitions("__sq_rid", S.START)
            .drop("__sq_rid")
        )

    if index and not sort:
        raise ValueError("index=True requires sort=True (BAI assumes "
                         "coordinate order)")
    # column positions for the index builder, derived from `cols` so a
    # future reorder cannot silently build a BAI from the wrong fields
    _IFLAG, _ICTG, _ISTART, _IEND = (
        cols.index(S.FLAG), cols.index(S.CONTIG),
        cols.index(S.START), cols.index(S.END),
    )

    def _encode_with_index(rows, w):
        bld = B.BaiBuilder()
        for r in rows:
            t = tuple(r)
            v0 = w.tell_virtual()
            w.write(B.encode_record(t, ref_ids))
            bld.add(
                ref_ids.get(t[_ICTG], -1) if t[_ICTG] is not None else -1,
                (t[_ISTART] or 1) - 1,
                t[_IEND] or (t[_ISTART] or 1),
                t[_IFLAG] or 0,
                v0,
                w.tell_virtual(),
            )
        return bld.summary()

    if sharded:
        import pickle as _pickle
        import shutil as _shutil

        sdir = shard_dir or (path + ".shards")
        os.makedirs(sdir, exist_ok=True)
        if os.listdir(sdir):
            # stale shards (prior failed run / foreign files) would be
            # silently concatenated into the output — refuse loudly
            raise ValueError(
                f"shard directory {sdir!r} is not empty; remove leftovers "
                "from a previous run (or pass a fresh shard_dir)"
            )

        def write_shard(idx, rows):
            frag = os.path.join(sdir, f"part-{idx:09d}.bgzf")
            with open(frag, "wb") as fh:
                w = B.BgzfWriter(fh)
                if index:
                    summ = _encode_with_index(rows, w)
                else:
                    summ = None
                    n = 0
                    for r in rows:
                        w.write(B.encode_record(tuple(r), ref_ids))
                        n += 1
                w.close(eof=False)
            empty = (
                summ is not None
                and not summ["refs"]
                and summ["n_no_coor"] == 0
            ) or (summ is None and n == 0)
            if empty:
                os.remove(frag)
            elif index:
                with open(frag + ".baisum", "wb") as sf:
                    _pickle.dump(summ, sf)
            return iter(())

        out.rdd.mapPartitionsWithIndex(write_shard).count()  # run the job
        # shards concatenate in NUMERIC partition order — lexicographic
        # listdir order diverges past the pad width (and older 5-digit
        # shards would misorder at >=100k partitions)
        shard_names = sorted(
            (n for n in os.listdir(sdir) if n.endswith(".bgzf")),
            key=lambda n: int(n.split("-", 1)[1].split(".", 1)[0]),
        )
        summaries = []
        with open(path, "wb") as f:
            w = B.BgzfWriter(f)
            B.write_bam_header(w, refs, header_text)
            w.flush_blocks()
            for name in shard_names:
                shift = f.tell()
                full = os.path.join(sdir, name)
                with open(full, "rb") as sf:
                    # BGZF needs no reframing: raw block-copy stream, 8 MiB
                    # buffers (an object store would use multipart compose
                    # here instead of any driver byte copy)
                    _shutil.copyfileobj(sf, f, length=8 << 20)
                if index:
                    with open(full + ".baisum", "rb") as sf:
                        summaries.append(
                            B.shift_bai_summary(_pickle.load(sf), shift)
                        )
            f.write(B.BGZF_EOF)
        if index:
            B.write_bai(path + ".bai", len(refs), B.merge_bai_summaries(summaries))
        _shutil.rmtree(sdir)
        return

    def compress_partition(rows):
        import io

        buf = io.BytesIO()
        w = B.BgzfWriter(buf)
        summ = _encode_with_index(rows, w) if index else None
        if not index:
            for r in rows:
                w.write(B.encode_record(tuple(r), ref_ids))
        w.close(eof=False)
        data = buf.getvalue()
        return [(data, summ)] if data else []

    from pyspark import StorageLevel

    # Compress in parallel (one job over all partitions, results pinned to
    # executor DISK so the stream below re-reads blocks, not lineage), then
    # STREAM fragments to the driver one partition at a time: peak driver
    # memory is one partition's compressed fragment, not the whole file —
    # a collect() here was the scale-killer VERDICT r8 flagged (a
    # multi-hundred-GB export would OOM the driver JVM).
    fragments = out.rdd.mapPartitions(compress_partition).persist(
        StorageLevel.DISK_ONLY
    )
    try:
        fragments.count()  # parallel compression pass
        summaries = []
        with open(path, "wb") as f:
            w = B.BgzfWriter(f)
            B.write_bam_header(w, refs, header_text)
            w.flush_blocks()
            for frag, summ in fragments.toLocalIterator():
                if index and summ is not None:
                    summaries.append(B.shift_bai_summary(summ, f.tell()))
                f.write(frag)
            f.write(B.BGZF_EOF)
        if index:
            B.write_bai(
                path + ".bai", len(refs), B.merge_bai_summaries(summaries)
            )
    finally:
        fragments.unpersist()


def read_bam_native(
    spark: SparkSession,
    path: str | list[str],
    chunk: int = 10_000_000,
    with_tags: bool = True,
    typed_tags: bool = False,
    with_ordinal: bool = False,
    arrow: bool = True,
    columns: list[str] | None = None,
    with_blocks: bool = False,
) -> DataFrame:
    """Decode BAM with the pure-Python BGZF/BAM/BAI codec (sources/bamcodec
    — no pysam/htslib needed), partitioned by genomic chunk: the driver
    reads only headers + indexes; each task seeks its chunk's virtual
    offset from the BAI linear index and keeps exactly the reads whose
    start falls in its half-open range (owner-by-start — no duplicates at
    chunk boundaries; the reference assigns each read to one split the same
    way, datasources/BAM/AlignmentRelation.scala:298-393).  Without a .bai
    a file decodes in a single task (still correct; index it for scale).
    Indexed and unindexed reads of the same file yield the same rows: the
    trailing no-coordinate region (unmapped, ref_id -1) gets its own span
    when an index is present.

    ``path`` may be a single file, a glob ('dir/*.bam'), a directory, or a
    list — multi-sample tables exactly like the reference's
    ``OPTIONS(path '.../*.bam')``; sample_id derives from each file name
    (AlignmentRelation.scala:311-324).

    ``typed_tags=True`` appends the reference's 52 typed ``tag_*`` columns
    (lazy projection — see with_typed_tags).

    ``with_ordinal=True`` appends ``__ord`` (long) — the record's file
    order encoded as ``span_index << 32 | index_within_span``.  Spans are
    planned in file/coordinate order, so for a coordinate-sorted BAM
    ordering by ``(pos_start, __ord)`` reproduces the exact record stream
    order htslib's pileup engine sees (reads at the same start live in the
    same owner-by-start span, where ``__ord`` is byte-exact file order) —
    the tie-break mate-overlap detection needs.

    ``arrow=True`` (default) decodes through the vectorized NumPy->Arrow
    batch codec (sources/bamvec) and feeds Spark columnar RecordBatches via
    ``mapInArrow`` — ~20x the per-core throughput of the scalar row path
    (which remains available as ``arrow=False`` and is the pinned semantic
    reference).

    ``columns`` (arrow path) prunes the DECODE itself: mapInArrow is
    opaque to Catalyst's column pruning, so a caller that only needs
    position/flag columns passes them here and the codec never renders
    seq/qual/qname/tags bytes — the manual analog of parquet ReadSchema
    pruning, and of htsjdk's lazy per-field decode (the reference relies
    on both).  ``with_blocks=True`` (arrow path) appends
    ``__blocks list<struct<s:int,e:int>>`` — per-read M/=/X aligned
    blocks computed vectorized from the raw cigar ops at decode time
    (Read.scala:27-54's getAlignmentBlocks); operators/coverage consumes
    it directly and skips its SQL cigar walk.

    Pruning interacts with downstream feature detection: filter_reads /
    coverage apply their flag/mapq predicates only when those columns are
    present, so a ``columns`` list that omits ``flag``/``mapq`` silently
    disables that filtering — include them whenever reads feed a filtered
    operator.  ``typed_tags=True`` with a ``columns`` list that omits
    ``'tags'`` is rejected here (it would fail at plan time otherwise)."""
    import glob as _glob

    from sequila_spark.sources import bamcodec as B

    if isinstance(path, (list, tuple)):
        paths = list(path)
    elif os.path.isdir(path):
        paths = sorted(_glob.glob(os.path.join(path, "*.bam")))
    elif any(ch in path for ch in "*?["):
        paths = sorted(_glob.glob(path))
    else:
        paths = [path]
    if not paths:
        raise FileNotFoundError(f"no BAM files match {path!r}")

    refs_by_path: dict[str, list[tuple[str, int]]] = {}
    spans: list[tuple] = []  # (path, sample, span-or-None)
    for p in paths:
        with open(p, "rb") as f:
            refs_by_path[p], _ = B.read_bam_header(B.BgzfReader(f))
        sample = os.path.basename(p).split(".")[0]
        bai = next(
            (c for c in (p + ".bai", p[: p.rfind(".")] + ".bai") if os.path.exists(c)),
            None,
        )
        if bai:
            linear, n_no_coor = B.read_bai(bai)
            for sp in B.plan_spans(refs_by_path[p], linear, chunk):
                spans.append((p, sample, sp))
            # Trailing no-coordinate region: a sorted BAM stores records
            # with ref_id -1 after every mapped record, a region the
            # per-reference spans never reach — without this span an
            # indexed file would silently drop reads the unindexed
            # single-task path yields.  Scan from the last indexed virtual
            # offset, keeping only ref_id < 0 records (mapped records seen
            # on the way are owned by their mapped span).  Skipped only
            # when the index states n_no_coor == 0.
            if n_no_coor is None or n_no_coor > 0:
                last_voff = max((v for il in linear for v in il if v), default=0)
                spans.append((p, sample, ("__unmapped__", last_voff)))
        else:
            spans.append((p, sample, None))

    _COL_TYPES = {
        S.SAMPLE: "string", S.QNAME: "string", S.FLAG: "int",
        S.CONTIG: "string", S.START: "int", S.END: "int", S.MAPQ: "int",
        S.CIGAR: "string", S.RNEXT: "string", S.PNEXT: "int",
        S.TLEN: "int", S.SEQUENCE: "string", S.BASEQ: "string",
        "tags": "map<string,string>",
    }
    if columns is not None:
        unknown = set(columns) - set(_COL_TYPES)
        if unknown:
            raise ValueError(f"unknown BAM columns: {sorted(unknown)}")
        if not arrow:
            raise ValueError("columns pruning requires arrow=True")
        if typed_tags and "tags" not in columns:
            # with_typed_tags projects the tag_* columns out of 'tags';
            # pruning it away would otherwise fail downstream at plan time
            # with an unresolved-column error far from the cause
            raise ValueError(
                "typed_tags=True needs the 'tags' column — add 'tags' to "
                "columns (or drop the pruning list)"
            )
    if with_blocks and not arrow:
        raise ValueError("with_blocks requires arrow=True")
    keep = [c for c in _COL_TYPES if columns is None or c in columns]
    schema_str = ", ".join(f"{c} {_COL_TYPES[c]}" for c in keep)
    if with_blocks:
        schema_str += ", __blocks array<struct<s:int,e:int>>"
    if with_ordinal:
        schema_str += ", __ord long"

    if arrow:
        if not spans:
            df = spark.createDataFrame([], schema_str)
        else:
            def gen_batches(batches):
                from sequila_spark.sources import bamvec as BV

                for b in batches:
                    for sid in b.column(0).to_pylist():
                        p, sample, span = spans[sid]
                        yield from BV.iter_span_batches(
                            p,
                            refs_by_path[p],
                            sample,
                            span,
                            span_idx=sid,
                            with_tags=with_tags,
                            with_ordinal=with_ordinal,
                            columns=keep if columns is not None else None,
                            with_blocks=with_blocks,
                        )

            # one span per task: range(n) split into exactly n partitions
            df = spark.range(0, len(spans), 1, len(spans)).mapInArrow(
                gen_batches, schema_str
            )
        if S.CONTIG in keep:
            df = df.withColumn(S.CONTIG, clean_contig(F.col(S.CONTIG)))
        out = with_typed_tags(df) if typed_tags else df
        _attach_bam_provenance(
            out, path, chunk, columns=columns, with_blocks=with_blocks
        )
        return out

    def gen(task):
        span_idx, (p, sample, span) = task
        refs = refs_by_path[p]
        with open(p, "rb") as fh:
            if span is None:
                st = B.BgzfReader(fh)
                B.read_bam_header(st)  # skip to records
                it = B.parse_records(st, refs, with_tags=with_tags)
            elif span[0] == "__unmapped__":
                voff = span[1]
                if voff:
                    st = B.BgzfReader(fh, voff)
                else:  # index exists but no mapped reads: scan from header
                    st = B.BgzfReader(fh)
                    B.read_bam_header(st)
                it = B.parse_records(
                    st, refs, with_tags=with_tags, unmapped_only=True
                )
            else:
                rid, s0, e0, voff = span
                st = B.BgzfReader(fh, voff)
                it = B.parse_records(
                    st, refs, ref_id=rid, start0=s0, end0=e0, with_tags=with_tags
                )
            if with_ordinal:
                base_ord = span_idx << 32
                for i, rec in enumerate(it):
                    yield (sample, *rec, base_ord | i)
            else:
                for rec in it:
                    yield (sample, *rec)

    rdd = spark.sparkContext.parallelize(
        list(enumerate(spans)), max(len(spans), 1)
    ).flatMap(gen)
    df = rdd.toDF(schema_str)
    df = df.withColumn(S.CONTIG, clean_contig(F.col(S.CONTIG)))
    out = with_typed_tags(df) if typed_tags else df
    _attach_bam_provenance(out, path, chunk, columns=None, with_blocks=False)
    return out


def _attach_bam_provenance(
    df: DataFrame,
    path,
    chunk: int,
    *,
    columns: list[str] | None,
    with_blocks: bool,
) -> None:
    """Stamp reader provenance on a read_bam_native result so
    operators.coverage can auto-route the declarative
    ``coverage(read_bam_native(...))`` composition through the fused
    decode->events plan (read_bam_coverage_events) — the reference fuses
    scan+aggregate in its physical operator (pileup/PileupStrategy.scala:
    37-56); here the fusion triggers on lineage without an opt-in reader.
    The attribute lives on THIS DataFrame object only: any transformation
    (filter/select/join) returns a new DataFrame without it, which is
    exactly the contract — the fused reader can only reproduce the
    reader's own row set."""
    df._sequila_bam_source = {
        "path": path,
        "chunk": chunk,
        # aligned-block semantics require the cigar walk (or decode-time
        # blocks); span-only relations must not fuse
        "has_cigar": columns is None or S.CIGAR in columns or with_blocks,
        # filter pushdown parity: the declarative filter applies flag/mapq
        # predicates only when those columns exist on the relation
        "has_flag": columns is None or S.FLAG in columns,
        "has_mapq": columns is None or S.MAPQ in columns,
    }


def read_bam_coverage_events(
    spark: SparkSession,
    path: str | list[str],
    *,
    chunk_size: int = 16_384,
    flag_mask: int = 0,
    min_mapq: int = 0,
    chunk: int = 10_000_000,
) -> DataFrame:
    """Fused decode->coverage-events reader: (contig, chunk, pos, delta)
    rows, CLIPPED at ``chunk_size`` boundaries and pre-aggregated per
    decode batch (sources/bamvec.iter_span_cov_events).  Feed the result
    to ``operators.coverage.coverage_from_events`` with the SAME
    chunk_size — together they compute exactly
    ``coverage(read_bam_native(..., with_blocks=True), chunk_size=...)``
    while shuffling ~10x fewer rows and rendering zero strings: the
    per-read columns never leave the decode task, the way the reference
    fuses coverage into its scan partitions (pileup/PileupStrategy.scala)
    — here as an opt-in reader, with the declarative operator unchanged
    for alignment-shaped relations.  ``flag_mask``/``min_mapq`` apply
    filter_reads' predicates at decode time (pass 1796 for the
    reference's default read filter).  Span planning (BAI genomic chunks,
    owner-by-start) is identical to read_bam_native."""
    import glob as _glob

    from sequila_spark.sources import bamcodec as B

    if isinstance(path, (list, tuple)):
        paths = list(path)
    elif os.path.isdir(path):
        paths = sorted(_glob.glob(os.path.join(path, "*.bam")))
    elif any(ch in path for ch in "*?["):
        paths = sorted(_glob.glob(path))
    else:
        paths = [path]
    if not paths:
        raise FileNotFoundError(f"no BAM files match {path!r}")

    refs_by_path: dict[str, list[tuple[str, int]]] = {}
    spans: list[tuple] = []
    for p in paths:
        with open(p, "rb") as f:
            refs_by_path[p], _ = B.read_bam_header(B.BgzfReader(f))
        bai = next(
            (c for c in (p + ".bai", p[: p.rfind(".")] + ".bai") if os.path.exists(c)),
            None,
        )
        if bai:
            linear, _ = B.read_bai(bai)
            for sp in B.plan_spans(refs_by_path[p], linear, chunk):
                spans.append((p, sp))
        else:
            spans.append((p, None))

    schema_str = "contig string, chunk long, pos int, delta int"
    if not spans:
        return spark.createDataFrame([], schema_str)

    def gen_batches(batches):
        from sequila_spark.sources import bamvec as BV

        for b in batches:
            for sid in b.column(0).to_pylist():
                p, span = spans[sid]
                yield from BV.iter_span_cov_events(
                    p,
                    refs_by_path[p],
                    span,
                    chunk_size=chunk_size,
                    flag_mask=flag_mask,
                    min_mapq=min_mapq,
                )

    df = spark.range(0, len(spans), 1, len(spans)).mapInArrow(
        gen_batches, schema_str
    )
    return df.withColumn(S.CONTIG, clean_contig(F.col(S.CONTIG)))


#: (path, size, mtime_ns) -> (ref_names, rg_names, containers, validated)
#: — the CRAM planning scan + per-container codec validation are pure
#: functions of the file bytes, and a GB-scale file costs ~1 s of
#: driver-side work per query without this (0.08 s header scan + 0.85 s
#: validation at 4096 containers).  Spark caches parquet FileIndexes the
#: same way.  Keyed on stat() so an overwritten file re-plans; bounded.
_CRAM_SCAN_CACHE: dict[tuple, tuple] = {}
_CRAM_SCAN_CACHE_MAX = 16


def _cram_scan_cached(path: str) -> tuple[list[str], list[str], list[dict]]:
    from sequila_spark.sources import cramcodec as C

    st = os.stat(path)
    key = (os.path.abspath(path), st.st_size, st.st_mtime_ns)
    hit = _CRAM_SCAN_CACHE.get(key)
    if hit is None:
        ref_names, text, containers = C.scan_containers_file(path)
        hit = (ref_names, C.parse_rg_ids(text), containers, set())
        _CRAM_SCAN_CACHE[key] = hit
        while len(_CRAM_SCAN_CACHE) > _CRAM_SCAN_CACHE_MAX:
            _CRAM_SCAN_CACHE.pop(next(iter(_CRAM_SCAN_CACHE)))
    return hit[0], hit[1], hit[2]


def _validate_containers_cached(path: str, containers: list[dict]) -> None:
    """validate_container_file over ``containers``, memoized per file —
    validation decompresses only header blocks but is O(containers) of
    seeks, which dominates re-planning on large files."""
    from sequila_spark.sources import cramcodec as C

    st = os.stat(path)
    key = (os.path.abspath(path), st.st_size, st.st_mtime_ns)
    hit = _CRAM_SCAN_CACHE.get(key)
    done: set = hit[3] if hit is not None else set()
    todo = [h for h in containers if h["abs_offset"] not in done]
    if not todo:
        return
    with open(path, "rb") as vf:
        for h in todo:
            C.validate_container_file(vf, h)  # raises NotImplementedError
            done.add(h["abs_offset"])


def plan_cram_containers(
    path: str,
    contig: str | None = None,
    start: int | None = None,
    end: int | None = None,
) -> tuple[list[str], list[str], list[dict]]:
    """Plan-time scan of one CRAM file -> (ref_names, rg_names, containers),
    with interval predicate pushdown over the CONTAINER HEADERS: each header
    carries (ref_seq_id, alignment_start, span) — hts-specs CRAMv3 §8 — so
    a (contig, start, end) predicate prunes non-overlapping containers
    before any task is scheduled, the CRAM analog of the BAM path's BAI
    chunk planning (bamcodec.plan_spans; reference interval pushdown:
    AlignmentRelation.scala:103-110).

    Kept under a 1-based inclusive [start, end] predicate:
      - single-ref containers on the query contig whose
        [start, start+span-1] overlaps the interval,
      - multi-ref containers (ref_id == -2: per-record refs, header span
        meaningless) — never pruned,
    Dropped: other contigs, non-overlapping spans, and unmapped-only
    containers (ref_id == -1), which an interval query excludes by
    definition.  The query contig matches an @SQ name either raw or after
    clean_contig normalization ('chr1' and '1' both hit)."""
    from sequila_spark.functions.intervals import clean_contig_py
    from sequila_spark.sources import cramcodec as C

    ref_names, rg_names, containers = _cram_scan_cached(path)
    if contig is not None:
        want = clean_contig_py(contig)
        rids = {
            i for i, n in enumerate(ref_names)
            if n == contig or clean_contig_py(n) == want
        }
        qs = start if start is not None else 1
        qe = end if end is not None else 2**62
        kept = []
        for h in containers:
            if h["ref_id"] == -2:
                kept.append(h)  # multi-ref: cannot prune from the header
            elif h["ref_id"] in rids:
                c_start = h["start"]
                c_end = c_start + max(h["span"], 1) - 1
                if c_start <= qe and c_end >= qs:
                    kept.append(h)
        containers = kept
    return ref_names, rg_names, containers


def read_cram_native(
    spark: SparkSession,
    path: str | list[str],
    ref_path: str | None = None,
    with_tags: bool = True,
    contig: str | None = None,
    start: int | None = None,
    end: int | None = None,
    columns: list[str] | None = None,
) -> DataFrame:
    """Decode CRAM 3.0 with the pure-Python codec (sources/cramcodec — no
    htslib/pysam), one task per container: the driver scans container
    HEADERS only (no block decompression) to plan byte-range tasks; each
    task seeks to its container offset and decodes its records.  Containers
    carry their own compression header, so tasks are independent — the same
    scale model as the BAI-chunked BAM reader.

    ``path`` may be a single file, a glob ('dir/*.cram'), a directory, or a
    list — multi-sample tables exactly like read_bam_native; sample_id
    derives from each file name (reference multi-sample:
    AlignmentRelation.scala:311-324).

    A (``contig``, ``start``, ``end``) interval (1-based inclusive) is
    pushed down to container-header pruning (plan_cram_containers) AND
    applied as an overlap row filter (htslib-fetch semantics: records whose
    alignment span overlaps the interval), so fewer tasks run and the
    result is exact.

    ``ref_path`` is the reference FASTA used at encode time (CRAM stores
    reads as diffs against it; required unless the file was written with
    RR=false).  Files using codecs outside the implemented set raise
    NotImplementedError AT PLAN TIME (every planned container's compression
    and slice headers are validated driver-side — a cheap, data-block-free
    pass) so read_bam's pysam fallback engages before any executor work.

    I/O model: planning reads container headers only (O(containers), not
    O(file size)); each task seeks to its container's byte range and reads
    just that; the reference FASTA is loaded once on the driver and
    broadcast.  Records carry tags['RG'] materialized from the RG data
    series against the header's @RG lines (htslib parity).

    Emission is COLUMNAR: each task decodes its container through
    decode_container_columns (whole-series arrays + one C feature walk
    per slice) and yields Arrow RecordBatches via mapInArrow — the same
    transfer model as the vectorized BAM reader, with no per-row pickle
    between Python and the JVM.

    ``columns`` prunes the DECODE itself (mirroring read_bam_native):
    the expensive per-record rendering — qname decode, tag rendering,
    seq/cigar string slicing, qual phred translation — is skipped for
    columns not requested, and only the requested Arrow arrays ship to
    the JVM.  sample_id is always included; an interval filter requires
    contig/pos_start/pos_end to be present."""
    import glob as _glob

    from sequila_spark.sources import cramcodec as C

    if isinstance(path, (list, tuple)):
        paths = list(path)
    elif os.path.isdir(path):
        paths = sorted(_glob.glob(os.path.join(path, "*.cram")))
    elif any(ch in path for ch in "*?["):
        paths = sorted(_glob.glob(path))
    else:
        paths = [path]
    if not paths:
        raise FileNotFoundError(f"no CRAM files match {path!r}")

    meta_by_path: dict[str, tuple[list[str], list[str]]] = {}
    tasks: list[tuple[str, str, dict]] = []
    for p in paths:
        ref_names, rg_names, containers = plan_cram_containers(
            p, contig=contig, start=start, end=end
        )
        meta_by_path[p] = (ref_names, rg_names)
        sample = os.path.basename(p).split(".")[0]
        # NotImplementedError -> pysam fallback; memoized per file stat
        _validate_containers_cached(p, containers)
        for h in containers:
            tasks.append((p, sample, h))
    bref = (
        spark.sparkContext.broadcast(C.load_fasta(ref_path)) if ref_path else None
    )

    # output column catalog (schema names == decode column keys)
    _ALL = [
        S.QNAME, S.FLAG, S.CONTIG, S.START, S.END, S.MAPQ,
        S.CIGAR, S.RNEXT, S.PNEXT, S.TLEN, S.SEQUENCE, S.BASEQ,
    ]
    _INT = {S.FLAG, S.START, S.END, S.MAPQ, S.PNEXT, S.TLEN}
    if columns is None:
        keep = list(_ALL)
        keep_tags = True
    else:
        want = set(columns)
        unknown = want - set(_ALL) - {"tags", S.SAMPLE}
        if unknown:
            raise ValueError(f"unknown CRAM columns: {sorted(unknown)}")
        keep = [c for c in _ALL if c in want]
        keep_tags = "tags" in want
        if contig is not None and not {S.CONTIG, S.START, S.END} <= set(keep):
            raise ValueError(
                "an interval filter needs contig/pos_start/pos_end in columns"
            )
    decode_cols = set(keep) | ({"tags"} if keep_tags and with_tags else set())
    schema_str = ", ".join(
        [f"{S.SAMPLE} string"]
        + [f"{c} {'int' if c in _INT else 'string'}" for c in keep]
        + ([f"tags map<string,string>"] if keep_tags else [])
    )
    names = [S.SAMPLE] + keep + (["tags"] if keep_tags else [])

    # Partition = a contiguous GROUP of containers packed to a byte
    # target, not one container: real containers are ~1 MB and a Python
    # runner costs ~0.2-0.3 s per task (worker spin-up + imports), so
    # one-task-per-container is ~10x overhead at any scale (and 100M
    # tasks at 100 TB).  The target adapts downward so small inputs
    # still fill the cluster (2 waves per core when possible).
    par = spark.sparkContext.defaultParallelism or 1
    total_bytes = sum(t[2]["length"] for t in tasks)
    target = max(1, min(32 << 20, total_bytes // max(1, 2 * par)))
    groups: list[list[int]] = []
    cur: list[int] = []
    cur_bytes = 0
    for ti, t in enumerate(tasks):
        cur.append(ti)
        cur_bytes += t[2]["length"]
        if cur_bytes >= target:
            groups.append(cur)
            cur, cur_bytes = [], 0
    if cur:
        groups.append(cur)

    def gen_batches(batches):
        """mapInArrow task body: one contiguous container GROUP per task
        id, columnar decode straight into Arrow RecordBatches (no
        per-row pickle — the same transfer model as the vectorized BAM
        reader)."""
        import pyarrow as pa

        from sequila_spark.sources import cramcodec as CC

        s = pa.string()
        i32 = pa.int32()
        mtype = pa.map_(pa.string(), pa.string())
        for b in batches:
            for gid in b.column(0).to_pylist():
                for tid in groups[gid]:
                    p, sample, h = tasks[tid]
                    ref_names, rg_names = meta_by_path[p]
                    with open(p, "rb") as f:
                        f.seek(h["abs_data_offset"])
                        blob = f.read(h["length"])
                    hh = dict(h, data_offset=0)
                    refs = bref.value if bref is not None else None
                    for cols in CC.decode_container_columns(
                        blob, hh, ref_names, refs, rg_names=rg_names,
                        columns=decode_cols,
                    ):
                        n = len(cols["flag"])
                        arrays = [pa.array([sample] * n, s)] + [
                            pa.array(cols[c], i32 if c in _INT else s)
                            for c in keep
                        ]
                        if keep_tags:
                            tag_items = (
                                [list(d.items()) for d in cols["tags"]]
                                if with_tags
                                else [[]] * n
                            )
                            arrays.append(pa.array(tag_items, mtype))
                        yield pa.RecordBatch.from_arrays(arrays, names=names)

    if not tasks:
        df = spark.createDataFrame([], schema_str)
    else:
        df = spark.range(0, len(groups), 1, len(groups)).mapInArrow(
            gen_batches, schema_str
        )
    if S.CONTIG in keep:
        df = df.withColumn(S.CONTIG, clean_contig(F.col(S.CONTIG)))
    if contig is not None:
        cond = F.col(S.CONTIG) == clean_contig(F.lit(contig))
        if end is not None:
            cond = cond & (F.col(S.START) <= F.lit(end))
        if start is not None:
            cond = cond & (F.col(S.END) >= F.lit(start))
        df = df.where(cond)
    # reader provenance (same contract as _attach_bam_provenance: the
    # attribute lives on THIS object only) — operators.coverage re-plans
    # a full-column coverage(read_cram_native(...)) composition as a
    # column-PRUNED re-read, skipping qname/tags/seq/qual rendering and
    # transfer entirely
    df._sequila_cram_source = {
        "path": path,
        "ref_path": ref_path,
        "columns": columns,
        "contig": contig,
        "start": start,
        "end": end,
    }
    return df


def read_cram_coverage_events(
    spark: SparkSession,
    path: str | list[str],
    ref_path: str | None = None,
    *,
    chunk_size: int = 16_384,
    flag_mask: int = 0,
    min_mapq: int = 0,
    contig: str | None = None,
    start: int | None = None,
    end: int | None = None,
) -> DataFrame:
    """Fused CRAM decode->coverage-events reader — the CRAM analog of
    :func:`read_bam_coverage_events`: (contig, chunk, pos, delta) rows
    clipped at ``chunk_size`` boundaries and pre-aggregated per container
    group, feeding ``operators.coverage.coverage_from_events`` (same
    chunk_size).  Together they compute exactly
    ``coverage(read_cram_native(...), chunk_size=...)`` while rendering
    ZERO strings per record: the columnar decode hands back the C feature
    walk's cigar TEXT buffer + offsets (cramcodec ``__cig_raw``), a
    vectorized parse converts it to BAM-encoded ops
    (bamvec.cigar_text_to_ops), and the clipped-event aggregation is the
    shared bamvec.events_from_blocks.  Slices the columnar decode cannot
    take (multi-ref, exotic codecs) fall through to the per-record path
    and are parsed from their cigar strings — identical events either way.

    Planning (container-header scan, interval pruning, byte-targeted
    container groups) is identical to read_cram_native; an interval also
    applies the htslib-fetch overlap row filter.  ``flag_mask`` /
    ``min_mapq`` apply filter_reads' predicates at decode time."""
    import glob as _glob

    from sequila_spark.functions.intervals import clean_contig_py
    from sequila_spark.sources import cramcodec as C

    if isinstance(path, (list, tuple)):
        paths = list(path)
    elif os.path.isdir(path):
        paths = sorted(_glob.glob(os.path.join(path, "*.cram")))
    elif any(ch in path for ch in "*?["):
        paths = sorted(_glob.glob(path))
    else:
        paths = [path]
    if not paths:
        raise FileNotFoundError(f"no CRAM files match {path!r}")

    meta_by_path: dict[str, list[str]] = {}
    tasks: list[tuple[str, dict]] = []
    for p in paths:
        ref_names, _rg, containers = plan_cram_containers(
            p, contig=contig, start=start, end=end
        )
        meta_by_path[p] = ref_names
        _validate_containers_cached(p, containers)
        for h in containers:
            tasks.append((p, h))
    bref = (
        spark.sparkContext.broadcast(C.load_fasta(ref_path)) if ref_path else None
    )

    schema_str = "contig string, chunk long, pos int, delta int"
    if not tasks:
        return spark.createDataFrame([], schema_str)

    par = spark.sparkContext.defaultParallelism or 1
    total_bytes = sum(t[1]["length"] for t in tasks)
    target = max(1, min(32 << 20, total_bytes // max(1, 2 * par)))
    groups: list[list[int]] = []
    cur: list[int] = []
    cur_bytes = 0
    for ti, t in enumerate(tasks):
        cur.append(ti)
        cur_bytes += t[1]["length"]
        if cur_bytes >= target:
            groups.append(cur)
            cur, cur_bytes = [], 0
    if cur:
        groups.append(cur)

    want_contig = clean_contig_py(contig) if contig is not None else None
    q_start = start if start is not None else 1
    q_end = end if end is not None else 2**62

    def gen_batches(batches):
        import numpy as np
        import pyarrow as pa

        from sequila_spark.functions.intervals import clean_contig_py as ccp
        from sequila_spark.sources import bamvec as BV
        from sequila_spark.sources import cramcodec as CC

        k2 = chunk_size + 2
        k1 = ((1 << 31) // chunk_size + 2) * k2
        decode_cols = {"flag", "contig", "pos_start", "mapq", "__cig_raw"}
        ref_take_by_path: dict[str, pa.Array] = {}
        for b in batches:
            for gid in b.column(0).to_pylist():
                for tid in groups[gid]:
                    p, h = tasks[tid]
                    ref_names = meta_by_path[p]
                    take = ref_take_by_path.get(p)
                    if take is None:
                        take = pa.array(
                            [ccp(nm) for nm in ref_names], type=pa.string()
                        )
                        ref_take_by_path[p] = take
                    with open(p, "rb") as f:
                        f.seek(h["abs_data_offset"])
                        blob = f.read(h["length"])
                    hh = dict(h, data_offset=0)
                    refs = bref.value if bref is not None else None
                    for cols in CC.decode_container_columns(
                        blob, hh, ref_names, refs, columns=decode_cols,
                    ):
                        raw = cols.get("__cig_raw")
                        if raw is not None:
                            buf, co = raw
                            co = np.asarray(co, dtype=np.int64)
                            ap = np.asarray(cols["__ap"], dtype=np.int64)
                            bf = np.asarray(cols["__bf"], dtype=np.int64)
                            mq = np.asarray(cols["__mapq"], dtype=np.int64)
                            rid = np.full(
                                len(ap), int(cols["__s_ref"]), dtype=np.int64
                            )
                        else:
                            # per-record fallback slice (multi-ref, exotic
                            # layouts): rebuild the text buffer from the
                            # rendered cigar strings
                            cigs = [c or "*" for c in cols["cigar"]]
                            buf = np.frombuffer(
                                "".join(cigs).encode("ascii"), dtype=np.uint8
                            )
                            co = np.zeros(len(cigs) + 1, dtype=np.int64)
                            np.cumsum(
                                [len(c) for c in cigs], out=co[1:]
                            )
                            ap = np.asarray(cols["pos_start"], dtype=np.int64)
                            bf = np.asarray(cols["flag"], dtype=np.int64)
                            mq = np.asarray(
                                [m if m is not None else 0 for m in cols["mapq"]],
                                dtype=np.int64,
                            )
                            name_to_rid = {
                                nm: i for i, nm in enumerate(ref_names)
                            }
                            rid = np.asarray(
                                [
                                    name_to_rid.get(cg, -1)
                                    if cg is not None
                                    else -1
                                    for cg in cols["contig"]
                                ],
                                dtype=np.int64,
                            )
                        cig_u32, op_cum = BV.cigar_text_to_ops(buf, co)
                        keep = rid >= 0
                        if flag_mask:
                            keep &= (bf & flag_mask) == 0
                        if min_mapq:
                            keep &= mq >= min_mapq
                        if want_contig is not None:
                            names_ok = np.asarray(
                                [
                                    ccp(nm) == want_contig
                                    for nm in ref_names
                                ]
                            )
                            keep &= np.where(rid >= 0, names_ok[np.maximum(rid, 0)], False)
                            # per-record ref-consumed length via the
                            # cumulative-difference trick (robust to
                            # zero-op records, unlike reduceat)
                            ref_adv = (
                                (cig_u32 >> 4).astype(np.int64)
                                * BV._REF_CONSUME[cig_u32 & 0xF]
                            )
                            cum = np.zeros(len(ref_adv) + 1, dtype=np.int64)
                            np.cumsum(ref_adv, out=cum[1:])
                            rec_len = cum[op_cum[1:]] - cum[op_cum[:-1]]
                            rec_end = ap + np.maximum(rec_len - 1, 0)
                            keep &= (ap <= q_end) & (rec_end >= q_start)
                        # _blocks_raw expects BAM's 0-based pos; CRAM's
                        # pos_start is 1-based
                        bs, be, rec_of, _ = BV._blocks_raw(
                            cig_u32, op_cum, ap - 1
                        )
                        if not len(bs):
                            continue
                        bmask = keep[rec_of]
                        if not bmask.all():
                            bs, be, rec_of = bs[bmask], be[bmask], rec_of[bmask]
                        if not len(bs):
                            continue
                        batch = BV.events_from_blocks(
                            bs, be, rid[rec_of], take, chunk_size, k1, k2
                        )
                        if batch is not None:
                            yield batch

    return spark.range(0, len(groups), 1, len(groups)).mapInArrow(
        gen_batches, schema_str
    )


def read_bam(
    spark: SparkSession,
    path: str,
    ref_path: str | None = None,
    chunk: int = 10_000_000,
    columns: list[str] | None = None,
    with_blocks: bool = False,
) -> DataFrame:
    """Decode BAM/CRAM partitioned by genomic chunk/container.  Plain BAM
    and CRAM 3.0 go through the native pure-Python codecs; CRAM files using
    codecs outside the native set fall back to pysam when available.

    ``columns``/``with_blocks`` (BAM only) push column pruning and
    aligned-block extraction into the decode itself — see
    read_bam_native; an analytics-only caller (coverage, read counting)
    should pass the positional columns it needs and skip seq/qual/tag
    rendering entirely."""
    if not path.endswith(".cram"):
        return read_bam_native(
            spark, path, chunk=chunk, columns=columns, with_blocks=with_blocks
        )
    if with_blocks:
        raise ValueError("with_blocks extraction is BAM-only for now")
    try:
        return read_cram_native(spark, path, ref_path=ref_path, columns=columns)
    except NotImplementedError:
        pass  # codec outside the native set — try pysam
    try:
        import pysam
    except ImportError as e:
        raise ImportError(
            "this CRAM uses codecs outside the native decoder's set; "
            "decoding it needs pysam on driver and executors — or "
            "store alignments as parquet and use read_alignments() instead"
        ) from e

    with pysam.AlignmentFile(path, "rc" if path.endswith(".cram") else "rb") as af:
        spans = [
            (name, s, min(s + chunk, length))
            for name, length in zip(af.references, af.lengths)
            for s in range(0, length, chunk)
        ]

    sample = os.path.basename(path).split(".")[0]
    rdd = spark.sparkContext.parallelize(spans, max(len(spans), 1)).flatMap(
        lambda span: _pysam_reader(path, ref_path, *span)
    )
    df = rdd.toDF(
        f"{S.QNAME} string, {S.FLAG} int, {S.CONTIG} string, {S.START} int, "
        f"{S.END} int, {S.MAPQ} int, {S.CIGAR} string, {S.SEQUENCE} string, "
        f"{S.BASEQ} string"
    )
    return df.select(
        F.lit(sample).alias(S.SAMPLE),
        "*",
    ).withColumn(S.CONTIG, clean_contig(F.col(S.CONTIG)))

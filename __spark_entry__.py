"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes one entry per implemented operator from SURVEY.md §2 over
the synthetic tables; `oracle_sql()` gives the DuckDB-equivalent SQL.  The
genomic operators run on deterministic alignment/interval views derived from
the TPC-H-ish tables (see sequila_spark/testdata.py — derivation SQL is
shared between engines so results must hash-match).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sequila_spark import testdata as TD
from sequila_spark import schemas as S
from sequila_spark.functions import intervals as IV
from sequila_spark.operators.coverage import (
    coverage,
    coverage_blocks_walks,
    filter_reads,
)
from sequila_spark.operators.pileup import pileup, pileup_md
from sequila_spark.operators.range_join import range_join


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: featureCounts — interval join + per-target read counts
    (reference apps/FeatureCounts.scala:35-50)."""
    return _q_feature_counts(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Query implementations (Spark side)
# ---------------------------------------------------------------------------

# Interval-width bound for the synthetic genomic views, known by
# construction (testdata.READS_SQL: read_len <= 500 -> width <= 499;
# testdata.TARGETS_SQL: width <= 200 + 1800 = 2000).  Passing it as the
# range_join max_width hint skips the per-call statistics probe — the
# intended production pattern when the caller knows the width distribution
# (sequila_spark/operators/range_join.py docstring).
_SYNTH_MAX_WIDTH = 2000

def _q_feature_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = TD.reads(spark, sf_dir)
    targets = TD.targets(spark, sf_dir)
    joined = range_join(reads, targets, how="inner", max_width=_SYNTH_MAX_WIDTH)
    return (
        joined.groupBy("target_id")
        .agg(F.count("*").alias("read_count"))
    )


def _q_range_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = TD.reads(spark, sf_dir)
    targets = TD.targets(spark, sf_dir)
    j = range_join(reads, targets, how="inner", max_width=_SYNTH_MAX_WIDTH)
    return j.select(
        "qname",
        "target_id",
        IV.overlap_length(S.START, S.END, f"{S.START}_r", f"{S.END}_r").alias("overlap_len"),
    )


def _q_range_join_minoverlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = TD.reads(spark, sf_dir)
    targets = TD.targets(spark, sf_dir)
    j = range_join(reads, targets, how="inner", min_overlap=100, max_width=_SYNTH_MAX_WIDTH)
    return j.select("qname", "target_id")


def _q_range_join_maxgap(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = TD.reads(spark, sf_dir)
    targets = TD.targets(spark, sf_dir)
    j = range_join(reads, targets, how="inner", max_gap=1000, max_width=_SYNTH_MAX_WIDTH)
    return j.select("qname", "target_id")


def _q_range_join_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nanopore-class long intervals (10-100 kb): exercises the bin_cap
    long-interval branch (here bin_cap=8 -> 40 kb threshold so the branch
    genuinely routes rows) with the default max_width='auto' probe —
    regression guard for the branch-pruning logic at the harness level."""
    lr = TD.longreads(spark, sf_dir)
    targets = TD.targets(spark, sf_dir)
    j = range_join(lr, targets, how="inner", bin_cap=8)
    return j.select("qname", "target_id")


def _q_range_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """subsetByOverlaps analog (GRangesTestSuite distinct-overlap case)."""
    reads = TD.reads(spark, sf_dir)
    targets = TD.targets(spark, sf_dir)
    return range_join(targets, reads, how="left_semi", max_width=_SYNTH_MAX_WIDTH).select(
        "target_id", S.CONTIG, S.START, S.END
    )


def _q_interval_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = TD.targets(spark, sf_dir)
    return t.select(
        "target_id",
        IV.shift(S.START, S.END, 5)[S.START].alias("shift_start"),
        IV.shift(S.START, S.END, 5)[S.END].alias("shift_end"),
        IV.resize(S.START, S.END, 7, "center")[S.START].alias("resize_start"),
        IV.resize(S.START, S.END, 7, "center")[S.END].alias("resize_end"),
        IV.flank(S.START, S.END, 100, True, False)[S.START].alias("flank_start"),
        IV.flank(S.START, S.END, 100, True, False)[S.END].alias("flank_end"),
        IV.promoters(S.START, S.END, 2000, 200)[S.START].alias("prom_start"),
        IV.promoters(S.START, S.END, 2000, 200)[S.END].alias("prom_end"),
        IV.reflect(S.START, S.END, 1, 200000)[S.START].alias("refl_start"),
        IV.reflect(S.START, S.END, 1, 200000)[S.END].alias("refl_end"),
        # remaining variants: resize start/end anchors, flank both/negative,
        # overlap length vs a fixed probe interval
        IV.resize(S.START, S.END, 10, "start")[S.END].alias("rs_end"),
        IV.resize(S.START, S.END, 10, "end")[S.START].alias("re_start"),
        IV.flank(S.START, S.END, 50, True, True)[S.START].alias("fb_start"),
        IV.flank(S.START, S.END, 50, True, True)[S.END].alias("fb_end"),
        IV.flank(S.START, S.END, -50, False, False)[S.START].alias("fn_start"),
        IV.flank(S.START, S.END, -50, False, False)[S.END].alias("fn_end"),
        IV.overlap_length(S.START, S.END, F.lit(40_000), F.lit(60_000)).alias("ov_probe"),
        # contig normalization (DataQualityFuncs.scala:9-41) on chr-prefixed
        # renderings + the chrM special case
        IV.clean_contig(F.concat(F.lit("chr"), F.col(S.CONTIG))).alias("cleaned"),
        IV.clean_contig(F.lit("chrM")).alias("m_case"),
        IV.unclean_contig(F.col(S.CONTIG)).alias("unclean"),
    )


def _q_targets_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union of intervals (bedtools-merge / GRanges reduce analog):
    overlapping-or-touching targets collapse into maximal islands with the
    source-interval count — event-based prefix sum + chunked run
    stitching, no per-contig serial window."""
    t = TD.targets(spark, sf_dir)
    return IV.merge_intervals(t)


def _q_read_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read quality filter (AlignmentsRDD.scala:132-145)."""
    reads = TD.reads(spark, sf_dir)
    return filter_reads(reads, flag_mask=1796, min_mapq=20).select(
        "qname", S.CONTIG, S.START, S.END, "flag", "mapq"
    )


def _q_coverage_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both aligned-block walks under one gate (round 11 folded the
    former coverage_cigar slot in): span blocks (use_cigar=False) and the
    CIGAR-walk path (use_cigar=True), discriminated by ``walk``.  The
    synthetic reads carry all-M cigars, so both sides share one oracle;
    indel/clip CIGAR semantics are pinned by tests/test_coverage.py.

    r16: computed by the fused multi-walk pipeline — one tagged block
    explode feeds ONE events aggregation / prefix-sum window / boundary
    merge for both walks (guide §2.4), instead of two full per-walk
    pipelines unioned.  Row-identical to the union form (pinned by
    tests/test_coverage.py::test_coverage_blocks_walks_matches_union and
    the oracle gate)."""
    reads = TD.reads(spark, sf_dir)
    return coverage_blocks_walks(reads)


def _q_coverage_bases_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-base coverage, aggregated per contig (keeps the oracle result
    small while pinning every per-base value through sum/avg)."""
    reads = TD.reads(spark, sf_dir)
    bases = coverage(reads, mode="bases", use_cigar=False)
    return bases.groupBy(S.CONTIG).agg(
        F.count("*").cast("long").alias("covered_positions"),
        F.sum(S.COVERAGE).cast("long").alias("total_depth"),
        F.max(S.COVERAGE).cast("int").alias("max_cov"),
    )


def _q_coverage_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = TD.reads(spark, sf_dir)
    win = coverage(reads, mode="windows", window_size=1000, use_cigar=False)
    # coverage() computes sum(int)/w — one exact-integer sum, one IEEE
    # division: bit-identical across engines.
    return win.select(S.CONTIG, S.START, S.END, F.col(S.COVERAGE).alias("avg_cov"))


def _q_coverage_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coverage over quality-filtered reads (flag mask + mapq), the
    reference's default pileup pre-filter."""
    reads = TD.reads(spark, sf_dir)
    return coverage(reads, mode="blocks", use_cigar=False, flag_mask=1796, min_mapq=20)


def _q_grange_tvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bdg_grange TVF analog: 1-row genomic interval joined against targets
    (GenomicIntervalTVFTestSuite semantics)."""
    from sequila_spark.session import SequilaSession

    ss = SequilaSession(spark)
    targets = TD.targets(spark, sf_dir)
    iv = ss.grange("3", 10_000, 40_000)
    j = range_join(targets, iv, how="inner", max_width=30_001)
    return j.select("target_id", S.CONTIG, S.START, S.END)


def _slice_reads(reads: DataFrame, contig: str, lo: int, hi: int) -> DataFrame:
    """Read-level slice prune for the pileup slice queries — the Spark-side
    mirror of the oracle's ``_pileup_base_cte(prune=(contig, lo, hi))``,
    which pushes the same filter below its UNNEST.  Lossless for any query
    that keeps only pileup rows with pos in [lo, hi]: a pileup row at pos p
    aggregates bases exclusively from reads with pos_start <= p <= pos_end,
    and every such read satisfies pos_start <= hi AND pos_end >= lo.
    Catalyst cannot derive this bound itself (pos is born inside the
    explode), so without it every read of the contig pays seq/qual
    synthesis + per-base explode only to be filtered after the Generate
    (measured ~90% wasted work for a 10 kb slice of a 99 kb contig —
    guide §8: use what you know that the optimizer does not)."""
    return reads.where(
        (F.col(S.CONTIG) == contig)
        & (F.col(S.START) <= hi)
        & (F.col(S.END) >= lo)
    )


def _q_pileup_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-position pileup with alt maps on a genomic slice (contig 1,
    1..20000), alts rendered with altmap_to_str for comparison — the
    reference's own golden-comparison technique (AltFunctions.scala:15-22)."""
    from sequila_spark.functions.maps import altmap_to_str

    reads = _slice_reads(TD.reads_with_seq(spark, sf_dir), "1", 1, 20000)
    # synthetic reads are all-M: gapless expansion is exact here (CIGAR-walk
    # semantics are oracle-gated separately by pileup_indels*)
    p = pileup(reads, ref=TD.ref_base_col, alts=True, use_cigar=False)
    return p.where((F.col(S.CONTIG) == "1") & F.col(S.START).between(1, 20000)).select(
        S.CONTIG,
        S.START,
        S.END,
        S.REF,
        S.COVERAGE,
        S.COUNT_REF,
        S.COUNT_NONREF,
        F.nullif(altmap_to_str(F.col(S.ALTS)), F.lit("")).alias("alts_str"),
    )


def _q_pileup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-genome pileup digest per contig: pins every per-position value
    through exact integer sums."""
    reads = TD.reads_with_seq(spark, sf_dir)
    p = pileup(reads, ref=TD.ref_base_col, alts=True, use_cigar=False)
    return p.groupBy(S.CONTIG).agg(
        F.count("*").alias("n_pos"),
        F.sum(S.COVERAGE).cast("long").alias("sum_cov"),
        F.sum(S.COUNT_REF).cast("long").alias("sum_ref"),
        F.sum(S.COUNT_NONREF).cast("long").alias("sum_nonref"),
        F.sum(F.when(F.col(S.COUNT_NONREF) > 0, 1).otherwise(0)).cast("long").alias("n_alt_pos"),
    )


def _q_pileup_quals_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pileup with per-base quality histograms on a slice, rendered with
    qualsmap_to_str (QualityFunctions.scala:52-58 golden rendering)."""
    from sequila_spark.functions.maps import qualsmap_to_str

    reads = _slice_reads(TD.reads_with_seq(spark, sf_dir), "2", 1, 10000)
    p = pileup(reads, ref=TD.ref_base_col, alts=True, quals=True, use_cigar=False)
    return p.where((F.col(S.CONTIG) == "2") & F.col(S.START).between(1, 10000)).select(
        S.CONTIG,
        S.START,
        S.REF,
        S.COVERAGE,
        qualsmap_to_str(F.col(S.QUALS)).alias("quals_str"),
    )


def _q_pileup_quals_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality binning (PileupStrategy.scala:110-118): histogram indexes are
    qual div binSize."""
    from sequila_spark.functions.maps import qualsmap_to_str

    reads = _slice_reads(TD.reads_with_seq(spark, sf_dir), "4", 1, 10000)
    p = pileup(
        reads, ref=TD.ref_base_col, alts=True, quals=True, qual_bin_size=10, use_cigar=False
    )
    return p.where((F.col(S.CONTIG) == "4") & F.col(S.START).between(1, 10000)).select(
        S.CONTIG,
        S.START,
        S.COVERAGE,
        qualsmap_to_str(F.col(S.QUALS)).alias("quals_str"),
    )


def _q_pileup_indels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indel-aware pileup digest over mixed-CIGAR reads (gapless /
    soft-clipped / deletion / insertion shapes): each seq index is mapped to
    its reference position through the CIGAR walk (pileup/MDTagParser.scala:
    24-53, pileup/model/Read.scala:56-69 semantics).  Callable ref ->
    sparse-mismatch path; per-contig integer sums pin every position."""
    reads = TD.reads_indel(spark, sf_dir)
    p = pileup(reads, ref=TD.ref_base_col, alts=True)
    return p.groupBy(S.CONTIG).agg(
        F.count("*").alias("n_pos"),
        F.sum(S.COVERAGE).cast("long").alias("sum_cov"),
        F.sum(S.COUNT_REF).cast("long").alias("sum_ref"),
        F.sum(S.COUNT_NONREF).cast("long").alias("sum_nonref"),
        F.sum(F.when(F.col(S.COUNT_NONREF) > 0, 1).otherwise(0)).cast("long").alias("n_alt_pos"),
    )


def _q_pileup_indels_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Indel-aware pileup on a slice through the DENSE path (ref passed as a
    relation), alts rendered per position — pins exact per-position values
    with CIGAR-shifted base attribution."""
    from sequila_spark.functions.maps import altmap_to_str

    reads = _slice_reads(TD.reads_indel(spark, sf_dir), "3", 1, 20000)
    ref_rel = (
        spark.range(1, 20001)
        .select(F.lit("3").alias(S.CONTIG), F.col("id").cast("int").alias("pos"))
        .withColumn(S.REF, TD.ref_base_col(F.col(S.CONTIG), F.col("pos")))
    )
    p = pileup(reads, ref=ref_rel, alts=True)
    return p.where((F.col(S.CONTIG) == "3") & F.col(S.START).between(1, 20000)).select(
        S.CONTIG,
        S.START,
        S.END,
        S.REF,
        S.COVERAGE,
        S.COUNT_REF,
        S.COUNT_NONREF,
        F.nullif(altmap_to_str(F.col(S.ALTS)), F.lit("")).alias("alts_str"),
    )


def _q_pileup_blocks_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-compressed pileup (the reference TVF's native output shape —
    CommonPileupFormat): alt-free equal-coverage runs merged with
    concatenated ref, mismatch positions as singleton rows.  Over the
    mixed-CIGAR reads so block boundaries interact with indels."""
    from sequila_spark.functions.maps import altmap_to_str
    from sequila_spark.operators.pileup import pileup_blocks

    reads = _slice_reads(TD.reads_indel(spark, sf_dir), "2", 1, 30000)
    p = pileup(reads, ref=TD.ref_base_col, alts=True)
    sliced = p.where((F.col(S.CONTIG) == "2") & F.col(S.START).between(1, 30000))
    b = pileup_blocks(sliced)
    return b.select(
        S.CONTIG,
        S.START,
        S.END,
        S.REF,
        S.COVERAGE,
        F.nullif(altmap_to_str(F.col(S.ALTS)), F.lit("")).alias("alts_str"),
    )


def _q_distinct_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT sample_id fast path (SequilaDataSourceStrategy.scala:38-54);
    with partitioned storage this is partition listing — here the aggregate."""
    reads = TD.reads(spark, sf_dir)
    return reads.select("sample_id").distinct()


# --- LLM-pipeline operators (dedup / similarity / text / multimodal) --------

def _spread(df: DataFrame) -> DataFrame:
    """Spread a small (single-file / single-rowgroup) input across the
    local cores before compute-heavy map work.  Scale-adaptive (guide
    §2.4): when the scan already has at least half the session
    parallelism in natural file-split partitions — always true for the
    many-file inputs of a real deployment — the keyless repartition
    (a full payload shuffle + sort-before-repartition) is skipped, so at
    scale the corpus is never shuffled just to be spread.  Row set is
    identical either way."""
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 >= p:
        return df
    return df.repartition(p)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # small single-file input; spread before the 100x shingle explosion
    return _spread(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup over a corpus with planted copies (documents unioned with
    an id-shifted copy of itself)."""
    from sequila_spark.operators.dedup import exact_duplicates

    d = _docs(spark, sf_dir)
    corpus = d.unionByName(d.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    return exact_duplicates(corpus)


def _q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sequila_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.8)


def _q_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sequila_spark.operators.dedup import minhash_dedup_pairs

    # verify is PINNED to 'broadcast' (not 'auto') so the sweep's
    # crosscheck — which runs verify='join' — always exercises a genuinely
    # different execution; under 'auto' a corpus past the byte budget would
    # silently resolve to 'join' and make the crosscheck vacuous.
    return minhash_dedup_pairs(
        _docs(spark, sf_dir), threshold=0.8, verify="broadcast"
    )


def _q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering end to end: MinHash+LSH pairs -> connected
    components -> (id, rep_id) keep-one-per-cluster assignment.  Oracle:
    the same pair SQL + a recursive-CTE transitive closure."""
    from sequila_spark.operators.dedup import dedup_components, minhash_dedup_pairs

    pairs = minhash_dedup_pairs(_docs(spark, sf_dir), threshold=0.8)
    return dedup_components(pairs)


def _q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sequila_spark.operators.dedup import simhash

    return simhash(_docs(spark, sf_dir))


def _q_docs_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test split by id-hash bucket (portable
    md5 arithmetic — stable across runs/engines); per-split integer sums
    pin every assignment."""
    from sequila_spark.operators.sampling import hash_split

    d = _docs(spark, sf_dir)
    s = hash_split(d, "doc_id", {"train": 0.9, "valid": 0.05, "test": 0.05})
    return s.groupBy("split").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("doc_id").cast("long").alias("sum_ids"),
    )


def _q_events_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing sampler: per-stratum deterministic rates (view 10%,
    click 50%, purchase 100%, everything else 20%) — the mixture-control
    primitive of a training-data pipeline, reproducible by id hash."""
    from sequila_spark.operators.sampling import stratified_sample
    from sequila_spark.streaming.ops import read_events

    e = read_events(spark, sf_dir)
    s = stratified_sample(
        e,
        "event_id",
        "event_type",
        {"view": 0.1, "click": 0.5, "purchase": 1.0},
        default=0.2,
    )
    return s.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("event_id").cast("long").alias("sum_ids"),
    )


def _q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sequila_spark.operators.similarity import cosine_topk

    embs = _embs(spark, sf_dir)
    queries_df = embs.where(F.col("vec_id") % 50 == 0)
    return cosine_topk(embs, queries_df, k=5)


def _q_similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sequila_spark.operators.similarity import ann_topk_lsh

    embs = _embs(spark, sf_dir)
    queries_df = embs.where(F.col("vec_id") % 50 == 0)
    return ann_topk_lsh(embs, queries_df, k=5)


def _q_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sequila_spark.operators.text import text_features

    return text_features(_docs(spark, sf_dir)).select(
        "doc_id", "ws_tokens", "bpe_tokens", "quality", "lang_pred", "fp_md5", "fp_shingle"
    )


def _q_multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sequila_spark.operators.multimodal import attach_binary, byte_features

    media = attach_binary(_docs(spark, sf_dir))
    feats = byte_features(media)
    return feats.select(
        "doc_id",
        "byte_len",
        F.col("checksum").cast("long").alias("checksum"),
        F.array_join(F.col("byte_hist"), ",").alias("hist_str"),
    )


def _q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN in the seeded (iters=0) variant: assignment to the nearest of
    the 16 smallest-id seed vectors, 4 probed lists per query — fully
    SQL-expressible, so the whole pipeline (seeding, assignment, probing,
    in-list exact scoring) is DuckDB-oracle-gated.  The Lloyd-iterated
    variant (iters>0) shares every operator and is pinned by
    tests/test_llm_ops.py recall/determinism assertions."""
    from sequila_spark.operators.similarity import ivf_topk

    embs = _embs(spark, sf_dir)
    queries_df = embs.where(F.col("vec_id") % 50 == 0)
    return ivf_topk(embs, queries_df, k=5, iters=0)


def _q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via multi-table LSH candidates +
    exact verify (threshold tuned to the corpus).  The bucket equi-joins
    replace the quadratic self-join; the oracle replicates the bucket
    arithmetic, so recall behavior is deterministic and hash-checked."""
    from sequila_spark.operators.similarity import cosine_dup_pairs

    return cosine_dup_pairs(_embs(spark, sf_dir), threshold=0.4)


def _q_bed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BED source with the full optional-column gradient + unclean_contig
    rendering (BEDRelation.scala:18-57, DataQualityFuncs.scala:42-72):
    the repo BED fixture — track/browser header lines, a 12-column row,
    a 3-column row and a 4-column chrM row — parsed natively; the oracle
    is the file transcribed BY EYE (independent of the parser).  sf_dir
    is ignored — real data."""
    from sequila_spark.sources.bed import read_bed

    bed = read_bed(
        spark,
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "tests", "fixtures", "test.bed",
        ),
    )

    # The driver's canonicalizer sorts/hashes pandas frames, which chokes on
    # unhashable list cells — render the int-array columns as deterministic
    # JSON-style strings ("[255,0,0]", NULL stays NULL) on BOTH sides.
    def _arr_str(name: str):
        c = F.col(name)
        return (
            F.when(c.isNull(), F.lit(None).cast("string"))
            .otherwise(F.concat(F.lit("["), F.concat_ws(",", c), F.lit("]")))
            .alias(name)
        )

    return bed.select(
        S.CONTIG, S.START, S.END, S.BED_NAME, S.BED_SCORE, S.BED_STRAND,
        S.BED_THICK_START, S.BED_THICK_END,
        _arr_str(S.BED_ITEM_RGB), S.BED_BLOCK_COUNT,
        _arr_str(S.BED_BLOCK_SIZES), _arr_str(S.BED_BLOCK_STARTS),
        IV.unclean_contig(F.col(S.CONTIG)).alias("contig_unclean"),
    )


# --- general analytics over the raw star schema (engine breadth: broadcast
# dim joins, top-k, multi-join aggregation; money quantized to cents so sums
# are exact integers) ---------------------------------------------------------

def _table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary (quantized money)."""
    li = _table(spark, sf_dir, "lineitem")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    disc_cents = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    # l_shipdate is TIMESTAMP_NTZ (wall-clock): NTZ comparisons never consult
    # the session TZ, and DuckDB's naive timestamps have the same semantics.
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
            F.sum(cents).alias("sum_price_cents"),
            F.sum(disc_cents).alias("sum_disc_price_cents"),
            F.count("*").alias("n_rows"),
        )
        .withColumn(
            "avg_qty", F.col("sum_qty").cast("double") / F.col("n_rows")
        )
    )


def _q_orders_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-shaped multi-join revenue per nation PLUS the top revenue order
    within each nation (broadcast dims, two-level aggregation, window
    rank) — consolidates the former top_orders and nation_revenue gates
    into one slot, preserving both queries' operator coverage (multi-way
    broadcast join, partial agg, window top-k, deterministic ties)."""
    region = _table(spark, sf_dir, "region")
    nation = _table(spark, sf_dir, "nation")
    cust = _table(spark, sf_dir, "customer")
    orders = _table(spark, sf_dir, "orders")
    li = _table(spark, sf_dir, "lineitem")
    rev = F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("long")
    dims = nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(dims), cust.c_nationkey == F.col("n_nationkey"))
        .groupBy("r_name", "n_name", "o_orderkey")
        .agg(F.sum(rev).alias("order_cents"), F.count("*").alias("n_i"))
    )
    w = W.partitionBy("r_name", "n_name").orderBy(
        F.col("order_cents").desc(), F.col("o_orderkey")
    )
    return (
        per_order.withColumn("rk", F.row_number().over(w))
        .groupBy("r_name", "n_name")
        .agg(
            F.sum("order_cents").cast("long").alias("revenue_cents"),
            F.sum("n_i").cast("long").alias("n_items"),
            F.max(F.when(F.col("rk") == 1, F.col("o_orderkey"))).cast("long").alias("top_orderkey"),
            F.max(F.when(F.col("rk") == 1, F.col("order_cents"))).cast("long").alias("top_order_cents"),
        )
    )


def _q_vcf_genotypes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sample genotype rows decoded from the reference project's own
    multi-sample VCF (vcf/test.vcf — the surface VCFRelation.scala:25-45
    exposes via Glow, parsed natively here).  Oracle: the 15 rows of the
    file hand-transcribed into a VALUES table — fully independent of the
    parser.  sf_dir is ignored — real data."""
    from sequila_spark.sources.vcf import read_vcf

    path = "/root/reference/src/test/resources/vcf/test.vcf"
    g_cols = [
        F.col("contig"),
        F.col("pos_start"),
        F.col("ref"),
        F.concat_ws(",", "alt").alias("alt_str"),
        F.col("g.sample_id").alias("sample_id"),
        F.col("g.phased").alias("phased"),
        F.array_join(
            F.transform(F.col("g.calls"), lambda c: c.cast("string")), "/"
        ).alias("calls_str"),
        F.col("g.fields")["GQ"].cast("int").alias("gq"),
        F.col("g.fields")["DP"].cast("int").alias("dp"),
        F.col("g.fields")["HQ"].alias("hq"),
    ]
    if not os.path.exists(path):
        # Fail LOUDLY: the hand-transcribed oracle always returns 15 rows,
        # so silently returning an empty frame here would surface as a
        # baffling row-count mismatch instead of a clear missing-fixture
        # diagnosis.
        raise FileNotFoundError(
            f"vcf_genotypes gate requires the reference fixture {path}; "
            "it is absent in this environment"
        )
    return read_vcf(spark, path).select(
        "contig", "pos_start", "ref", "alt",
        F.explode("genotypes").alias("g"),
    ).select(*g_cols)


# --- events: windowed aggregation / sessionization (batch forms of the
# streaming operators — sequila_spark/streaming/ops.py) ----------------------

def _q_events_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sequila_spark.streaming.ops import read_events, windowed_event_agg

    return windowed_event_agg(read_events(spark, sf_dir), exact_users=True)


def _q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sequila_spark.streaming.ops import read_events, sessionize

    return sessionize(read_events(spark, sf_dir))


def _q_events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured handling: parse the JSON props column with the
    native from_json path and aggregate on the extracted field."""
    from sequila_spark.streaming.ops import read_events

    e = read_events(spark, sf_dir)
    k = F.from_json(F.col("props"), "k INT")["k"]
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )


def _q_events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest prior (or
    same-instant) view.  Oracle = DuckDB's native ASOF JOIN."""
    from sequila_spark.operators.asof import asof_join
    from sequila_spark.streaming.ops import read_events

    e = read_events(spark, sf_dir)
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("ts"), F.col("event_id").alias("purchase_id")
    )
    views = e.where(F.col("event_type") == "view").select(
        "user_id", F.unix_micros("ts").alias("ts"), F.col("event_id").alias("view_id")
    )
    j = asof_join(purchases, views, on="user_id", ts_col="ts")
    return j.select(
        "user_id",
        "purchase_id",
        F.col("r_view_id").cast("long").alias("view_id"),
    )


def _q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event-type counts as columns."""
    from sequila_spark.streaming.ops import read_events

    e = read_events(spark, sf_dir)
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .count()
        .select(
            "user_id",
            *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in types],
        )
    )


def _q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup aggregation over (event_type, user_id) with grouping flags."""
    from sequila_spark.streaming.ops import read_events

    e = read_events(spark, sf_dir)
    return e.rollup("event_type", "user_id").agg(
        F.count("*").alias("n"),
        F.grouping("event_type").cast("int").alias("g_type"),
        F.grouping("user_id").cast("int").alias("g_user"),
    )


def _q_reads_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from sequila_spark.streaming.ops import windowed_read_counts

    return windowed_read_counts(TD.reads(spark, sf_dir))


_MDBAM_FIX = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "mdbam"
)


def _alts_str(col) -> F.Column:
    """Canonical 'A:2,g:1' rendering of an alts map — the single shared
    implementation (converters._render_alts) so the golden fixtures and
    every comparison surface stay hash-identical."""
    from sequila_spark.converters import _render_alts

    return _render_alts(col)


def _q_pileup_mdbam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-data pileup under the per-round hash gate: the reference
    project's MD BAM (decoded by the native codec into fixtures/mdbam,
    tools/make_mdbam_fixture.py) through the CIGAR-aware pileup with
    samtools flag mask + strand casing, compared against the cleaned
    `samtools mpileup -x` golden (SamtoolsConverter.scala:18-140
    semantics).  sf_dir is ignored — real data has no scale factor."""
    reads = spark.read.parquet(f"{_MDBAM_FIX}/reads.parquet")
    ref = spark.read.parquet(f"{_MDBAM_FIX}/ref_bases.parquet")
    p = pileup(reads, ref=ref, alts=True, flag_mask=1796, strand_case=True)
    return p.select(
        "contig",
        F.col("pos_start").alias("pos"),
        F.upper("ref").alias("ref"),
        "coverage",
        "countRef",
        "countNonRef",
        _alts_str(F.col("alts")).alias("alts_str"),
    )


def _q_pileup_md_mismatches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MD-tag-only pileup (pileup_md — no reference genome anywhere) on the
    real BAM, mismatch positions vs the same samtools golden: a second,
    fully independent derivation of the mismatch set (MD walk vs the
    golden's FASTA-based output)."""
    reads = spark.read.parquet(f"{_MDBAM_FIX}/reads.parquet")
    p = pileup_md(reads, alts=True, flag_mask=1796, strand_case=True)
    return p.where(F.col("countNonRef") > 0).select(
        "contig",
        F.col("pos_start").alias("pos"),
        "ref",
        "coverage",
        "countRef",
        "countNonRef",
        _alts_str(F.col("alts")).alias("alts_str"),
    )


def _q_pileup_convert_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Converter path under the per-round hash gate (PileupComparison
    analog, apps/PileupComparison.scala:18-40): the real `samtools mpileup
    -x` TEXT output parsed by the distributed samtools converter
    (converters.read_samtools_pileup — mark removal, countRef folding,
    strand-cased alts) must reproduce the golden pileup parquet exactly —
    the same golden the ENGINE pileup matches in `pileup_mdbam`, so the
    two queries together pin converter == samtools == engine per round."""
    from sequila_spark.converters import read_samtools_pileup

    conv = read_samtools_pileup(spark, f"{_MDBAM_FIX}/samtools_x.pileup.gz")
    return conv.select(
        "contig",
        F.col("pos_start").alias("pos"),
        "ref",
        "coverage",
        "countRef",
        "countNonRef",
        _alts_str(F.col("alts")).alias("alts_str"),
    )


#: containers in the fixtures/bigcram gate fixture (tools/make_big_cram.py)
_BIGCRAM_COPIES = 64


def _cram_fixture() -> tuple[str | None, int]:
    """ONE resolver for the cram_decode fixture, shared by the query and
    its oracle multiplier so the two can never silently diverge (r14
    ADVICE): returns (cram_path, oracle_copies) — (bigcram, 64) when the
    64-container gate fixture exists, (reference single-container, 1) as
    the fallback, (None, 0) in fully fixture-less environments (where the
    query returns an empty frame and the gate degrades gracefully instead
    of failing on a row-count mismatch, r13 ADVICE)."""
    here = os.path.dirname(os.path.abspath(__file__))
    big = os.path.join(here, "fixtures", "bigcram", "NA12878.slice.cram")
    if os.path.exists(big):
        return big, _BIGCRAM_COPIES
    ref = "/root/reference/src/test/resources/NA12878.slice.cram"
    if os.path.exists(ref):
        return ref, 1
    return None, 0


def _cram_oracle_copies() -> int:
    return _cram_fixture()[1]


def _q_cram_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native CRAM 3.0 decode under the per-round hash gate: a 64-container
    / 203,008-record CRAM (the reference project's NA12878.slice container
    repeated — tools/make_big_cram.py, r12 VERDICT task 4) decoded by the
    pure-Python codec (sources/cramcodec) vs the same records decoded from
    the paired BAM by the independent BAM codec (fixtures/slicebam,
    oracle-side CROSS JOIN range(64)).  The multi-container fixture makes
    the gate measure the ENGINE: the old single-container run paid ~370 ms
    of plan/Arrow-runner fixed cost for ~30 ms of decode.  Falls back to
    the reference single-container file where the fixture is absent.
    sf_dir is ignored — real data."""
    from sequila_spark.sources import read_cram_native

    cram, _ = _cram_fixture()
    fasta = "/root/reference/src/test/resources/NA12878.slice.fasta"
    if cram is None:  # fixture-less environments: empty result
        return spark.read.parquet(f"{_SLICEBAM_FIX}/reads.parquet").limit(0)
    # columns= pushes the tag prune into the DECODE (r12): the gate never
    # reads tags, so their rendering + transfer are skipped, not dropped
    cols = [
        S.QNAME, S.FLAG, S.CONTIG, S.START, S.END, S.MAPQ, S.CIGAR,
        S.RNEXT, S.PNEXT, S.TLEN, S.SEQUENCE, S.BASEQ,
    ]
    return read_cram_native(spark, cram, ref_path=fasta, columns=cols)


_SLICEBAM_FIX = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "fixtures", "slicebam"
)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "feature_counts": _q_feature_counts,
    "range_join_pairs": _q_range_join_pairs,
    "range_join_minoverlap": _q_range_join_minoverlap,
    "range_join_maxgap": _q_range_join_maxgap,
    "range_join_semi": _q_range_join_semi,
    "range_join_long": _q_range_join_long,
    "pileup_mdbam": _q_pileup_mdbam,
    "pileup_md_mismatches": _q_pileup_md_mismatches,
    "pileup_convert_compare": _q_pileup_convert_compare,
    "cram_decode": _q_cram_decode,
    "interval_ops": _q_interval_ops,
    "targets_merged": _q_targets_merged,
    "read_filter": _q_read_filter,
    "coverage_blocks": _q_coverage_blocks,
    "coverage_bases_agg": _q_coverage_bases_agg,
    "coverage_windows": _q_coverage_windows,
    "coverage_filtered": _q_coverage_filtered,
    "grange_tvf": _q_grange_tvf,
    "distinct_samples": _q_distinct_samples,
    "pileup_slice": _q_pileup_slice,
    "pileup_agg": _q_pileup_agg,
    "pileup_quals_slice": _q_pileup_quals_slice,
    "pileup_quals_binned": _q_pileup_quals_binned,
    "pileup_indels": _q_pileup_indels,
    "pileup_indels_slice": _q_pileup_indels_slice,
    "pileup_blocks_slice": _q_pileup_blocks_slice,
    "dedup_exact": _q_dedup_exact,
    "dedup_ngram_jaccard": _q_dedup_ngram_jaccard,
    "dedup_minhash_pairs": _q_dedup_minhash_pairs,
    "dedup_clusters": _q_dedup_clusters,
    "dedup_simhash": _q_dedup_simhash,
    "docs_split": _q_docs_split,
    "events_stratified": _q_events_stratified,
    "similarity_topk": _q_similarity_topk,
    "similarity_ann_lsh": _q_similarity_ann_lsh,
    "text_features": _q_text_features,
    "multimodal_byte_features": _q_multimodal_byte_features,
    "events_window_agg": _q_events_window_agg,
    "events_sessionize": _q_events_sessionize,
    "reads_window_counts": _q_reads_window_counts,
    "dedup_embedding": _q_dedup_embedding,
    "bed_features": _q_bed_features,
    "pricing_summary": _q_pricing_summary,
    "orders_analytics": _q_orders_analytics,
    "vcf_genotypes": _q_vcf_genotypes,
    "events_props_json": _q_events_props_json,
    "similarity_ivf": _q_similarity_ivf,
    "events_asof": _q_events_asof,
    "events_pivot": _q_events_pivot,
    "events_rollup": _q_events_rollup,
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


# Misaligned with the default 750 (not a divisor or multiple; boundaries
# coincide only every lcm=25500 positions): every bin boundary, explode
# fan-out and anchor-bin assignment differs from the primary plan's, so a
# boundary/anchor bug cannot produce the same wrong answer in both.  1700
# also changes which rows the bin_cap long-branch routing would see
# (cap * 1700 vs cap * 750 thresholds).
_XCHECK_BIN = 1700


def _xq_range_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = TD.reads(spark, sf_dir)
    targets = TD.targets(spark, sf_dir)
    j = range_join(reads, targets, how="inner", max_width=_SYNTH_MAX_WIDTH,
                   bin_size=_XCHECK_BIN)
    return j.select(
        "qname",
        "target_id",
        IV.overlap_length(S.START, S.END, f"{S.START}_r", f"{S.END}_r").alias("overlap_len"),
    )


def _xq_range_join_minoverlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = TD.reads(spark, sf_dir)
    targets = TD.targets(spark, sf_dir)
    j = range_join(reads, targets, how="inner", min_overlap=100,
                   max_width=_SYNTH_MAX_WIDTH, bin_size=_XCHECK_BIN)
    return j.select("qname", "target_id")


def _xq_range_join_maxgap(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = TD.reads(spark, sf_dir)
    targets = TD.targets(spark, sf_dir)
    j = range_join(reads, targets, how="inner", max_gap=1000,
                   max_width=_SYNTH_MAX_WIDTH, bin_size=_XCHECK_BIN)
    return j.select("qname", "target_id")


def _xq_pileup_indels(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = TD.reads_indel(spark, sf_dir)
    p = pileup(reads, ref=TD.ref_base_col, alts=True, strategy="dense")
    return p.groupBy(S.CONTIG).agg(
        F.count("*").alias("n_pos"),
        F.sum(S.COVERAGE).cast("long").alias("sum_cov"),
        F.sum(S.COUNT_REF).cast("long").alias("sum_ref"),
        F.sum(S.COUNT_NONREF).cast("long").alias("sum_nonref"),
        F.sum(F.when(F.col(S.COUNT_NONREF) > 0, 1).otherwise(0)).cast("long").alias("n_alt_pos"),
    )


def _xq_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Naive all-shared-shingles formulation (the oracle's own semantics,
    distributed): no prefix filter, no candidate restriction — every shared
    shingle contributes to every pair count.  Structurally independent of
    the primary's asymmetric-PPJoin + positional-filter execution.

    Feasibility note, measured at sf1: the naive all-shared-shingles
    formulation is not materializable on one machine — DuckDB exhausted a
    60 GB spill budget, and two Spark shapes of it (raw self-join; group-
    by-shingle with pre-shuffle partial agg) each filled an 80 GB disk,
    because the distinct shared-pair space itself is the blowup.  So the
    independent execution stays in the PPJoin family but flips every
    data-dependent decision: the prefixes are taken under the REVERSED
    frequency-tie order (lossless for any total order — Xiao et al. 2008),
    relocating each equal-frequency prefix boundary and positional-filter
    rank, and verification runs the join path instead of the primary's
    replicated broadcast; the ranking prologue pins plan='classic'
    (separate freq/sizes groupBys + joins) against the primary's collapsed
    two-exchange window shape (r14)."""
    from sequila_spark.operators.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), threshold=0.8, order="rarity_rev",
        verify="join", plan="classic",
    )


def _xq_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-verify execution: per-doc shingle sets attach to the candidate
    list via broadcast-hash joins and the exact intersection runs in an
    Arrow-batched pandas UDF — a different code path end-to-end from the
    primary's replicated-broadcast mapInPandas verify.  (Candidates are
    semantically pinned by the fixed MinHash permutations, so candidate
    generation is shared; what diverges is the whole verification
    execution.)"""
    from sequila_spark.operators.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(_docs(spark, sf_dir), threshold=0.8, verify="join")


def _xq_range_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = TD.reads(spark, sf_dir)
    targets = TD.targets(spark, sf_dir)
    j = range_join(targets, reads, how="left_semi", max_width=_SYNTH_MAX_WIDTH,
                   bin_size=_XCHECK_BIN)
    return j.select("target_id", S.CONTIG, S.START, S.END)


def crosscheck_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Independent-plan variants of the queries whose DuckDB oracle outgrows a
    single node at large scale factors: the interval-join trio's result set
    is output-quadratic in sf (~3.3-8.1 BILLION pairs at sf1), and
    range_join_semi's EXISTS oracle — 20k-row *output* — still walks the same
    quadratic pair space inside DuckDB (measured: >35 min single-threaded at
    sf1 vs 30 s at sf0.1).  Each variant builds the same result through a
    structurally different execution: a misaligned bin size shifts every
    explode boundary and anchor-dedup/semi-dedup decision.  The primary plan
    is full-hash verified against DuckDB at sf0.01 (driver gate) and sf0.1
    (sweep); tools/sweep.py uses these variants plus a distributed hash
    aggregate to extend value-fidelity verification to scales where the
    oracle engine, not this engine, is the bottleneck.

    pileup_indels joins the set for a different reason: its 5-row output is
    tiny, but the oracle must expand every base of every read single-node —
    at sf1 DuckDB exhausted a 24 GB memory cap plus a 56 GB spill budget
    evaluating it.  Its variant pins the other physical pileup plan
    (strategy='dense', explode-every-base) against the sparse-mismatch
    primary — independent executions whose row-identity the oracle parity
    suite verifies at gate scale."""
    return {
        "range_join_pairs": _xq_range_join_pairs,
        "range_join_minoverlap": _xq_range_join_minoverlap,
        "range_join_maxgap": _xq_range_join_maxgap,
        "range_join_semi": _xq_range_join_semi,
        "pileup_indels": _xq_pileup_indels,
        "dedup_ngram_jaccard": _xq_dedup_ngram_jaccard,
        "dedup_minhash_pairs": _xq_dedup_minhash_pairs,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_OVERLAP_ON = (
    "r.contig = t.contig AND r.pos_start <= t.pos_end AND r.pos_end >= t.pos_start"
)

_COVERAGE_BLOCKS_CTE = """
ev AS (
  SELECT contig, pos_start AS pos, 1 AS delta FROM reads
  UNION ALL
  SELECT contig, pos_end + 1 AS pos, -1 AS delta FROM reads
),
d AS (
  SELECT contig, pos, SUM(delta) AS delta
  FROM ev GROUP BY contig, pos HAVING SUM(delta) <> 0
),
c AS (
  SELECT contig, pos,
         SUM(delta) OVER (PARTITION BY contig ORDER BY pos) AS cov,
         LEAD(pos) OVER (PARTITION BY contig ORDER BY pos) AS next_pos
  FROM d
),
blocks AS (
  SELECT contig, CAST(pos AS INT) AS pos_start, CAST(next_pos - 1 AS INT) AS pos_end,
         CAST(cov AS INT) AS coverage
  FROM c WHERE cov > 0 AND next_pos IS NOT NULL
)
"""


def _pileup_base_cte(
    where: str = "TRUE", prune: tuple[str, int, int] | None = None
) -> str:
    """DuckDB per-base expansion + per-(pos,base) counts.  The oracle derives
    bases arithmetically (testdata.read_base_sql) — independent of the Spark
    path, which materializes seq strings and parses them back.

    ``prune=(contig, lo, hi)`` pushes a slice filter BELOW the UNNEST:
    reads are pruned by overlap and the expanded range clipped to
    [lo, hi] — semantically identical for slice queries (non-overlapping
    reads contribute no in-slice bases) but it keeps the expansion
    slice-sized, which is what lets the same oracle run at sf1 where the
    full per-base expansion exhausts single-node DuckDB."""
    if prune is not None:
        c, lo, hi = prune
        pb = f"""
pb AS (
  SELECT contig, okey,
         UNNEST(range(GREATEST(pos_start, {lo}), LEAST(pos_end, {hi}) + 1)) AS p
  FROM reads
  WHERE contig = '{c}' AND pos_start <= {hi} AND pos_end >= {lo}
),"""
    else:
        pb = """
pb AS (
  SELECT contig, okey, UNNEST(range(pos_start, pos_end + 1)) AS p FROM reads
),"""
    return f"""{pb}
pb2 AS (
  SELECT contig, CAST(p AS INT) AS pos,
         {TD.read_base_sql('p', 'contig', 'okey')} AS base,
         {TD.ref_base_sql('p', 'contig')} AS ref,
         {TD.qual_sql('p', 'okey')} AS q
  FROM pb WHERE {where}
),
cnts AS (
  SELECT contig, pos, ref, base, COUNT(*) AS cnt
  FROM pb2 GROUP BY contig, pos, ref, base
)
"""


def _indel_base_cte(
    where: str = "TRUE",
    o_range: str = "range(0, n)",
    block_where: str = "TRUE",
) -> str:
    """DuckDB per-base expansion for the mixed-CIGAR reads: aligned blocks
    are derived arithmetically per CIGAR shape (kind), bases from the
    0-based query offset — fully independent of the Spark CIGAR fold.

    ``o_range``/``block_where`` let the windowed sf1 oracle clip the
    per-block offset expansion to a base window BEFORE the UNNEST while
    sharing this one iblocks derivation (a drifting copy here would make
    the sf1 oracle silently validate different semantics than sf0.01)."""
    return f"""
iblocks AS (
  SELECT contig, okey, pos_start AS s,
         CASE kind WHEN 1 THEN 5 ELSE 0 END AS q,
         CASE kind WHEN 0 THEN qlen WHEN 1 THEN qlen - 10 ELSE a END AS n
  FROM reads_indel
  UNION ALL
  SELECT contig, okey,
         CASE kind WHEN 2 THEN pos_start + a + d ELSE pos_start + a END AS s,
         CASE kind WHEN 2 THEN a ELSE a + ins END AS q,
         CASE kind WHEN 2 THEN qlen - a ELSE qlen - a - ins END AS n
  FROM reads_indel WHERE kind = 2 OR kind = 3
),
ipb AS (
  SELECT contig, okey, s, q, UNNEST({o_range}) AS o
  FROM iblocks WHERE {block_where}
),
ipb2 AS (
  SELECT contig, CAST(s + o AS INT) AS pos,
         {TD.indel_base_sql('(q + o)', 'okey')} AS base,
         {TD.ref_base_sql('(s + o)', 'contig')} AS ref
  FROM ipb
),
icnts AS (
  SELECT contig, pos, ref, base, COUNT(*) AS cnt
  FROM ipb2 WHERE {where} GROUP BY contig, pos, ref, base
)
"""


_PILEUP_DIGEST_TAIL = """,
pos_level AS (
  SELECT contig, pos,
         SUM(cnt) AS coverage,
         SUM(CASE WHEN base = ref THEN cnt ELSE 0 END) AS cref,
         SUM(CASE WHEN base <> ref THEN cnt ELSE 0 END) AS cnonref
  FROM {cnts} GROUP BY contig, pos
)
SELECT contig,
       CAST(COUNT(*) AS BIGINT) AS n_pos,
       CAST(SUM(coverage) AS BIGINT) AS sum_cov,
       CAST(SUM(cref) AS BIGINT) AS sum_ref,
       CAST(SUM(cnonref) AS BIGINT) AS sum_nonref,
       CAST(SUM(CASE WHEN cnonref > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_alt_pos
FROM pos_level GROUP BY contig
"""


def windowed_digest_oracles() -> dict[str, dict]:
    """Per-(contig, base-window) slices of the pileup-family DIGEST oracles,
    for scale factors where one oracle pass exhausts single-node DuckDB (the
    per-base expansion at sf1): each window expands ONLY the bases landing
    in [lo, hi] (reads pruned by overlap BEFORE the UNNEST, offset ranges
    clipped to the window), and the per-contig digest rows merge additively
    across disjoint windows (COUNT/SUM over positions, each position in
    exactly one window).  tools/sweep.py --duck-windowed consumes this:
    external-oracle value fidelity for pileup_agg / pileup_indels at sf1,
    replacing the same-engine dense-vs-sparse crosscheck (VERDICT r8 gap #2;
    reference samtools-oracle pattern: tests/pileup/SamtoolsTestSuite.scala).

    Each entry: ``extent_sql`` -> (contig, lo, hi) rows enumerating the
    windowable domain, ``window_sql(contig, lo, hi)`` -> digest slice with
    the same column names as the Spark query."""
    cte = TD.duck_cte

    def agg_window(c: str, lo: int, hi: int) -> str:
        base = f"""
pb AS (
  SELECT contig, okey,
         UNNEST(range(GREATEST(pos_start, {lo}), LEAST(pos_end, {hi}) + 1)) AS p
  FROM reads
  WHERE contig = '{c}' AND pos_start <= {hi} AND pos_end >= {lo}
),
pb2 AS (
  SELECT contig, CAST(p AS INT) AS pos,
         {TD.read_base_sql('p', 'contig', 'okey')} AS base,
         {TD.ref_base_sql('p', 'contig')} AS ref
  FROM pb
),
cnts AS (
  SELECT contig, pos, ref, base, COUNT(*) AS cnt
  FROM pb2 GROUP BY contig, pos, ref, base
)
"""
        return (
            f"{cte('reads')}, {base}"
            + _PILEUP_DIGEST_TAIL.format(cnts="cnts")
        )

    def indels_window(c: str, lo: int, hi: int) -> str:
        # shared iblocks derivation (_indel_base_cte); the window clips the
        # per-block offset range so pos = s + o stays in [lo, hi] while o
        # keeps its ABSOLUTE query-offset meaning for base attribution
        base = _indel_base_cte(
            o_range=f"range(GREATEST({lo} - s, 0), LEAST(n, {hi} - s + 1))",
            block_where=f"contig = '{c}' AND s <= {hi} AND s + n > {lo}",
        )
        return (
            f"{cte('reads_indel')}, {base}"
            + _PILEUP_DIGEST_TAIL.format(cnts="icnts")
        )

    return {
        "pileup_agg": {
            "extent_sql": (
                f"{TD.duck_cte('reads')} SELECT contig, MIN(pos_start), "
                "MAX(pos_end) FROM reads GROUP BY contig ORDER BY contig"
            ),
            "window_sql": agg_window,
        },
        "pileup_indels": {
            "extent_sql": (
                f"{TD.duck_cte('reads_indel')} SELECT contig, MIN(pos_start), "
                "MAX(pos_end) FROM reads_indel GROUP BY contig ORDER BY contig"
            ),
            "window_sql": indels_window,
        },
    }


def _llm_oracles() -> dict[str, str]:
    """DuckDB replicas of the LLM-pipeline operators (deterministic
    arithmetic shared with sequila_spark.operators.dedup/similarity/text)."""
    from sequila_spark.operators import dedup as DD
    from sequila_spark.operators import sampling as SP
    from sequila_spark.operators import similarity as SIM
    from sequila_spark.operators import text as TX

    _, duck_shingles = DD.shingle_hash_exprs("text")
    P = DD.MINHASH_P

    sh_cte = f"""
sh AS (
  SELECT DISTINCT doc_id, UNNEST({duck_shingles}) AS sh FROM documents
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS id_1, b.doc_id AS id_2, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
jac AS (
  SELECT id_1, id_2,
         CAST(c AS DOUBLE) / (s1.n + s2.n - c) AS jaccard
  FROM shared
  JOIN sizes s1 ON s1.doc_id = id_1
  JOIN sizes s2 ON s2.doc_id = id_2
)
"""

    mh_cols = ", ".join(
        f"MIN(({DD.PERM_A[i]} * (sh % {P}) + {DD.PERM_B[i]}) % {P}) AS mh{i}"
        for i in range(DD.NUM_PERM)
    )
    band_selects = " UNION ALL ".join(
        "SELECT {b} AS band, {key} AS bkey, doc_id FROM sig".format(
            b=b,
            key=" || ',' || ".join(
                f"CAST(mh{b * DD.ROWS_PER_BAND + r} AS STRING)"
                for r in range(DD.ROWS_PER_BAND)
            ),
        )
        for b in range(DD.BANDS)
    )

    bit_sums = ", ".join(
        f"SUM(CASE WHEN (sh >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(DD.SIMHASH_BITS)
    )
    simhash_value = " + ".join(
        f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(DD.SIMHASH_BITS)
    )

    quant = (
        "list_transform(embedding, x -> "
        f"CAST(FLOOR(CAST(x AS DOUBLE) * {SIM.QUANT_SCALE}) AS BIGINT))"
    )
    cosine = (
        "CAST(list_sum(list_transform(range(1, len(qv) + 1), i -> qv[i] * cv[i])) AS DOUBLE)"
        " / (sqrt(CAST(list_sum(list_transform(qv, x -> x * x)) AS DOUBLE))"
        " * sqrt(CAST(list_sum(list_transform(cv, x -> x * x)) AS DOUBLE)))"
    )
    topk_tail = f"""
scored AS (
  SELECT query_id, neighbor_id, {cosine} AS cosine
  FROM q CROSS JOIN c
  WHERE query_id <> neighbor_id
)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""

    half = (SIM._PLANE_MOD - 1) // 2

    def bucket_expr(table: int) -> str:
        return " + ".join(
            "(CASE WHEN list_sum(list_transform(range(1, len(v) + 1), "
            f"i -> v[i] * ((({(table * SIM.N_PLANES + p)} * 997 + (i - 1)) * 2654435761)"
            f" % {SIM._PLANE_MOD} - {half})"
            f")) > 0 THEN {1 << p} ELSE 0 END)"
            for p in range(SIM.N_PLANES)
        )

    bucket_cols = ", ".join(
        f"CAST({bucket_expr(t)} AS BIGINT) AS bkt{t}" for t in range(SIM.N_TABLES)
    )
    cand_union = " UNION ".join(
        f"SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id "
        f"FROM eb q JOIN eb c ON q.bkt{t} = c.bkt{t} "
        f"WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id"
        for t in range(SIM.N_TABLES)
    )
    dup_cand_union = " UNION ".join(
        f"SELECT a.vec_id AS id_1, b.vec_id AS id_2 "
        f"FROM eb a JOIN eb b ON a.bkt{t} = b.bkt{t} "
        f"WHERE a.vec_id < b.vec_id"
        for t in range(SIM.N_TABLES)
    )
    l2 = (
        "list_sum(list_transform(range(1, len({a}) + 1),"
        " i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])))"
    )

    # text features
    occ = TX.occurrences_sql
    tokens = "len(string_split_regex(trim(text), '\\s+'))"
    n = "LENGTH(text)"
    n_nospace = "LENGTH(regexp_replace(text, '\\s', '', 'g'))"
    n_alpha = "LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g'))"
    n_digit = "LENGTH(regexp_replace(text, '[^0-9]', '', 'g'))"
    stop_hits = " + ".join(
        occ("(' ' || LOWER(text) || ' ')", f" {w} ") for w in ("the", "a", "of", "and")
    )
    punct_ratio = f"CAST(({n_nospace} - {n_alpha} - {n_digit}) AS DOUBLE) / {n}"
    digit_ratio = f"CAST({n_digit} AS DOUBLE) / {n}"
    stop_ratio = f"CAST(({stop_hits}) AS DOUBLE) / ({tokens})"
    quality = f"(((0.5 + ({stop_ratio}) * 2.0) - ({punct_ratio}) * 1.0) - ({digit_ratio}) * 1.0)"
    bpe_pat = TX.TOKEN_PATTERN  # single-quoted SQL string: backslashes pass through
    fp_shingle = (
        "list_min(list_transform(range(1, greatest(length(text) - 15, 1) + 1),"
        " i -> md5(substr(text, CAST(i AS INT), 16))))"
    )

    hist_cols = ", ".join(
        f"SUM(CASE WHEN code % {16} = {k} THEN 1 ELSE 0 END) AS h{k}" for k in range(16)
    )
    hist_str = " || ',' || ".join(f"CAST(h{k} AS STRING)" for k in range(16))

    return {
        "dedup_exact": """
            WITH corpus AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text FROM documents
            )
            SELECT md5(text) AS content_hash,
                   CAST(COUNT(*) AS BIGINT) AS n_copies,
                   MIN(doc_id) AS rep_id
            FROM corpus GROUP BY md5(text) HAVING COUNT(*) > 1
        """,
        "dedup_ngram_jaccard": f"""
            WITH {sh_cte}
            SELECT id_1, id_2, jaccard FROM jac WHERE jaccard >= 0.8
        """,
        "dedup_minhash_pairs": f"""
            WITH {sh_cte},
            sig AS (SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id),
            bands AS ({band_selects}),
            cands AS (
              SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
            )
            SELECT j.id_1, j.id_2, j.jaccard
            FROM jac j JOIN cands USING (id_1, id_2)
            WHERE j.jaccard >= 0.8
        """,
        "dedup_clusters": f"""
            WITH RECURSIVE {sh_cte},
            sig AS (SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id),
            bands AS ({band_selects}),
            cands AS (
              SELECT DISTINCT a.doc_id AS id_1, b.doc_id AS id_2
              FROM bands a JOIN bands b
                ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
            ),
            pairs AS (
              SELECT j.id_1, j.id_2
              FROM jac j JOIN cands USING (id_1, id_2)
              WHERE j.jaccard >= 0.8
            ),
            e AS (
              SELECT id_1 AS a, id_2 AS b FROM pairs
              UNION
              SELECT id_2 AS a, id_1 AS b FROM pairs
            ),
            reach AS (
              SELECT a AS src, a AS node FROM (SELECT DISTINCT a FROM e) __n
              UNION
              SELECT r.src, e.b AS node FROM reach r JOIN e ON e.a = r.node
            )
            SELECT src AS id, MIN(node) AS rep_id FROM reach GROUP BY src
        """,
        "dedup_simhash": f"""
            WITH sh AS (
              SELECT DISTINCT doc_id, UNNEST({duck_shingles}) AS sh FROM documents
            ),
            bits AS (SELECT doc_id, {bit_sums} FROM sh GROUP BY doc_id)
            SELECT doc_id, CAST({simhash_value} AS INT) AS simhash FROM bits
        """,
        "docs_split": f"""
            WITH b AS (
              SELECT doc_id, {SP.hash_bucket_sql('doc_id')} AS bkt
              FROM documents
            ),
            s AS (
              SELECT doc_id,
                     CASE WHEN bkt < 9000 THEN 'train'
                          WHEN bkt < 9500 THEN 'valid'
                          ELSE 'test' END AS split
              FROM b
            )
            SELECT split, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(doc_id) AS BIGINT) AS sum_ids
            FROM s GROUP BY split
        """,
        "events_stratified": f"""
            WITH b AS (
              SELECT event_type, event_id, {SP.hash_bucket_sql('event_id')} AS bkt
              FROM events
            ),
            k AS (
              SELECT * FROM b
              WHERE bkt < CASE event_type WHEN 'view' THEN 1000
                                          WHEN 'click' THEN 5000
                                          WHEN 'purchase' THEN 10000
                                          ELSE 2000 END
            )
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(event_id) AS BIGINT) AS sum_ids
            FROM k GROUP BY event_type
        """,
        "similarity_topk": f"""
            WITH q AS (
              SELECT vec_id AS query_id, {quant} AS qv
              FROM embeddings WHERE vec_id % 50 = 0
            ),
            c AS (SELECT vec_id AS neighbor_id, {quant} AS cv FROM embeddings),
            {topk_tail}
        """,
        "similarity_ann_lsh": f"""
            WITH e AS (
              SELECT vec_id, {quant} AS v FROM embeddings
            ),
            eb AS (SELECT vec_id, v, {bucket_cols} FROM e),
            cand AS ({cand_union}),
            scored AS (
              SELECT query_id, neighbor_id, {cosine} AS cosine
              FROM cand
              JOIN (SELECT vec_id, v AS qv FROM e) q ON q.vec_id = cand.query_id
              JOIN (SELECT vec_id, v AS cv FROM e) c ON c.vec_id = cand.neighbor_id
            )
            SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
              FROM scored
            ) WHERE rank <= 5
        """,
        "dedup_embedding": f"""
            WITH e AS (
              SELECT vec_id, {quant} AS v FROM embeddings
            ),
            eb AS (SELECT vec_id, v, {bucket_cols} FROM e),
            cand AS ({dup_cand_union}),
            pairs AS (
              SELECT id_1, id_2, a.v AS qv, b.v AS cv
              FROM cand
              JOIN e a ON a.vec_id = cand.id_1
              JOIN e b ON b.vec_id = cand.id_2
            )
            SELECT id_1, id_2, cosine FROM (
              SELECT id_1, id_2, {cosine} AS cosine FROM pairs
            ) WHERE cosine >= 0.4
        """,
        "similarity_ivf": f"""
            WITH e AS (
              SELECT vec_id, {quant} AS v FROM embeddings
            ),
            seeds AS (
              SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list_id, v AS c
              FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {SIM.IVF_LISTS})
            ),
            assign AS (
              SELECT id, list_id, v FROM (
                SELECT e.vec_id AS id, s.list_id, e.v,
                       row_number() OVER (
                         PARTITION BY e.vec_id
                         ORDER BY {l2.format(a='e.v', b='s.c')}, s.list_id
                       ) AS rk
                FROM e CROSS JOIN seeds s
              ) WHERE rk = 1
            ),
            q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id % 50 = 0),
            probes AS (
              SELECT query_id, qv, list_id FROM (
                SELECT q.query_id, q.qv, s.list_id,
                       row_number() OVER (
                         PARTITION BY q.query_id
                         ORDER BY {l2.format(a='q.qv', b='s.c')}, s.list_id
                       ) AS rk
                FROM q CROSS JOIN seeds s
              ) WHERE rk <= {SIM.IVF_PROBES}
            ),
            cand AS (
              SELECT p.query_id, a.id AS neighbor_id, p.qv, a.v AS cv
              FROM probes p JOIN assign a ON p.list_id = a.list_id
              WHERE p.query_id <> a.id
            ),
            scored AS (SELECT query_id, neighbor_id, {cosine} AS cosine FROM cand)
            SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, cosine FROM (
              SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
              FROM scored
            ) WHERE rank <= 5
        """,
        "text_features": f"""
            SELECT doc_id,
                   CAST({tokens} AS INT) AS ws_tokens,
                   CAST(len(regexp_extract_all(text, '{bpe_pat}')) AS INT) AS bpe_tokens,
                   {quality} AS quality,
                   {TX.lang_id_sql('text')} AS lang_pred,
                   md5(text) AS fp_md5,
                   {fp_shingle} AS fp_shingle
            FROM documents
        """,
        "multimodal_byte_features": f"""
            WITH pc AS (
              SELECT doc_id, text, UNNEST(range(1, length(text) + 1)) AS i FROM documents
            ),
            codes AS (
              SELECT doc_id, ascii(substr(text, CAST(i AS INT), 1)) AS code FROM pc
            ),
            agg AS (
              SELECT doc_id,
                     CAST(COUNT(*) AS INT) AS byte_len,
                     CAST(SUM(code) % 2147483647 AS BIGINT) AS checksum,
                     {hist_cols}
              FROM codes GROUP BY doc_id
            )
            SELECT doc_id, byte_len, checksum, {hist_str} AS hist_str FROM agg
        """,
    }


def oracle_sql() -> dict[str, str]:
    cte = TD.duck_cte
    return {
        "feature_counts": f"""
            {cte('reads', 'targets')}
            SELECT t.target_id AS target_id, COUNT(*) AS read_count
            FROM reads r JOIN targets t ON {_OVERLAP_ON}
            GROUP BY t.target_id
        """,
        "range_join_pairs": f"""
            {cte('reads', 'targets')}
            SELECT r.qname AS qname, t.target_id AS target_id,
                   CAST(LEAST(r.pos_end, t.pos_end) - GREATEST(r.pos_start, t.pos_start) + 1 AS INT)
                     AS overlap_len
            FROM reads r JOIN targets t ON {_OVERLAP_ON}
        """,
        "range_join_minoverlap": f"""
            {cte('reads', 'targets')}
            SELECT r.qname AS qname, t.target_id AS target_id
            FROM reads r JOIN targets t ON {_OVERLAP_ON}
              AND LEAST(r.pos_end, t.pos_end) - GREATEST(r.pos_start, t.pos_start) + 1 >= 100
        """,
        "range_join_maxgap": f"""
            {cte('reads', 'targets')}
            SELECT r.qname AS qname, t.target_id AS target_id
            FROM reads r JOIN targets t ON r.contig = t.contig
              AND r.pos_start <= t.pos_end + 1000 AND r.pos_end >= t.pos_start - 1000
        """,
        "range_join_long": f"""
            {cte('longreads', 'targets')}
            SELECT l.qname AS qname, t.target_id AS target_id
            FROM longreads l JOIN targets t ON l.contig = t.contig
              AND l.pos_start <= t.pos_end AND l.pos_end >= t.pos_start
        """,
        "pileup_mdbam": f"""
            SELECT contig, pos, ref, coverage, "countRef", "countNonRef", alts_str
            FROM read_parquet('{_MDBAM_FIX}/golden_pileup.parquet/*.parquet')
        """,
        "pileup_md_mismatches": f"""
            SELECT contig, pos, ref, coverage, "countRef", "countNonRef", alts_str
            FROM read_parquet('{_MDBAM_FIX}/golden_pileup.parquet/*.parquet')
            WHERE "countNonRef" > 0
        """,
        "pileup_convert_compare": f"""
            SELECT contig, pos, ref, coverage, "countRef", "countNonRef", alts_str
            FROM read_parquet('{_MDBAM_FIX}/golden_pileup.parquet/*.parquet')
        """,
        "cram_decode": f"""
            SELECT r.* FROM
              read_parquet('{_SLICEBAM_FIX}/reads.parquet/*.parquet') r
              CROSS JOIN range({_cram_oracle_copies()})
        """,
        "range_join_semi": f"""
            {cte('reads', 'targets')}
            SELECT t.target_id AS target_id, t.contig AS contig,
                   t.pos_start AS pos_start, t.pos_end AS pos_end
            FROM targets t WHERE EXISTS (
              SELECT 1 FROM reads r WHERE {_OVERLAP_ON}
            )
        """,
        "interval_ops": f"""
            {cte('targets')}
            SELECT target_id,
              pos_start + 5 AS shift_start, pos_end + 5 AS shift_end,
              (pos_start + CAST(FLOOR((pos_end - pos_start) / 2) AS INT))
                - (CAST(FLOOR((pos_end - pos_start) / 2) AS INT) + 4) AS resize_start,
              (pos_start + CAST(FLOOR((pos_end - pos_start) / 2) AS INT))
                + (CAST(FLOOR((pos_end - pos_start) / 2) AS INT) + 3) AS resize_end,
              pos_start - 100 AS flank_start, pos_start - 1 AS flank_end,
              pos_start - 2000 AS prom_start, pos_start + 200 - 1 AS prom_end,
              2 * 1 + (200000 - 1) - pos_end AS refl_start,
              2 * 1 + (200000 - 1) - pos_end + (pos_end - pos_start) AS refl_end,
              pos_end + 10 AS rs_end,
              pos_start - 10 AS re_start,
              pos_start - 50 AS fb_start,
              pos_start - 50 + 100 - 1 AS fb_end,
              pos_end - 50 + 1 AS fn_start,
              pos_end - 50 + 1 + 50 - 1 AS fn_end,
              CAST(LEAST(pos_end, 60000) - GREATEST(pos_start, 40000) + 1 AS INT) AS ov_probe,
              contig AS cleaned,
              'MT' AS m_case,
              'chr' || contig AS unclean
            FROM targets
        """,
        "targets_merged": f"""
            {cte('targets')},
            o AS (
              SELECT *, MAX(pos_end) OVER (PARTITION BY contig ORDER BY pos_start, pos_end
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
              FROM targets
            ),
            f AS (
              SELECT *, CASE WHEN prev_max IS NULL OR pos_start > prev_max + 1
                             THEN 1 ELSE 0 END AS brk
              FROM o
            ),
            g AS (
              SELECT *, SUM(brk) OVER (PARTITION BY contig ORDER BY pos_start, pos_end
                        ROWS UNBOUNDED PRECEDING) AS island
              FROM f
            )
            SELECT contig,
                   CAST(MIN(pos_start) AS INT) AS pos_start,
                   CAST(MAX(pos_end) AS INT) AS pos_end,
                   CAST(COUNT(*) AS BIGINT) AS n_intervals
            FROM g GROUP BY contig, island
        """,
        "read_filter": f"""
            {cte('reads')}
            SELECT qname, contig, pos_start, pos_end, flag, mapq
            FROM reads
            WHERE contig IS NOT NULL AND contig <> '' AND pos_start <= pos_end
              AND (flag & 1796) = 0 AND mapq >= 20
        """,
        "coverage_blocks": f"""
            {cte('reads')}, {_COVERAGE_BLOCKS_CTE}
            SELECT 'span' AS walk, contig, pos_start, pos_end, coverage
            FROM blocks
            UNION ALL
            SELECT 'cigar' AS walk, contig, pos_start, pos_end, coverage
            FROM blocks
        """,
        "coverage_bases_agg": f"""
            {cte('reads')}, {_COVERAGE_BLOCKS_CTE}
            SELECT contig,
                   CAST(SUM(pos_end - pos_start + 1) AS BIGINT) AS covered_positions,
                   CAST(SUM(CAST(coverage AS BIGINT) * (pos_end - pos_start + 1)) AS BIGINT) AS total_depth,
                   CAST(MAX(coverage) AS INT) AS max_cov
            FROM blocks GROUP BY contig
        """,
        "coverage_windows": f"""
            {cte('reads')}, {_COVERAGE_BLOCKS_CTE},
            exploded AS (
              SELECT contig, pos_start, pos_end, coverage,
                     UNNEST(range(CAST(FLOOR((pos_start - 1) / 1000) AS BIGINT),
                                  CAST(FLOOR((pos_end - 1) / 1000) AS BIGINT) + 1)) AS win
              FROM blocks
            ),
            per_win AS (
              SELECT contig, win,
                     LEAST(pos_end, (win + 1) * 1000)
                       - GREATEST(pos_start, win * 1000 + 1) + 1 AS ov,
                     coverage
              FROM exploded
            )
            SELECT contig,
                   CAST(win * 1000 + 1 AS INT) AS pos_start,
                   CAST((win + 1) * 1000 AS INT) AS pos_end,
                   CAST(SUM(CAST(coverage AS BIGINT) * ov) AS DOUBLE) / 1000 AS avg_cov
            FROM per_win GROUP BY contig, win
        """,
        "coverage_filtered": f"""
            WITH reads0 AS ({TD.READS_SQL}),
            reads AS (
              SELECT * FROM reads0
              WHERE contig IS NOT NULL AND contig <> '' AND pos_start <= pos_end
                AND (flag & 1796) = 0 AND mapq >= 20
            ), {_COVERAGE_BLOCKS_CTE}
            SELECT contig, pos_start, pos_end, coverage FROM blocks
        """,
        "grange_tvf": f"""
            {cte('targets')}
            SELECT target_id, contig, pos_start, pos_end
            FROM targets
            WHERE contig = '3' AND pos_start <= 40000 AND pos_end >= 10000
        """,
        "distinct_samples": f"""
            {cte('reads')}
            SELECT DISTINCT sample_id FROM reads
        """,
        "pileup_slice": f"""
            {cte('reads')}, {_pileup_base_cte("contig = '1' AND p BETWEEN 1 AND 20000", prune=('1', 1, 20000))}
            SELECT contig, pos AS pos_start, pos AS pos_end, ref,
                   CAST(SUM(cnt) AS INT) AS coverage,
                   CAST(SUM(CASE WHEN base = ref THEN cnt ELSE 0 END) AS INT) AS "countRef",
                   CAST(SUM(CASE WHEN base <> ref THEN cnt ELSE 0 END) AS INT) AS "countNonRef",
                   STRING_AGG(CASE WHEN base <> ref THEN base || ':' || CAST(cnt AS STRING) END,
                              '|' ORDER BY base) AS alts_str
            FROM cnts GROUP BY contig, pos, ref
        """,
        "pileup_agg": f"""
            {cte('reads')}, {_pileup_base_cte()},
            pos_level AS (
              SELECT contig, pos,
                     SUM(cnt) AS coverage,
                     SUM(CASE WHEN base = ref THEN cnt ELSE 0 END) AS cref,
                     SUM(CASE WHEN base <> ref THEN cnt ELSE 0 END) AS cnonref
              FROM cnts GROUP BY contig, pos
            )
            SELECT contig,
                   CAST(COUNT(*) AS BIGINT) AS n_pos,
                   CAST(SUM(coverage) AS BIGINT) AS sum_cov,
                   CAST(SUM(cref) AS BIGINT) AS sum_ref,
                   CAST(SUM(cnonref) AS BIGINT) AS sum_nonref,
                   CAST(SUM(CASE WHEN cnonref > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_alt_pos
            FROM pos_level GROUP BY contig
        """,
        "pileup_quals_slice": f"""
            {cte('reads')}, {_pileup_base_cte("contig = '2' AND p BETWEEN 1 AND 10000", prune=('2', 1, 10000))},
            qc AS (
              SELECT contig, pos, ref, base, q, COUNT(*) AS n
              FROM pb2 GROUP BY contig, pos, ref, base, q
            ),
            hist AS (
              SELECT contig, pos, ref, base,
                     STRING_AGG(CAST(q AS STRING) || '=' || CAST(n AS STRING), ',' ORDER BY q) AS h,
                     SUM(n) AS bn
              FROM qc GROUP BY contig, pos, ref, base
            )
            SELECT contig, pos AS pos_start, ref,
                   CAST(SUM(bn) AS INT) AS coverage,
                   STRING_AGG(base || ':' || h, '|' ORDER BY base) AS quals_str
            FROM hist GROUP BY contig, pos, ref
        """,
        "pileup_quals_binned": f"""
            {cte('reads')}, {_pileup_base_cte("contig = '4' AND p BETWEEN 1 AND 10000", prune=('4', 1, 10000))},
            qc AS (
              SELECT contig, pos, base, CAST(FLOOR(q / 10) AS INT) AS qb, COUNT(*) AS n
              FROM pb2 GROUP BY contig, pos, base, CAST(FLOOR(q / 10) AS INT)
            ),
            hist AS (
              SELECT contig, pos, base,
                     STRING_AGG(CAST(qb AS STRING) || '=' || CAST(n AS STRING), ',' ORDER BY qb) AS h,
                     SUM(n) AS bn
              FROM qc GROUP BY contig, pos, base
            )
            SELECT contig, pos AS pos_start,
                   CAST(SUM(bn) AS INT) AS coverage,
                   STRING_AGG(base || ':' || h, '|' ORDER BY base) AS quals_str
            FROM hist GROUP BY contig, pos
        """,
        "pileup_indels": f"""
            {cte('reads_indel')}, {_indel_base_cte()},
            pos_level AS (
              SELECT contig, pos,
                     SUM(cnt) AS coverage,
                     SUM(CASE WHEN base = ref THEN cnt ELSE 0 END) AS cref,
                     SUM(CASE WHEN base <> ref THEN cnt ELSE 0 END) AS cnonref
              FROM icnts GROUP BY contig, pos
            )
            SELECT contig,
                   CAST(COUNT(*) AS BIGINT) AS n_pos,
                   CAST(SUM(coverage) AS BIGINT) AS sum_cov,
                   CAST(SUM(cref) AS BIGINT) AS sum_ref,
                   CAST(SUM(cnonref) AS BIGINT) AS sum_nonref,
                   CAST(SUM(CASE WHEN cnonref > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_alt_pos
            FROM pos_level GROUP BY contig
        """,
        "pileup_indels_slice": f"""
            {cte('reads_indel')}, {_indel_base_cte("contig = '3' AND pos BETWEEN 1 AND 20000")}
            SELECT contig, pos AS pos_start, pos AS pos_end, ref,
                   CAST(SUM(cnt) AS INT) AS coverage,
                   CAST(SUM(CASE WHEN base = ref THEN cnt ELSE 0 END) AS INT) AS "countRef",
                   CAST(SUM(CASE WHEN base <> ref THEN cnt ELSE 0 END) AS INT) AS "countNonRef",
                   STRING_AGG(CASE WHEN base <> ref THEN base || ':' || CAST(cnt AS STRING) END,
                              '|' ORDER BY base) AS alts_str
            FROM icnts GROUP BY contig, pos, ref
        """,
        "pileup_blocks_slice": f"""
            {cte('reads_indel')}, {_indel_base_cte("contig = '2' AND pos BETWEEN 1 AND 30000")},
            pos_level AS (
              SELECT contig, pos, ref,
                     CAST(SUM(cnt) AS INT) AS cov,
                     CAST(SUM(CASE WHEN base <> ref THEN cnt ELSE 0 END) AS INT) AS cnonref,
                     STRING_AGG(CASE WHEN base <> ref THEN base || ':' || CAST(cnt AS STRING) END,
                                '|' ORDER BY base) AS alts_str
              FROM icnts GROUP BY contig, pos, ref
            ),
            lagged AS (
              SELECT *, CASE WHEN cnonref > 0 THEN 1 ELSE 0 END AS is_alt,
                     LAG(pos) OVER w AS prev_pos,
                     LAG(cov) OVER w AS prev_cov,
                     LAG(CASE WHEN cnonref > 0 THEN 1 ELSE 0 END) OVER w AS prev_alt
              FROM pos_level
              WINDOW w AS (PARTITION BY contig ORDER BY pos)
            ),
            runs AS (
              SELECT *, SUM(CASE WHEN prev_pos IS NULL OR pos <> prev_pos + 1
                                   OR cov <> prev_cov OR is_alt = 1 OR prev_alt = 1
                                 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY contig ORDER BY pos) AS run
              FROM lagged
            )
            SELECT contig,
                   CAST(MIN(pos) AS INT) AS pos_start,
                   CAST(MAX(pos) AS INT) AS pos_end,
                   STRING_AGG(ref, '' ORDER BY pos) AS ref,
                   CAST(MIN(cov) AS INT) AS coverage,
                   MAX(alts_str) AS alts_str
            FROM runs GROUP BY contig, run
        """,
        **_llm_oracles(),
        "events_window_agg": """
            WITH e AS (
              SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type, user_id, value
              FROM events
            )
            SELECT CAST((us // 3600000000) * 3600 AS BIGINT) AS win_start_s,
                   CAST(((us // 3600000000) + 1) * 3600 AS BIGINT) AS win_end_s,
                   event_type,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
            FROM e GROUP BY us // 3600000000, event_type
        """,
        "events_sessionize": """
            WITH e AS (
              SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events
            ),
            l AS (
              SELECT *, LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
              FROM e
            ),
            b AS (
              SELECT *, CASE WHEN prev IS NULL THEN 0
                             WHEN us - prev > 1800000000 THEN 1 ELSE 0 END AS is_new
              FROM l
            ),
            s AS (
              SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                          ROWS UNBOUNDED PRECEDING) AS session_no
              FROM b
            )
            SELECT user_id,
                   CAST(session_no AS BIGINT) AS session_no,
                   CAST(MIN(us) // 1000000 AS BIGINT) AS session_start_s,
                   CAST(MAX(us) // 1000000 AS BIGINT) AS session_end_s,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM s GROUP BY user_id, session_no
        """,
        "reads_window_counts": f"""
            {cte('reads')}
            SELECT contig,
                   CAST(FLOOR((pos_start - 1) / 10000) AS BIGINT) AS win,
                   CAST(COUNT(*) AS BIGINT) AS n_reads
            FROM reads GROUP BY contig, CAST(FLOOR((pos_start - 1) / 10000) AS BIGINT)
        """,
        # tests/fixtures/test.bed transcribed BY EYE (header lines skipped,
        # 0-based starts +1, chr prefixes cleaned; contig_unclean re-renders)
        "bed_features": """
            SELECT * FROM (VALUES
              ('1', 101, 200, 'feat1', 960, '+', 100, 200,
               '[255,0,0]', 2, '[10,20]', '[0,80]', 'chr1'),
              ('2', 1, 50, NULL, NULL, NULL, NULL, NULL,
               CAST(NULL AS VARCHAR), NULL, CAST(NULL AS VARCHAR),
               CAST(NULL AS VARCHAR), 'chr2'),
              ('MT', 11, 30, 'mito', NULL, NULL, NULL, NULL,
               CAST(NULL AS VARCHAR), NULL, CAST(NULL AS VARCHAR),
               CAST(NULL AS VARCHAR), 'chrM')
            ) AS t(contig, pos_start, pos_end, name, score, strand,
                   thick_start, thick_end, item_rgb, block_count,
                   block_sizes, block_starts, contig_unclean)
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
                   CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "orders_analytics": """
            WITH per_order AS (
              SELECT r_name, n_name, o_orderkey,
                     CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS order_cents,
                     COUNT(*) AS n_i
              FROM lineitem
              JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY r_name, n_name, o_orderkey
            ),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY r_name, n_name
                ORDER BY order_cents DESC, o_orderkey) AS rk
              FROM per_order
            )
            SELECT r_name, n_name,
                   CAST(SUM(order_cents) AS BIGINT) AS revenue_cents,
                   CAST(SUM(n_i) AS BIGINT) AS n_items,
                   CAST(MAX(CASE WHEN rk = 1 THEN o_orderkey END) AS BIGINT) AS top_orderkey,
                   CAST(MAX(CASE WHEN rk = 1 THEN order_cents END) AS BIGINT) AS top_order_cents
            FROM ranked GROUP BY r_name, n_name
        """,
        # Hand-transcribed from vcf/test.vcf (5 sites x 3 samples) — the
        # oracle is the file read BY EYE, independent of the parser.
        "vcf_genotypes": """
            SELECT * FROM (VALUES
              ('20', 14370,   'G',   'A',      'NA00001', TRUE,  '0/0', 48, 1, '51,51'),
              ('20', 14370,   'G',   'A',      'NA00002', TRUE,  '1/0', 48, 8, '51,51'),
              ('20', 14370,   'G',   'A',      'NA00003', FALSE, '1/1', 43, 5, '.,.'),
              ('20', 17330,   'T',   'A',      'NA00001', TRUE,  '0/0', 49, 3, '58,50'),
              ('20', 17330,   'T',   'A',      'NA00002', TRUE,  '0/1', 3,  5, '65,3'),
              ('20', 17330,   'T',   'A',      'NA00003', FALSE, '0/0', 41, 3, NULL),
              ('20', 1110696, 'A',   'G,T',    'NA00001', TRUE,  '1/2', 21, 6, '23,27'),
              ('20', 1110696, 'A',   'G,T',    'NA00002', TRUE,  '2/1', 2,  0, '18,2'),
              ('20', 1110696, 'A',   'G,T',    'NA00003', FALSE, '2/2', 35, 4, NULL),
              ('20', 1230237, 'T',   '.',      'NA00001', TRUE,  '0/0', 54, 7, '56,60'),
              ('20', 1230237, 'T',   '.',      'NA00002', TRUE,  '0/0', 48, 4, '51,51'),
              ('20', 1230237, 'T',   '.',      'NA00003', FALSE, '0/0', 61, 2, NULL),
              ('20', 1234567, 'GTC', 'G,GTCT', 'NA00001', FALSE, '0/1', 35, 4, NULL),
              ('20', 1234567, 'GTC', 'G,GTCT', 'NA00002', FALSE, '0/2', 17, 2, NULL),
              ('20', 1234567, 'GTC', 'G,GTCT', 'NA00003', FALSE, '1/1', 40, 3, NULL)
            ) AS t(contig, pos_start, ref, alt_str, sample_id, phased,
                   calls_str, gq, dp, hq)
        """,
        "events_asof": """
            WITH p AS (
              SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts, event_id AS purchase_id
              FROM events WHERE event_type = 'purchase'
            ),
            v AS (
              SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts, event_id AS view_id
              FROM events WHERE event_type = 'view'
            )
            SELECT p.user_id, p.purchase_id, CAST(v.view_id AS BIGINT) AS view_id
            FROM p ASOF LEFT JOIN v
              ON p.user_id = v.user_id AND v.ts <= p.ts
        """,
        "events_pivot": """
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
                   CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
            FROM events GROUP BY user_id
        """,
        "events_rollup": """
            SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(CASE WHEN GROUPING(event_type) THEN 1 ELSE 0 END AS INT) AS g_type,
                   CAST(CASE WHEN GROUPING(user_id) THEN 1 ELSE 0 END AS INT) AS g_user
            FROM events GROUP BY ROLLUP (event_type, user_id)
        """,
        "events_props_json": """
            SELECT event_type,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
                   CAST(MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
                   CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
            FROM events GROUP BY event_type
        """,
    }

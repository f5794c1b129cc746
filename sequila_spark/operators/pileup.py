"""Pileup — per-position base counts, mismatch (alt) maps and base-quality
histograms.

Semantics match the reference's pileup TVF
(utvf/ResolveTableValuedFunctionsSeq.scala:88-109 surface;
pileup/model/Read.scala:56-69 + pileup/MDTagParser.scala:24-53 mismatch
counting; pileup/model/ReadSummary.scala:37-137 quality histograms;
pileup/PileupStrategy.scala:110-118 quality binning).  Deviations documented
in schemas.py: alts are ``map<string,int>`` keyed by 1-char base strings,
quals ``map<string, array<int>>`` indexed by (possibly binned) quality value.

Architecture.  The reference walks each read against the MD tag inside a
custom physical operator.  Here each read is exploded to per-base rows with
native expressions (sequence + substr — stays in whole-stage codegen), the
reference base comes from a joined reference relation (or an expression), and
everything else is two hash aggregations:

  g1 = groupBy(contig, pos, base [, qual_bin]).count()      -- map-side combine
  g2 = groupBy(contig, pos): coverage, countRef, countNonRef,
       alts = map of non-ref base counts, quals = base -> histogram array

At scale this is one shuffle keyed by genomic position — no driver state, no
partition-boundary fix-ups (shuffle alignment replaces
AlignmentsRDD.scala:148-236).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sequila_spark import schemas as S

RefExpr = Callable[[Column, Column], Column]  # (contig, pos) -> ref base


def expand_bases(reads: DataFrame, with_quals: bool = False) -> DataFrame:
    """Explode alignment rows into per-base rows (contig, pos, base [, qual]).

    Assumes seq aligns 1:1 from pos_start (gapless CIGAR, e.g. '100M' —
    indel-aware expansion goes through `aligned_blocks`-style offsets; the
    qual string is phred+33).  Native expressions only.
    """
    # Split once into a char array and posexplode — ~3x faster than
    # per-position substr (the split is one pass over the string; substr in
    # a sequence-explode re-scans).  slice() drops the regex's trailing
    # empty element.
    seq_chars = F.slice(F.split(F.col(S.SEQUENCE), "(?!^)"), 1, F.length(S.SEQUENCE))
    if with_quals:
        qual_chars = F.slice(F.split(F.col(S.BASEQ), "(?!^)"), 1, F.length(S.BASEQ))
        zipped = F.arrays_zip(seq_chars.alias("b"), qual_chars.alias("q"))
        out = reads.select(
            S.CONTIG, S.START, F.posexplode(zipped).alias("__i", "__bq")
        )
        return out.select(
            F.col(S.CONTIG),
            (F.col(S.START) + F.col("__i")).cast("int").alias("pos"),
            F.upper(F.col("__bq.b")).alias("base"),
            (F.ascii(F.col("__bq.q")) - 33).cast("int").alias("qual"),
        )
    out = reads.select(S.CONTIG, S.START, F.posexplode(seq_chars).alias("__i", "__b"))
    return out.select(
        F.col(S.CONTIG),
        (F.col(S.START) + F.col("__i")).cast("int").alias("pos"),
        F.upper(F.col("__b")).alias("base"),
    )


def pileup(
    reads: DataFrame,
    *,
    ref: DataFrame | RefExpr | None = None,
    alts: bool = True,
    quals: bool = False,
    max_qual: int = 40,
    qual_bin_size: int = 1,
    flag_mask: int = 0,
    min_mapq: int = 0,
) -> DataFrame:
    """Per-position pileup rows (pos_start == pos_end == pos), matching the
    pileup TVF's 4 overloads: coverage-only, +alts, +quals, +binSize.

    ``ref`` is either a relation (contig, pos, ref) or a deterministic
    expression builder (contig, pos) -> base.  When None, the most frequent
    base at each position is used as the reference proxy (no-FASTA mode).
    """
    from sequila_spark.operators.coverage import filter_reads

    if flag_mask or min_mapq:
        reads = filter_reads(reads, flag_mask=flag_mask, min_mapq=min_mapq)

    if not quals and callable(ref) and not isinstance(ref, DataFrame):
        return _pileup_sparse(reads, ref, alts)

    per_base = expand_bases(reads, with_quals=quals)

    if isinstance(ref, DataFrame):
        refd = ref.select(
            F.col(S.CONTIG).alias("__rc"), F.col("pos").alias("__rp"), F.col(S.REF).alias("__rb")
        )
        per_base = per_base.join(
            refd,
            (per_base[S.CONTIG] == refd["__rc"]) & (per_base["pos"] == refd["__rp"]),
            "left",
        ).select(per_base[S.CONTIG], "pos", "base", *(["qual"] if quals else []), F.col("__rb").alias("ref_base"))
    elif callable(ref):
        per_base = per_base.withColumn("ref_base", ref(F.col(S.CONTIG), F.col("pos")))
    else:
        per_base = per_base.withColumn("ref_base", F.lit(None).cast("string"))

    group1 = [S.CONTIG, "pos", "ref_base", "base"]
    if quals:
        nbins = max_qual // qual_bin_size + 1
        qb = F.least(
            (F.col("qual") / qual_bin_size).cast("int"), F.lit(nbins - 1)
        ).alias("qual_bin")
        g1 = per_base.groupBy(*group1, qb).agg(F.count("*").alias("cnt"))
        # per (pos, base): histogram array indexed by qual_bin
        hist = F.aggregate(
            F.collect_list(
                F.struct(F.col("qual_bin"), F.col("cnt").cast("int").alias("cnt"))
            ),
            F.array_repeat(F.lit(0), nbins),
            lambda acc, e: F.transform(
                acc,
                lambda v, i: F.when(i == e["qual_bin"], v + e["cnt"]).otherwise(v),
            ),
        )
        g1 = (
            g1.groupBy(S.CONTIG, "pos", "ref_base", "base")
            .agg(F.sum("cnt").alias("cnt"), hist.alias("hist"))
        )
    else:
        g1 = per_base.groupBy(*group1).agg(F.count("*").alias("cnt"))

    is_ref = F.col("base") == F.col("ref_base")
    aggs = [
        F.sum("cnt").cast("int").alias(S.COVERAGE),
        F.sum(F.when(is_ref, F.col("cnt")).otherwise(0)).cast("int").alias(S.COUNT_REF),
        F.sum(F.when(~is_ref, F.col("cnt")).otherwise(0)).cast("int").alias(S.COUNT_NONREF),
    ]
    if alts:
        aggs.append(
            F.map_from_entries(
                F.array_sort(
                    F.collect_list(
                        F.when(~is_ref, F.struct(F.col("base"), F.col("cnt").cast("int").alias("cnt")))
                    )
                )
            ).alias(S.ALTS)
        )
    if quals:
        aggs.append(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct(F.col("base"), F.col("hist"))))
            ).alias(S.QUALS)
        )

    out = g1.groupBy(S.CONTIG, "pos", "ref_base").agg(*aggs)
    cols = [
        F.col(S.CONTIG),
        F.col("pos").cast("int").alias(S.START),
        F.col("pos").cast("int").alias(S.END),
        F.col("ref_base").alias(S.REF),
        F.col(S.COVERAGE),
        F.col(S.COUNT_REF),
        F.col(S.COUNT_NONREF),
    ]
    if alts:
        cols.append(F.col(S.ALTS))
    if quals:
        cols.append(F.col(S.QUALS))
    return out.select(*cols)


def _pileup_sparse(reads: DataFrame, ref: RefExpr, alts: bool) -> DataFrame:
    """Fast path for alts-mode pileup with an expression-computable
    reference: the same sparse-mismatch design as the reference's MD-tag
    walk (pileup/MDTagParser.scala:24-53 — matching bases never materialize
    as per-base records).

      coverage    <- event-based coverage blocks exploded to positions
                     (|changes| << |bases| rows through the shuffle)
      alt counts  <- per-base rows FILTERED to base != ref before the
                     shuffle (mismatch rate ~2%, so ~50x less shuffle I/O)
      countRef    =  coverage - countNonRef

    Output is identical to the dense path (verified by the oracle parity
    suite); only the plan differs.
    """
    from sequila_spark.operators.coverage import coverage as _coverage

    cov = _coverage(reads, mode="bases", use_cigar=False).select(
        S.CONTIG, F.col(S.START).alias("pos"), S.COVERAGE
    )

    # Explode all bases map-side, filter to mismatches pre-shuffle.  (An
    # array-lambda prefilter before the explode was measured 2x SLOWER —
    # higher-order-function evaluation beats Generate on per-element cost.)
    per_base = expand_bases(reads, with_quals=False)
    mism = per_base.withColumn("ref_base", ref(F.col(S.CONTIG), F.col("pos"))).where(
        F.col("base") != F.col("ref_base")
    )
    g1 = mism.groupBy(S.CONTIG, "pos", "base").agg(F.count("*").cast("int").alias("cnt"))
    alt_agg = [
        F.sum("cnt").cast("int").alias(S.COUNT_NONREF),
    ]
    if alts:
        alt_agg.append(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct(F.col("base"), F.col("cnt"))))
            ).alias(S.ALTS)
        )
    alt_pos = g1.groupBy(S.CONTIG, "pos").agg(*alt_agg)

    joined = cov.join(alt_pos, [S.CONTIG, "pos"], "left")
    nonref = F.coalesce(F.col(S.COUNT_NONREF), F.lit(0)).cast("int")
    cols = [
        F.col(S.CONTIG),
        F.col("pos").cast("int").alias(S.START),
        F.col("pos").cast("int").alias(S.END),
        ref(F.col(S.CONTIG), F.col("pos")).alias(S.REF),
        F.col(S.COVERAGE).cast("int").alias(S.COVERAGE),
        (F.col(S.COVERAGE) - nonref).cast("int").alias(S.COUNT_REF),
        nonref.alias(S.COUNT_NONREF),
    ]
    if alts:
        # dense path yields an empty map (not null) at all-ref positions
        cols.append(
            F.coalesce(
                F.col(S.ALTS), F.expr("map()").cast("map<string,int>")
            ).alias(S.ALTS)
        )
    return joined.select(*cols)

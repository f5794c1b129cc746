"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes one entry per implemented operator from SURVEY.md §2 over
the synthetic tables; `oracle_sql()` gives the DuckDB-equivalent SQL.  The
genomic operators run on deterministic alignment/interval views derived from
the TPC-H-ish tables (see sequila_spark/testdata.py — derivation SQL is
shared between engines so results must hash-match).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sequila_spark import testdata as TD
from sequila_spark import schemas as S
from sequila_spark.functions import intervals as IV
from sequila_spark.operators.coverage import coverage, filter_reads
from sequila_spark.operators.pileup import pileup
from sequila_spark.operators.range_join import range_join


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: featureCounts — interval join + per-target read counts
    (reference apps/FeatureCounts.scala:35-50)."""
    return _q_feature_counts(spark, "/root/testdata/sf0.001")


# ---------------------------------------------------------------------------
# Query implementations (Spark side)
# ---------------------------------------------------------------------------

def _q_feature_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = TD.reads(spark, sf_dir)
    targets = TD.targets(spark, sf_dir)
    joined = range_join(reads, targets, how="inner")
    return (
        joined.groupBy("target_id")
        .agg(F.count("*").alias("read_count"))
    )


def _q_range_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = TD.reads(spark, sf_dir)
    targets = TD.targets(spark, sf_dir)
    j = range_join(reads, targets, how="inner")
    return j.select(
        "qname",
        "target_id",
        IV.overlap_length(S.START, S.END, f"{S.START}_r", f"{S.END}_r").alias("overlap_len"),
    )


def _q_range_join_minoverlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = TD.reads(spark, sf_dir)
    targets = TD.targets(spark, sf_dir)
    j = range_join(reads, targets, how="inner", min_overlap=100)
    return j.select("qname", "target_id")


def _q_range_join_maxgap(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = TD.reads(spark, sf_dir)
    targets = TD.targets(spark, sf_dir)
    j = range_join(reads, targets, how="inner", max_gap=1000)
    return j.select("qname", "target_id")


def _q_range_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """subsetByOverlaps analog (GRangesTestSuite distinct-overlap case)."""
    reads = TD.reads(spark, sf_dir)
    targets = TD.targets(spark, sf_dir)
    return range_join(targets, reads, how="left_semi").select(
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
    )


def _q_read_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read quality filter (AlignmentsRDD.scala:132-145)."""
    reads = TD.reads(spark, sf_dir)
    return filter_reads(reads, flag_mask=1796, min_mapq=20).select(
        "qname", S.CONTIG, S.START, S.END, "flag", "mapq"
    )


def _q_coverage_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    reads = TD.reads(spark, sf_dir)
    return coverage(reads, mode="blocks", use_cigar=False)


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
    j = range_join(targets, iv, how="inner")
    return j.select("target_id", S.CONTIG, S.START, S.END)


def _q_pileup_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-position pileup with alt maps on a genomic slice (contig 1,
    1..20000), alts rendered with altmap_to_str for comparison — the
    reference's own golden-comparison technique (AltFunctions.scala:15-22)."""
    from sequila_spark.functions.maps import altmap_to_str

    reads = TD.reads_with_seq(spark, sf_dir)
    p = pileup(reads, ref=TD.ref_base_col, alts=True)
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
    p = pileup(reads, ref=TD.ref_base_col, alts=True)
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

    reads = TD.reads_with_seq(spark, sf_dir)
    p = pileup(reads, ref=TD.ref_base_col, alts=True, quals=True)
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

    reads = TD.reads_with_seq(spark, sf_dir)
    p = pileup(reads, ref=TD.ref_base_col, alts=True, quals=True, qual_bin_size=10)
    return p.where((F.col(S.CONTIG) == "4") & F.col(S.START).between(1, 10000)).select(
        S.CONTIG,
        S.START,
        S.COVERAGE,
        qualsmap_to_str(F.col(S.QUALS)).alias("quals_str"),
    )


def _q_distinct_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT sample_id fast path (SequilaDataSourceStrategy.scala:38-54);
    with partitioned storage this is partition listing — here the aggregate."""
    reads = TD.reads(spark, sf_dir)
    return reads.select("sample_id").distinct()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "feature_counts": _q_feature_counts,
    "range_join_pairs": _q_range_join_pairs,
    "range_join_minoverlap": _q_range_join_minoverlap,
    "range_join_maxgap": _q_range_join_maxgap,
    "range_join_semi": _q_range_join_semi,
    "interval_ops": _q_interval_ops,
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
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


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


def _pileup_base_cte(where: str = "TRUE") -> str:
    """DuckDB per-base expansion + per-(pos,base) counts.  The oracle derives
    bases arithmetically (testdata.read_base_sql) — independent of the Spark
    path, which materializes seq strings and parses them back."""
    return f"""
pb AS (
  SELECT contig, okey, UNNEST(range(pos_start, pos_end + 1)) AS p FROM reads
),
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
              2 * 1 + (200000 - 1) - pos_end + (pos_end - pos_start) AS refl_end
            FROM targets
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
            SELECT contig, pos_start, pos_end, coverage FROM blocks
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
            {cte('reads')}, {_pileup_base_cte("contig = '1' AND p BETWEEN 1 AND 20000")}
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
            {cte('reads')}, {_pileup_base_cte("contig = '2' AND p BETWEEN 1 AND 10000")},
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
            {cte('reads')}, {_pileup_base_cte("contig = '4' AND p BETWEEN 1 AND 10000")},
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
    }

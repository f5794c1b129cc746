"""Pileup format converters + cross-tool comparison.

Parity targets: the reference's converter package and comparison app
(pileup/converters/samtools/SamtoolsConverter.scala:18-140,
converters/samtools/PileupStringUtils.scala:6-100,
converters/gatk/GatkConverter.scala:14-22,
converters/sequila/SequilaConverter.scala:10-55,
apps/PileupComparison.scala:18-40).  Each converter normalizes one tool's
pileup text format into the common per-position shape

    (contig, pos_start, pos_end, ref, coverage, countRef, countNonRef,
     alts map<string,int>)

so outputs from samtools mpileup, GATK and this engine can be compared
row-for-row.  Architecture differs from the reference deliberately: its
converters collect every row to the driver (``spark.createDF(...collect)``)
— here parsing stays distributed (``spark.read.csv`` + native expressions;
the one irreducibly stateful scan, samtools mark removal, is an
Arrow-batched pandas UDF).

Counting is native: per-letter counts come from
``length(s) - length(translate(s, letter, ''))`` (one pass, no explode, no
shuffle), so a converter is a map-only plan whatever the file size.
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf resolves
# its pd.Series type hints at runtime and postponed (string) annotations
# break that resolution.
import pandas as pd  # noqa: F401 — pandas_udf signature resolution

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sequila_spark import schemas as S
from sequila_spark.functions.intervals import clean_contig

_BASES = "ACGTNacgtn"


def _letter_count(s: Column, ch: str) -> Column:
    return (F.length(s) - F.length(F.translate(s, ch, ""))).cast("int")


def _base_counts_map(s: Column) -> Column:
    """map<base, count> over the ten cased base letters, zero-count entries
    dropped, NULL when no base letter occurs (GatkConverter emits null for
    an empty map, GatkConverter.scala:40-46)."""
    entries = F.filter(
        F.array(
            *[
                F.struct(F.lit(ch).alias("key"), _letter_count(s, ch).alias("value"))
                for ch in _BASES
            ]
        ),
        lambda e: e["value"] > 0,
    )
    return F.when(F.size(entries) > 0, F.map_from_entries(entries))


def _common_select(
    contig: Column, pos: Column, ref: Column, clean: Column
) -> list[Column]:
    n_ref = _letter_count(clean, ".") + _letter_count(clean, ",")
    cov = F.length(clean).cast("int")
    return [
        clean_contig(contig).alias(S.CONTIG),
        pos.cast("int").alias(S.START),
        pos.cast("int").alias(S.END),
        F.upper(ref).alias(S.REF),
        cov.alias(S.COVERAGE),
        n_ref.cast("int").alias(S.COUNT_REF),
        (cov - n_ref).cast("int").alias(S.COUNT_NONREF),
        _base_counts_map(clean).alias(S.ALTS),
    ]


def read_samtools_pileup(spark: SparkSession, path: str) -> DataFrame:
    """`samtools mpileup` text -> common format.

    The base column is cleaned exactly as PileupStringUtils.removeAllMarks
    (^X read-start marks, $ read-end marks, +n/-n indel runs whose n
    following characters belong to other positions) plus dropping the
    '*' '<' '>' placeholders (deletion/refskip — not aligned bases,
    SamtoolsConverter semantics).  './,' entries fold into countRef;
    mismatch letters keep their strand case in the alts map.

    Mark removal needs a stateful scan (the indel run length governs how
    many following chars to skip — not regular), so it runs as an
    Arrow-batched pandas UDF; everything else is native."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _clean(bases: pd.Series) -> pd.Series:
        import re as _re

        run = _re.compile(r"[+-](\d+)")

        def one(s: str) -> str:
            out = []
            i, n = 0, len(s)
            while i < n:
                ch = s[i]
                if ch == "^":
                    i += 2
                    continue
                if ch == "$":
                    i += 1
                    continue
                if ch in "+-":
                    m = run.match(s, i)
                    if m is None:  # '+'/'-' with no digit run: malformed
                        raise ValueError(
                            f"malformed mpileup base string {s!r}: "
                            f"indel mark at offset {i} lacks a length"
                        )
                    i += 1 + len(m.group(1)) + int(m.group(1))
                    continue
                if ch not in "*<>":
                    out.append(ch)
                i += 1
            return "".join(out)

        return bases.map(one)

    raw = spark.read.csv(
        path, sep="\t", schema="c string, p int, r string, cov int, bases string, quals string"
    )
    clean = _clean(F.coalesce(F.col("bases"), F.lit("")))
    out = raw.select(*_common_select(F.col("c"), F.col("p"), F.col("r"), clean))
    # positions with no aligned base (only deletions/refskips) are dropped,
    # matching the reference's nonzero-coverage comparison universe
    return out.where(F.col(S.COVERAGE) > 0)


def read_gatk_pileup(spark: SparkSession, path: str) -> DataFrame:
    """GATK pileup text (space-delimited ``contig pos ref bases quals``)
    -> common format (GatkConverter.scala:14-22 parity).

    GATK prints actual base letters (no './,' ref-fold), so countRef is
    derived by matching letters against the upper-cased ref column and the
    alts map counts every base letter — the GatkConverter convention
    (count all cased ACGTN chars of the pileup string; coverage = its
    length).  Note the reference's 5-field schema over the 6-field line
    (trailing space) makes its column index land on the quals string —
    this parses the documented bases column."""
    raw = spark.read.csv(
        path, sep=" ", schema="c string, p int, r string, bases string, quals string"
    )
    bases = F.coalesce(F.col("bases"), F.lit(""))
    ref_u = F.upper(F.col("r"))
    cov = F.length(bases).cast("int")
    bases_u = F.upper(bases)
    n_ref = (
        F.length(bases_u) - F.length(F.replace(bases_u, ref_u, F.lit("")))
    ).cast("int")
    return raw.select(
        clean_contig(F.col("c")).alias(S.CONTIG),
        F.col("p").cast("int").alias(S.START),
        F.col("p").cast("int").alias(S.END),
        ref_u.alias(S.REF),
        cov.alias(S.COVERAGE),
        n_ref.alias(S.COUNT_REF),
        (cov - n_ref).cast("int").alias(S.COUNT_NONREF),
        _base_counts_map(bases).alias(S.ALTS),
    ).where(F.col(S.COVERAGE) > 0)


def read_sequila_pileup(spark: SparkSession, path: str) -> DataFrame:
    """This engine's block-compressed CommonPileupFormat CSV -> per-base
    common format (SequilaConverter.scala:23-52 parity: every block row
    explodes to its positions; ref comes from the block's concatenated ref
    string, or 'R' when written without a reference).

    The alts string renders entries as ``(base,count)`` pairs — parsed
    natively with regexp_extract_all.  Blocks carry alts only on singleton
    mismatch rows, so per-base rows inherit the block's map exactly as the
    reference's converter does."""
    raw = spark.read.csv(
        path,
        sep=",",
        quote='"',
        escape="\\",
        schema="c string, s int, e int, r string, cov int, alts string, quals string",
    )
    pairs = F.regexp_extract_all(
        F.coalesce(F.col("alts"), F.lit("")), F.lit(r"\((.),(\d+)\)"), 0
    )
    alts_map = F.when(
        F.size(pairs) > 0,
        F.map_from_entries(
            F.transform(
                pairs,
                lambda p: F.struct(
                    F.regexp_extract(p, r"\((.),", 1).alias("key"),
                    F.regexp_extract(p, r",(\d+)\)", 1).cast("int").alias("value"),
                ),
            )
        ),
    )
    exploded = raw.select(
        F.col("c"),
        F.col("r"),
        F.col("cov"),
        alts_map.alias("__alts"),
        F.posexplode(F.sequence(F.col("s"), F.col("e"))).alias("__i", "pos"),
    )
    n_nonref = F.coalesce(
        F.aggregate(
            F.map_values(F.col("__alts")), F.lit(0), lambda a, v: a + v
        ),
        F.lit(0),
    ).cast("int")
    return exploded.select(
        clean_contig(F.col("c")).alias(S.CONTIG),
        F.col("pos").cast("int").alias(S.START),
        F.col("pos").cast("int").alias(S.END),
        F.when(F.col("r") == "R", F.lit("R"))
        .otherwise(F.upper(F.substring(F.col("r"), F.col("__i") + 1, 1)))
        .alias(S.REF),
        F.col("cov").cast("int").alias(S.COVERAGE),
        (F.col("cov") - n_nonref).cast("int").alias(S.COUNT_REF),
        n_nonref.alias(S.COUNT_NONREF),
        F.col("__alts").alias(S.ALTS),
    )


def _render_alts(col: Column) -> Column:
    """Deterministic string rendering of an alts map for set comparison
    (map columns are not comparable with exceptAll)."""
    return F.when(
        col.isNotNull(),
        F.array_join(
            F.transform(
                F.array_sort(F.map_entries(col)),
                lambda e: F.concat(e["key"], F.lit(":"), e["value"].cast("string")),
            ),
            ",",
        ),
    ).otherwise(F.lit(""))


def compare_pileups(
    dfs: dict[str, DataFrame], on: list[str] | None = None
) -> dict[tuple[str, str], str]:
    """Cross-compare converted pileups pairwise (PileupComparison.scala:
    18-40 analog): every pair of inputs gets 'EQUAL' or
    'NOT EQUAL (a_only=<n>, b_only=<m>)' computed with two exceptAll
    counts over the selected columns (default: all shared columns; the
    alts map is auto-rendered to a sorted string)."""
    names = list(dfs)
    out: dict[tuple[str, str], str] = {}

    def proj(df: DataFrame, cols: list[str]) -> DataFrame:
        sel = [
            _render_alts(F.col(c)).alias(c) if c == S.ALTS else F.col(c)
            for c in cols
        ]
        return df.select(*sel)

    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = dfs[names[i]], dfs[names[j]]
            cols = on or [c for c in a.columns if c in set(b.columns)]
            pa, pb = proj(a, cols), proj(b, cols)
            a_only = pa.exceptAll(pb).count()
            b_only = pb.exceptAll(pa).count()
            out[(names[i], names[j])] = (
                "EQUAL"
                if a_only == 0 and b_only == 0
                else f"NOT EQUAL (a_only={a_only}, b_only={b_only})"
            )
    return out

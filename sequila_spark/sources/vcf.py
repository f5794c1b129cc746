"""VCF data source.

Semantics match the reference's VCFDataSource
(datasources/VCF/VCFRelation.scala:25-45): canonical column names (contig,
pos_start, pos_end, ref, alt), contig normalization, alt as array.  The
reference delegates parsing AND its ``normalization_mode`` option to Glow
(split_multiallelics / normalize_variants); here both are native so the
modes run with no optional dependency:

- ``split``: one output row per alternate allele (vt-decompose / Glow
  ``split_multiallelics`` semantics) — a map-side ``posexplode``, no
  shuffle, scales linearly.
- ``normalize``: parsimony + left-alignment (vt normalize, Tan et al.
  Bioinformatics 2015; Glow ``normalize_variants`` implements the same
  algorithm) — an Arrow-batched pandas UDF over a broadcast reference
  FASTA; map-only, no shuffle.
- ``split_and_normalize``: both, split first.
"""

# NOTE: no `from __future__ import annotations` — pandas_udf resolves its
# pd.Series type hints at runtime and postponed (string) annotations break
# that resolution (same constraint as converters.py).

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sequila_spark import schemas as S
from sequila_spark.functions.intervals import clean_contig

_MODES = (None, "split", "normalize", "split_and_normalize")


def _norm_one(
    pos: int, alleles: list[str], chrom_seq: str | None
) -> tuple[int, list[str]]:
    """vt-normalize one record (1-based ``pos``; ``alleles[0]`` is REF).

    Right-trim while every allele ends with the same base, left-extending
    from the reference when an allele would become empty; then left-trim
    while every allele has length >= 2 and shares its first base.  Symbolic
    or missing alleles ('.', '*', '<..>', breakends) are the caller's
    responsibility to exclude."""
    alleles = list(alleles)
    while True:
        if all(a and a[-1] == alleles[0][-1] for a in alleles) and len(alleles) > 1:
            if any(len(a) == 1 for a in alleles):
                # an allele would empty out: prepend the reference base at
                # pos-1 (requires the genome — vt normalize's left extension)
                if chrom_seq is None or pos <= 1:
                    raise ValueError(
                        "variant normalization requires ref_genome_path "
                        "(left extension needed)"
                    )
                base = chrom_seq[pos - 2].upper()
                alleles = [base + a[:-1] for a in alleles]
                pos -= 1
            else:
                alleles = [a[:-1] for a in alleles]
            continue
        break
    while all(len(a) >= 2 for a in alleles) and len(
        {a[0] for a in alleles}
    ) == 1 and len(alleles) > 1:
        alleles = [a[1:] for a in alleles]
        pos += 1
    return pos, alleles


def _is_symbolic(a: str) -> bool:
    return (not a) or a == "." or a == "*" or a[0] == "<" or "[" in a or "]" in a


def split_multiallelics(df: DataFrame) -> DataFrame:
    """One row per alternate allele (vt-decompose / Glow
    ``split_multiallelics``).  INFO values carrying exactly one
    comma-separated item per alternate allele (the Number=A convention —
    the text layout carries no header metadata, so arity is the signal,
    as in bcftools' fallback) keep the item at the alt's index; all other
    INFO values replicate unchanged.  Adds ``split_from_multiallelic``.

    Plan shape: ``posexplode`` + native map rebuild — map-side only."""
    # n must be materialized BEFORE the final select: the output re-aliases
    # a single-element array as `alt`, and lateral column alias resolution
    # would bind a bare F.col(alt) to that new column (size 1), silently
    # disabling the per-alt INFO renumbering
    ex = df.select(
        "*",
        F.size(F.col(S.ALT)).alias("_n_alts"),
        F.posexplode(F.col(S.ALT)).alias("_alt_idx", "_alt"),
    )
    n = F.col("_n_alts")

    def per_alt(value: Column) -> Column:
        parts = F.split(value, ",")
        return F.when(
            (F.size(parts) == n) & (n > 1),
            F.element_at(parts, F.col("_alt_idx") + 1),
        ).otherwise(value)

    info = F.when(
        F.col("info").isNotNull(),
        F.map_from_entries(
            F.transform(
                F.map_entries("info"),
                lambda e: F.struct(
                    e["key"].alias("key"), per_alt(e["value"]).alias("value")
                ),
            )
        ),
    )
    return ex.select(
        S.CONTIG,
        S.START,
        S.END,
        "id",
        S.REF,
        F.array("_alt").alias(S.ALT),
        "qual",
        "filter",
        info.alias("info"),
        (n > 1).alias("split_from_multiallelic"),
    )


def normalize_variants(
    df: DataFrame, ref_genome_path: str | None = None
) -> DataFrame:
    """Parsimony + left-alignment over (pos_start, ref, alt) — vt normalize
    (Tan et al. 2015), the algorithm behind Glow's ``normalize_variants``.
    Records with any symbolic/missing allele pass through untouched (the
    spec normalizes sequence alleles only).

    The reference FASTA is loaded once on the driver and broadcast; the
    rewrite itself is an Arrow-batched pandas UDF (string-loop semantics
    are not expressible as native columns), map-only — no shuffle, so the
    plan scales with input splits."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    if ref_genome_path is not None:
        from sequila_spark.sources.cramcodec import load_fasta

        bref = spark.sparkContext.broadcast(load_fasta(ref_genome_path))
    else:
        bref = None

    @pandas_udf(
        f"struct<{S.START}:int,{S.REF}:string,{S.ALT}:array<string>>"
    )
    def _norm(
        contig: pd.Series, pos: pd.Series, ref: pd.Series, alt: pd.Series
    ) -> pd.DataFrame:
        genome = bref.value if bref is not None else {}
        out_pos, out_ref, out_alt = [], [], []
        for c, p, r, a in zip(contig, pos, ref, alt):
            alts = list(a) if a is not None else []
            if r is None or _is_symbolic(r) or any(_is_symbolic(x) for x in alts):
                out_pos.append(p), out_ref.append(r), out_alt.append(alts)
                continue
            np_, alleles = _norm_one(int(p), [r] + alts, genome.get(c))
            out_pos.append(np_), out_ref.append(alleles[0])
            out_alt.append(alleles[1:])
        return pd.DataFrame(
            {S.START: out_pos, S.REF: out_ref, S.ALT: out_alt}
        )

    norm = _norm(F.col(S.CONTIG), F.col(S.START), F.col(S.REF), F.col(S.ALT))
    others = [c for c in df.columns if c not in (S.START, S.END, S.REF, S.ALT)]
    return df.withColumn("_n", norm).select(
        *[
            c
            for c in (
                S.CONTIG,
                F.col(f"_n.{S.START}").alias(S.START),
                (F.col(f"_n.{S.START}") + F.length(f"_n.{S.REF}") - 1)
                .cast("int")
                .alias(S.END),
                "id",
                F.col(f"_n.{S.REF}").alias(S.REF),
                F.col(f"_n.{S.ALT}").alias(S.ALT),
                *[x for x in others if x not in (S.CONTIG, "id")],
            )
        ]
    )


def read_vcf(
    spark: SparkSession,
    path: str,
    normalization_mode: str | None = None,
    ref_genome_path: str | None = None,
) -> DataFrame:
    """Native VCF text parse -> canonical columns, with the reference's
    ``normalization_mode`` option implemented natively (VCFRelation.scala:
    25-45 delegates to Glow; same modes, no dependency).  ``normalize`` and
    ``split_and_normalize`` raise without ``ref_genome_path`` exactly like
    the reference relation when left extension is impossible is handled
    per-record (trim-only records normalize fine without a genome)."""
    if normalization_mode not in _MODES:
        raise ValueError(
            f"normalization_mode must be one of {_MODES}, got "
            f"{normalization_mode!r}"
        )
    lines = spark.read.text(path)
    rows = lines.where(~F.col("value").startswith("#") & (F.trim("value") != ""))
    f = F.split(F.col("value"), "\t")

    def field(i: int):
        return F.when(F.size(f) > i, F.element_at(f, i + 1)).otherwise(F.lit(None))

    info_map = F.map_from_entries(
        F.transform(
            F.split(field(7), ";"),
            # flag entries (e.g. "DB") have no '=': value defaults to "" —
            # F.get is OOB-tolerant where getItem raises
            lambda kv: F.struct(
                F.split(kv, "=").getItem(0).alias("key"),
                F.coalesce(F.get(F.split(kv, "="), F.lit(1)), F.lit("")).alias("value"),
            ),
        )
    )
    df = rows.select(
        clean_contig(field(0)).alias(S.CONTIG),
        field(1).cast("int").alias(S.START),
        (field(1).cast("int") + F.length(field(3)) - 1).cast("int").alias(S.END),
        F.nullif(field(2), F.lit(".")).alias("id"),
        field(3).alias(S.REF),
        F.split(field(4), ",").alias(S.ALT),
        F.nullif(field(5), F.lit(".")).cast("double").alias("qual"),
        F.nullif(field(6), F.lit(".")).alias("filter"),
        F.when(field(7).isNull() | (field(7) == "."), None)
        .otherwise(info_map)
        .alias("info"),
    )
    if normalization_mode in ("split", "split_and_normalize"):
        df = split_multiallelics(df)
    if normalization_mode in ("normalize", "split_and_normalize"):
        df = normalize_variants(df, ref_genome_path)
    return df

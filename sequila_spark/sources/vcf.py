"""VCF data source.

Semantics match the reference's VCFDataSource
(datasources/VCF/VCFRelation.scala:25-45): canonical column names (contig,
pos_start, pos_end, ref, alt), contig normalization, alt as array.  The
reference delegates parsing AND its ``normalization_mode`` option to Glow
(split_multiallelics / normalize_variants); here both are native so the
modes run with no optional dependency:

- ``split``: one output row per alternate allele (vt-decompose / Glow
  ``split_multiallelics`` semantics) — a map-side ``posexplode``, no
  shuffle, scales linearly.  INFO/FORMAT renumbering is header-driven
  (``Number=A/R/G`` from ``##INFO``/``##FORMAT`` lines), with the arity
  heuristic only for undeclared fields; GT calls renumber vt-decompose
  style (current alt -> 1, ref -> 0, other alts -> missing).
- ``normalize``: parsimony + left-alignment (vt normalize, Tan et al.
  Bioinformatics 2015; Glow ``normalize_variants`` implements the same
  algorithm) — an Arrow-batched pandas UDF with per-contig reference
  slices fetched executor-side via the FASTA index; map-only, no shuffle.
- ``split_and_normalize``: both, split first.

Per-sample genotypes: the reference surfaces Glow's full VCF schema
including the per-sample ``genotypes`` array (VCFRelation.scala:25-45 only
renames site-level columns).  Here FORMAT + sample columns parse natively
into ``genotypes: array<struct<sample_id, phased, calls, fields>>`` —
``calls`` is the GT allele index array (-1 for '.'), ``fields`` the
remaining FORMAT key->value map.
"""

# NOTE: no `from __future__ import annotations` — pandas_udf resolves its
# pd.Series type hints at runtime and postponed (string) annotations break
# that resolution (same constraint as converters.py).

import glob as _glob
import gzip
import os
import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sequila_spark import schemas as S
from sequila_spark.functions.intervals import clean_contig, clean_contig_py

_MODES = (None, "split", "normalize", "split_and_normalize")

_META_RE = re.compile(r"##(INFO|FORMAT)=<ID=([^,>]+),Number=([^,>]+)")


class VcfHeader:
    """Plan-time header metadata: sample names (#CHROM line) and declared
    ``Number=`` for INFO/FORMAT fields (``{key: "A"|"R"|"G"|"0"|"1"|...}``)."""

    def __init__(self, samples, info_numbers, format_numbers):
        self.samples = samples
        self.info_numbers = info_numbers
        self.format_numbers = format_numbers


def _open_text(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt")
    return open(path)


def _resolve_vcf_files(path: str) -> list[str]:
    """All concrete VCF files a path spec (file, glob, or directory) names,
    sorted — the same file set Spark's text reader will scan."""
    matches = sorted(_glob.glob(path)) or [path]
    files: list[str] = []
    for m in matches:
        if os.path.isdir(m):
            files.extend(
                sorted(
                    p
                    for p in _glob.glob(os.path.join(m, "*"))
                    if not os.path.basename(p).startswith(("_", "."))
                    and not os.path.isdir(p)
                )
            )
        else:
            files.append(m)
    return files


def _read_one_header(target: str) -> VcfHeader:
    samples: list[str] = []
    info_numbers: dict[str, str] = {}
    format_numbers: dict[str, str] = {}
    try:
        with _open_text(target) as f:
            for line in f:
                if not line.startswith("#"):
                    break
                m = _META_RE.match(line)
                if m:
                    kind, key, num = m.groups()
                    (info_numbers if kind == "INFO" else format_numbers)[key] = num
                elif line.startswith("#CHROM"):
                    cols = line.rstrip("\n").split("\t")
                    if len(cols) > 9:
                        samples = cols[9:]
    except OSError:
        pass  # non-local path: header metadata unavailable, heuristics apply
    return VcfHeader(samples, info_numbers, format_numbers)


def read_vcf_header(path: str) -> VcfHeader:
    """Parse header lines of the first file matching ``path`` (driver-side,
    reads only the header bytes — never the record body)."""
    files = _resolve_vcf_files(path)
    return _read_one_header(files[0] if files else path)


def read_vcf_headers(path: str) -> dict[str, VcfHeader]:
    """Per-file headers for every file ``path`` names (Glow resolves VCF
    headers per file; a cohort directory can mix sample columns).  Only
    header bytes are read, driver-side — one small sequential read per
    file at plan time."""
    return {f: _read_one_header(f) for f in _resolve_vcf_files(path)}


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


def _binom(m: Column, i: Column) -> Column:
    """Exact integer C(m, i) as a JVM-side expression: the iterative
    ``acc <- acc * (m - i + t) / t`` for t = 1..i keeps ``acc = C(m-i+t, t)``
    — an integer at every step, so the double division is exact (values are
    far below 2^53 for any real ploidy/allele count)."""
    return F.when(i <= 0, F.lit(1).cast("long")).otherwise(
        F.aggregate(
            F.sequence(F.lit(1), i.cast("int")),
            F.lit(1).cast("long"),
            lambda acc, t: (acc * (m.cast("long") - i + t) / t).cast("long"),
        )
    )


def _genotype_index(a: Column, p: Column, j: Column) -> Column:
    """VCF ordered-genotype index of the ploidy-``p`` genotype with ``j``
    copies of allele ``a`` and ``p - j`` copies of the reference (the only
    genotypes representable after a biallelic split).  The VCF spec orders
    genotypes by ``Index(a1<=...<=ap) = sum_i C(a_i + i - 1, i)``; with the
    sorted tuple (0,...,0,a,...,a) only the last ``j`` terms are nonzero."""
    return F.when(j <= 0, F.lit(0).cast("long")).otherwise(
        F.aggregate(
            F.sequence((p - j + 1).cast("int"), p.cast("int")),
            F.lit(0).cast("long"),
            lambda acc, i: acc + _binom(a + i - 1, i),
        )
    )


def _per_alt_value(
    value: Column, n: Column, alt_idx: Column, key: Column | None,
    numbers: dict[str, str] | None, ploidy: Column | None = None,
) -> Column:
    """Renumber one comma-separated value for the alt at 0-based ``alt_idx``.

    Header-driven when ``numbers`` declares the key (Glow/bcftools are
    header-driven); the Number=A arity heuristic applies only to undeclared
    keys.  Declared-but-mismatched arities replicate unchanged (defensive —
    a malformed field must not silently reindex).

    ``ploidy`` (FORMAT context: the sample's GT call count) generalizes
    Number=G to any ploidy via the spec's combinadic genotype ordering;
    without it (INFO context, where no per-sample ploidy exists) Number=G
    assumes diploid."""
    parts = F.split(value, ",")
    a = alt_idx + 1  # 1-based allele index of this alt
    pick_a = F.when(
        F.size(parts) == n, F.element_at(parts, alt_idx + 1)
    ).otherwise(value)
    pick_r = F.when(
        F.size(parts) == n + 1,
        F.concat_ws(",", F.element_at(parts, 1), F.element_at(parts, alt_idx + 2)),
    ).otherwise(value)
    if ploidy is None:
        # Number=G, diploid: genotype (j,k) j<=k sits at k(k+1)/2 + j.  The
        # split keeps genotypes over {ref, this alt}: (0,0), (0,a), (a,a).
        g_arity = (n + 1) * (n + 2) / F.lit(2)
        pick_g = F.when(
            F.size(parts).cast("long") == g_arity.cast("long"),
            F.concat_ws(
                ",",
                F.element_at(parts, 1),
                F.element_at(parts, (a * (a + 1) / 2).cast("int") + 1),
                F.element_at(parts, (a * (a + 1) / 2 + a).cast("int") + 1),
            ),
        ).otherwise(value)
    else:
        # any ploidy p: the split keeps the p+1 genotypes ref^(p-j) alt^j,
        # j = 0..p, whose source positions follow the combinadic ordering
        p = ploidy.cast("long")
        g_arity = _binom(n.cast("long") + p, p)
        picked = F.transform(
            F.sequence(F.lit(0), p.cast("int")),
            lambda j: F.coalesce(
                F.element_at(
                    parts, (_genotype_index(a.cast("long"), p, j) + 1).cast("int")
                ),
                F.lit("."),
            ),
        )
        pick_g = F.when(
            F.size(parts).cast("long") == g_arity,
            F.array_join(picked, ","),
        ).otherwise(value)
    heuristic = F.when(
        (F.size(parts) == n) & (n > 1), F.element_at(parts, alt_idx + 1)
    ).otherwise(value)
    if not numbers or key is None:
        return heuristic
    a_keys = [k for k, v in numbers.items() if v == "A"]
    r_keys = [k for k, v in numbers.items() if v == "R"]
    g_keys = [k for k, v in numbers.items() if v == "G"]
    other = [k for k in numbers if k not in (*a_keys, *r_keys, *g_keys)]
    expr = F.when(F.lit(False), value)
    if a_keys:
        expr = expr.when(key.isin(a_keys), pick_a)
    if r_keys:
        expr = expr.when(key.isin(r_keys), pick_r)
    if g_keys:
        expr = expr.when(key.isin(g_keys), pick_g)
    if other:
        # declared scalar / fixed-arity: replicate even if it contains
        # commas (free-text Number=1 values must not be reindexed)
        expr = expr.when(key.isin(other), value)
    return expr.otherwise(heuristic)


def split_multiallelics(
    df: DataFrame,
    info_numbers: dict[str, str] | None = None,
    format_numbers: dict[str, str] | None = None,
) -> DataFrame:
    """One row per alternate allele (vt-decompose / Glow
    ``split_multiallelics``).  INFO values renumber per ``##INFO`` header
    ``Number=`` declarations when provided (A -> take alt's item,
    R -> ref item + alt's item, G -> diploid genotype triple, scalar ->
    replicate); undeclared fields fall back to the arity heuristic
    (bcftools' fallback).  A ``genotypes`` column, when present, has GT
    calls renumbered vt-decompose -s style (ref -> 0, current alt -> 1,
    any other alt -> -1/missing) and FORMAT fields renumbered per
    ``format_numbers``.  Adds ``split_from_multiallelic``.

    Plan shape: ``posexplode`` + native map rebuild — map-side only."""
    has_gt = "genotypes" in df.columns
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
    idx = F.col("_alt_idx")

    info = F.when(
        F.col("info").isNotNull(),
        F.map_from_entries(
            F.transform(
                F.map_entries("info"),
                lambda e: F.struct(
                    e["key"].alias("key"),
                    _per_alt_value(e["value"], n, idx, e["key"], info_numbers)
                    .alias("value"),
                ),
            )
        ),
    )
    cols = [
        S.CONTIG,
        S.START,
        S.END,
        "id",
        S.REF,
        F.array("_alt").alias(S.ALT),
        "qual",
        "filter",
        info.alias("info"),
    ]
    if has_gt:
        # ref call stays 0, the split alt becomes 1, any other alt is no
        # longer representable -> missing (-1); '.' stays missing
        renum = F.transform(
            F.col("genotypes"),
            lambda g: F.struct(
                g["sample_id"].alias("sample_id"),
                g["phased"].alias("phased"),
                F.transform(
                    g["calls"],
                    lambda c: F.when(c <= 0, c)
                    .when(c == idx + 1, F.lit(1))
                    .otherwise(F.lit(-1)),
                ).alias("calls"),
                F.map_from_entries(
                    F.transform(
                        F.map_entries(g["fields"]),
                        lambda e: F.struct(
                            e["key"].alias("key"),
                            _per_alt_value(
                                e["value"], n, idx, e["key"], format_numbers,
                                # sample ploidy from its GT call count;
                                # no/empty GT -> the conventional diploid
                                ploidy=F.coalesce(
                                    F.when(
                                        F.size(g["calls"]) > 0,
                                        F.size(g["calls"]),
                                    ),
                                    F.lit(2),
                                ),
                            ).alias("value"),
                        ),
                    )
                ).alias("fields"),
            ),
        )
        cols.append(F.when(F.col("genotypes").isNotNull(), renum).alias("genotypes"))
    cols.append((n > 1).alias("split_from_multiallelic"))
    return ex.select(*cols)


# --- indexed FASTA access ----------------------------------------------------

# Executor-side LRU cache of fetched contig sequences, keyed (path, name).
# BOUNDED: a human contig is ~250 MB of text, and a long-lived Python worker
# whose tasks touch many contigs would otherwise accumulate the whole genome
# (~3 GB per worker, x workers per host).  Tasks are range-partitioned by
# contig, so 3 entries cover the access pattern; past the cap, re-fetch is a
# cheap seek+read.
from collections import OrderedDict

_CONTIG_CACHE: OrderedDict[tuple, str] = OrderedDict()
_CONTIG_CACHE_MAX = 3


def _is_bgzf_fasta(path: str) -> bool:
    from sequila_spark.sources.bamcodec import is_bgzf

    return path.endswith(".gz") and is_bgzf(path)


# executor-side cache of BGZF block indexes, keyed by path — a few entries
# of (uoff, coff) pairs per 64 KB block (~1 MB for a whole genome)
_BGZF_INDEX_CACHE: dict[str, list[tuple[int, int]]] = {}


def _bgzf_block_index(path: str) -> list[tuple[int, int]]:
    """Block index for a BGZF FASTA: the ``.gzi`` bgzip wrote when present,
    else reconstructed from block headers/trailers (no decompression) —
    cached per path per process."""
    from sequila_spark.sources.bamcodec import read_gzi, scan_bgzf_block_index

    idx = _BGZF_INDEX_CACHE.get(path)
    if idx is None:
        gzi = path + ".gzi"
        idx = read_gzi(gzi) if os.path.exists(gzi) else scan_bgzf_block_index(path)
        _BGZF_INDEX_CACHE[path] = idx
    return idx


def load_fasta_region_index(path: str) -> dict[str, tuple[str, int, int]]:
    """``{clean_contig: (raw_name, seq_byte_start, seq_byte_end)}`` for a
    plain-text or bgzip-compressed FASTA — from the ``.fai`` when present,
    else one streaming driver-side scan (O(1) memory; never materializes
    sequences).  For BGZF input the offsets are in UNCOMPRESSED coordinate
    space (exactly what samtools faidx records for ``.fa.gz``), resolved at
    fetch time through the block index.  This is what gets broadcast: a few
    entries per contig, not the genome."""
    fai = path + ".fai"
    entries: dict[str, tuple[str, int, int]] = {}
    if os.path.exists(fai):
        with open(fai) as f:
            for line in f:
                name, length, offset, linebases, linewidth = line.split("\t")[:5]
                length, offset = int(length), int(offset)
                linebases, linewidth = int(linebases), int(linewidth)
                nlines = (length + linebases - 1) // linebases if length else 0
                span = length + nlines * (linewidth - linebases)
                entries[clean_contig_py(name)] = (name, offset, offset + span)
        return entries
    # no .fai: stream the file once recording sequence byte spans (robust
    # to ragged line lengths — the fetch strips whitespace, not offsets).
    # BGZF input streams through the block decoder; offsets stay in
    # uncompressed space either way.
    def _lines():
        if _is_bgzf_fasta(path):
            from sequila_spark.sources.bamcodec import BgzfReader

            with open(path, "rb") as f:
                r = BgzfReader(f)
                tail = b""
                while True:
                    chunk = r.read(1 << 20)
                    if not chunk:
                        break
                    tail += chunk
                    cut = tail.rfind(b"\n") + 1
                    if cut:
                        yield from tail[:cut].splitlines(keepends=True)
                        tail = tail[cut:]
                if tail:
                    yield tail
        else:
            with open(path, "rb") as f:
                yield from f
        return

    name, start = None, 0
    pos = 0
    for raw in _lines():
        if raw.startswith(b">"):
            if name is not None:
                entries[clean_contig_py(name)] = (name, start, pos)
            name = raw[1:].split()[0].decode()
            start = pos + len(raw)
        pos += len(raw)
    if name is not None:
        entries[clean_contig_py(name)] = (name, start, pos)
    return entries


def fetch_contig_seq(path: str, span: tuple[str, int, int]) -> str:
    """Read one contig's sequence bytes (executor-side; cached per contig).
    Requires the FASTA to be reachable from executors — the standard
    cluster layout (shared FS / mounted object store), and exactly how
    htslib-based engines access the reference."""
    key = (path, span[0])
    seq = _CONTIG_CACHE.get(key)
    if seq is None:
        if _is_bgzf_fasta(path):
            from sequila_spark.sources.bamcodec import bgzf_fetch_range

            raw = bgzf_fetch_range(path, _bgzf_block_index(path), span[1], span[2])
        else:
            with open(path, "rb") as f:
                f.seek(span[1])
                raw = f.read(span[2] - span[1])
        seq = raw.decode().replace("\n", "").replace("\r", "")
        _CONTIG_CACHE[key] = seq
        while len(_CONTIG_CACHE) > _CONTIG_CACHE_MAX:
            _CONTIG_CACHE.popitem(last=False)
    else:
        _CONTIG_CACHE.move_to_end(key)
    return seq


def normalize_variants(
    df: DataFrame, ref_genome_path: str | None = None
) -> DataFrame:
    """Parsimony + left-alignment over (pos_start, ref, alt) — vt normalize
    (Tan et al. 2015), the algorithm behind Glow's ``normalize_variants``.
    Records with any symbolic/missing allele pass through untouched (the
    spec normalizes sequence alleles only).

    Scale: only the FASTA *region index* (a handful of ints per contig) is
    broadcast; executors fetch and cache just the contig slices their
    partitions touch (a 3 GB human genome never materializes on the
    driver).  Contig lookup is clean_contig-normalized on both sides, so a
    chr-prefixed reference resolves against cleaned variant contigs and
    vice versa.  The rewrite itself is an Arrow-batched pandas UDF
    (string-loop semantics are not expressible as native columns),
    map-only — no shuffle, so the plan scales with input splits."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    if ref_genome_path is not None:
        if ref_genome_path.endswith(".gz") and not _is_bgzf_fasta(ref_genome_path):
            raise ValueError(
                "normalize: plain gzip FASTA is not random-accessible — "
                "recompress with bgzip (BGZF), the standard reference "
                "distribution format, or provide the uncompressed file"
            )
        bref = spark.sparkContext.broadcast(
            load_fasta_region_index(ref_genome_path)
        )
    else:
        bref = None
    ref_path = ref_genome_path

    @pandas_udf(
        f"struct<{S.START}:int,{S.REF}:string,{S.ALT}:array<string>>"
    )
    def _norm(
        contig: pd.Series, pos: pd.Series, ref: pd.Series, alt: pd.Series
    ) -> pd.DataFrame:
        index = bref.value if bref is not None else {}
        out_pos, out_ref, out_alt = [], [], []
        for c, p, r, a in zip(contig, pos, ref, alt):
            alts = list(a) if a is not None else []
            if r is None or _is_symbolic(r) or any(_is_symbolic(x) for x in alts):
                out_pos.append(p), out_ref.append(r), out_alt.append(alts)
                continue
            span = index.get(clean_contig_py(c)) if c is not None else None
            seq = fetch_contig_seq(ref_path, span) if span is not None else None
            np_, alleles = _norm_one(int(p), [r] + alts, seq)
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
    """Native VCF text parse -> canonical columns + per-sample
    ``genotypes``, with the reference's ``normalization_mode`` option
    implemented natively (VCFRelation.scala:25-45 delegates to Glow; same
    modes, no dependency).  Sample names and ``Number=`` declarations come
    from a driver-side header read (header bytes only); genotype parsing
    is pure native column expressions — one struct per sample with the GT
    call indices typed (``calls``, -1 for '.') and the remaining FORMAT
    fields as a map."""
    if normalization_mode not in _MODES:
        raise ValueError(
            f"normalization_mode must be one of {_MODES}, got "
            f"{normalization_mode!r}"
        )
    headers = read_vcf_headers(path)
    # Number= declarations merged across files (first file wins on a
    # conflicting re-declaration of the same key)
    info_numbers: dict[str, str] = {}
    format_numbers: dict[str, str] = {}
    for h in headers.values():
        for k, v in h.info_numbers.items():
            info_numbers.setdefault(k, v)
        for k, v in h.format_numbers.items():
            format_numbers.setdefault(k, v)
    sample_lists = [h.samples for h in headers.values()]
    distinct_sample_lists = {tuple(s) for s in sample_lists}
    heterogeneous = len(distinct_sample_lists) > 1
    header = VcfHeader(
        sample_lists[0] if sample_lists else [], info_numbers, format_numbers
    )
    lines = spark.read.text(path)
    rows = lines.where(~F.col("value").startswith("#") & (F.trim("value") != ""))
    if heterogeneous:
        # per-file sample columns (Glow resolves headers per file): tag each
        # line with its source file and broadcast-join the tiny
        # file -> samples table — the text scan itself stays one pass
        rows = rows.withColumn(
            "_vcf_file",
            F.regexp_replace(F.input_file_name(), "^[a-z]+:/+", "/"),
        )
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
    cols = [
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
    ]
    keys = F.split(field(8), ":")

    def geno_entry(name_col: Column, sample_field: Column) -> Column:
        """One genotypes struct from a sample's raw colon-joined value."""
        vals = F.split(sample_field, ":")
        # trailing FORMAT fields may be dropped per sample (spec §1.6.2)
        m = F.least(F.size(keys), F.size(vals))
        fmap = F.map_from_arrays(F.slice(keys, 1, m), F.slice(vals, 1, m))
        gpos = F.array_position(keys, "GT").cast("int")
        gt = F.when(
            (gpos > 0) & (gpos <= F.size(vals)), F.element_at(vals, gpos)
        )
        calls = F.when(
            gt.isNotNull(),
            F.transform(
                F.split(gt, "[/|]"),
                lambda x: F.when((x == ".") | (x == ""), F.lit(-1))
                .otherwise(x)
                .cast("int"),
            ),
        )
        return F.struct(
            name_col.alias("sample_id"),
            F.coalesce(gt.contains("|"), F.lit(False)).alias("phased"),
            calls.alias("calls"),
            F.map_filter(fmap, lambda k, v: k != "GT").alias("fields"),
        )

    if heterogeneous and any(h.samples for h in headers.values()):
        # samples resolved per source file at runtime: genotype i parses
        # column 9+i against THIS file's sample list, so every call lands
        # under the right sample_id even when files disagree on columns
        samples_col = F.col("_samples")
        cols.append(
            F.when(
                field(8).isNotNull() & (F.size(samples_col) > 0),
                F.transform(
                    samples_col,
                    lambda s, i: geno_entry(s, F.get(f, i + F.lit(9))),
                ),
            ).alias("genotypes")
        )
    elif header.samples:
        entries = [
            geno_entry(F.lit(name), field(9 + i))
            for i, name in enumerate(header.samples)
        ]
        cols.append(
            F.when(field(8).isNotNull(), F.array(*entries)).alias("genotypes")
        )
    if heterogeneous:
        file_rows = [
            (os.path.abspath(fp), list(h.samples)) for fp, h in headers.items()
        ]
        files_df = spark.createDataFrame(
            file_rows, "_vcf_file string, _samples array<string>"
        )
        rows = rows.join(
            F.broadcast(files_df),
            rows["_vcf_file"] == files_df["_vcf_file"],
            "left",
        )
    df = rows.select(*cols)
    if normalization_mode in ("split", "split_and_normalize"):
        df = split_multiallelics(
            df, header.info_numbers, header.format_numbers
        )
    if normalization_mode in ("normalize", "split_and_normalize"):
        df = normalize_variants(df, ref_genome_path)
    return df

"""SQL surface for the table-valued operators.

The reference swaps Spark's analyzer to resolve its TVFs
(utvf/SeQuiLaAnalyzer.scala:44-133, ResolveTableValuedFunctionsSeq.scala:37-170).
A PySpark engine cannot (and should not) replace the analyzer; instead
``sequila_sql`` preprocesses the query string: each TVF call in a FROM
clause is evaluated through the Python operators, registered as a temp view,
and the call text is rewritten to the view name.  Catalyst then plans the
whole query as usual — same observable semantics as the reference's
analyzer rule, zero lifecycle hacks.

Supported TVFs (surface from ResolveTableValuedFunctionsSeq.scala:88-127):

  coverage('<table>' [, '<sample>'] [, '<blocks|bases|windows>'] [, <window>])
  pileup('<table>' [, '<sample>'] [, '<ref_table>'] [, <alts>] [, <quals>] [, <binSize>])
  bdg_grange('<contig>', <start>, <end>)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sequila_spark import schemas as S

_TVF_RE = re.compile(r"\b(coverage|pileup|bdg_grange)\s*\(([^()]*)\)", re.IGNORECASE)


def _parse_args(raw: str) -> list:
    args = []
    for part in raw.split(","):
        part = part.strip()
        if not part:
            continue
        if part.startswith(("'", '"')):
            args.append(part[1:-1])
        elif part.lower() in ("true", "false"):
            args.append(part.lower() == "true")
        else:
            args.append(int(part))
    return args


def _tvf_coverage(spark: SparkSession, args: list) -> DataFrame:
    from sequila_spark.operators.coverage import coverage

    table = args[0]
    sample = None
    mode = "blocks"
    window = None
    for a in args[1:]:
        if isinstance(a, str) and a in ("blocks", "bases", "windows"):
            mode = a
        elif isinstance(a, int):
            window = a
        elif isinstance(a, str):
            sample = a
    df = spark.table(table)
    if sample and S.SAMPLE in df.columns:
        df = df.where(F.col(S.SAMPLE) == sample)
    return coverage(df, mode=mode, window_size=window)


def _tvf_pileup(spark: SparkSession, args: list) -> DataFrame:
    from sequila_spark.operators.pileup import pileup

    table = args[0]
    sample = args[1] if len(args) > 1 and isinstance(args[1], str) else None
    ref_table = args[2] if len(args) > 2 and isinstance(args[2], str) and args[2] else None
    flags = [a for a in args if isinstance(a, bool)]
    ints = [a for a in args if isinstance(a, int) and not isinstance(a, bool)]
    alts = flags[0] if flags else True
    quals = flags[1] if len(flags) > 1 else False
    bin_size = ints[0] if ints else 1
    df = spark.table(table)
    if sample and S.SAMPLE in df.columns:
        df = df.where(F.col(S.SAMPLE) == sample)
    ref = spark.table(ref_table) if ref_table else None
    return pileup(df, ref=ref, alts=alts, quals=quals, qual_bin_size=bin_size)


def _tvf_grange(spark: SparkSession, args: list) -> DataFrame:
    contig, start, end = args
    return spark.createDataFrame(
        [(str(contig), int(start), int(end))],
        schema=f"{S.CONTIG} string, {S.START} int, {S.END} int",
    )


_TVFS = {"coverage": _tvf_coverage, "pileup": _tvf_pileup, "bdg_grange": _tvf_grange}


def sequila_sql(spark: SparkSession, query: str) -> DataFrame:
    """Run SQL with sequila TVF support (see module docstring)."""
    counter = 0

    def substitute(m: re.Match) -> str:
        nonlocal counter
        name = m.group(1).lower()
        args = _parse_args(m.group(2))
        df = _TVFS[name](spark, args)
        view = f"__sequila_tvf_{counter}"
        counter += 1
        df.createOrReplaceTempView(view)
        return view

    rewritten = _TVF_RE.sub(substitute, query)
    return spark.sql(rewritten)

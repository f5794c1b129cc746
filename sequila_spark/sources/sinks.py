"""Result sinks.

Semantics match the reference's writers (apps/DepthOfCoverage.scala:53-59,
pileup/PileupWriter.scala:26-34): CSV/TSV (optionally coalesced to a single
file), parquet, and ORC.  The reference's hand-rolled vectorized ORC writer
(pileup/model/VectorizedPileup.scala) is deliberately dropped — Spark's ORC
writer is already vectorized (SURVEY.md §2.1)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_result(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    single_file: bool = False,
    delimiter: str = "\t",
    mode: str = "overwrite",
) -> None:
    if single_file:
        df = df.coalesce(1)
    writer = df.write.mode(mode)
    if fmt in ("csv", "tsv"):
        writer.option("delimiter", delimiter if fmt == "tsv" else ",").option(
            "header", True
        ).csv(path)
    elif fmt == "parquet":
        writer.parquet(path)
    elif fmt == "orc":
        writer.orc(path)
    else:
        raise ValueError(f"unsupported format {fmt!r}")

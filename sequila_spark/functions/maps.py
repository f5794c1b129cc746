"""Pileup-map post-processing functions.

Semantics match the reference's pileup UDFs
(pileup/udfs/QualityFunctions.scala:7-58, pileup/udfs/AltFunctions.scala:6-22,
pileup/udfs/CoverageFunctions.scala:5).  In this engine alts are
``map<string,int>`` (1-char base keys) and quals are
``map<string, array<int>>`` (base -> per-quality histogram, index = qual
value), so the byte->char conversions of the reference become identity-shaped
but are kept for surface parity.  All are native higher-order-function
expressions — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F


def alts_to_char(alts: Column) -> Column:
    """map<base,count> with 1-char string keys (AltFunctions.scala:6-13)."""
    return F.transform_keys(alts, lambda k, _: k.cast("string"))


def altmap_to_str(alts: Column) -> Column:
    """Canonical sorted rendering for golden-file comparison
    (AltFunctions.scala:15-22), e.g. ``A:2|C:1``."""
    entries = F.array_sort(F.map_entries(alts))
    return F.array_join(
        F.transform(entries, lambda e: F.concat_ws(":", e["key"], e["value"])), "|"
    )


def quals_to_map(quals: Column) -> Column:
    """base -> {qual_char: count} with zero counts dropped; qual char is
    chr(index + 33) (QualityFunctions.scala:7-20)."""
    def hist_to_map(arr: Column) -> Column:
        entries = F.filter(
            F.zip_with(
                arr,
                F.sequence(F.lit(33), F.lit(33) + F.size(arr) - 1),
                lambda cnt, q: F.struct(F.char(q).alias("key"), cnt.alias("value")),
            ),
            lambda e: e["value"] > 0,
        )
        return F.map_from_entries(entries)

    return F.transform_values(quals, lambda _, v: hist_to_map(v))


def to_charmap(quals: Column) -> Column:
    """Same as quals_to_map with outer keys rendered as 1-char strings
    (QualityFunctions.scala:21-34)."""
    return F.transform_keys(quals_to_map(quals), lambda k, _: k.cast("string"))


def quals_to_cov(quals: Column, cov: Column) -> Column:
    """Sum of all histogram counts, falling back to ``cov`` when quals is
    null — an invariant check (QualityFunctions.scala:36-41)."""
    total = F.aggregate(
        F.flatten(F.map_values(quals)), F.lit(0), lambda acc, x: acc + x
    )
    return F.when(quals.isNull(), cov).otherwise(total).cast("int")


def quals_to_char(quals: Column) -> Column:
    """Outer byte keys -> 1-char strings (QualityFunctions.scala:43-50)."""
    return F.transform_keys(quals, lambda k, _: k.cast("string"))


def qualsmap_to_str(quals: Column) -> Column:
    """Canonical sorted string rendering (QualityFunctions.scala:52-58):
    ``A:33=2,34=1|C:40=7``."""
    outer = F.array_sort(F.map_entries(quals))
    def render_hist(arr: Column) -> Column:
        pairs = F.filter(
            F.zip_with(
                arr,
                F.sequence(F.lit(0), F.size(arr) - 1),
                lambda cnt, i: F.struct(i.alias("q"), cnt.alias("n")),
            ),
            lambda e: e["n"] > 0,
        )
        return F.array_join(
            F.transform(pairs, lambda e: F.concat_ws("=", e["q"], e["n"])), ","
        )

    return F.array_join(
        F.transform(outer, lambda e: F.concat_ws(":", e["key"], render_hist(e["value"]))),
        "|",
    )


def cov_equals(a: Column, b: Column) -> Column:
    """Coverage equality (CoverageFunctions.scala:5)."""
    return a == b


def register_map_functions(spark: SparkSession) -> None:
    """SQL surface for the map functions (names per utils/UDFRegister.scala).
    Registered as SQL temp functions over the string-keyed map types."""
    defs = {
        "altmap_to_str": (
            "m MAP<STRING,INT>",
            "STRING",
            "array_join(transform(array_sort(map_entries(m)),"
            " e -> concat_ws(':', e.key, e.value)), '|')",
        ),
        "quals_to_cov": (
            "m MAP<STRING,ARRAY<INT>>, cov INT",
            "INT",
            "CASE WHEN m IS NULL THEN cov ELSE "
            "CAST(aggregate(flatten(map_values(m)), 0, (acc, x) -> acc + x) AS INT) END",
        ),
        "cov_equals": ("a INT, b INT", "BOOLEAN", "a = b"),
        "alts_to_char": (
            "m MAP<STRING,INT>",
            "MAP<STRING,INT>",
            "transform_keys(m, (k, v) -> CAST(k AS STRING))",
        ),
        "quals_to_char": (
            "m MAP<STRING,ARRAY<INT>>",
            "MAP<STRING,ARRAY<INT>>",
            "transform_keys(m, (k, v) -> CAST(k AS STRING))",
        ),
        "quals_to_map": (
            "m MAP<STRING,ARRAY<INT>>",
            "MAP<STRING,MAP<STRING,INT>>",
            "transform_values(m, (k, v) -> map_from_entries("
            " filter(zip_with(v, sequence(33, 33 + size(v) - 1),"
            "  (cnt, q) -> struct(char(q) AS key, cnt AS value)), e -> e.value > 0)))",
        ),
        "to_charmap": (
            "m MAP<STRING,ARRAY<INT>>",
            "MAP<STRING,MAP<STRING,INT>>",
            "transform_values(m, (k, v) -> map_from_entries("
            " filter(zip_with(v, sequence(33, 33 + size(v) - 1),"
            "  (cnt, q) -> struct(char(q) AS key, cnt AS value)), e -> e.value > 0)))",
        ),
        "qualsmap_to_str": (
            "m MAP<STRING,ARRAY<INT>>",
            "STRING",
            "array_join(transform(array_sort(map_entries(m)), e -> concat_ws(':', e.key,"
            " array_join(transform(filter(zip_with(e.value, sequence(0, size(e.value)-1),"
            " (cnt, i) -> struct(i AS q, cnt AS n)), p -> p.n > 0),"
            " p -> concat_ws('=', p.q, p.n)), ','))), '|')",
        ),
    }
    for name, (args, rtype, body) in defs.items():
        for fname in (name, f"bdg_{name}"):
            spark.sql(
                f"CREATE OR REPLACE TEMPORARY FUNCTION {fname}({args}) "
                f"RETURNS {rtype} RETURN {body}"
            )

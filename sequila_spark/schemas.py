"""Canonical column names and schemas.

Mirrors the reference's centralized column-name registry
(``utils/Columns.scala:13-68``) and the Avro-declared record schemas
(``src/main/avro/input/*.avsc``).  Tests and queries reference these exact
names; any reimplementation must keep them.

Type deviations from the reference (documented, deliberate):
 - ``Map[Byte,Short]`` alts     -> ``MapType(StringType, IntegerType)``
   (byte keys do not round-trip through Arrow/Python; keys are 1-char bases).
 - ``Map[Int, Array[Short]]`` quals -> ``MapType(StringType, ArrayType(IntegerType))``.
 - Short/Byte counters          -> IntegerType (Arrow-friendly; semantics equal).
"""

from pyspark.sql import types as T

# --- canonical column names (utils/Columns.scala:13-68) ---------------------
SAMPLE = "sample_id"
QNAME = "qname"
FLAG = "flag"
CONTIG = "contig"
POS = "pos"
START = "pos_start"
END = "pos_end"
MAPQ = "mapq"
CIGAR = "cigar"
RNEXT = "rnext"
PNEXT = "pnext"
TLEN = "tlen"
SEQUENCE = "seq"
BASEQ = "qual"

COVERAGE = "coverage"
COUNT_REF = "countRef"
COUNT_NONREF = "countNonRef"
QUALS = "quals"
REF = "ref"
ALT = "alt"
ALTS = "alts"

# BED (src/main/avro/input/BED.avsc)
BED_NAME = "name"
BED_SCORE = "score"
BED_STRAND = "strand"
BED_THICK_START = "thick_start"
BED_THICK_END = "thick_end"
BED_ITEM_RGB = "item_rgb"
BED_BLOCK_COUNT = "block_count"
BED_BLOCK_SIZES = "block_sizes"
BED_BLOCK_STARTS = "block_starts"

# FASTQ (src/main/avro/input/SequencedFragment.avsc)
FASTQ_INSTRUMENT = "instrument_name"
FASTQ_RUN = "run_id"
FASTQ_FLOWCELL = "flowcell_id"
FASTQ_LANE = "lane"
FASTQ_TILE = "tile"
FASTQ_POS_X = "pos_x"
FASTQ_POS_Y = "pos_y"
FASTQ_FILTER = "filter_passed"
FASTQ_CONTROL = "control_num"
FASTQ_INDEX_SEQ = "index_seq"


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


# Typed optional-tag columns (src/main/avro/input/Alignment.avsc tag_* fields,
# which AlignmentRelation.scala:228-261 extracts one column each).  The
# engine's canonical storage is the single `tags` map below; these declared
# types drive the lazy tag_* projection (sources.bam.with_typed_tags) so a
# user's `SELECT tag_MD FROM reads` works with the reference's exact schema.
TAG_TYPES: dict[str, str] = {
    "AM": "int", "AS": "int", "BC": "string", "BQ": "string", "BZ": "string",
    "CB": "string", "CC": "string", "CG": "string", "CM": "int",
    "CO": "string", "CP": "int", "CQ": "string", "CR": "string",
    "CS": "string", "CT": "string", "CY": "string", "E2": "string",
    "FI": "int", "FS": "string", "FZ": "string", "H0": "int", "H1": "int",
    "H2": "int", "HI": "int", "IH": "int", "LB": "string", "MC": "string",
    "MD": "string", "MI": "string", "MQ": "int", "NH": "int", "NM": "int",
    "OA": "string", "OC": "string", "OP": "int", "OQ": "string",
    "OX": "string", "PG": "string", "PQ": "int", "PT": "string",
    "PU": "string", "Q2": "string", "QT": "string", "QX": "string",
    "R2": "string", "RG": "string", "RX": "string", "SA": "string",
    "SM": "int", "TC": "int", "U2": "string", "UQ": "int",
}

# --- Alignment (src/main/avro/input/Alignment.avsc; core fields) -------------
# The reference's Avro record also carries ~45 nullable tag_* columns; we model
# optional tags as a single map column (Arrow/Parquet friendly at scale).
ALIGNMENT_SCHEMA = T.StructType(
    [
        _f(SAMPLE, T.StringType()),
        _f(QNAME, T.StringType()),
        _f(FLAG, T.IntegerType()),
        _f(CONTIG, T.StringType()),
        _f(START, T.IntegerType()),
        _f(END, T.IntegerType()),
        _f(MAPQ, T.IntegerType()),
        _f(CIGAR, T.StringType()),
        _f(RNEXT, T.StringType()),
        _f(PNEXT, T.IntegerType()),
        _f(TLEN, T.IntegerType()),
        _f(SEQUENCE, T.StringType()),
        _f(BASEQ, T.StringType()),
        _f("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)

# --- BED (datasources/BED/BEDRelation.scala:16; BED.avsc) --------------------
BED_SCHEMA = T.StructType(
    [
        _f(CONTIG, T.StringType()),
        _f(START, T.IntegerType()),
        _f(END, T.IntegerType()),
        _f(BED_NAME, T.StringType()),
        _f(BED_SCORE, T.IntegerType()),
        _f(BED_STRAND, T.StringType()),
        _f(BED_THICK_START, T.IntegerType()),
        _f(BED_THICK_END, T.IntegerType()),
        _f(BED_ITEM_RGB, T.ArrayType(T.IntegerType())),
        _f(BED_BLOCK_COUNT, T.IntegerType()),
        _f(BED_BLOCK_SIZES, T.ArrayType(T.IntegerType())),
        _f(BED_BLOCK_STARTS, T.ArrayType(T.IntegerType())),
    ]
)

# --- FASTQ (datasources/FASTQ/SequenceFragmentRelation.scala:24) -------------
FASTQ_SCHEMA = T.StructType(
    [
        _f(SAMPLE, T.StringType()),
        _f(FASTQ_INSTRUMENT, T.StringType()),
        _f(FASTQ_RUN, T.IntegerType()),
        _f(FASTQ_FLOWCELL, T.StringType()),
        _f(FASTQ_LANE, T.IntegerType()),
        _f(FASTQ_TILE, T.IntegerType()),
        _f(FASTQ_POS_X, T.IntegerType()),
        _f(FASTQ_POS_Y, T.IntegerType()),
        _f(FASTQ_FILTER, T.BooleanType()),
        _f(FASTQ_CONTROL, T.IntegerType()),
        _f(FASTQ_INDEX_SEQ, T.StringType()),
        _f(SEQUENCE, T.StringType()),
        _f(BASEQ, T.StringType()),
    ]
)

# --- Interval struct (rangejoins/methods/transformations/RangeMethods.scala) -
INTERVAL_SCHEMA = T.StructType(
    [
        _f(START, T.IntegerType(), False),
        _f(END, T.IntegerType(), False),
    ]
)

# --- Coverage row (utvf/ResolveTableValuedFunctionsSeq.scala:239) ------------
COVERAGE_SCHEMA = T.StructType(
    [
        _f(CONTIG, T.StringType()),
        _f(START, T.IntegerType()),
        _f(END, T.IntegerType()),
        _f(REF, T.StringType()),
        _f(COVERAGE, T.IntegerType()),
    ]
)

# --- Pileup row (utvf/ResolveTableValuedFunctionsSeq.scala:249-250) ----------
PILEUP_SCHEMA = T.StructType(
    [
        _f(CONTIG, T.StringType()),
        _f(START, T.IntegerType()),
        _f(END, T.IntegerType()),
        _f(REF, T.StringType()),
        _f(COVERAGE, T.IntegerType()),
        _f(COUNT_REF, T.IntegerType()),
        _f(COUNT_NONREF, T.IntegerType()),
        _f(ALTS, T.MapType(T.StringType(), T.IntegerType())),
        _f(QUALS, T.MapType(T.StringType(), T.ArrayType(T.IntegerType()))),
    ]
)

# --- Variant (datasources/VCF/VCFRelation.scala:25-45 canonical columns) -----
VARIANT_SCHEMA = T.StructType(
    [
        _f(CONTIG, T.StringType()),
        _f(START, T.IntegerType()),
        _f(END, T.IntegerType()),
        _f("id", T.StringType()),
        _f(REF, T.StringType()),
        _f(ALT, T.ArrayType(T.StringType())),
        _f("qual", T.DoubleType()),
        _f("filter", T.StringType()),
        _f("info", T.MapType(T.StringType(), T.StringType())),
    ]
)

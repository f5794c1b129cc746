"""sequila_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of biodatageeks/sequila, re-expressed Spark-first.

The reference (read-only, /root/reference) is a Scala library that extends
Spark SQL with genomic interval joins, depth-of-coverage / pileup operators,
genomic file-format data sources and interval-arithmetic UDFs.  This package
provides the same capabilities as idiomatic PySpark: declarative DataFrame
plans that Catalyst/Tungsten can optimize (binned equi-joins instead of a
broadcast interval-tree physical operator, shuffle/window prefix sums instead
of custom partition-boundary machinery), plus the LLM-data-pipeline operator
family (dedup, similarity search, text analysis, multimodal columns) designed
for 100 TB scale.
"""

from sequila_spark.session import SequilaSession, get_spark, register
from sequila_spark.operators.range_join import range_join
from sequila_spark.operators.coverage import coverage
from sequila_spark.operators.pileup import mismatches_from_md, pileup, pileup_md
from sequila_spark.operators.asof import asof_join
from sequila_spark.operators.dedup import (
    dedup_components,
    exact_duplicates,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from sequila_spark.operators.sampling import (
    hash_split,
    mix_domains,
    stratified_sample,
)
from sequila_spark.operators.multimodal import (
    audio_features,
    byte_features,
    decode_media,
    register_decoder,
    resize_images,
    sample_frames,
)
from sequila_spark.operators.similarity import (
    ann_topk_lsh,
    cosine_dup_pairs,
    cosine_topk,
    ivf_index_load,
    ivf_index_save,
    ivf_topk,
)
from sequila_spark.operators.text import lang_id, quality_score, text_features
from sequila_spark.functions import intervals as interval_functions
from sequila_spark.converters import (
    compare_pileups,
    read_gatk_pileup,
    read_samtools_pileup,
    read_sequila_pileup,
)

__version__ = "0.1.0"

__all__ = [
    "SequilaSession",
    "get_spark",
    "register",
    "range_join",
    "coverage",
    "pileup",
    "pileup_md",
    "compare_pileups",
    "read_gatk_pileup",
    "read_samtools_pileup",
    "read_sequila_pileup",
    "mismatches_from_md",
    "interval_functions",
    # LLM-data-pipeline operator family
    "asof_join",
    "exact_duplicates",
    "ngram_jaccard_pairs",
    "minhash_dedup_pairs",
    "simhash",
    "dedup_components",
    "cosine_topk",
    "cosine_dup_pairs",
    "ann_topk_lsh",
    "ivf_topk",
    "ivf_index_save",
    "ivf_index_load",
    "hash_split",
    "stratified_sample",
    "mix_domains",
    "text_features",
    "quality_score",
    "lang_id",
    # multimodal family (native PNG/BMP/GIF/JPEG/WAV codecs built in)
    "byte_features",
    "decode_media",
    "resize_images",
    "sample_frames",
    "audio_features",
    "register_decoder",
]

from sequila_spark.sources.bed import read_bed
from sequila_spark.sources.fastq import read_fastq
from sequila_spark.sources.fasta import read_fasta, read_fasta_bases
from sequila_spark.sources.vcf import read_vcf
from sequila_spark.sources.adam import read_adam
from sequila_spark.sources.bam import (
    list_samples,
    read_alignments,
    read_bam,
    read_bam_native,
    read_cram_native,
    with_typed_tags,
    write_alignments,
    write_bam,
)
from sequila_spark.sources.sinks import write_result

__all__ = [
    "read_bed",
    "read_fastq",
    "read_fasta",
    "read_fasta_bases",
    "read_vcf",
    "read_adam",
    "read_alignments",
    "list_samples",
    "read_bam",
    "read_bam_native",
    "read_cram_native",
    "with_typed_tags",
    "write_bam",
    "write_alignments",
    "write_result",
]

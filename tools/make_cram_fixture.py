"""One-shot fixture generator: export the BAM-side decode of
NA12878.slice as parquet (fixtures/slicebam/reads.parquet) so the driver
gate can hash-compare the NATIVE CRAM DECODER against it per round — the
BAM and CRAM fixtures contain the identical 3172 records, decoded by two
fully independent codecs.

Run from the repo root:  python tools/make_cram_fixture.py
"""

import os
import sys

RES = "/root/reference/src/test/resources"
BAM = f"{RES}/NA12878.slice.bam"
OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "slicebam")


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from pyspark.sql import SparkSession

    from sequila_spark.sources import read_bam_native

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    os.makedirs(OUT, exist_ok=True)
    (
        read_bam_native(spark, BAM)
        .drop("tags")  # map column: compared via the pytest golden instead
        .repartition(1)
        .sortWithinPartitions("contig", "pos_start", "qname", "flag")
        .write.mode("overwrite")
        .parquet(f"{OUT}/reads.parquet")
    )
    print("fixture written to", os.path.abspath(OUT))


if __name__ == "__main__":
    main()

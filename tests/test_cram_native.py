"""Native CRAM 3.0 decoder vs the BAM decode of the SAME reads.

The reference project ships NA12878.slice in both BAM and CRAM
(src/test/resources/NA12878.slice.{bam,cram}) plus the FASTA the CRAM was
encoded against — so the pure-Python BAM codec provides an independent
golden for the pure-Python CRAM codec, record for record: every core
field (qname, flag, contig, pos, end, mapq, cigar, rnext, pnext, tlen,
seq, qual) must round-trip exactly, including the two reads extending
past the reference end (htslib stores their beyond-reference bases as
explicit base+qual 'B' features).

NM policy: htslib drops NM at encode when it assumes recomputability, so
a faithful decode yields NM only where the tag dictionary carried it
explicitly — those must equal the BAM's values.
"""

import os

import pytest

from sequila_spark.sources import bamcodec as B
from sequila_spark.sources import cramcodec as C

RES = "/root/reference/src/test/resources"
CRAM = f"{RES}/NA12878.slice.cram"
BAM = f"{RES}/NA12878.slice.bam"
FASTA = f"{RES}/NA12878.slice.fasta"

pytestmark = pytest.mark.skipif(
    not os.path.exists(CRAM), reason="reference CRAM fixture not present"
)


def _bam_records():
    with open(BAM, "rb") as f:
        st = B.BgzfReader(f)
        refs, _ = B.read_bam_header(st)
        return list(B.parse_records(st, refs))


@pytest.fixture(scope="module")
def decoded():
    cram = list(C.read_cram_records(CRAM, FASTA))
    bam = _bam_records()
    return cram, bam


def test_all_core_fields_roundtrip(decoded):
    cram, bam = decoded
    assert len(cram) == len(bam) == 3172
    a = sorted(r[:12] for r in cram)
    b = sorted(r[:12] for r in bam)
    assert a == b  # qname..qual, every record, byte-exact


def test_tags_roundtrip(decoded):
    cram, bam = decoded
    bkey = {(r[0], r[1]): r for r in bam}
    checked = 0
    nm_explicit = 0
    for r in cram:
        g = bkey[(r[0], r[1])]
        # RG travels in the RG data series, NM is dropped-as-recomputable;
        # everything else must match exactly
        gg = {k: v for k, v in g[12].items() if k not in ("RG", "NM")}
        cc = {k: v for k, v in r[12].items() if k != "NM"}
        assert cc == gg, (r[0], cc, gg)
        checked += len(gg)
        if "NM" in r[12]:  # explicitly preserved -> must equal the BAM's
            nm_explicit += 1
            assert r[12]["NM"] == g[12]["NM"]
    assert checked > 10_000 and nm_explicit == 2


def test_synthesize_nm_counts_edits():
    """Opt-in NM synthesis (samtools-calmd analog) fills NM for every
    mapped read from the feature walk."""
    data = open(CRAM, "rb").read()
    names = C.read_file_header(data)[0]
    fa = C.load_fasta(FASTA)
    recs = []
    for h in C.scan_containers(data):
        recs.extend(C.decode_container(data, h, names, fa, synthesize_nm=True))
    assert all("NM" in r[12] for r in recs if not r[1] & 0x4)


def test_read_cram_native_spark(spark):
    from pyspark.sql import functions as F

    from sequila_spark.sources import read_bam, read_bam_native

    df = read_bam(spark, CRAM, ref_path=FASTA)
    assert df.count() == 3172
    assert df.select("sample_id").distinct().collect()[0][0] == "NA12878"
    # contig cleaning applied the same as the BAM reader
    assert {r["contig"] for r in df.select("contig").distinct().collect()} == {"1"}
    # cross-source agreement on a downstream operator: per-contig read count
    bam_df = read_bam_native(spark, BAM)
    a = df.groupBy("contig").agg(F.count("*").alias("n")).collect()
    b = bam_df.groupBy("contig").agg(F.count("*").alias("n")).collect()
    assert {(r["contig"], r["n"]) for r in a} == {(r["contig"], r["n"]) for r in b}


def test_scan_containers_headers_only():
    """The planning scan sees every container with correct record counts
    and in-bounds byte ranges (it reads headers only — no data-block
    decompression happens at plan time)."""
    data = open(CRAM, "rb").read()
    containers = C.scan_containers(data)
    assert sum(h["n_records"] for h in containers) == 3172
    for h in containers:
        assert 0 < h["data_offset"] < len(data)
        assert h["data_offset"] + h["length"] <= len(data)


def test_missing_reference_is_loud():
    """Reference-based slices without ref_seqs must raise with guidance,
    not silently produce N sequences."""
    with pytest.raises(ValueError, match="ref_path"):
        list(C.read_cram_records(CRAM, None))

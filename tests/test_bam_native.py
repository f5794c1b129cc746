"""Native BAM codec: real-file decode, chunk-boundary ownership, and the
pysam-path owner-by-start rule (monkeypatched pysam — the library is not
installed here).

Input: the reference project's public test slice
(src/test/resources/NA12878.slice.bam) — behavior parity target for
datasources/BAM/AlignmentRelation.scala.  Tests skip if absent.
"""

import os
import shutil
import sys
import types

import pytest

from sequila_spark.sources import bamcodec as B

SLICE = "/root/reference/src/test/resources/NA12878.slice.bam"

needs_slice = pytest.mark.skipif(not os.path.exists(SLICE), reason="no reference BAM")


def _whole_file_records(path):
    with open(path, "rb") as f:
        st = B.BgzfReader(f)
        refs, _ = B.read_bam_header(st)
        return refs, list(B.parse_records(st, refs))


@needs_slice
def test_codec_decodes_slice():
    refs, recs = _whole_file_records(SLICE)
    assert len(recs) == 3172
    r = recs[0]
    qname, flag, contig, start, end, mapq, cigar, rnext, pnext, tlen, seq, qual, tags = r
    assert contig == "chr1" and start == 34 and cigar == "76M"
    assert end == start + 75  # 76M consumes 76 reference bases
    assert len(seq) == 76 and len(qual) == 76
    assert set("ACGTN") >= set(seq)
    assert "RG" in tags or "NM" in tags or tags == {}  # tags decoded


@needs_slice
def test_spans_equal_whole_file_ownership():
    """Chunked scans via the BAI linear index must reproduce the whole-file
    record multiset exactly — no duplicated or dropped reads at chunk
    boundaries (owner-by-start)."""
    from collections import Counter

    refs, recs = _whole_file_records(SLICE)
    whole = Counter((r[0], r[1], r[3]) for r in recs if r[2] is not None)
    linear = B.read_bai_linear(SLICE + ".bai")
    for chunk in (7_000, 100_000_000):  # many boundaries / single chunk
        got = Counter()
        for rid, s0, e0, voff in B.plan_spans(refs, linear, chunk):
            with open(SLICE, "rb") as fh:
                st = B.BgzfReader(fh, voff)
                for r in B.parse_records(st, refs, ref_id=rid, start0=s0, end0=e0):
                    got[(r[0], r[1], r[3])] += 1
        assert got == whole, f"chunk={chunk}"


@needs_slice
def test_read_bam_native_spark(spark, tmp_path):
    from sequila_spark.sources import read_bam_native

    df = read_bam_native(spark, SLICE, chunk=7_000)
    rows = df.collect()
    assert len(rows) == 3172
    assert df.columns[:8] == [
        "sample_id", "qname", "flag", "contig", "pos_start", "pos_end", "mapq", "cigar",
    ]
    assert rows[0]["sample_id"] == "NA12878"
    assert {r["contig"] for r in rows} == {"1"}  # chr1 -> cleaned to '1'
    # no-index fallback: single-task decode yields the same count
    unindexed = tmp_path / "noidx.bam"
    shutil.copyfile(SLICE, unindexed)
    assert read_bam_native(spark, str(unindexed)).count() == 3172


MULTISAMPLE = "/root/reference/src/test/resources/multisample"


@pytest.mark.skipif(not os.path.isdir(MULTISAMPLE), reason="no multisample dir")
def test_multisample_glob(spark):
    """OPTIONS(path '*.bam') parity: a glob yields one unioned relation
    with per-file sample_id (AlignmentRelation.scala:311-324)."""
    from sequila_spark.sources import read_bam_native

    df = read_bam_native(spark, f"{MULTISAMPLE}/*.bam")
    per_sample = {r["sample_id"]: r["count"] for r in df.groupBy("sample_id").count().collect()}
    assert set(per_sample) == {"NA12877", "NA12878", "NA12879"}
    assert all(v > 1000 for v in per_sample.values())
    # directory form and DISTINCT-sample fast path shape
    assert read_bam_native(spark, MULTISAMPLE).count() == sum(per_sample.values())


@pytest.mark.skipif(not os.path.isdir(MULTISAMPLE), reason="no multisample dir")
def test_list_samples_scan_elision(spark, tmp_path):
    """DISTINCT sample_id from metadata only: BAM file names and parquet
    partition directories, no data read."""
    from sequila_spark.sources import list_samples, read_bam_native, write_alignments

    assert list_samples(f"{MULTISAMPLE}/*.bam") == ["NA12877", "NA12878", "NA12879"]
    assert list_samples(MULTISAMPLE) == ["NA12877", "NA12878", "NA12879"]
    store = str(tmp_path / "aln_store")
    write_alignments(read_bam_native(spark, SLICE), store)
    assert list_samples(store) == ["NA12878"]


@needs_slice
def test_write_bam_roundtrip(spark, tmp_path):
    """BAM write (SURVEY §2.1 last row): decode the real slice, write it
    back coordinate-sorted with the native codec, decode again — core
    fields round-trip exactly and the output is standard BGZF (readable
    by plain gzip)."""
    import gzip

    from sequila_spark.sources import read_bam_native, write_bam

    df = read_bam_native(spark, SLICE).where("contig IS NOT NULL")
    out = str(tmp_path / "rt.bam")
    write_bam(df, out)

    # standard BGZF: stdlib gzip reads the multi-member stream
    with gzip.open(out, "rb") as g:
        assert g.read(4) == b"BAM\x01"

    back = read_bam_native(spark, out)
    key = ["qname", "flag", "contig", "pos_start", "pos_end", "mapq", "cigar", "seq", "qual"]
    a = sorted(map(tuple, df.select(*key).collect()))
    b = sorted(map(tuple, back.select(*key).collect()))
    assert a == b
    # coordinate-sorted output
    pos = [r["pos_start"] for r in back.where("contig = '1'").collect()]
    assert pos == sorted(pos)


def test_pysam_owner_by_start_rule(monkeypatch):
    """_pysam_reader must keep only reads whose reference_start falls inside
    the chunk's half-open range, so a read overlapping two chunks is owned
    by exactly one."""
    from sequila_spark.sources.bam import _pysam_reader

    class FakeRead:
        def __init__(self, name, start):
            self.query_name = name
            self.flag = 0
            self.reference_name = "1"
            self.reference_start = start          # 0-based, pysam style
            self.reference_end = start + 100
            self.mapping_quality = 60
            self.cigarstring = "100M"
            self.query_sequence = "A" * 100
            self.qual = "I" * 100

    READS = [FakeRead("a", 9_950), FakeRead("b", 10_000), FakeRead("c", 10_050)]

    class FakeAF:
        def __init__(self, path, mode, **kw):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def fetch(self, contig, start, end):
            # pysam semantics: every read OVERLAPPING [start, end)
            return [r for r in READS if r.reference_start + 100 > start and r.reference_start < end]

    fake = types.ModuleType("pysam")
    fake.AlignmentFile = FakeAF
    monkeypatch.setitem(sys.modules, "pysam", fake)

    chunk1 = [r[0] for r in _pysam_reader("x.bam", None, "1", 0, 10_000)]
    chunk2 = [r[0] for r in _pysam_reader("x.bam", None, "1", 10_000, 20_000)]
    assert chunk1 == ["a"]          # 'b' overlaps chunk1 but starts at its end
    assert chunk2 == ["b", "c"]     # each read owned by exactly one chunk
    assert not (set(chunk1) & set(chunk2))

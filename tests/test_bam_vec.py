"""Vectorized BAM decode (sources/bamvec) parity with the scalar codec.

The scalar ``bamcodec.parse_records`` is the pinned semantic reference
(itself pinned to the reference project's fixtures in test_bam_native);
the NumPy->Arrow batch decoder must reproduce it record-for-record —
including tags rendering, null seq/qual, '*' cigars, region ownership and
the trailing no-coordinate span.
"""

import os

import pytest

from sequila_spark.sources import bamcodec as B
from sequila_spark.sources import bamvec as BV

SLICE = "/root/reference/src/test/resources/NA12878.slice.bam"
MDBAM = (
    "/root/reference/src/test/resources/multichrom/mdbam/"
    "NA12878.multichrom.md.bam"
)


def _scalar(path, **kw):
    with open(path, "rb") as f:
        st = B.BgzfReader(f)
        refs, _ = B.read_bam_header(st)
        return refs, list(B.parse_records(st, refs, **kw))


def _vec(path, refs, span=None, **kw):
    rows = []
    for b in BV.iter_span_batches(path, refs, "S", span, **kw):
        cols = [c.to_pylist() for c in b.columns]
        cols[13] = [dict(m) for m in cols[13]]  # MapArray renders as pairs
        rows.extend(zip(*cols))
    return rows


@pytest.mark.parametrize(
    "path", [p for p in (SLICE, MDBAM) if os.path.exists(p)]
)
def test_whole_file_exact(path):
    """Every field of every record identical, in order — tags included."""
    refs, recs = _scalar(path)
    assert recs, "fixture decoded empty"
    assert _vec(path, refs) == [("S",) + r for r in recs]


@pytest.mark.skipif(not os.path.exists(SLICE), reason="no reference BAM")
def test_region_spans_ownership():
    """Chunked region decode reproduces the whole-file mapped multiset
    (owner-by-start), exactly like the scalar span scan."""
    from collections import Counter

    refs, recs = _scalar(SLICE)
    whole = Counter((r[0], r[1], r[3]) for r in recs if r[2] is not None)
    linear = B.read_bai_linear(SLICE + ".bai")
    got = Counter()
    for span in B.plan_spans(refs, linear, 7_000):
        for r in _vec(SLICE, refs, span=span):
            got[(r[1], r[2], r[4])] += 1
    assert got == whole


@pytest.mark.skipif(not os.path.exists(SLICE), reason="no reference BAM")
def test_no_tags_and_ordinal():
    refs, recs = _scalar(SLICE, with_tags=False)
    got = _vec(SLICE, refs, with_tags=False, with_ordinal=True, span_idx=3)
    assert [g[:-1] for g in got] == [("S",) + r for r in recs]
    assert [g[-1] for g in got] == [(3 << 32) | i for i in range(len(recs))]


def test_synthetic_edge_records(tmp_path):
    """Codec corner cases the real fixtures may not cover: empty seq ('*'),
    absent qual (0xFF fill), empty cigar, odd-length seq, unmapped rid=-1,
    B-array and float tags."""
    refs = [("c1", 1000), ("c2", 1000)]
    ref_ids = {n: i for i, (n, _) in enumerate(refs)}
    recs = [
        ("r1", 0, "c1", 10, 14, 60, "5M", "c2", 77, -5, "ACGTA", "IIIII",
         {"NM": "1", "MD": "5"}),
        ("odd", 0, "c1", 20, 22, 7, "3M", None, 0, 0, "ACG", "II#", {}),
        ("noseq", 4, None, 0, 0, 0, "*", None, 0, 0, None, None, {"ZZ": "x"}),
        ("noqual", 0, "c2", 5, 8, 1, "2M1D1M", None, 0, 0, "AAA", None, {}),
    ]
    path = str(tmp_path / "edge.bam")
    with open(path, "wb") as f:
        w = B.BgzfWriter(f)
        B.write_bam_header(w, refs, "")
        for r in recs:
            w.write(B.encode_record(r, ref_ids))
        w.close()
    srefs, scalar = _scalar(path)
    assert [r[0] for r in scalar] == ["r1", "odd", "noseq", "noqual"]
    assert scalar[2][10] is None and scalar[3][11] is None
    assert _vec(path, srefs) == [("S",) + r for r in scalar]


@pytest.mark.skipif(not os.path.exists(SLICE), reason="no reference BAM")
def test_batch_boundary_carry():
    """A record split across the streaming batch boundary must carry over
    intact — tiny batch_bytes forces a split inside nearly every record."""
    refs, recs = _scalar(SLICE)
    got = _vec(SLICE, refs, batch_bytes=257)
    assert got == [("S",) + r for r in recs]


def test_high_qual_bytes_render_latin1(tmp_path):
    """Qual bytes above phred 93 render +33 mod 256 as latin-1 code
    points (>= 0x80) — the vectorized path must fall back to the scalar
    renderer instead of shipping invalid UTF-8 buffers into Arrow
    (regression: the flat-buffer utf8 array crashed on byte 0xCF)."""
    refs = [("c1", 1000)]
    ref_ids = {"c1": 0}
    hi = "".join(chr(q + 33) for q in (200, 99, 10, 222, 0))
    recs = [
        ("hq", 0, "c1", 10, 14, 60, "5M", None, 0, 0, "ACGTA", hi, {}),
        ("lo", 0, "c1", 20, 24, 60, "5M", None, 0, 0, "ACGTA", "IIIII", {}),
    ]
    path = str(tmp_path / "hq.bam")
    with open(path, "wb") as f:
        w = B.BgzfWriter(f)
        B.write_bam_header(w, refs, "")
        for r in recs:
            w.write(B.encode_record(r, ref_ids))
        w.close()
    srefs, scalar = _scalar(path)
    assert any(ord(c) >= 0x80 for c in scalar[0][11])
    assert _vec(path, srefs) == [("S",) + r for r in scalar]


@pytest.mark.skipif(not os.path.exists(MDBAM), reason="no reference BAM")
def test_pruned_decode_matches_full():
    """columns= pruning changes WHAT is rendered, never the values: the
    pruned columns must equal the same columns sliced from a full decode,
    for every record (soft-clipped + deletion CIGARs included)."""
    refs, recs = _scalar(MDBAM, with_tags=False)
    cols = ["qname", "contig", "pos_start", "pos_end", "seq"]
    got = []
    for b in BV.iter_span_batches(
        MDBAM, refs, "S", None, with_tags=False, columns=cols
    ):
        got.extend(zip(*[c.to_pylist() for c in b.columns]))
    # scalar tuple layout: qname flag contig pos_start pos_end mapq cigar
    # rnext pnext tlen seq qual tags
    want = [(r[0], r[2], r[3], r[4], r[10]) for r in recs]
    assert got == want


@pytest.mark.skipif(not os.path.exists(MDBAM), reason="no reference BAM")
def test_with_blocks_matches_sql_cigar_walk(spark):
    """__blocks (decode-time vectorized M/=/X extraction) explodes to the
    exact (start, end) block multiset the SQL CIGAR fold produces on the
    same real reads — the equivalence operators/coverage relies on."""
    from collections import Counter

    from sequila_spark.operators.coverage import aligned_blocks
    from sequila_spark.sources.bam import read_bam_native

    with_b = read_bam_native(
        spark, MDBAM, with_tags=False,
        columns=["qname", "contig", "pos_start", "pos_end"], with_blocks=True,
    )
    fast = Counter(
        (r["qname"], r["contig"], r["__sq_bs"], r["__sq_be"])
        for r in aligned_blocks(with_b).collect()
    )
    full = read_bam_native(spark, MDBAM, with_tags=False).drop("__blocks")
    slow = Counter(
        (r["qname"], r["contig"], r["__sq_bs"], r["__sq_be"])
        for r in aligned_blocks(full, use_cigar=True).collect()
    )
    assert fast == slow and len(fast) > 0


@pytest.mark.skipif(not os.path.exists(MDBAM), reason="no reference BAM")
def test_blocks_respects_explicit_use_cigar_false(spark):
    """An explicit use_cigar=False must win over a __blocks column:
    whole-span (pos_start..pos_end) rows, not per-M-block rows."""
    from sequila_spark.operators.coverage import aligned_blocks
    from sequila_spark.sources.bam import read_bam_native

    df = read_bam_native(
        spark, MDBAM, with_tags=False,
        columns=["qname", "contig", "pos_start", "pos_end"], with_blocks=True,
    )
    rows = aligned_blocks(df, use_cigar=False)
    bad = rows.where(
        (rows["__sq_bs"] != rows["pos_start"]) | (rows["__sq_be"] != rows["pos_end"])
    ).count()
    assert bad == 0 and rows.count() == df.count()


def test_corrupt_block_size_raises(tmp_path):
    """A record whose int32 block_size is negative (or below the 32-byte
    fixed section) must raise, not stall the offset scan on the same
    position forever (the <= -4 case made end == off)."""
    import struct

    refs = [("c1", 1000)]
    path = str(tmp_path / "bad.bam")
    with open(path, "wb") as f:
        w = B.BgzfWriter(f)
        B.write_bam_header(w, refs, "")
        w.write(struct.pack("<i", -4) + b"\x00" * 64)
        w.close()
    with pytest.raises(ValueError, match="block_size"):
        list(BV.iter_span_batches(path, refs, "S", None))
    with open(path, "wb") as f:
        w = B.BgzfWriter(f)
        B.write_bam_header(w, refs, "")
        w.write(struct.pack("<i", 8) + b"\x00" * 64)
        w.close()
    with pytest.raises(ValueError, match="block_size"):
        list(BV.iter_span_batches(path, refs, "S", None))


def test_utf8_array_rejects_int32_offset_overflow():
    """Offsets past 2^31 would wrap silently in the int32 cast and ship
    corrupt Arrow string buffers; the guard must fail loudly instead."""
    import numpy as np

    cum = np.array([0, 1 << 31], dtype=np.int64)
    with pytest.raises(ValueError, match="int32 offset range"):
        BV._utf8_array(np.zeros(8, dtype=np.uint8), cum)


def test_ckern_and_python_scan_identical(tmp_path, monkeypatch):
    """The C offset-scan/gather kernel and the pure-Python/NumPy fallback
    must produce byte-identical decode output (when the kernel built)."""
    from sequila_spark.sources import _ckern

    if not _ckern.available():
        pytest.skip("C kernel unavailable on this host")
    path = SLICE if os.path.exists(SLICE) else None
    if path is None:
        pytest.skip("no reference BAM")
    refs, recs = _scalar(path)
    with_c = _vec(path, refs, batch_bytes=100_000)
    monkeypatch.setattr(_ckern, "_LIB", False)  # force fallback paths
    assert not _ckern.available()
    without_c = _vec(path, refs, batch_bytes=100_000)
    monkeypatch.setattr(_ckern, "_LIB", None)
    assert with_c == without_c == [("S",) + r for r in recs]


def test_corrupt_inner_fields_raise_before_gather(tmp_path):
    """Corrupt inner record fields (valid block_size, overstated l_seq /
    zero l_qname) must raise before any gather — the C memcpy path would
    otherwise read out of bounds where the scalar parser raises."""
    import struct

    refs = [("c1", 1000)]

    def rec(l_qname, n_cigar, l_seq, body_len):
        fixed = struct.pack(
            "<iiiBBHHHiiii", 32 + body_len, 0, 10, l_qname, 30, 0,
            n_cigar, 0, l_seq, -1, -1, 0,
        )
        return fixed + b"\x00" * body_len

    for bad in (
        rec(l_qname=0, n_cigar=0, l_seq=0, body_len=4),
        rec(l_qname=2, n_cigar=0, l_seq=1000, body_len=4),  # l_seq > record
    ):
        path = str(tmp_path / "inner.bam")
        with open(path, "wb") as f:
            w = B.BgzfWriter(f)
            B.write_bam_header(w, refs, "")
            w.write(bad)
            w.close()
        with pytest.raises(ValueError, match="corrupt BAM record"):
            list(BV.iter_span_batches(path, refs, "S", None))


def test_cigar_text_to_ops_parses_like_python():
    """cigar_text_to_ops (the fused CRAM coverage reader's vectorized
    text parse) agrees with a per-record Python regex parse on random
    cigars, including '*' records and multi-digit/op-dense strings."""
    import re

    import numpy as np

    from sequila_spark.sources import bamvec as BV

    rng = np.random.default_rng(13)
    ops = "MIDNSHP=X"
    cigs = []
    for _ in range(500):
        kind = rng.integers(0, 10)
        if kind == 0:
            cigs.append("*")
            continue
        n_ops = int(rng.integers(1, 8))
        cigs.append(
            "".join(
                f"{int(rng.integers(1, 10 ** int(rng.integers(1, 5))))}"
                f"{ops[rng.integers(0, len(ops))]}"
                for _ in range(n_ops)
            )
        )
    buf = np.frombuffer("".join(cigs).encode(), dtype=np.uint8)
    co = np.zeros(len(cigs) + 1, dtype=np.int64)
    np.cumsum([len(c) for c in cigs], out=co[1:])
    cig_u32, op_cum = BV.cigar_text_to_ops(buf, co)

    code = {c: i for i, c in enumerate(ops)}
    want = []
    for c in cigs:
        if c == "*":
            want.append([])
        else:
            want.append(
                [(int(n) << 4) | code[o] for n, o in re.findall(r"(\d+)(.)", c)]
            )
    got = [
        cig_u32[op_cum[i] : op_cum[i + 1]].tolist() for i in range(len(cigs))
    ]
    assert got == want

    with pytest.raises(ValueError, match="invalid CIGAR op"):
        BV.cigar_text_to_ops(
            np.frombuffer(b"10Z", dtype=np.uint8),
            np.array([0, 3], dtype=np.int64),
        )
    # empty buffer: n zero-op records
    u, oc = BV.cigar_text_to_ops(
        np.zeros(0, dtype=np.uint8), np.zeros(4, dtype=np.int64)
    )
    assert len(u) == 0 and oc.tolist() == [0, 0, 0, 0]

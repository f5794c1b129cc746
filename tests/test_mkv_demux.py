"""Native Matroska/WebM demux (sources/mkv.py) — the muxer lives HERE
(the mux_mp4 pattern): minimal spec-correct EBML containers built around
known opaque frame payloads, covering all four lacing modes, SimpleBlock
vs BlockGroup keyframe semantics, and sample_frames on Spark."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sequila_spark.sources.mkv import demux_mkv, parse_mkv

# ---------------------------------------------------------------------------
# muxer (test-side fixture builder)
# ---------------------------------------------------------------------------


def _size(v: int) -> bytes:
    """EBML size varint (marker stripped on read)."""
    n = 1
    while v >= (1 << (7 * n)) - 1:
        n += 1
    out = v | (1 << (7 * n))
    return out.to_bytes(n, "big")


def _id(eid: int) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big")


def _el(eid: int, body: bytes) -> bytes:
    return _id(eid) + _size(len(body)) + body


def _uint_el(eid: int, v: int) -> bytes:
    return _el(eid, v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big"))


def _simple_block(track: int, payloads: list[bytes], *, key: bool = True,
                  lacing: int = 0, ts: int = 0) -> bytes:
    """SimpleBlock body with the requested lacing (0 none, 1 Xiph,
    2 fixed, 3 EBML — note the wire encoding is flags bits 0x06:
    00/01/10/11 -> none/Xiph/fixed/EBML)."""
    wire = {0: 0, 1: 1, 2: 2, 3: 3}[lacing]
    flags = (0x80 if key else 0) | (wire << 1)
    body = _size(track) + struct.pack(">h", ts) + bytes([flags])
    if lacing == 0:
        assert len(payloads) == 1
        return _el(0xA3, body + payloads[0])
    body += bytes([len(payloads) - 1])
    if lacing == 1:  # Xiph
        for p in payloads[:-1]:
            n = len(p)
            body += b"\xff" * (n // 255) + bytes([n % 255])
    elif lacing == 2:  # fixed
        assert len({len(p) for p in payloads}) == 1
    else:  # EBML: first absolute, rest signed deltas — sizes cover only
        # the first n-1 frames, so a 1-frame lace carries NO size fields
        if len(payloads) > 1:
            body += _size(len(payloads[0]))
        prev = len(payloads[0])
        for p in payloads[1:-1]:
            # 2-byte signed vint: bias 2^13-1, marker bit 1<<14
            raw = (len(p) - prev) + (1 << 13) - 1
            assert 0 <= raw < (1 << 14) - 1
            body += (raw | (1 << 14)).to_bytes(2, "big")
            prev = len(p)
    return _el(0xA3, body + b"".join(payloads))


def mux_mkv(blocks, *, codec: str = "V_MOCK", width: int = 64,
            height: int = 48, duration_ms: float = 5000.0,
            with_audio_track: bool = False, doctype: bytes = b"matroska",
            block_group_refs: dict[int, bool] | None = None) -> bytes:
    """blocks = list of (track, payloads, key, lacing) tuples; track 1 is
    the video track.  ``block_group_refs[i]=True`` wraps block i in a
    BlockGroup WITH a ReferenceBlock (i.e. NOT a keyframe)."""
    header = _el(
        0x1A45DFA3,
        _uint_el(0x4286, 1) + _el(0x4282, doctype) + _uint_el(0x4287, 4),
    )
    video = _el(0xE0, _uint_el(0xB0, width) + _uint_el(0xBA, height))
    t1 = _el(
        0xAE,
        _uint_el(0xD7, 1) + _uint_el(0x83, 1)
        + _el(0x86, codec.encode()) + video,
    )
    tracks_body = t1
    if with_audio_track:
        tracks_body += _el(
            0xAE,
            _uint_el(0xD7, 2) + _uint_el(0x83, 2) + _el(0x86, b"A_MOCK"),
        )
    tracks = _el(0x1654AE6B, tracks_body)
    info = _el(
        0x1549A966,
        _uint_el(0x2AD7B1, 1_000_000)
        + _el(0x4489, struct.pack(">d", duration_ms)),
    )
    cluster_body = _uint_el(0xE7, 0)
    for i, (track, payloads, key, lacing) in enumerate(blocks):
        sb = _simple_block(track, payloads, key=key, lacing=lacing)
        if block_group_refs is not None and i in block_group_refs:
            inner = sb[:1].replace(b"\xa3", b"\xa1") + sb[1:]  # Block id
            grp = inner
            if block_group_refs[i]:
                grp += _el(0xFB, b"\x00")  # ReferenceBlock -> not a keyframe
            sb = _el(0xA0, grp)
        cluster_body += sb
    segment = _el(
        0x18538067, info + tracks + _el(0x1F43B675, cluster_body)
    )
    return header + segment


def _payloads(sizes, seed=5):
    rng = np.random.default_rng(seed)
    return [
        bytes(rng.integers(0, 256, size=s, dtype=np.uint8)) for s in sizes
    ]


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_demux_unlaced_blocks():
    ps = _payloads([30, 70, 45])
    b = mux_mkv([(1, [p], i == 0, 0) for i, p in enumerate(ps)])
    d = demux_mkv(b)
    assert d["frames"] == ps
    assert (d["codec"], d["width"], d["height"]) == ("V_MOCK", 64, 48)
    assert d["duration_s"] == 5.0 and d["track_id"] == 1
    assert d["sync_idx"] == [0]


@pytest.mark.parametrize("lacing", [1, 2, 3])
def test_demux_lacing_modes(lacing):
    sizes = [64, 64, 64] if lacing == 2 else [300, 12, 77]
    ps = _payloads(sizes, seed=lacing)
    b = mux_mkv([(1, ps, True, lacing)])
    assert demux_mkv(b)["frames"] == ps


@pytest.mark.parametrize("lacing", [1, 2, 3])
def test_single_frame_lace(lacing):
    # a lace-count byte of 0 (n_frames == 1) carries size fields for the
    # first n-1 frames, i.e. none — the whole remainder is ONE frame.  The
    # EBML path used to read an absolute first-lace size here and split
    # the frame in two (r13 ADVICE).
    ps = _payloads([137], seed=7)
    b = mux_mkv([(1, ps, True, lacing)])
    assert demux_mkv(b)["frames"] == ps


def test_audio_blocks_filtered_out():
    vp = _payloads([40, 50], seed=2)
    ap = _payloads([10], seed=3)
    b = mux_mkv(
        [(1, [vp[0]], True, 0), (2, ap, True, 0), (1, [vp[1]], False, 0)],
        with_audio_track=True,
    )
    d = demux_mkv(b)
    assert d["frames"] == vp


def test_block_group_keyframe_from_reference_block():
    ps = _payloads([20, 20, 20], seed=4)
    b = mux_mkv(
        [(1, [p], False, 0) for p in ps],
        block_group_refs={0: False, 1: True, 2: True},
    )
    d = demux_mkv(b)
    # group 0 has NO ReferenceBlock -> keyframe; 1 and 2 do -> not
    assert d["frames"] == ps and d["sync_idx"] == [0]


def test_webm_doctype_and_parse_metadata():
    ps = _payloads([25], seed=6)
    b = mux_mkv([(1, ps, True, 0)], doctype=b"webm", codec="V_VP9")
    info = parse_mkv(b)
    assert info["doctype"] == "webm"
    assert info["tracks"][0]["codec"] == "V_VP9"
    assert demux_mkv(b)["codec"] == "V_VP9"


def test_no_video_track_and_garbage_loud():
    ps = _payloads([10], seed=7)
    with pytest.raises(ValueError):
        demux_mkv(b"\x00\x01\x02\x03" * 10)
    good = mux_mkv([(1, ps, True, 0)])
    for cut in (3, 15, len(good) // 2, len(good) - 3):
        with pytest.raises(ValueError):
            demux_mkv(good[:cut])


def test_registry_and_sample_frames(spark):
    from sequila_spark.operators.multimodal import sample_frames

    ps = _payloads([33, 44, 55, 66], seed=9)
    b = mux_mkv([(1, ps[:2], True, 1), (1, ps[2:], False, 3)])
    df = spark.createDataFrame(
        [(1, "video/x-matroska", bytearray(b))],
        "doc_id LONG, media_type STRING, payload BINARY",
    )
    rows = sorted(
        (r["frame_idx"], bytes(r["frame"]))
        for r in sample_frames(df, every_n=3).collect()
    )
    assert rows == [(0, ps[0]), (3, ps[3])]

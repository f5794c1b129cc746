"""Native MP4/ISO-BMFF demux (sources/mp4.py) — the muxer lives HERE
(the encode_png/encode_flac pattern): minimal spec-correct containers
built from ISO/IEC 14496-12 box grammar around known opaque sample
payloads, demuxed back byte-exact, end-to-end through
operators/multimodal.sample_frames on Spark."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sequila_spark.sources.mp4 import demux_mp4, parse_mp4

# ---------------------------------------------------------------------------
# muxer (test-side fixture builder)
# ---------------------------------------------------------------------------


def _box(cc: bytes, *parts: bytes) -> bytes:
    body = b"".join(parts)
    return struct.pack(">I", 8 + len(body)) + cc + body


def _fullbox(cc: bytes, version: int, body: bytes) -> bytes:
    return _box(cc, bytes([version]) + b"\x00\x00\x00" + body)


def _stsc_entries(chunks: list[list[bytes]]) -> list[tuple[int, int, int]]:
    entries = []
    for i, ch in enumerate(chunks):
        if not entries or entries[-1][1] != len(ch):
            entries.append((i + 1, len(ch), 1))
    return entries


def mux_mp4(
    chunks: list[list[bytes]],
    *,
    handler: bytes = b"vide",
    codec: bytes = b"mk01",
    width: int = 64,
    height: int = 48,
    timescale: int = 1000,
    duration: int = 5000,
    syncs: list[int] | None = None,
    co64: bool = False,
    v1: bool = False,
    largesize_mdat: bool = False,
    track_id: int = 7,
) -> bytes:
    """Minimal valid MP4: ftyp + mdat(sample bytes) + moov(one track)."""
    sizes = [len(s) for ch in chunks for s in ch]
    mdat_body = b"".join(s for ch in chunks for s in ch)
    ftyp = _box(b"ftyp", b"isom", struct.pack(">I", 0), b"isomiso2")
    if largesize_mdat:
        mdat = (
            struct.pack(">I", 1) + b"mdat"
            + struct.pack(">Q", 16 + len(mdat_body)) + mdat_body
        )
        data_at = len(ftyp) + 16
    else:
        mdat = _box(b"mdat", mdat_body)
        data_at = len(ftyp) + 8

    offs = []
    pos = data_at
    for ch in chunks:
        offs.append(pos)
        pos += sum(len(s) for s in ch)

    if v1:
        tkhd = _fullbox(
            b"tkhd", 1,
            struct.pack(">QQIIQ", 0, 0, track_id, 0, duration)
            + b"\x00" * 52,
        )
        mdhd = _fullbox(
            b"mdhd", 1,
            struct.pack(">QQIQ", 0, 0, timescale, duration)
            + struct.pack(">HH", 0x55C4, 0),
        )
    else:
        tkhd = _fullbox(
            b"tkhd", 0,
            struct.pack(">IIIII", 0, 0, track_id, 0, duration)
            + b"\x00" * 52,
        )
        mdhd = _fullbox(
            b"mdhd", 0,
            struct.pack(">IIII", 0, 0, timescale, duration)
            + struct.pack(">HH", 0x55C4, 0),
        )
    hdlr = _fullbox(
        b"hdlr", 0, struct.pack(">I", 0) + handler + b"\x00" * 12 + b"t\x00"
    )
    entry = (
        struct.pack(">I", 86) + codec + b"\x00" * 6 + struct.pack(">H", 1)
        + b"\x00" * 16 + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000) + b"\x00" * 4
        + struct.pack(">H", 1) + b"\x00" * 32 + struct.pack(">Hh", 24, -1)
    )
    stsd = _fullbox(b"stsd", 0, struct.pack(">I", 1) + entry)
    stts = _fullbox(
        b"stts", 0, struct.pack(">III", 1, len(sizes), 100)
    )
    stsc_e = _stsc_entries(chunks)
    stsc = _fullbox(
        b"stsc", 0,
        struct.pack(">I", len(stsc_e))
        + b"".join(struct.pack(">III", *e) for e in stsc_e),
    )
    stsz = _fullbox(
        b"stsz", 0,
        struct.pack(">II", 0, len(sizes))
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    if co64:
        stco = _fullbox(
            b"co64", 0,
            struct.pack(">I", len(offs))
            + b"".join(struct.pack(">Q", o) for o in offs),
        )
    else:
        stco = _fullbox(
            b"stco", 0,
            struct.pack(">I", len(offs))
            + b"".join(struct.pack(">I", o) for o in offs),
        )
    stbl_parts = [stsd, stts, stsc, stsz, stco]
    if syncs is not None:
        stbl_parts.append(
            _fullbox(
                b"stss", 0,
                struct.pack(">I", len(syncs))
                + b"".join(struct.pack(">I", s) for s in syncs),
            )
        )
    stbl = _box(b"stbl", *stbl_parts)
    minf = _box(b"minf", _fullbox(b"vmhd", 0, b"\x00" * 8), stbl)
    mdia = _box(b"mdia", mdhd, hdlr, minf)
    trak = _box(b"trak", tkhd, mdia)
    mvhd = _fullbox(
        b"mvhd", 0,
        struct.pack(">IIII", 0, 0, timescale, duration) + b"\x00" * 80,
    )
    moov = _box(b"moov", mvhd, trak)
    return ftyp + mdat + moov


def _payloads(n: int, seed: int = 5) -> list[bytes]:
    rng = np.random.default_rng(seed)
    return [
        bytes(rng.integers(0, 256, size=int(rng.integers(20, 200)),
                           dtype=np.uint8))
        for _ in range(n)
    ]


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_demux_roundtrip_two_chunks():
    ps = _payloads(5)
    b = mux_mp4([ps[:3], ps[3:]])
    d = demux_mp4(b)
    assert d["frames"] == ps
    assert d["n_frames"] == 5
    assert (d["codec"], d["width"], d["height"]) == ("mk01", 64, 48)
    assert d["duration_s"] == 5.0 and d["track_id"] == 7
    assert d["sync_idx"] == [0, 1, 2, 3, 4]  # no stss -> all sync


def test_stsc_run_coalescing_and_uneven_chunks():
    ps = _payloads(7, seed=9)
    chunks = [ps[:2], ps[2:4], ps[4:7]]  # stsc runs (1,2),(3,3)
    b = mux_mp4(chunks)
    assert _stsc_entries(chunks) == [(1, 2, 1), (3, 3, 1)]
    assert demux_mp4(b)["frames"] == ps


def test_stss_sync_samples():
    ps = _payloads(6, seed=2)
    b = mux_mp4([ps], syncs=[1, 4])
    d = demux_mp4(b)
    assert d["sync_idx"] == [0, 3]
    assert d["frames"] == ps


def test_co64_v1_and_largesize_mdat():
    ps = _payloads(4, seed=3)
    b = mux_mp4([ps[:2], ps[2:]], co64=True, v1=True, largesize_mdat=True,
                timescale=90000, duration=180000)
    d = demux_mp4(b)
    assert d["frames"] == ps
    assert d["duration_s"] == 2.0


def test_audio_only_is_loud_and_parse_sees_it():
    ps = _payloads(3, seed=4)
    b = mux_mp4([ps], handler=b"soun", codec=b"mp4a")
    info = parse_mp4(b)
    assert info["tracks"][0]["handler"] == "soun"
    with pytest.raises(ValueError, match="no video track"):
        demux_mp4(b)


def test_not_mp4_and_truncations_loud():
    ps = _payloads(3, seed=6)
    good = mux_mp4([ps])
    with pytest.raises(ValueError):
        demux_mp4(b"RIFF" + good[4:])
    for cut in (5, 20, len(good) // 2, len(good) - 5):
        with pytest.raises(ValueError):
            demux_mp4(good[:cut])


def test_sample_span_outside_file_is_loud():
    ps = _payloads(2, seed=8)
    b = bytearray(mux_mp4([ps]))
    # inflate the last stsz entry so the final sample overruns the file
    i = b.find(b"stsz")
    (n,) = struct.unpack_from(">I", b, i + 12)
    struct.pack_into(">I", b, i + 16 + (n - 1) * 4, 1 << 24)
    with pytest.raises(ValueError, match="outside the file|allocation"):
        demux_mp4(bytes(b))


def test_fixed_stsz_huge_count_rejected_before_allocation():
    # fixed-size stsz (sample_size != 0) carries no per-entry table to
    # bound count against; a crafted count like 0xFFFFFFFF must be
    # rejected BEFORE [fixed] * count allocates a multi-GB list
    # (r13 ADVICE: the old guard only applied on the fixed == 0 path).
    ps = _payloads(2, seed=9)
    b = bytearray(mux_mp4([ps]))
    i = b.find(b"stsz")
    struct.pack_into(">II", b, i + 8, 4, 0xFFFFFFFF)  # fixed=4, count=4B
    with pytest.raises(ValueError, match="stsz count"):
        demux_mp4(bytes(b))
    # and a fixed size whose total overruns the allocation guard
    struct.pack_into(">II", b, i + 8, 1 << 20, 1 << 12)  # 4 GiB total
    with pytest.raises(ValueError, match="stsz count"):
        demux_mp4(bytes(b))


def test_registry_and_sample_frames(spark):
    """video/mp4 dispatches through the registry; sample_frames demuxes
    real container payloads into per-frame rows."""
    from sequila_spark.operators.multimodal import sample_frames

    ps = _payloads(6, seed=11)
    b = mux_mp4([ps[:3], ps[3:]])
    df = spark.createDataFrame(
        [(1, "video/mp4", bytearray(b))],
        "doc_id LONG, media_type STRING, payload BINARY",
    )
    rows = sorted(
        (r["frame_idx"], bytes(r["frame"]))
        for r in sample_frames(df, every_n=2).collect()
    )
    assert rows == [(0, ps[0]), (2, ps[2]), (4, ps[4])]

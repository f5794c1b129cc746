"""Native Matroska/WebM (EBML) container demux for the multimodal
registry — zero new dependencies.

The MP4 demuxer's twin (sources/mp4.py): EBML varint grammar, Segment →
Tracks/Info metadata, and Cluster → SimpleBlock/BlockGroup frame
extraction with ALL FOUR lacing modes (none, Xiph, fixed, EBML), so
``sample_frames`` demuxes real .mkv/.webm payloads.  Codec bitstreams
(VP9/AV1/H.264/Opus...) stay opaque bytes — the registry stub boundary.

Spec: the public Matroska/EBML specifications (RFC 8794 EBML; the
matroska.org element registry).  Corrupt payloads raise ValueError per
the media-fuzz contract: varints, element spans and lace sizes are all
bounds-checked.
"""

from __future__ import annotations

import struct

#: allocation guard: total demuxed frame bytes must stay under 1 GiB
_MAX_SAMPLE_BYTES = 1 << 30

_EBML = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESTAMP_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_CLUSTER = 0x1F43B675
_SIMPLE_BLOCK = 0xA3
_BLOCK_GROUP = 0xA0
_BLOCK = 0xA1
_DOCTYPE = 0x4282


def _vint(b: bytes, i: int, end: int, keep_marker: bool) -> tuple[int, int]:
    """EBML variable-length integer at ``i`` -> (value, next offset).
    Element IDs keep the length-marker bit (matching the registry
    constants above); sizes strip it.  An all-ones size means
    unknown-size and returns -1."""
    if i >= end:
        raise ValueError("truncated EBML varint")
    first = b[i]
    if first == 0:
        raise ValueError("invalid EBML varint (>8 bytes)")
    n = 9 - first.bit_length()  # leading zeros + 1
    if i + n > end:
        raise ValueError("truncated EBML varint")
    v = first if keep_marker else first & ((1 << (8 - n)) - 1)
    for k in range(1, n):
        v = (v << 8) | b[i + k]
    if not keep_marker and v == (1 << (7 * n)) - 1:
        return -1, i + n  # unknown size
    return v, i + n


def _elements(b: bytes, start: int, end: int):
    """Yield (element id, body_start, body_end); unknown-size elements
    extend to the parent's end."""
    i = start
    while i < end:
        eid, i = _vint(b, i, end, keep_marker=True)
        size, i = _vint(b, i, end, keep_marker=False)
        if size < 0:
            yield eid, i, end
            return
        if i + size > end:
            raise ValueError(f"EBML element 0x{eid:X} overruns its parent")
        yield eid, i, i + size
        i += size


def _find(b: bytes, start: int, end: int, eid: int):
    for e, s, ee in _elements(b, start, end):
        if e == eid:
            return s, ee
    return None


def _uint(b: bytes, s: int, e: int) -> int:
    if e - s > 8:
        raise ValueError("EBML uint wider than 8 bytes")
    return int.from_bytes(b[s:e], "big")


def _block_frames(b: bytes, s: int, e: int) -> tuple[int, bool, list[bytes]]:
    """(Simple)Block body -> (track_number, keyframe, frames) handling
    all four lacing modes."""
    track, i = _vint(b, s, e, keep_marker=False)
    if i + 3 > e:
        raise ValueError("truncated Matroska block header")
    flags = b[i + 2]
    key = bool(flags & 0x80)
    i += 3
    lacing = (flags >> 1) & 0x3
    if lacing == 0:
        return track, key, [b[i:e]]
    if i >= e:
        raise ValueError("truncated Matroska lace header")
    n_frames = b[i] + 1
    i += 1
    sizes: list[int] = []
    if lacing == 2:  # fixed-size
        total = e - i
        if total % n_frames:
            raise ValueError("Matroska fixed lacing does not divide evenly")
        sizes = [total // n_frames] * n_frames
    elif lacing == 1:  # Xiph
        for _ in range(n_frames - 1):
            sz = 0
            while True:
                if i >= e:
                    raise ValueError("truncated Xiph lace sizes")
                sz += b[i]
                stop = b[i] != 255
                i += 1
                if stop:
                    break
            sizes.append(sz)
        sizes.append((e - i) - sum(sizes))
    elif n_frames == 1:
        # EBML lacing encodes sizes only for the first n-1 frames, i.e.
        # none at all when the lace holds a single frame — the remainder
        # of the block IS the frame (the Xiph/fixed paths get this right
        # by construction; reading a size field here would split one
        # frame into two).
        sizes = [e - i]
    else:  # EBML lacing: first absolute, rest signed deltas
        first, i = _vint(b, i, e, keep_marker=False)
        if first < 0:
            raise ValueError("invalid EBML lace size")
        sizes.append(first)
        prev = first
        for _ in range(n_frames - 2):
            j = i
            raw, i = _vint(b, j, e, keep_marker=False)
            if raw < 0:
                raise ValueError("invalid EBML lace delta")
            n_bytes = i - j
            delta = raw - ((1 << (7 * n_bytes - 1)) - 1)  # signed bias
            prev += delta
            sizes.append(prev)
        sizes.append((e - i) - sum(sizes))
    if any(sz < 0 for sz in sizes) or sum(sizes) != e - i:
        raise ValueError("Matroska lace sizes inconsistent with block")
    frames = []
    for sz in sizes:
        frames.append(b[i : i + sz])
        i += sz
    return track, key, frames


def parse_mkv(b: bytes) -> dict:
    """Parse the container -> {"doctype", "timestamp_scale_ns",
    "duration_s", "tracks": [...]} with per-track {number, type, codec,
    width, height}; frame payloads come from :func:`demux_mkv`."""
    top = list(_elements(b, 0, len(b)))
    if not top or top[0][0] != _EBML:
        raise ValueError("not a Matroska file (no EBML header)")
    doctype = None
    hs, he = top[0][1], top[0][2]
    span = _find(b, hs, he, _DOCTYPE)
    if span:
        doctype = b[span[0] : span[1]].decode("latin-1")
    seg = next(((s, e) for eid, s, e in top if eid == _SEGMENT), None)
    if seg is None:
        raise ValueError("Matroska file has no Segment")

    scale = 1_000_000
    duration = None
    tracks = []
    for eid, s, e in _elements(b, *seg):
        if eid == _INFO:
            span = _find(b, s, e, _TIMESTAMP_SCALE)
            if span:
                scale = _uint(b, *span)
            span = _find(b, s, e, _DURATION)
            if span:
                n = span[1] - span[0]
                if n == 4:
                    duration = struct.unpack(">f", b[span[0] : span[1]])[0]
                elif n == 8:
                    duration = struct.unpack(">d", b[span[0] : span[1]])[0]
                else:
                    raise ValueError("Matroska Duration must be float32/64")
        elif eid == _TRACKS:
            for t_eid, ts, te in _elements(b, s, e):
                if t_eid != _TRACK_ENTRY:
                    continue
                t = {"number": None, "type": None, "codec": None,
                     "width": None, "height": None}
                for f_eid, fs, fe in _elements(b, ts, te):
                    if f_eid == _TRACK_NUMBER:
                        t["number"] = _uint(b, fs, fe)
                    elif f_eid == _TRACK_TYPE:
                        t["type"] = _uint(b, fs, fe)
                    elif f_eid == _CODEC_ID:
                        t["codec"] = b[fs:fe].decode("latin-1")
                    elif f_eid == _VIDEO:
                        w = _find(b, fs, fe, _PIXEL_W)
                        h = _find(b, fs, fe, _PIXEL_H)
                        t["width"] = _uint(b, *w) if w else None
                        t["height"] = _uint(b, *h) if h else None
                tracks.append(t)
    if not tracks:
        raise ValueError("Matroska Segment has no Tracks")
    return {
        "doctype": doctype,
        "timestamp_scale_ns": scale,
        "duration_s": (duration * scale / 1e9) if duration is not None else None,
        "tracks": tracks,
        "_segment": seg,
    }


def demux_mkv(b: bytes) -> dict:
    """Registry decoder (``video/x-matroska`` / ``video/webm``): demux
    the FIRST video track's frames -> the fake_video_decoder frames
    contract plus container metadata (codec, dims, duration,
    sync_idx = keyframes)."""
    info = parse_mkv(b)
    vid = next((t for t in info["tracks"] if t["type"] == 1), None)
    if vid is None:
        raise ValueError("Matroska file has no video track")
    frames: list[bytes] = []
    sync: list[int] = []
    total = 0
    for eid, s, e in _elements(b, *info["_segment"]):
        if eid != _CLUSTER:
            continue
        for c_eid, cs, ce in _elements(b, s, e):
            body = None
            group_key = None
            if c_eid == _SIMPLE_BLOCK:
                body = (cs, ce)
            elif c_eid == _BLOCK_GROUP:
                span = _find(b, cs, ce, _BLOCK)
                if span is None:
                    raise ValueError("Matroska BlockGroup without Block")
                body = span
                # a BlockGroup block is a keyframe iff it carries no
                # ReferenceBlock (0xFB) — the flags byte is reserved there
                group_key = _find(b, cs, ce, 0xFB) is None
            if body is None:
                continue
            track, key, fr = _block_frames(b, *body)
            if group_key is not None:
                key = group_key
            if track != vid["number"]:
                continue
            for f in fr:
                total += len(f)
                if total > _MAX_SAMPLE_BYTES:
                    raise ValueError(
                        "Matroska demuxed size exceeds allocation guard"
                    )
                if key:
                    sync.append(len(frames))
                frames.append(f)
    return {
        "frames": frames,
        "n_frames": len(frames),
        "codec": vid["codec"],
        "width": vid["width"],
        "height": vid["height"],
        "duration_s": info["duration_s"],
        "track_id": vid["number"],
        "sync_idx": sync,
    }

"""Native WAV (RIFF/PCM) decode for the multimodal registry — zero new
dependencies.

Companion to sources/image.py (PNG/BMP): WAV is the one mainstream audio
container a pure-Python + NumPy stack can decode EXACTLY, so the
multimodal family's audio column gets a real codec instead of a stub.
Spec: RIFF chunk grammar + the `fmt `/`data` chunks (Microsoft/IBM WAVE,
as implemented by libsndfile and ffmpeg):

- ``fmt `` — format tag 1 (integer PCM: 8-bit unsigned, 16/24/32-bit
  signed little-endian) or 3 (IEEE float32/float64); format tag 0xFFFE
  (WAVE_FORMAT_EXTENSIBLE) resolves through the SubFormat GUID to the
  same two.  Anything else (ADPCM, mu-law, MP3-in-WAV...) raises
  NotImplementedError by name.
- ``data`` — interleaved frames, truncated to whole frames like
  libsndfile does when the chunk length is not frame-aligned.
- other chunks (LIST, fact, cue...) are skipped via the declared sizes
  (word-aligned, per the RIFF rule that odd chunks carry a pad byte).

``decode_wav`` returns ``{"sample_rate", "channels", "bits",
"n_frames", "duration_s", "samples"}`` with ``samples`` = float32
bytes, frame-major interleaved, scaled to [-1, 1] with the symmetric
2^(bits-1) divisor (ffmpeg/libsndfile convention: 8-bit unsigned is
recentred by -128 first).  Size fields are validated before any
allocation, mirroring image.py's guard.
"""

from __future__ import annotations

import struct

import numpy as np

#: allocation guard: decoded float32 sample buffer must stay under 1 GiB
_MAX_SAMPLE_BYTES = 1 << 30

_KSDATAFORMAT_PCM = bytes.fromhex("0100000000001000800000aa00389b71")
_KSDATAFORMAT_FLOAT = bytes.fromhex("0300000000001000800000aa00389b71")

# (format_tag, bits) -> numpy dtype of the wire samples; 24-bit handled
# separately (no native 3-byte dtype)
_WIRE_DTYPES = {
    (1, 8): np.dtype("u1"),
    (1, 16): np.dtype("<i2"),
    (1, 32): np.dtype("<i4"),
    (3, 32): np.dtype("<f4"),
    (3, 64): np.dtype("<f8"),
}


def decode_wav(b: bytes) -> dict:
    """Decode one WAV payload -> {sample_rate, channels, bits, n_frames,
    duration_s, samples(float32 bytes)}."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        (ln,) = struct.unpack_from("<I", b, i + 4)
        ln = min(ln, len(b) - i - 8)  # clamp a lying size to the payload
        body = b[i + 8 : i + 8 + ln]
        i += 8 + ln + (ln & 1)  # RIFF chunks are word-aligned
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
            if fmt is not None:
                break  # frames found after the format — nothing else needed
    if fmt is None or len(fmt) < 16:
        raise ValueError("WAV missing fmt chunk")
    if data is None:
        raise ValueError("WAV missing data chunk")
    tag, channels, rate, _brate, _balign, bits = struct.unpack_from(
        "<HHIIHH", fmt
    )
    if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: resolve the SubFormat GUID
        if len(fmt) < 40:
            raise ValueError("WAV extensible fmt chunk too short")
        guid = fmt[24:40]
        if guid == _KSDATAFORMAT_PCM:
            tag = 1
        elif guid == _KSDATAFORMAT_FLOAT:
            tag = 3
        else:
            raise NotImplementedError(
                f"WAV extensible subformat {guid.hex()}"
            )
    if channels == 0 or rate == 0:
        raise ValueError(f"implausible WAV fmt: channels={channels} rate={rate}")
    if tag == 1 and bits == 24:
        wire = None  # 3-byte samples: widened below
    else:
        wire = _WIRE_DTYPES.get((tag, bits))
        if wire is None:
            raise NotImplementedError(
                f"WAV format tag {tag} at {bits}-bit (PCM 8/16/24/32 and "
                "IEEE float32/64 only)"
            )
    frame_bytes = channels * (bits // 8)
    n_frames = len(data) // frame_bytes  # libsndfile: drop a partial frame
    if n_frames * channels * 4 > _MAX_SAMPLE_BYTES:
        raise ValueError(f"implausible WAV length: {n_frames} frames")
    usable = n_frames * frame_bytes
    if wire is None:  # 24-bit: widen each 3-byte group to int32, keep sign
        raw = np.frombuffer(data, dtype=np.uint8, count=usable)
        raw = raw.reshape(-1, 3)
        a = np.zeros((raw.shape[0], 4), dtype=np.uint8)
        a[:, 1:] = raw  # low-pad then arithmetic shift restores magnitude
        x = a.view("<i4").ravel().astype(np.float32) / float(1 << 31)
    else:
        x = np.frombuffer(data, dtype=wire, count=usable // wire.itemsize)
        if tag == 3:
            x = x.astype(np.float32)
        elif bits == 8:
            x = (x.astype(np.float32) - 128.0) / 128.0
        else:
            x = x.astype(np.float32) / float(1 << (bits - 1))
    return {
        "sample_rate": int(rate),
        "channels": int(channels),
        "bits": int(bits),
        "n_frames": int(n_frames),
        "duration_s": n_frames / rate,
        "samples": x.tobytes(),
    }


def encode_wav_pcm16(
    samples: np.ndarray, sample_rate: int, channels: int = 1
) -> bytes:
    """Minimal PCM16 WAV writer (fixtures + round-trip tests; also the
    honest way to persist an audio column back out without ffmpeg).
    ``samples`` = float array in [-1, 1], frame-major interleaved."""
    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    pcm = np.round(x * 32767.0).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF",
        36 + len(pcm),
        b"WAVE",
        b"fmt ",
        16,
        1,
        channels,
        sample_rate,
        sample_rate * channels * 2,
        channels * 2,
        16,
        b"data",
        len(pcm),
    )
    return hdr + pcm

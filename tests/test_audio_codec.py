"""Native WAV decode (sources/audio.py) — fixtures built here from the
RIFF spec (struct-packed headers, real PCM/float payloads), decoded back
sample-exact vs NumPy goldens, and end-to-end through
operators/multimodal.audio_features on Spark."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sequila_spark.sources.audio import decode_wav, encode_wav_pcm16


def _wav(tag: int, bits: int, rate: int, channels: int, frames: bytes,
         extensible: bool = False, extra_chunks: bytes = b"") -> bytes:
    if extensible:
        guid = (
            bytes.fromhex("0100000000001000800000aa00389b71")
            if tag == 1
            else bytes.fromhex("0300000000001000800000aa00389b71")
        )
        fmt = struct.pack(
            "<HHIIHHHHI",
            0xFFFE, channels, rate,
            rate * channels * bits // 8, channels * bits // 8, bits,
            22, bits, 0,
        ) + guid
    else:
        fmt = struct.pack(
            "<HHIIHH",
            tag, channels, rate,
            rate * channels * bits // 8, channels * bits // 8, bits,
        )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt + (b"\x00" if len(fmt) & 1 else b"")
        + extra_chunks
        + b"data" + struct.pack("<I", len(frames)) + frames
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_pcm16_roundtrip_exact():
    rng = np.random.default_rng(7)
    x = rng.integers(-32768, 32768, size=2000, dtype=np.int16)
    d = decode_wav(_wav(1, 16, 16000, 1, x.astype("<i2").tobytes()))
    assert (d["sample_rate"], d["channels"], d["bits"], d["n_frames"]) == (
        16000, 1, 16, 2000,
    )
    got = np.frombuffer(d["samples"], dtype=np.float32)
    assert np.array_equal(got, x.astype(np.float32) / 32768.0)
    assert d["duration_s"] == pytest.approx(0.125)


def test_pcm8_unsigned_recentred():
    x = np.array([0, 128, 255], dtype=np.uint8)
    got = np.frombuffer(decode_wav(_wav(1, 8, 8000, 1, x.tobytes()))["samples"],
                        dtype=np.float32)
    assert np.array_equal(got, (x.astype(np.float32) - 128.0) / 128.0)


def test_pcm24_sign_and_scale():
    # min, -1, 0, +1, max in 24-bit two's complement, little-endian
    vals = [-(1 << 23), -1, 0, 1, (1 << 23) - 1]
    raw = b"".join(int(v).to_bytes(3, "little", signed=True) for v in vals)
    got = np.frombuffer(decode_wav(_wav(1, 24, 48000, 1, raw))["samples"],
                        dtype=np.float32)
    assert np.array_equal(
        got, (np.array(vals, dtype=np.float64) / (1 << 23)).astype(np.float32)
    )


def test_pcm32_and_float32_and_float64():
    i32 = np.array([-(1 << 31), 0, (1 << 31) - 1], dtype="<i4")
    got = np.frombuffer(decode_wav(_wav(1, 32, 44100, 1, i32.tobytes()))["samples"],
                        dtype=np.float32)
    assert np.array_equal(got, (i32.astype(np.float64) / (1 << 31)).astype(np.float32))
    f32 = np.array([-1.0, 0.25, 1.0], dtype="<f4")
    got = np.frombuffer(decode_wav(_wav(3, 32, 44100, 1, f32.tobytes()))["samples"],
                        dtype=np.float32)
    assert np.array_equal(got, f32)
    f64 = np.array([-0.5, 0.125], dtype="<f8")
    got = np.frombuffer(decode_wav(_wav(3, 64, 44100, 1, f64.tobytes()))["samples"],
                        dtype=np.float32)
    assert np.array_equal(got, f64.astype(np.float32))


def test_stereo_interleave_and_partial_frame_dropped():
    x = np.array([[100, -100], [200, -200], [300, -300]], dtype="<i2")
    raw = x.tobytes() + b"\x01"  # trailing partial frame: dropped
    d = decode_wav(_wav(1, 16, 22050, 2, raw))
    assert d["channels"] == 2 and d["n_frames"] == 3
    got = np.frombuffer(d["samples"], dtype=np.float32).reshape(-1, 2)
    assert np.array_equal(got, x.astype(np.float32) / 32768.0)


def test_extensible_format_and_skipped_chunks():
    x = np.array([1000, -1000], dtype="<i2")
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd: padded
    d = decode_wav(_wav(1, 16, 32000, 1, x.tobytes(), extensible=True,
                        extra_chunks=extra))
    assert d["bits"] == 16 and d["n_frames"] == 2


def test_encode_decode_roundtrip():
    t = np.arange(800) / 8000.0
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    d = decode_wav(encode_wav_pcm16(x, 8000))
    got = np.frombuffer(d["samples"], dtype=np.float32)
    assert np.abs(got - x).max() <= 1.0 / 32768.0 + 1e-7


def test_corrupt_and_unsupported_are_loud():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"nope")
    with pytest.raises(ValueError, match="fmt"):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"WAVE")
    with pytest.raises(NotImplementedError, match="tag 2"):
        decode_wav(_wav(2, 4, 8000, 1, b"\x00" * 8))  # ADPCM
    with pytest.raises(ValueError, match="implausible"):
        decode_wav(_wav(1, 16, 0, 1, b"\x00\x00"))


def test_audio_features_through_spark(spark):
    """End-to-end: WAV payloads through multimodal.audio_features via the
    default audio/wav registry entry, features exact vs NumPy goldens."""
    from sequila_spark.operators.multimodal import audio_features

    t = np.arange(1600) / 16000.0
    sine = 0.5 * np.sin(2 * np.pi * 220 * t)
    silence = np.zeros(800)
    rows = [
        (1, bytearray(encode_wav_pcm16(sine, 16000)), "audio/wav", 0),
        (2, bytearray(encode_wav_pcm16(silence, 16000)), "audio/wav", 0),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string, byte_len int"
    )
    out = {r["doc_id"]: r for r in audio_features(media).collect()}
    assert out[1]["sample_rate"] == 16000
    assert out[1]["n_frames"] == 1600
    assert out[1]["duration_s"] == pytest.approx(0.1)
    # golden recomputed from the quantized wire samples
    q = np.round(np.clip(sine, -1, 1) * 32767.0).astype(np.int16)
    mono = (q.astype(np.float64) / 32768.0)
    assert out[1]["rms"] == pytest.approx(float(np.sqrt(np.mean(mono**2))), rel=1e-6)
    assert out[1]["peak"] == pytest.approx(float(np.abs(mono).max()), rel=1e-6)
    zc = float(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) / (len(mono) - 1)
    assert out[1]["zero_cross_rate"] == pytest.approx(zc, rel=1e-6)
    assert out[2]["rms"] == 0.0 and out[2]["peak"] == 0.0


def test_audio_features_contract_needs_no_duration():
    """A registered decoder returning ONLY the documented contract
    {sample_rate, channels, n_frames, samples} must work — duration is
    derived, not read (code-review regression).  Runs the mapInPandas op
    in-process (driver-side register_decoder doesn't reach Spark workers
    by design — the Spark-path plumbing is covered by the e2e test
    above, which uses the default audio/wav entry)."""
    import pandas as pd

    from sequila_spark.operators import multimodal as MM

    def minimal_decoder(b: bytes) -> dict:
        x = np.zeros(400, dtype=np.float32)
        return {"sample_rate": 8000, "channels": 1, "n_frames": 400,
                "samples": x.tobytes()}

    class _CaptureOp:
        def mapInPandas(self, op, schema):
            self.op = op
            return self

    MM.register_decoder("x-test/pcm", minimal_decoder)
    try:
        cap = _CaptureOp()
        MM.audio_features(cap)
        batch = pd.DataFrame(
            {"doc_id": [9], "media_type": ["x-test/pcm"], "payload": [b""]}
        )
        out = next(cap.op(iter([batch])))
        assert out["duration_s"][0] == pytest.approx(0.05)
        assert out["n_frames"][0] == 400
    finally:
        MM._DECODERS.pop("x-test/pcm", None)

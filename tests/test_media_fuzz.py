"""Corrupt-input discipline for the native media codecs: at 100 TB the
media column WILL contain truncated and bit-flipped payloads, and a
decoder that escapes with IndexError/struct.error/StopIteration (or
hangs, or allocates unboundedly) poisons whole tasks instead of failing
the row loudly.  Seeded deterministic mutations of valid fixtures —
byte flips, truncations, 8-byte garbage splices — must ALWAYS raise
ValueError or NotImplementedError.  (This fuzz found two real escapes
in the JPEG marker walk before it was committed: a StopIteration from a
scan referencing an unknown component id and an IndexError from a
truncated SOS header.)"""

from __future__ import annotations

import numpy as np
import pytest

from sequila_spark.sources.audio import decode_wav
from sequila_spark.sources.flac import decode_flac
from sequila_spark.sources.gif import decode_gif
from sequila_spark.sources.image import decode_bmp, decode_png
from sequila_spark.sources.jpeg import decode_jpeg
from sequila_spark.sources.mkv import demux_mkv
from sequila_spark.sources.mp4 import demux_mp4

TRIALS = 300


def _fixtures():
    from tests.test_audio_codec import _wav
    from tests.test_flac_codec import encode_flac as encode_flac_fixture
    from tests.test_gif_codec import encode_gif
    from tests.test_mkv_demux import mux_mkv
    from tests.test_mp4_demux import mux_mp4
    from tests.test_image_codec import encode_png, encode_png_ex
    from tests.test_jpeg_codec import encode_jpeg, encode_jpeg_progressive

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    gif_img = rng.integers(0, 16, size=(16, 16), dtype=np.uint8)
    pcm = bytes(rng.integers(0, 256, size=400, dtype=np.uint8))
    idx4 = rng.integers(0, 16, size=(16, 16, 1), dtype=np.uint8)
    img16 = rng.integers(0, 1 << 16, size=(16, 16, 3), dtype=np.uint16)
    return {
        "jpeg": (bytes(encode_jpeg([img])), decode_jpeg),
        "jpeg_progressive": (
            bytes(encode_jpeg_progressive([img])), decode_jpeg,
        ),
        "jpeg_12bit": (
            bytes(
                encode_jpeg(
                    [rng.integers(0, 4096, size=(16, 16), dtype=np.uint16)],
                    precision=12,
                )
            ),
            decode_jpeg,
        ),
        "gif": (bytes(encode_gif([gif_img], pal)), decode_gif),
        "png": (bytes(encode_png(img)), decode_png),
        "png_palette": (
            bytes(
                encode_png_ex(idx4, 4, 3, plte=pal, trns=b"\x80" * 7)
            ),
            decode_png,
        ),
        "png_interlaced": (
            bytes(encode_png_ex(img[:, :, None], 8, 0, interlace=1)),
            decode_png,
        ),
        "png_16bit": (bytes(encode_png_ex(img16, 16, 2)), decode_png),
        "wav": (bytes(_wav(1, 16, 8000, 1, pcm)), decode_wav),
        "flac": (
            bytes(
                encode_flac_fixture(
                    np.frombuffer(pcm, dtype="<i2").astype(np.int64)[:, None],
                    8000,
                    16,
                    blocksize=64,
                )
            ),
            decode_flac,
        ),
        "flac_lpc": (
            bytes(
                encode_flac_fixture(
                    np.frombuffer(pcm, dtype="<i2").astype(np.int64)[:100][:, None],
                    8000,
                    16,
                    blocksize=50,
                    mode="lpc",
                    lpc=([900, 120], 11, 10),
                    porder=1,
                    rice2=True,
                )
            ),
            decode_flac,
        ),
        "mp4": (
            bytes(
                mux_mp4(
                    [[bytes(rng.integers(0, 256, size=50, dtype=np.uint8))
                      for _ in range(3)],
                     [bytes(rng.integers(0, 256, size=80, dtype=np.uint8))
                      for _ in range(2)]],
                    syncs=[1, 3],
                )
            ),
            demux_mp4,
        ),
        "mkv": (
            bytes(
                mux_mkv(
                    [
                        (1, [bytes(rng.integers(0, 256, size=60,
                                                dtype=np.uint8))], True, 0),
                        (1, [bytes(rng.integers(0, 256, size=s,
                                                dtype=np.uint8))
                             for s in (40, 25, 30)], False, 3),
                    ]
                )
            ),
            demux_mkv,
        ),
    }


@pytest.mark.parametrize(
    "name",
    [
        "jpeg", "jpeg_progressive", "jpeg_12bit", "gif", "png", "png_palette",
        "png_interlaced", "png_16bit", "wav", "flac", "flac_lpc", "mp4", "mkv",
    ],
)
def test_mutated_payloads_fail_loudly_or_decode(name):
    payload, dec = _fixtures()[name]
    # str hash() is PYTHONHASHSEED-salted; sha256 keeps the mutation stream
    # identical across runs so any failure is reproducible by trial number.
    import hashlib

    seed = int.from_bytes(hashlib.sha256(name.encode()).digest()[:4], "big")
    rng = np.random.default_rng(seed)
    for trial in range(TRIALS):
        b = bytearray(payload)
        op = rng.integers(0, 3)
        if op == 0:  # single byte flip
            b[rng.integers(0, len(b))] = rng.integers(0, 256)
        elif op == 1:  # truncate
            b = b[: rng.integers(1, len(b))]
        else:  # splice 8 garbage bytes
            pos = rng.integers(0, len(b))
            b[pos : pos + 8] = bytes(rng.integers(0, 256, size=8, dtype=np.uint8))
        try:
            dec(bytes(b))  # a mutation may land in a don't-care byte
        except (ValueError, NotImplementedError):
            pass  # the loud, per-row-catchable contract
        except Exception as e:  # pragma: no cover - the failure being pinned
            raise AssertionError(
                f"{name} trial {trial}: non-loud {type(e).__name__}: {e!r}"
            ) from e

"""Multimodal column handling: opaque binary payloads with typed metadata,
decoded / feature-extracted through Arrow-batched pandas over mapInPandas.

Extends the reference's surface (BASELINE.json north star).  The Spark-side
plumbing — schemas, batch iteration, partition-preserving projection — is
real and tested; the actual media decoding is stubbed (the image/audio
libraries are not in this environment): ``decode_media`` raises
NotImplementedError unless a registered decoder exists, and
``byte_features`` provides the deterministic fallback feature extractor
(length, checksum, 16-bin byte histogram) used by tests and oracles.

At scale this is a map-only pipeline: no shuffle, Arrow batches end-to-end,
and binary payloads stay off the driver.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

HIST_BINS = 16

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("checksum", T.LongType()),
        T.StructField("byte_hist", T.ArrayType(T.LongType())),
    ]
)

# decoder registry: media_type -> bytes -> dict of features; populated by
# users when a real codec (PIL / torchaudio / ffmpeg) is on the executors.
_DECODERS: dict[str, Callable[[bytes], dict]] = {}


def register_decoder(media_type: str, fn: Callable[[bytes], dict]) -> None:
    _DECODERS[media_type] = fn


def attach_binary(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Wrap a column as an opaque binary payload with typed metadata —
    the canonical multimodal row shape (payload never inspected by Spark)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.length(payload).cast("int").alias("byte_len"),
    )


def _extract(batch: pd.DataFrame) -> pd.DataFrame:
    out = {
        "doc_id": batch["doc_id"],
        "media_type": batch["media_type"],
        "byte_len": batch["payload"].map(len).astype("int32"),
        "checksum": batch["payload"].map(
            lambda b: sum(b) % 2_147_483_647
        ),
        "byte_hist": batch["payload"].map(
            lambda b: _hist(b)
        ),
    }
    return pd.DataFrame(out)


def _hist(b: bytes) -> list[int]:
    h = [0] * HIST_BINS
    for byte in b:
        h[byte % HIST_BINS] += 1
    return h


def byte_features(media: DataFrame) -> DataFrame:
    """Deterministic byte-level features over the binary payload, computed in
    Arrow-batched pandas (mapInPandas) — the stub 'decode' step with real
    batch shape, schema and partitioning."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _extract(batch)

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def decode_media(media: DataFrame) -> DataFrame:
    """Dispatch to a registered decoder per media_type.  Raises
    NotImplementedError when no decoder is registered for a type present in
    the data — media codecs are not available in this environment; the
    Spark-side plumbing is exercised via byte_features."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            for mt in batch["media_type"].unique():
                if mt not in _DECODERS:
                    raise NotImplementedError(
                        f"no decoder registered for media_type={mt!r}; "
                        "register one with register_decoder() or use "
                        "byte_features() for byte-level features"
                    )
            yield _extract(batch)

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)

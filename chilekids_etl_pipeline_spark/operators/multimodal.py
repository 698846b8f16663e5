"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns with a
typed metadata struct. Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` — the only place Python touches the data, and it sees
columnar batches, not rows. The actual codec calls are STUBBED (the
container has no image/audio libraries): ``decode_stub`` raises
``NotImplementedError`` unless ``fake=True``, in which case it produces a
deterministic fake feature vector so the Spark-side plumbing (schema,
batching, partitioning) is fully exercisable in tests.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("byte_len", LongType()),
        StructField("content_hash", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("byte_len", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def to_media_frame(docs: DataFrame) -> DataFrame:
    """Wrap a (doc_id, text) frame as a media frame: text bytes play the
    opaque payload; modality assigned deterministically."""
    return docs.select(
        "doc_id",
        F.expr(
            "CASE cast(doc_id % 3 AS int) WHEN 0 THEN 'image' "
            "WHEN 1 THEN 'audio' ELSE 'video' END"
        ).alias("media_type"),
        F.col("text").cast("binary").alias("payload"),
    ).withColumns(
        {
            "byte_len": F.octet_length("payload"),
            "content_hash": F.md5("payload"),
        }
    )


def decode_stub(payload: bytes, media_type: str, fake: bool = False, dim: int = 8) -> list[float]:
    """Stand-in for image/audio decode. Real implementation would call
    PIL/librosa/ffmpeg here; those libs are absent, so either raise or
    produce a deterministic hash-derived fake feature vector."""
    if not fake:
        raise NotImplementedError(
            f"no codec available for {media_type}; install decoders or pass fake=True"
        )
    h = hashlib.sha256(payload).digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_features(media: DataFrame, fake: bool = True, dim: int = 8, batch_hint: int | None = None) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    Each Python worker receives pandas batches (columnar, zero-copy via
    Arrow) and emits (doc_id, media_type, byte_len, feature). At scale this
    is the pattern for any per-item decode: repartition upstream controls
    parallelism; nothing is collected to the driver.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(p, m, fake=fake, dim=dim)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "feature": feats,
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(payload: bytes, media_type: str, width: int, height: int, fake: bool = False) -> bytes:
    """Stand-in for image/video resize. Real implementation would call
    PIL/ffmpeg; absent those, either raise or emit a deterministic
    truncated-and-tagged payload so batch plumbing is testable."""
    if not fake:
        raise NotImplementedError(
            f"no codec available to resize {media_type}; install decoders or pass fake=True"
        )
    tag = f"resized:{width}x{height}:".encode()
    return tag + payload[: width * height // 64]


def resize_media(media: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Arrow-batched resize over mapInPandas: (doc_id, media_type, payload)
    → same schema with the transformed payload and refreshed metadata.
    Identical distribution shape to extract_features — per-item codec work
    scales with partition count, nothing touches the driver."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                resize_stub(p, m, width, height, fake=fake)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": out,
                    "byte_len": [len(b) for b in out],
                    "content_hash": [hashlib.md5(b).hexdigest() for b in out],
                }
            )

    return media.mapInPandas(run, MEDIA_SCHEMA)


def frame_sample_plan(
    media: DataFrame,
    every_n_bytes: int = 64,
    max_frames: int = 8,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Deterministic 'frame sampling' over the opaque payload: byte offsets
    every_n_bytes apart (capped). Pure column expressions — shows how a
    video-frame sampler's offset plan is computed without decoding.
    ``keep_cols`` carries extra metadata columns through."""
    return media.select(
        "doc_id",
        "media_type",
        *(keep_cols or []),
        F.expr(
            # byte_len = 0 would make sequence(0, -1, step) an illegal range
            # and crash the job on empty media rows — emit array() instead.
            f"CASE WHEN byte_len <= 0 THEN array() "
            f"ELSE transform(sequence(0, least(cast(byte_len AS int) - 1, "
            f"{(max_frames - 1)} * {every_n_bytes}), {every_n_bytes}), x -> x) END"
        ).alias("frame_offsets"),
    )

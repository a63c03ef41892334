"""Multimodal columns: image/audio/video as opaque binary + typed metadata
(north-star extension, SURVEY.md §2B last row).

The container has no image/audio codecs, so DECODING is stubbed — either a
clearly-marked NotImplementedError (real-codec path) or a deterministic fake
(hash-derived features) — while everything Spark-side is REAL and tested:
schema (binary + metadata struct), partition-preserving mapInPandas
plumbing, Arrow batch shapes, pandas-UDF signatures.

At 100 TB the pattern is: binary payloads stay columnar in parquet, metadata
is scalar columns (prunable without touching payload bytes), per-batch
Python work happens once per Arrow batch, never per row.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 8

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def attach_media(docs: DataFrame) -> DataFrame:
    """Manufacture an opaque binary payload column from document text (the
    test stand-in for real image/audio bytes) plus typed metadata."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        payload.alias("payload"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.md5(F.col("text")).alias("checksum"),
    )


def decode_real(payload: bytes, media_type: str):
    """The real-codec path. Container ships no codecs -> explicit stub."""
    raise NotImplementedError(
        "media decoding requires image/audio codecs not present in this "
        "environment; production would decode here (PIL/ffmpeg/torchaudio)"
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a decode->embed step: bytes -> stable
    pseudo-features. Replaces decode_real until codecs exist."""
    h = np.frombuffer(payload[: FEATURE_DIM * 8].ljust(FEATURE_DIM * 8, b"\0"), dtype=np.uint64)
    return (h % 1000).astype(np.float64).tolist() if len(h) == FEATURE_DIM else (
        np.resize((np.frombuffer(payload.ljust(8, b"\0")[:8], dtype=np.uint64) % 1000), FEATURE_DIM)
        .astype(np.float64)
        .tolist()
    )


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: one Python roundtrip per Arrow batch
    (never per row); partitioning of the input is preserved — no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "features": feats,
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 4) -> DataFrame:
    """'Frame sampling' plumbing: emit up to max_frames fixed-stride slices
    of each payload (what video frame extraction looks like shape-wise:
    one input row -> N output rows, schema change, no shuffle)."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_no", LongType()),
            StructField("frame", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "frame_no": [], "frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                for i in range(max_frames):
                    start = i * every_n_bytes
                    if start >= len(payload):
                        break
                    rows["media_id"].append(mid)
                    rows["frame_no"].append(i)
                    rows["frame"].append(bytes(payload[start : start + every_n_bytes]))
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=out_schema)

"""Multimodal-column queries: binary payload metadata (oracle-checked — the
JVM-side part) and pandas-UDF feature extraction / frame sampling
(rows-only: Python-side stubs with real Spark plumbing)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from experiments_datafusion_spark.io import table
from experiments_datafusion_spark.operators import multimodal as M
from experiments_datafusion_spark.queries import register


@register(
    "mm_metadata",
    tags=("llm", "multimodal"),
    oracle="""
SELECT
  doc_id AS media_id,
  ['image','audio','video'][CAST(doc_id % 3 + 1 AS INT)] AS media_type,
  CAST(octet_length(encode(text)) AS BIGINT)             AS n_bytes,
  md5(text)                                              AS checksum
FROM documents
""",
)
def mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over opaque binary payloads — the prunable scalar
    columns that let 100 TB of payload bytes stay unread for metadata-only
    queries."""
    media = M.attach_media(table(spark, sf_dir, "documents"))
    return media.select("media_id", "media_type", "n_bytes", "checksum")


@register(
    "mm_dedup_payload",
    tags=("llm", "multimodal", "dedup"),
    oracle="""
SELECT md5(text) AS checksum,
       min(doc_id) AS keeper,
       count(*)    AS n_copies,
       CAST(min(octet_length(encode(text))) AS BIGINT) AS n_bytes
FROM documents
GROUP BY 1
""",
)
def mm_dedup_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact binary-payload dedup by content checksum — the first pass of
    any multimodal ingest (identical images/audio clips collapse before a
    single byte is decoded).  Group-by on the checksum column only; payload
    bytes stay unread (column pruning)."""
    media = M.attach_media(table(spark, sf_dir, "documents"))
    return media.groupBy("checksum").agg(
        F.min("media_id").alias("keeper"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min("n_bytes").alias("n_bytes"),
    )


@register("mm_features", tags=("llm", "multimodal"))
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction via mapInPandas (deterministic fake decode —
    codecs absent; see operators/multimodal.py:decode_real). Rows-only."""
    media = M.attach_media(table(spark, sf_dir, "documents"))
    feats = M.extract_features(media)
    return feats.select(
        "media_id",
        "media_type",
        "n_bytes",
        F.round(F.element_at("features", 1), 2).alias("f0"),
        F.size("features").alias("feature_dim"),
    )


@register("mm_frame_sample", tags=("llm", "multimodal"))
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (1 row -> N frames via mapInPandas).
    Rows-only."""
    media = M.attach_media(table(spark, sf_dir, "documents"))
    frames = M.frame_sample(media)
    return frames.select(
        "media_id",
        "frame_no",
        F.length("frame").cast("bigint").alias("frame_bytes"),
    )

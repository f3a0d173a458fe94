"""Multimodal-column queries (north-star): binary payload metadata
(oracle-checked) and the stubbed-decoder feature extraction
(rows-only — Python mapInPandas has no SQL equivalent)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stripe_data_pipeline_spark.catalog.registry import register
from stripe_data_pipeline_spark.io import read_table
from stripe_data_pipeline_spark.operators import multimodal as M


@register(
    "media_metadata",
    oracle="""
SELECT doc_id,
       'image/fake' AS media_type,
       sha256(text) AS payload_sha256,
       CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS payload_bytes
FROM documents
""",
    doc="Multimodal plumbing: opaque binary payload + typed metadata "
    "(sha256 sidecar, byte length) computed JVM-side; the binary "
    "itself never enters a shuffle key.",
)
def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return M.documents_as_media(docs).select(
        "doc_id", "media_type", "payload_sha256", "payload_bytes"
    )


@register(
    "media_features",
    oracle=None,  # mapInPandas + numpy fake-decoder; rows-only check
    doc="Arrow-batched feature extraction over binary payloads via "
    "mapInPandas with the deterministic fake decoder (real decode "
    "stubbed: no image libs in container).",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    feats = M.extract_features(M.documents_as_media(docs), fake=True)
    return feats.select(
        "doc_id", "payload_sha256", "width", "height", F.size("feature").alias("dim")
    )


@register(
    "media_frame_samples",
    oracle=None,  # mapInPandas + numpy fake video decoder; rows-only
    doc="Frame sampling over video-like binaries (every 2nd frame): "
    "the mapInPandas iterator EMITS MORE ROWS THAN IT RECEIVES (one "
    "per sampled frame) - the batch-level explode a real video "
    "pipeline uses; frame features are fixed-dim so output rows stay "
    "bounded regardless of payload size. Decode honestly stubbed "
    "(no ffmpeg in container); frame counts/coverage pytest-gated.",
)
def q_media_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    frames = M.sample_frames(M.documents_as_media(docs), every_k=2, fake=True)
    return frames.select(
        "doc_id",
        "payload_sha256",
        "n_frames",
        "frame_idx",
        F.size("frame_feature").alias("dim"),
    )

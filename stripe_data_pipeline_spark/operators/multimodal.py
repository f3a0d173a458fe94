"""Multimodal column plumbing (north-star).

Images/audio/video ride through the pipeline as opaque ``binary``
columns plus typed metadata; per-item decode/feature work happens in
Arrow-batched Pandas iterators (``mapInPandas``) so the Python
boundary is crossed per-batch, never per-row.

The container has no image/audio libraries, so the actual decode is
STUBBED: ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic pseudo-decoder (seeded by
the content hash) produces stable fake features. Everything around
the stub — schema, batch iteration, partitioning behavior — is real
and tested.

Scale notes: binary payloads dominate row size; keep
``spark.sql.files.maxPartitionBytes`` at default 128 MB so tasks hold
a bounded number of blobs, and never groupBy a raw binary column —
join/group on the sha256 sidecar instead.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("payload_bytes", T.LongType()),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload_sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Build a media table from the documents fixture: the text payload
    stands in for an encoded image; metadata is computed JVM-side."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.lit("image/fake").alias("media_type"),
        payload.alias("payload"),
        F.sha2(payload, 256).alias("payload_sha256"),
        F.octet_length(payload).cast("long").alias("payload_bytes"),
    )


def decode_image(payload: bytes, fake: bool = False) -> tuple[np.ndarray, int, int]:
    """Decode an image payload -> (HxWx3 array, width, height).

    STUB: real decoding needs PIL/libvips (absent in this container).
    The fake path derives a deterministic tiny image from the payload
    hash so the downstream plumbing is exercised end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/libvips; run with fake=True for the "
            "deterministic test double"
        )
    h = hashlib.sha256(payload).digest()
    rng = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    w = 4 + int(h[0]) % 4
    ht = 4 + int(h[1]) % 4
    img = np.resize(rng, (ht, w, 3))
    return img, w, ht


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas: one Python worker call per Arrow batch; the fake
    decoder keeps it deterministic. Swap ``decode_image``'s body for a
    real decoder without touching the Spark plumbing.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, widths, heights = [], [], []
            for payload in pdf["payload"]:
                img, w, h = decode_image(bytes(payload), fake=fake)
                # stand-in feature: per-channel means + shape moments
                flat = img.reshape(-1, 3)
                f8 = np.concatenate(
                    [
                        flat.mean(axis=0),
                        flat.std(axis=0),
                        np.array([w, h], dtype=np.float32),
                    ]
                ).astype(np.float32)
                feats.append(f8[:FEATURE_DIM])
                widths.append(w)
                heights.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload_sha256": pdf["payload_sha256"],
                    "feature": feats,
                    "width": widths,
                    "height": heights,
                }
            )

    return media.mapInPandas(run, schema=FEATURES_SCHEMA)

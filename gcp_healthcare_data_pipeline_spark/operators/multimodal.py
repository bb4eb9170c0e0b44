"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` stages so the Python hop is per-batch, not per-row, and
the pipeline stays partition-parallel at 100 TB.

The actual codec step is STUBBED (no image/audio libraries in this
environment): ``decode_stub_features`` produces deterministic fake
features derived from the payload bytes, clearly marked; swap
``_decode_one`` for a real decoder (PIL/torchaudio/ffmpeg) in deployment.
The Spark-side contract — schemas, batch iteration, partitioning — is
real and tested (tests/test_multimodal.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

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
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),       # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),    # opaque bytes
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("content_digest", StringType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def _decode_one(payload: bytes, dim: int) -> list[float]:
    """STUB decoder: deterministic pseudo-features from payload bytes.

    Replace with a real decode (PIL image -> embedding, audio -> spectro
    stats, video -> frame samples). Raises on None payload like a real
    decoder would on corrupt input.
    """
    if payload is None:
        raise ValueError("corrupt media payload: None")
    h = hashlib.sha256(payload).digest()
    return [h[i % len(h)] / 255.0 for i in range(dim)]


def extract_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over media rows (mapInPandas).

    Corrupt rows (None payload) yield NULL features instead of failing
    the task — quarantine-style tolerance, consistent with the silver
    layer's data-quality posture.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats, digests, sizes = [], [], []
            for payload in pdf["payload"]:
                if payload is None:
                    feats.append(None)
                    digests.append(None)
                    sizes.append(0)
                else:
                    b = bytes(payload)
                    feats.append(_decode_one(b, dim))
                    digests.append(hashlib.sha256(b).hexdigest())
                    sizes.append(len(b))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "content_digest": digests,
                    "features": feats,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def exact_media_dedup(features: DataFrame) -> DataFrame:
    """Content-digest dedup over extracted features (binary twin of the
    text exact-dedup operator)."""
    return (
        features.filter(F.col("content_digest").isNotNull())
        .groupBy("content_digest")
        .agg(
            F.min("media_id").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )

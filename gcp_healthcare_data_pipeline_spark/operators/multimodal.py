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


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("payload", BinaryType(), True),
    ]
)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage for image payloads (mapInPandas, Arrow-batched).

    STUB codec: a real deployment decodes with PIL and re-encodes; the
    stub emits a deterministic truncated-digest payload so the batch
    shape, schema, and partition parallelism are real and testable.
    Non-image rows pass through untouched metadata with NULL payload.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_w, out_h = width, height
        for pdf in it:
            payloads, ws, hs = [], [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                if kind == "image" and payload is not None:
                    # stands in for decode->resize->encode
                    digest = hashlib.sha256(bytes(payload)).digest()
                    payloads.append(digest[: out_w * out_h % 32 + 4])
                    ws.append(out_w)
                    hs.append(out_h)
                else:
                    payloads.append(None)
                    ws.append(None)
                    hs.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": ws,
                    "height": hs,
                    "payload": payloads,
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), True),
        StructField("frame_ts_ms", LongType(), True),
        StructField("frame_payload", BinaryType(), True),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling stage for video payloads: one output row per
    sampled frame (fan-out inside mapInPandas — batch in, frames out).

    STUB codec: frame count derives from duration_ms / every_ms; each
    frame payload is a deterministic digest slice. Swap for ffmpeg/pyav
    in deployment; the row fan-out contract is what downstream stages
    (per-frame featurization, dedup) depend on.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, payloads = [], [], [], []
            for mid, kind, payload, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["duration_ms"]
            ):
                if kind != "video" or payload is None or dur is None:
                    continue
                digest = hashlib.sha256(bytes(payload)).digest()
                n = max(1, int(dur) // every_ms)
                for i in range(n):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    payloads.append(digest[i % 24: i % 24 + 8])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "frame_payload": payloads,
                }
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


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

"""Multimodal plumbing tests: binary payload schema, Arrow-batched feature
extraction (stub decoder), corrupt-row tolerance, digest dedup."""

from __future__ import annotations

from gcp_healthcare_data_pipeline_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    exact_media_dedup,
    extract_features,
    resize_images,
    sample_frames,
)


def _media(spark):
    rows = [
        (1, "image", "image/png", b"\x89PNG-fake-bytes-1", 64, 64, None),
        (2, "image", "image/png", b"\x89PNG-fake-bytes-1", 64, 64, None),  # dup payload
        (3, "audio", "audio/wav", b"RIFF-fake-audio", None, None, 1200),
        (4, "image", "image/png", None, None, None, None),  # corrupt
        (5, "video", "video/mp4", b"\x00mp4-fake-video", 640, 480, 3500),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_resize_stage_shapes(spark):
    out = {r.media_id: r for r in resize_images(_media(spark), 32, 32).collect()}
    assert out[1].width == 32 and out[1].height == 32
    assert out[1].payload == out[2].payload  # deterministic per payload
    assert out[3].payload is None  # audio passes through untouched
    assert out[4].payload is None  # corrupt tolerated
    assert len(out) == 5  # row-per-input contract


def test_frame_sampling_fanout(spark):
    frames = sample_frames(_media(spark), every_ms=1000).collect()
    # 3500ms video at 1 frame/s -> 3 frames; only video rows fan out
    assert len(frames) == 3
    assert [f.frame_idx for f in sorted(frames, key=lambda x: x.frame_idx)] == [0, 1, 2]
    assert all(f.media_id == 5 for f in frames)
    assert all(f.frame_ts_ms == f.frame_idx * 1000 for f in frames)
    assert len({bytes(f.frame_payload) for f in frames}) == 3  # distinct slices


def test_feature_extraction_schema_and_determinism(spark):
    out = extract_features(_media(spark), dim=8)
    rows = {r.media_id: r for r in out.collect()}
    assert set(out.columns) == {
        "media_id", "kind", "n_bytes", "content_digest", "features",
    }
    # deterministic: identical payloads -> identical features/digest
    assert rows[1].features == rows[2].features
    assert rows[1].content_digest == rows[2].content_digest
    assert len(rows[1].features) == 8
    assert all(0.0 <= v <= 1.0 for v in rows[1].features)
    # different payload -> different digest
    assert rows[3].content_digest != rows[1].content_digest


def test_corrupt_rows_tolerated(spark):
    rows = {r.media_id: r for r in extract_features(_media(spark)).collect()}
    assert rows[4].features is None and rows[4].content_digest is None
    assert rows[4].n_bytes == 0


def test_digest_dedup(spark):
    dedup = exact_media_dedup(extract_features(_media(spark)))
    got = {r.keeper_id: r.n_copies for r in dedup.collect()}
    assert got == {1: 2, 3: 1, 5: 1}

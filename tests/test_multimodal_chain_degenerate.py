"""Degenerate-corpus contracts for the multimodal -> embed -> coreset
chains (r12 verdict item 6): the empty corpus and the < K_MIN corpus —
the shapes the r12 vector-family contract tests pin for _kmeans_assign
inputs — must hold through the FULL codec chains too (synth -> resize /
frame-sample -> decode -> embed -> hierarchical coreset), where an
empty Arrow batch or a seedless hash bucket has extra ways to blow up.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_healthcare_data_pipeline_spark.queries.extended_queries import (
    _audio_coreset_chain,
    _image_coreset_chain,
    _video_coreset_chain,
)


def _docs(spark, n: int):
    return spark.range(n).select(F.col("id").alias("media_id"))


def test_image_chain_empty_corpus(spark):
    out = _image_coreset_chain(_docs(spark, 0))
    assert out.count() == 0
    # schema contract survives the empty path
    assert out.columns == ["centroid_id", "rank", "vec_id", "dist"]


def test_image_chain_below_k_min(spark):
    """3 images < K_MIN=8 seeds: every image must come back exactly once
    (the every-vector-assigned contract), no cluster exceeds the coreset
    cap, and ranks are dense from 1."""
    rows = _image_coreset_chain(_docs(spark, 3)).collect()
    assert sorted(r["vec_id"] for r in rows) == [0, 1, 2]
    assert all(1 <= r["rank"] <= 3 for r in rows)
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["centroid_id"], []).append(r["rank"])
    for ranks in by_cluster.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_video_chain_empty_corpus(spark):
    out = _video_coreset_chain(_docs(spark, 0))
    assert out.count() == 0
    assert out.columns == [
        "centroid_id", "rank", "media_id", "frame_idx", "dist",
    ]


def test_audio_chain_empty_corpus(spark):
    out = _audio_coreset_chain(_docs(spark, 0))
    assert out.count() == 0
    assert out.columns == [
        "centroid_id", "rank", "media_id", "window_idx", "dist",
    ]


def test_audio_chain_below_k_min(spark):
    """2 clips -> 40 + 60 samples -> 2 + 3 full 20-sample windows,
    still < K_MIN: every window comes back exactly once with the
    contiguous window indices the decoder contract promises."""
    rows = _audio_coreset_chain(_docs(spark, 2)).collect()
    got = sorted((r["media_id"], r["window_idx"]) for r in rows)
    # doc 0: 40 samples -> windows 0, 1; doc 1: 60 samples -> 0, 1, 2
    assert got == [(0, 0), (0, 1), (1, 0), (1, 1), (1, 2)]
    assert all(1 <= r["rank"] <= 3 for r in rows)


def test_video_chain_below_k_min(spark):
    """2 clips -> 4 + 5 frames sampled at stride 2 -> 2 + 3 vectors,
    still < K_MIN: every sampled frame comes back exactly once with the
    stride-2 frame indices the sampler contract promises."""
    rows = _video_coreset_chain(_docs(spark, 2)).collect()
    got = sorted((r["media_id"], r["frame_idx"]) for r in rows)
    # doc 0: 4 frames -> idx 0, 2; doc 1: 5 frames -> idx 0, 2, 4
    assert got == [(0, 0), (0, 2), (1, 0), (1, 2), (1, 4)]
    assert all(1 <= r["rank"] <= 3 for r in rows)

"""Property-based round-trip laws for the pure-Python media codecs.

The oracle queries pin specific synthetic corpora; these pin the codecs
over ARBITRARY inputs (hypothesis): encode->decode is the identity for
every payload a writer can produce, so no input-dependent corner (odd
widths triggering row padding, full-scale samples, empty-ish clips,
single-pixel frames) can corrupt silently. Pure Python — no Spark
session, so the whole file runs in milliseconds per example.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from gcp_healthcare_data_pipeline_spark.operators.multimodal import (
    decode_avi_rgb24,
    decode_bmp24,
    decode_wav_pcm16,
    encode_avi_rgb24,
    encode_bmp24,
    encode_wav_pcm16,
)


@settings(max_examples=50, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    data=st.data(),
)
def test_bmp_roundtrip_any_image(w, h, data):
    rgb = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    got = decode_bmp24(encode_bmp24(w, h, rgb))
    assert got == (w, h, rgb)


@settings(max_examples=50, deadline=None)
@given(
    rate=st.integers(min_value=1, max_value=192000),
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), max_size=200
    ),
)
def test_wav_roundtrip_any_clip(rate, samples):
    got_rate, got = decode_wav_pcm16(encode_wav_pcm16(rate, samples))
    assert got_rate == rate and got == samples


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=6),
    h=st.integers(min_value=1, max_value=6),
    fps=st.integers(min_value=1, max_value=120),
    n_frames=st.integers(min_value=0, max_value=5),
    data=st.data(),
)
def test_avi_roundtrip_any_video(w, h, fps, n_frames, data):
    frames = [
        bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255),
                    min_size=w * h * 3,
                    max_size=w * h * 3,
                )
            )
        )
        for _ in range(n_frames)
    ]
    got_w, got_h, got_us, got = decode_avi_rgb24(
        encode_avi_rgb24(w, h, fps, frames)
    )
    assert (got_w, got_h) == (w, h)
    assert got_us == 1000000 // fps
    assert got == frames

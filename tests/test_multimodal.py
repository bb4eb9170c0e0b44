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


def test_bmp_codec_roundtrip_and_edge_layouts():
    """Pure-Python BMP codec: encode->decode is identity for padded and
    unpadded row widths; decoder also handles top-down (negative height)
    files and rejects malformed/unsupported payloads."""
    import struct

    import pytest

    from gcp_healthcare_data_pipeline_spark.operators.multimodal import (
        decode_bmp24,
        encode_bmp24,
    )

    for w, h in ((5, 4), (4, 3), (1, 1), (7, 2)):
        rgb = bytes((i * 37 + 11) % 256 for i in range(w * h * 3))
        assert decode_bmp24(encode_bmp24(w, h, rgb)) == (w, h, rgb)

    # top-down variant: negative height, rows stored first-row-first
    w, h = 3, 2
    rgb = bytes(range(w * h * 3))
    bmp = bytearray(encode_bmp24(w, h, rgb))
    struct.pack_into("<i", bmp, 22, -h)
    # rebuild pixel area in top-down order (BGR, padded rows)
    row_size = (w * 3 + 3) & ~3
    for y in range(h):
        for x in range(w):
            off = (y * w + x) * 3
            base = 54 + y * row_size + x * 3
            bmp[base:base + 3] = bytes(
                (rgb[off + 2], rgb[off + 1], rgb[off])
            )
    assert decode_bmp24(bytes(bmp)) == (w, h, rgb)

    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp24(b"JFIF....")
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp24(encode_bmp24(4, 4, bytes(48))[:-8])
    bad_bpp = bytearray(encode_bmp24(2, 2, bytes(12)))
    struct.pack_into("<H", bad_bpp, 28, 8)
    with pytest.raises(ValueError, match="unsupported BMP variant"):
        decode_bmp24(bytes(bad_bpp))


def test_resize_images_real_bmp_nearest_neighbor(spark):
    """BMP payloads are really decoded, NN-resampled, and re-encoded:
    the output parses as a BMP of the target size and every output
    pixel equals its floor-mapped source pixel."""
    from gcp_healthcare_data_pipeline_spark.operators.multimodal import (
        decode_bmp24,
        encode_bmp24,
        resize_images,
    )

    src_w, src_h, out_w, out_h = 6, 4, 3, 2
    rgb = bytes((i * 29 + 5) % 256 for i in range(src_w * src_h * 3))
    media = spark.createDataFrame(
        [(1, "image", encode_bmp24(src_w, src_h, rgb))],
        "media_id long, kind string, payload binary",
    )
    out = resize_images(media, out_w, out_h).collect()[0]
    assert (out.width, out.height) == (out_w, out_h)
    w, h, got = decode_bmp24(bytes(out.payload))
    assert (w, h) == (out_w, out_h)
    for y in range(out_h):
        sy = min(src_h - 1, y * src_h // out_h)
        for x in range(out_w):
            sx = min(src_w - 1, x * src_w // out_w)
            src = (sy * src_w + sx) * 3
            dst = (y * out_w + x) * 3
            assert got[dst:dst + 3] == rgb[src:src + 3]


def test_extract_features_real_decode_for_bmp(spark):
    """_decode_one routes BM-magic payloads through the real decoder:
    the first three features are the decoded per-channel means."""
    from gcp_healthcare_data_pipeline_spark.operators.multimodal import (
        encode_bmp24,
        extract_features,
    )

    w, h = 4, 2
    rgb = bytes((i * 31 + 3) % 256 for i in range(w * h * 3))
    n = w * h
    media = spark.createDataFrame(
        [(7, "image", encode_bmp24(w, h, rgb))],
        "media_id long, kind string, payload binary",
    )
    feats = extract_features(media, dim=4).collect()[0].features
    for c in range(3):
        assert abs(feats[c] - sum(rgb[c::3]) / (255.0 * n)) < 1e-12


def test_wav_codec_roundtrip_and_chunk_walk():
    import struct

    from gcp_healthcare_data_pipeline_spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    samples = [0, 100, -100, 32767, -32768, 5, -1]
    payload = encode_wav_pcm16(8000, samples)
    rate, back = decode_wav_pcm16(payload)
    assert rate == 8000 and back == samples

    # a real-world WAV often carries extra chunks (LIST/INFO) between
    # fmt and data — the chunk walk must skip them by declared size,
    # including the odd-size 2-byte-alignment pad
    fmt_end = 12 + 8 + 16
    junk = b"LIST" + struct.pack("<I", 5) + b"JUNKS" + b"\x00"  # odd+pad
    with_junk = payload[:fmt_end] + junk + payload[fmt_end:]
    with_junk = with_junk[:4] + struct.pack(
        "<I", len(with_junk) - 8
    ) + with_junk[8:]
    rate2, back2 = decode_wav_pcm16(with_junk)
    assert rate2 == 8000 and back2 == samples


def test_wav_decoder_rejects_malformed():
    import pytest

    from gcp_healthcare_data_pipeline_spark.operators.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )

    ok = encode_wav_pcm16(8000, [1, 2, 3])
    for bad in (None, b"", b"RIFFxxxx", ok[:-3], b"NOTW" + ok[4:]):
        with pytest.raises((ValueError, TypeError)):
            decode_wav_pcm16(bad)


def test_decode_audio_stats_values_and_quarantine(spark):
    import math

    from gcp_healthcare_data_pipeline_spark.operators.multimodal import (
        decode_audio_stats,
        encode_wav_pcm16,
    )

    samples = [1000, -1000, 2000, -2000, 0, 3000]
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_wav_pcm16(4000, samples))),
            (2, bytearray(b"garbage-not-a-wav")),
        ],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in decode_audio_stats(media).collect()}
    good = rows[1]
    assert good.sample_rate == 4000 and good.n_samples == 6
    assert good.duration_ms == 6 * 1000 // 4000
    assert abs(
        good.rms
        - math.sqrt(sum(v * v for v in samples) / 6) / 32768.0
    ) < 1e-12
    # sign convention: 0 counts as non-negative -> crossings at
    # 1000/-1000, -1000/2000, 2000/-2000, -2000/0(no: both classes
    # differ -> -2000 neg, 0 nonneg -> crossing), 0/3000 same class
    assert good.zero_crossings == 4
    assert good.peak == 3000
    bad = rows[2]
    assert bad.sample_rate is None and bad.rms is None


def test_avi_codec_roundtrip():
    from gcp_healthcare_data_pipeline_spark.operators.multimodal import (
        decode_avi_rgb24,
        encode_avi_rgb24,
    )

    w, h = 5, 4  # width 5 -> 15-byte rows padded to 16 in every frame
    frames = [
        bytes(((t * 37 + i * 11) % 256) for i in range(w * h * 3))
        for t in range(3)
    ]
    payload = encode_avi_rgb24(w, h, 25, frames)
    w2, h2, us, back = decode_avi_rgb24(payload)
    assert (w2, h2, us) == (w, h, 40000)
    assert back == frames


def test_avi_decoder_rejects_malformed():
    import pytest

    from gcp_healthcare_data_pipeline_spark.operators.multimodal import (
        decode_avi_rgb24,
        encode_avi_rgb24,
    )

    ok = encode_avi_rgb24(2, 2, 10, [bytes(12)])
    for bad in (None, b"", b"RIFF1234WAVE", ok[:-5]):
        with pytest.raises((ValueError, TypeError)):
            decode_avi_rgb24(bad)


def test_sample_frames_real_avi_stride(spark):
    from gcp_healthcare_data_pipeline_spark.operators.multimodal import (
        encode_avi_rgb24,
    )

    w, h, fps = 2, 2, 10  # 100 ms frame period
    frames = [bytes(((t * 50 + i) % 256) for i in range(12)) for t in range(6)]
    media = spark.createDataFrame(
        [(9, "video", "video/avi",
          bytearray(encode_avi_rgb24(w, h, fps, frames)), w, h, 600)],
        MEDIA_SCHEMA,
    )
    # every_ms=200 over a 100 ms period -> stride 2 -> frames 0, 2, 4
    rows = sorted(
        sample_frames(media, every_ms=200).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in rows] == [0, 2, 4]
    assert [r.frame_ts_ms for r in rows] == [0, 200, 400]
    # payload is the DECODED top-down RGB of that exact frame
    assert [bytes(r.frame_payload) for r in rows] == [
        frames[0], frames[2], frames[4]
    ]


def test_malformed_payloads_quarantine_not_crash(spark):
    """The code-review crash matrix: payloads that used to escape the
    quarantine handlers (struct.error from undersized fmt/avih chunks,
    ZeroDivisionError from rate=0 / zero-dimension headers, lying
    declared sizes) must yield NULL stats or no rows — never a task
    failure."""
    import struct

    from gcp_healthcare_data_pipeline_spark.operators.multimodal import (
        decode_audio_stats,
        decode_video_stats,
        encode_avi_rgb24,
        encode_wav_pcm16,
    )

    # WAV: fmt chunk declaring size 4 (struct.error before the fix),
    # rate=0 (ZeroDivisionError), odd data size (struct.error)
    tiny_fmt = (b"RIFF" + struct.pack("<I", 16) + b"WAVE"
                + b"fmt " + struct.pack("<I", 4) + b"\x01\x00\x01\x00")
    rate0 = encode_wav_pcm16(1, [1, 2])
    rate0 = rate0.replace(struct.pack("<I", 1), struct.pack("<I", 0))
    odd_data = (b"RIFF" + struct.pack("<I", 37) + b"WAVE"
                + b"fmt " + struct.pack("<I", 16)
                + struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
                + b"data" + struct.pack("<I", 3) + b"abc")
    media = spark.createDataFrame(
        [(1, bytearray(tiny_fmt)), (2, bytearray(rate0)),
         (3, bytearray(odd_data)),
         (4, bytearray(encode_wav_pcm16(8000, [5, -5])))],
        "media_id long, payload binary",
    )
    rows = {r.media_id: r for r in decode_audio_stats(media).collect()}
    assert rows[1].rms is None and rows[2].rms is None
    assert rows[3].rms is None
    assert rows[4].n_samples == 2  # the good row still decodes

    # AVI: avih declaring size 8 with following bytes available (used
    # to silently read the next chunk as dimensions), zero-dim header,
    # truncated frame body
    good = encode_avi_rgb24(2, 2, 10, [bytes(12)])
    lying = good.replace(
        b"avih" + struct.pack("<I", 56), b"avih" + struct.pack("<I", 8), 1
    )
    zero_dim = good.replace(
        struct.pack("<14I", 100000, 0, 0, 0, 1, 0, 1, 0, 2, 2, 0, 0, 0, 0),
        struct.pack("<14I", 100000, 0, 0, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 0),
    )
    short_frame = good.replace(
        b"00db" + struct.pack("<I", 16), b"00db" + struct.pack("<I", 8), 1
    )[:-8]
    vmedia = spark.createDataFrame(
        [(1, bytearray(lying)), (2, bytearray(zero_dim)),
         (3, bytearray(short_frame)), (4, bytearray(good))],
        "media_id long, payload binary",
    )
    out = decode_video_stats(vmedia).collect()
    assert {r.media_id for r in out} == {4}  # only the good clip emits


def test_feature_extraction_strided_subsample_long_wav():
    """The O(1)-per-payload feature path: a WAV longer than
    _FEATURE_MAX_SAMPLES must be sketched from a strided subsample, and
    the frombuffer count/offset/stride arithmetic must match a pure-
    Python reference over the SAME subsample (guards off-by-ones in
    data_off/stride — this branch is never reached by the registry
    queries, whose clips are < 100 samples)."""
    import math

    from gcp_healthcare_data_pipeline_spark.operators.multimodal import (
        _FEATURE_MAX_SAMPLES,
        _decode_one,
        encode_wav_pcm16,
        probe_wav_pcm16,
    )

    n_total, rate, dim = 10_000, 8000, 8
    samples = [((i * 37 + 11) % 65536) - 32768 for i in range(n_total)]
    payload = encode_wav_pcm16(rate, samples)
    assert n_total > _FEATURE_MAX_SAMPLES
    _, _, probed_n = probe_wav_pcm16(payload)
    assert probed_n == n_total

    stride = max(1, -(-n_total // _FEATURE_MAX_SAMPLES))
    assert stride == 3  # the strided branch, not the trivial stride=1
    sub = samples[::stride]
    n = len(sub)
    nonneg = [x >= 0 for x in sub]
    expect = [
        math.sqrt(sum(x * x for x in sub) / n) / 32768.0,
        sum(a != b for a, b in zip(nonneg[1:], nonneg[:-1])) / n,
        max(abs(x) for x in sub) / 32768.0,
        n_total / rate,
    ]
    expect += [abs(float(v)) / 32768.0 for v in sub[: dim - 4]]

    got = _decode_one(payload, dim)
    assert len(got) == dim
    for g, e in zip(got, expect):
        assert abs(g - e) < 1e-12, (got, expect)


def test_avi_deep_list_nesting_raises_valueerror():
    """Hostile nesting: thousands of nested LIST chunks must raise
    ValueError ('nesting too deep'), NEVER RecursionError — ValueError
    is what the decode_video_stats/sample_frames quarantine handlers
    catch, so anything else kills the whole Spark task. Nesting under
    the 64 cap must walk cleanly to the normal 'missing avih' error."""
    import struct

    import pytest

    from gcp_healthcare_data_pipeline_spark.operators.multimodal import (
        decode_avi_rgb24,
    )

    def nested_lists(depth: int) -> bytes:
        body = b""
        for _ in range(depth):
            body = b"LIST" + struct.pack("<I", 4 + len(body)) + b"mvix" + body
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body

    with pytest.raises(ValueError, match="nesting too deep"):
        decode_avi_rgb24(nested_lists(5000))

    # below the cap: the iterative walk completes and fails for the
    # ordinary reason (no avih header), proving the cap doesn't
    # false-positive on legitimately nested files
    with pytest.raises(ValueError, match="missing avih"):
        decode_avi_rgb24(nested_lists(50))

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are ``binary`` columns with a metadata struct;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` stages so the Python hop is per-batch, not per-row, and
the pipeline stays partition-parallel at 100 TB.

Codec status: **BMP (24-bit uncompressed) decode/encode is REAL** — a
pure-Python parser/writer (``decode_bmp24`` / ``encode_bmp24``) handling
the BITMAPINFOHEADER layout, BGR channel order, bottom-up (and top-down
negative-height) row order, and 4-byte row padding; ``_decode_one``
routes ``BM``-magic payloads through it and emits decoded-pixel
features, and ``decode_image_stats`` / ``resize_images`` run real
pixel work inside their mapInPandas stages (oracle-pinned cross-engine
by queries/extended_queries.py:q_multimodal_decode). **WAV (RIFF 16-bit
mono PCM) decode/encode is REAL too** — ``encode_wav_pcm16`` /
``decode_wav_pcm16`` with a proper chunk walk (unknown chunks skipped,
2-byte alignment honored, malformed payloads raise); ``_decode_one``
routes ``RIFF``-magic payloads to real signal features and
``decode_audio_stats`` emits duration/RMS/zero-crossing/peak stats
(oracle-pinned as q_multimodal_audio). **AVI (RIFF, uncompressed
24-bit DIB frames) decode/encode is REAL as well** — ``encode_avi_rgb24``
/ ``decode_avi_rgb24`` with a nested-LIST RIFF walk; ``sample_frames``
emits REAL decoded frames for AVI payloads and ``decode_video_stats``
fan-outs per-frame channel means + exact frame-to-frame motion
(oracle-pinned as q_multimodal_video). Remaining formats (JPEG/
compressed audio/video codecs) stay stubbed with deterministic digest
features — no codec libraries in this environment; swap the fallbacks
for PIL/torchaudio/ffmpeg in deployment. The Spark-side contract —
schemas, batch iteration, partitioning — is identical either way.
"""

from __future__ import annotations

import hashlib
import struct
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


# --------------------------------------------------------------------------
# Real pure-Python BMP codec (24-bit uncompressed, BITMAPINFOHEADER)
# --------------------------------------------------------------------------

def encode_bmp24(width: int, height: int, rgb: bytes) -> bytes:
    """Encode top-down row-major RGB bytes (len = w*h*3) as a standard
    24-bit BMP: 14-byte file header, 40-byte BITMAPINFOHEADER, pixel
    rows stored bottom-up in BGR order, each row padded to 4 bytes."""
    import struct

    if len(rgb) != width * height * 3:
        raise ValueError(
            f"rgb length {len(rgb)} != {width}x{height}x3"
        )
    row_size = (width * 3 + 3) & ~3
    img_size = row_size * height
    header = b"BM" + struct.pack("<IHHI", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, img_size,
        2835, 2835, 0, 0,
    )
    # pixel array layout shared with AVI '00db' frame bodies
    return header + info + _rgb_to_dib(width, height, rgb)


def decode_bmp24(payload: bytes) -> tuple[int, int, bytes]:
    """Decode a 24-bit uncompressed BMP to (width, height, RGB bytes in
    top-down row-major order). Handles the standard bottom-up layout,
    top-down images (negative height), and row padding; raises on
    malformed headers / unsupported bpp/compression like any real
    decoder — callers quarantine, not crash (extract_features)."""
    import struct

    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_offset,) = struct.unpack_from("<I", payload, 10)
    (hdr_size,) = struct.unpack_from("<I", payload, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    width, height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if planes != 1 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant: planes={planes} bpp={bpp} "
            f"compression={compression}"
        )
    top_down = height < 0
    height = abs(height)
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height}")
    row_size = (width * 3 + 3) & ~3
    if len(payload) < pix_offset + row_size * height:
        raise ValueError("truncated BMP pixel data")
    out = bytearray(width * height * 3)
    for file_row in range(height):
        y = file_row if top_down else height - 1 - file_row
        base = pix_offset + file_row * row_size
        for x in range(width):
            b, g, r = payload[base + x * 3: base + x * 3 + 3]
            off = (y * width + x) * 3
            out[off], out[off + 1], out[off + 2] = r, g, b
    return width, height, bytes(out)


# Cap on Python/numpy-side samples per payload in the FEATURE path
# (sketch features, not exact stats): bounds per-payload work at scale.
_FEATURE_MAX_SAMPLES = 4096


def _decode_one(payload: bytes, dim: int) -> list[float]:
    """Decode a media payload to a fixed-dim feature vector.

    BMP payloads (``BM`` magic) get a REAL decode: features are the
    decoded image's per-channel means (r, g, b in [0,1]) followed by the
    first pixels' normalized luminance — actual pixel content, not a
    digest. Other formats fall back to the deterministic sha256 stub
    (no codec libraries in this environment; swap for
    PIL/torchaudio/ffmpeg in deployment). Raises on None payload like a
    real decoder would on corrupt input.
    """
    if payload is None:
        raise ValueError("corrupt media payload: None")
    if payload[:2] == b"BM":
        w, h, rgb = decode_bmp24(payload)
        n = w * h
        means = [
            sum(rgb[c::3]) / (255.0 * n) for c in range(3)
        ]
        lum = [
            (0.299 * rgb[i * 3] + 0.587 * rgb[i * 3 + 1]
             + 0.114 * rgb[i * 3 + 2]) / 255.0
            for i in range(min(n, max(dim - 3, 0)))
        ]
        feats = means + lum
        feats += [0.0] * (dim - len(feats))
        return feats[:dim]
    if payload[:4] == b"RIFF":
        import math  # noqa: PLC0415

        import numpy as np  # noqa: PLC0415

        try:
            rate, data_off, n_total = probe_wav_pcm16(payload)
        except (ValueError, struct.error):
            # RIFF magic but not decodable 16-bit PCM (compressed
            # audio, video container) -> the digest stub, same as JPEG
            pass
        else:
            # Feature extraction must NOT decode the full sample list
            # (a 1h clip is ~160M samples): probe the header, then
            # compute signal features over a deterministic strided
            # subsample of <= _FEATURE_MAX_SAMPLES, vectorized. Exact
            # stats live in decode_audio_stats; features are sketches.
            stride = max(1, -(-n_total // _FEATURE_MAX_SAMPLES))
            s = np.frombuffer(
                payload, dtype="<i2", count=n_total, offset=data_off
            )[::stride].astype(np.int64)
            n = max(len(s), 1)
            nonneg = s >= 0
            feats = [
                math.sqrt(float(np.dot(s, s)) / n) / 32768.0,    # rms
                float(np.count_nonzero(nonneg[1:] != nonneg[:-1])) / n,
                (float(np.abs(s).max()) if len(s) else 0.0) / 32768.0,
                n_total / rate,                                  # dur s
            ]
            feats += [
                abs(float(v)) / 32768.0 for v in s[: max(dim - 4, 0)]
            ]
            feats += [0.0] * (dim - len(feats))
            return feats[:dim]
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


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("mean_r", DoubleType(), True),
        StructField("mean_g", DoubleType(), True),
        StructField("mean_b", DoubleType(), True),
        StructField("pix_checksum", LongType(), True),
    ]
)


def decode_image_stats(media: DataFrame) -> DataFrame:
    """REAL decode stage (Arrow-batched mapInPandas): parse each BMP
    payload with ``decode_bmp24`` and emit per-image pixel statistics —
    dimensions, per-channel means (0..255 scale), and a position- AND
    channel-weighted checksum ``sum((y*w+x+1) * (r<<16 | g<<8 | b))``
    over top-down row-major pixels. The checksum is deliberately
    sensitive to the three classic decoder bugs (bottom-up row order not
    flipped, BGR not swapped to RGB, row padding miscounted), so the
    cross-engine oracle in q_multimodal_decode value-pins the decoder's
    correctness, not just the plumbing. Undecodable payloads yield NULL
    stats (quarantine posture, same as extract_features)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ws, hs, mrs, mgs, mbs, cks = [], [], [], [], [], []
            for payload in pdf["payload"]:
                try:
                    w, h, rgb = decode_bmp24(
                        bytes(payload) if payload is not None else None
                    )
                except (ValueError, TypeError, struct.error):
                    for col in (ws, hs, mrs, mgs, mbs, cks):
                        col.append(None)
                    continue
                n = w * h
                ws.append(w)
                hs.append(h)
                mrs.append(sum(rgb[0::3]) / n)
                mgs.append(sum(rgb[1::3]) / n)
                mbs.append(sum(rgb[2::3]) / n)
                cks.append(
                    sum(
                        (i + 1)
                        * ((rgb[i * 3] << 16) | (rgb[i * 3 + 1] << 8)
                           | rgb[i * 3 + 2])
                        for i in range(n)
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.array(ws, dtype="Int64"),
                    "height": pd.array(hs, dtype="Int64"),
                    "mean_r": pd.array(mrs, dtype="float64"),
                    "mean_g": pd.array(mgs, dtype="float64"),
                    "mean_b": pd.array(mbs, dtype="float64"),
                    "pix_checksum": pd.array(cks, dtype="Int64"),
                }
            )

    return media.mapInPandas(batches, schema=IMAGE_STATS_SCHEMA)


# --------------------------------------------------------------------------
# Real pure-Python WAV codec (RIFF, 16-bit mono PCM) + audio stats stage
# --------------------------------------------------------------------------

def encode_wav_pcm16(sample_rate: int, samples: "list[int]") -> bytes:
    """Encode signed 16-bit mono samples as a standard RIFF/WAVE file:
    12-byte RIFF header, 16-byte PCM ``fmt `` chunk, ``data`` chunk."""
    import struct  # noqa: PLC0415

    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )  # PCM, mono, rate, byte-rate, block-align, bits
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def probe_wav_pcm16(payload: bytes) -> tuple[int, int, int]:
    """Header-only WAV probe: chunk-walk a RIFF/WAVE payload and return
    (sample_rate, data_offset, n_samples) WITHOUT materializing the
    sample array. Feature extraction at 100 TB must not pay O(n_samples)
    Python work per payload — callers slice/stride the data chunk
    directly (numpy ``frombuffer``) using these offsets.

    Same validation contract as ``decode_wav_pcm16``: unknown chunks
    (LIST/INFO/fact/...) skipped by declared size with odd-size padding
    honored, ``fmt `` validated as 16-bit mono PCM with nonzero rate,
    malformed payloads raise ValueError — ONLY ValueError, so quarantine
    handlers never see a task-killing exception."""
    import struct  # noqa: PLC0415

    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, data_off, data_size = 12, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        (size,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + size > len(payload):
            raise ValueError("truncated WAV chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"fmt chunk too small ({size} bytes)")
            fmt_tag, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", payload, pos + 8
            )
            if fmt_tag != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    "only 16-bit mono PCM supported by the pure-Python "
                    "codec (swap for torchaudio/ffmpeg in deployment)"
                )
            if rate == 0:
                raise ValueError("WAV sample rate is 0")
        elif cid == b"data":
            if size & 1:
                raise ValueError("odd-length 16-bit PCM data chunk")
            data_off, data_size = pos + 8, size
        pos += 8 + size + (size & 1)  # RIFF chunks are 2-byte aligned
    if rate is None or data_off is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, data_off, data_size // 2


def decode_wav_pcm16(payload: bytes) -> tuple[int, "list[int]"]:
    """Parse a RIFF/WAVE payload to (sample_rate, samples).

    Full decode — see ``probe_wav_pcm16`` for the header-only walk
    (shared validation; this adds the one-shot sample unpack)."""
    import struct  # noqa: PLC0415

    rate, data_off, n = probe_wav_pcm16(payload)
    return rate, list(struct.unpack_from(f"<{n}h", payload, data_off))


AUDIO_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("sample_rate", LongType(), True),
        StructField("n_samples", LongType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("rms", DoubleType(), True),
        StructField("zero_crossings", LongType(), True),
        StructField("peak", LongType(), True),
    ]
)


def decode_audio_stats(media: DataFrame) -> DataFrame:
    """REAL audio decode stage (Arrow-batched mapInPandas): parse each
    WAV payload with ``decode_wav_pcm16`` and emit per-clip signal
    statistics — duration, RMS amplitude (normalized to full scale, an
    exact integer sum-of-squares with ONE division and ONE sqrt so the
    cross-engine oracle hash-pins it), sign-change count, and peak.
    Undecodable payloads yield NULL stats (quarantine posture)."""
    import math  # noqa: PLC0415

    import numpy as np  # noqa: PLC0415

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rates, ns, durs, rmss, zcs, peaks = [], [], [], [], [], []
            for payload in pdf["payload"]:
                # one bytes() materialization per payload — Arrow-backed
                # buffers copy on conversion, so binding it once halves
                # transient allocation in this per-batch hot loop
                buf = bytes(payload) if payload is not None else None
                try:
                    rate, data_off, n = probe_wav_pcm16(buf)
                except (ValueError, TypeError, struct.error):
                    for col in (rates, ns, durs, rmss, zcs, peaks):
                        col.append(None)
                    continue
                # Vectorized EXACT stats: int64 sum-of-squares is exact
                # (n * 2^30 << 2^63), then the same one-division-one-sqrt
                # as the oracle — bit-identical to the scalar loop it
                # replaces, ~100x less Python interpreter work per clip.
                s = np.frombuffer(
                    buf, dtype="<i2", count=n, offset=data_off
                ).astype(np.int64)
                rates.append(rate)
                ns.append(n)
                durs.append(n * 1000 // rate)
                rmss.append(
                    math.sqrt(int(np.dot(s, s)) / n) / 32768.0
                    if n else 0.0
                )
                nonneg = s >= 0
                zcs.append(int(np.count_nonzero(nonneg[1:] != nonneg[:-1])))
                peaks.append(int(np.abs(s).max()) if n else 0)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": pd.array(rates, dtype="Int64"),
                    "n_samples": pd.array(ns, dtype="Int64"),
                    "duration_ms": pd.array(durs, dtype="Int64"),
                    "rms": pd.array(rmss, dtype="float64"),
                    "zero_crossings": pd.array(zcs, dtype="Int64"),
                    "peak": pd.array(peaks, dtype="Int64"),
                }
            )

    return media.mapInPandas(batches, schema=AUDIO_STATS_SCHEMA)


# --------------------------------------------------------------------------
# Real pure-Python AVI codec (RIFF, uncompressed 24-bit DIB frames)
# --------------------------------------------------------------------------

def _rgb_to_dib(width: int, height: int, rgb: bytes) -> bytes:
    """Top-down RGB -> the DIB pixel array (bottom-up BGR, 4-byte row
    padding) — the ONE encode-side implementation of the layout, used
    by both encode_bmp24 bodies and AVI '00db' frames. (decode_bmp24
    keeps its own unified loop because it also handles the top-down
    negative-height BMP variant and an arbitrary pixel-array offset;
    _dib_to_rgb below is the bottom-up-only decode twin for AVI.)"""
    row_size = (width * 3 + 3) & ~3
    out = bytearray(row_size * height)
    for file_row in range(height):
        y = height - 1 - file_row
        base = file_row * row_size
        for x in range(width):
            off = (y * width + x) * 3
            r, g, b = rgb[off: off + 3]
            out[base + x * 3: base + x * 3 + 3] = bytes((b, g, r))
    return bytes(out)


def _dib_to_rgb(width: int, height: int, dib: bytes) -> bytes:
    """Inverse of ``_rgb_to_dib`` (bottom-up BGR padded -> top-down RGB)."""
    row_size = (width * 3 + 3) & ~3
    out = bytearray(width * height * 3)
    for file_row in range(height):
        y = height - 1 - file_row
        base = file_row * row_size
        for x in range(width):
            b, g, r = dib[base + x * 3: base + x * 3 + 3]
            off = (y * width + x) * 3
            out[off], out[off + 1], out[off + 2] = r, g, b
    return bytes(out)


def encode_avi_rgb24(
    width: int, height: int, fps: int, frames: "list[bytes]"
) -> bytes:
    """Encode top-down RGB frames as a standard uncompressed AVI:
    RIFF 'AVI ' / LIST hdrl (avih + strl[strh 'vids'/'DIB ', strf
    BITMAPINFOHEADER]) / LIST movi ('00db' DIB frame chunks)."""
    import struct  # noqa: PLC0415

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    if not 1 <= fps <= 1_000_000:
        raise ValueError(
            f"fps must be in [1, 1000000], got {fps}: fps=0 divides by "
            "zero and fps>1e6 yields us_per_frame=0, which the decoder "
            "rejects as a degenerate header"
        )
    us_per_frame = 1000000 // fps
    avih = struct.pack(
        "<14I", us_per_frame, 0, 0, 0, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIIi", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0, -1
        ) + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0,
        ((width * 3 + 3) & ~3) * height, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(
        chunk(b"00db", _rgb_to_dib(width, height, f)) for f in frames
    ))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def decode_avi_rgb24(payload: bytes) -> tuple[int, int, int, "list[bytes]"]:
    """Parse an uncompressed AVI to (width, height, us_per_frame,
    top-down RGB frames) — a real RIFF LIST walk: nested lists are
    descended by declared size, unknown chunks skipped with odd-size
    padding, malformed payloads raise ValueError — ONLY ValueError
    (struct.error is converted, declared sizes are honored before any
    unpack, and zero dimensions/rate are rejected), so the callers'
    quarantine handlers never see a task-killing exception."""
    import struct  # noqa: PLC0415

    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    dims: "list[int]" = []
    frames: "list[bytes]" = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        # Iterative LIST descent (explicit stack): a hostile payload of
        # thousands of nested LIST chunks must raise/skip cleanly, never
        # RecursionError (which would bypass the ValueError quarantine
        # contract and kill the Spark task).
        stack: "list[tuple[int, int]]" = [(pos, end)]
        while stack:
            pos, end = stack.pop()
            while pos + 8 <= end:
                cid = buf[pos:pos + 4]
                (size,) = struct.unpack_from("<I", buf, pos + 4)
                body_start = pos + 8
                if body_start + size > end:
                    raise ValueError("truncated AVI chunk")
                if cid == b"LIST":
                    if size < 4:
                        raise ValueError("LIST chunk too small for a type")
                    if len(stack) >= 64:
                        raise ValueError("AVI LIST nesting too deep")
                    # resume the current level after the nested list
                    stack.append((body_start + size + (size & 1), end))
                    pos, end = body_start + 4, body_start + size
                    continue
                if cid == b"avih":
                    # unpack only inside the DECLARED chunk body — a
                    # lying size must raise, not read the next chunk's
                    # bytes
                    if size < 40:
                        raise ValueError(f"avih chunk too small ({size})")
                    us, _, _, _, _, _, _, _, w, h = struct.unpack_from(
                        "<10I", buf, body_start
                    )
                    if w == 0 or h == 0 or us == 0:
                        raise ValueError(
                            f"degenerate AVI header: {w}x{h} @ {us}us/frame"
                        )
                    dims[:] = [w, h, us]
                elif cid in (b"00db", b"00dc"):
                    frames.append(buf[body_start: body_start + size])
                pos = body_start + size + (size & 1)

    walk(payload, 12, len(payload))
    if not dims:
        raise ValueError("AVI missing avih header")
    w, h, us = dims
    row_size = (w * 3 + 3) & ~3
    for f in frames:
        if len(f) < row_size * h:
            raise ValueError("truncated AVI frame body")
    return w, h, us, [_dib_to_rgb(w, h, f) for f in frames]


VIDEO_FRAME_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), True),
        StructField("frame_ts_ms", LongType(), True),
        StructField("mean_r", DoubleType(), True),
        StructField("mean_g", DoubleType(), True),
        StructField("mean_b", DoubleType(), True),
        StructField("motion", LongType(), True),
    ]
)


def decode_video_stats(media: DataFrame) -> DataFrame:
    """REAL video decode stage (Arrow mapInPandas, row fan-out: one
    output row per frame): parse each AVI payload with
    ``decode_avi_rgb24`` and emit per-frame channel means plus a motion
    metric — the exact sum of absolute per-byte diffs against the
    previous frame (0 for frame 0). Motion is the temporal analog of
    the image checksum: a decoder that misorders frames, rows, or
    channels cannot reproduce it. Undecodable payloads contribute no
    rows (quarantine posture for a fan-out stage)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss = [], [], []
            mrs, mgs, mbs, motions = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    w, h, us, frames = decode_avi_rgb24(
                        bytes(payload) if payload is not None else None
                    )
                except (ValueError, TypeError, struct.error):
                    continue
                n = w * h
                prev = None
                for i, rgb in enumerate(frames):
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(i * us // 1000)
                    mrs.append(sum(rgb[0::3]) / n)
                    mgs.append(sum(rgb[1::3]) / n)
                    mbs.append(sum(rgb[2::3]) / n)
                    motions.append(
                        0 if prev is None
                        else sum(abs(a - b) for a, b in zip(rgb, prev))
                    )
                    prev = rgb
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "mean_r": pd.Series(mrs, dtype="float64"),
                    "mean_g": pd.Series(mgs, dtype="float64"),
                    "mean_b": pd.Series(mbs, dtype="float64"),
                    "motion": pd.Series(motions, dtype="int64"),
                }
            )

    return media.mapInPandas(batches, schema=VIDEO_FRAME_STATS_SCHEMA)


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

    BMP payloads get a REAL decode -> nearest-neighbor resample ->
    re-encode round trip (src pixel = floor(dst * src_dim / dst_dim),
    the standard NN kernel, fully deterministic). Non-BMP image
    payloads fall back to a deterministic digest stub (no codec libs in
    this environment). Non-image rows pass through untouched metadata
    with NULL payload.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_w, out_h = width, height
        for pdf in it:
            payloads, ws, hs = [], [], []
            for kind, payload in zip(pdf["kind"], pdf["payload"]):
                if kind == "image" and payload is not None:
                    raw = bytes(payload)
                    if raw[:2] == b"BM":
                        src_w, src_h, rgb = decode_bmp24(raw)
                        out = bytearray(out_w * out_h * 3)
                        for y in range(out_h):
                            sy = min(src_h - 1, y * src_h // out_h)
                            for x in range(out_w):
                                sx = min(src_w - 1, x * src_w // out_w)
                                src = (sy * src_w + sx) * 3
                                dst = (y * out_w + x) * 3
                                out[dst:dst + 3] = rgb[src:src + 3]
                        payloads.append(
                            encode_bmp24(out_w, out_h, bytes(out))
                        )
                    else:
                        # stands in for decode->resize->encode
                        digest = hashlib.sha256(raw).digest()
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

    REAL for AVI payloads (``RIFF..AVI `` magic): frames come from the
    pure-Python container parse (``decode_avi_rgb24``), sampled by a
    stride of ``every_ms`` over the stream's own frame period, each
    emitted row carrying the decoded top-down RGB bytes. Other formats
    keep the digest stub (frame count from duration_ms / every_ms) —
    swap for ffmpeg/pyav in deployment; the row fan-out contract is
    what downstream stages (per-frame featurization, dedup) depend on.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, payloads = [], [], [], []
            for mid, kind, payload, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["duration_ms"]
            ):
                if kind != "video" or payload is None:
                    continue
                b = bytes(payload)
                if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
                    try:
                        _, _, us, frames = decode_avi_rgb24(b)
                    except (ValueError, struct.error):
                        continue
                    period_ms = max(us // 1000, 1)
                    stride = max(every_ms // period_ms, 1)
                    for i in range(0, len(frames), stride):
                        ids.append(mid)
                        idxs.append(i)
                        tss.append(i * period_ms)
                        payloads.append(frames[i])
                    continue
                if dur is None:
                    continue
                digest = hashlib.sha256(b).digest()
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

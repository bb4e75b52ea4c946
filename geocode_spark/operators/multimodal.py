"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata.

The decode layer is REAL: from-scratch stdlib codecs (functions/media.py
— BMP, PNG incl. palette/tRNS, Adam7 interlacing and 16-bit depth via
zlib, GIF87a/89a with a full LZW decoder, baseline AND progressive
JFIF JPEG, RIFF/WAVE PCM, RIFF/AVI MJPEG video, MPEG Layer III audio
frame walk) back every default hook, so ``with_media_meta`` reports
actual pixel dimensions, video frame-rate durations and sample-accurate
audio durations, ``extract_features`` histograms decoded pixels/samples
(video: the first sampled frame's decoded luma), ``resize_media`` emits
real resampled image bytes and ``frame_sample`` slices block-aligned
PCM segments, evenly sampled MJPEG frames (each a standalone decodable
JPEG) or raw MPEG audio frames. MP3 features fall back to the byte
histogram (frame headers give exact duration but PCM synthesis is out
of codec scope); every hook stays pluggable (``decode_fn=`` /
``feature_fn=`` / ``resize_fn=`` / ``frame_fn=``) for deployments that
ship PIL/ffmpeg.

``strict=True`` makes corrupt payloads (right magic, bad structure)
raise ``MediaFormatError`` instead of downgrading to ``binary`` —
quarantine-vs-continue is the caller's pipeline policy.

At 100 TB: binary payloads dominate partition size, so the operators are
built on Arrow-batched ``mapInPandas`` — the payload crosses the
JVM/Python boundary exactly once, rows stay columnar, and output
assembly is vectorized (no per-row pandas objects).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, IntegerType,
                               LongType, StringType, StructField, StructType)

from ..functions.media import (MediaFormatError, avi_frames,
                               decode_media_meta, media_features,
                               mp3_frames, resize_image_payload, sniff,
                               wav_frames)

MEDIA_META_SCHEMA = StructType([
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", LongType()),
])


def _fake_decode(payload: bytes) -> dict:
    """Deterministic TEST DOUBLE (the pre-round-4 stub, kept so plumbing
    tests can run without constructing valid media bytes): derives
    metadata purely from payload byte counts. Production default is the
    real ``functions.media.decode_media_meta``."""
    if payload is None:
        return {"media_type": None, "n_bytes": 0, "width": None,
                "height": None, "duration_ms": None}
    n = len(payload)
    head = bytes(payload[:4])
    if head.startswith(b"\x89PN") or head.startswith(b"\xff\xd8"):
        mt = "image"
    elif head.startswith(b"RIFF") or head.startswith(b"ID3"):
        mt = "audio"
    else:
        mt = "binary"
    return {"media_type": mt, "n_bytes": n,
            "width": int(n % 1920) + 1, "height": int((n * 7) % 1080) + 1,
            "duration_ms": int(n % 60000)}


def with_media_meta(df: DataFrame, binary_col: str = "html",
                    decode_fn: Callable[[bytes], dict] | None = None,
                    strict: bool = False) -> DataFrame:
    """Add a typed ``media`` struct decoded from an opaque binary column.

    Default decoder is the real stdlib codec layer: BMP/PNG payloads get
    pixel (width, height), WAV payloads get sample-accurate duration_ms,
    anything else is ``binary`` with n_bytes only. ``strict=True``
    raises ``MediaFormatError`` on corrupt media instead of downgrading.
    """
    if decode_fn is None:
        fn = lambda payload: decode_media_meta(payload, strict=strict)  # noqa: E731
    else:
        fn = decode_fn
    out_schema = StructType(df.schema.fields
                            + [StructField("media", MEDIA_META_SCHEMA)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fn(b) for b in pdf[binary_col]]
            out = pdf.copy()
            out["media"] = metas
            yield out

    return df.mapInPandas(run, schema=out_schema)


def extract_features(df: DataFrame, binary_col: str = "html", dim: int = 16,
                     feature_fn: Callable[[bytes], np.ndarray] | None = None
                     ) -> DataFrame:
    """Add a ``features: array<double>`` column from the binary payload.

    Default feature_fn is modality-aware and content-level: decoded-pixel
    luma histogram for images, decoded-PCM amplitude histogram for audio,
    byte histogram for unrecognized payloads (functions.media
    .media_features). All normalized to sum 1, all deterministic."""
    fn = feature_fn or (lambda payload: media_features(payload, dim))
    out_schema = StructType(df.schema.fields
                            + [StructField("features", ArrayType(DoubleType()))])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["features"] = [fn(b).tolist() for b in pdf[binary_col]]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def resize_media(df: DataFrame, binary_col: str = "html",
                 width: int = 64, height: int = 64,
                 resize_fn: Callable[[bytes, int, int], bytes] | None = None,
                 strict: bool = False,
                 out_col: str = "resized") -> DataFrame:
    """Resize an image payload to (width, height): adds ``out_col``
    (binary) plus ``resized_width``/``resized_height``.

    Default is the real path: decode BMP/PNG, nearest-neighbor resample,
    re-encode as 24-bit BMP (deterministic, compression-free). Payloads
    that aren't decodable images yield NULL bytes (``strict=True``
    raises MediaFormatError instead) — downstream filters on
    ``out_col IS NOT NULL`` keep size accounting honest. A custom
    ``resize_fn`` (e.g. PIL) receives (payload, width, height) and may
    raise MediaFormatError to get the same null-vs-raise policy."""
    fn = resize_fn or resize_image_payload

    def guarded(payload: bytes) -> bytes | None:
        if payload is None:
            return None
        try:
            return fn(payload, width, height)
        except MediaFormatError:
            if strict:
                raise
            return None

    out_schema = StructType(df.schema.fields + [
        StructField(out_col, BinaryType()),
        StructField("resized_width", IntegerType()),
        StructField("resized_height", IntegerType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf.copy()
            out[out_col] = [guarded(p) for p in pdf[binary_col].tolist()]
            out["resized_width"] = np.int32(width)
            out["resized_height"] = np.int32(height)
            yield out

    return df.mapInPandas(run, schema=out_schema)


def _default_frames(payload: bytes, n: int) -> list:
    """Real frame sampling per modality: WAV audio -> <=n contiguous
    block-aligned PCM segments; MJPEG AVI video -> <=n evenly sampled
    frame chunks (each a standalone decodable JPEG); MP3 -> <=n evenly
    sampled self-delimiting MPEG frames. Payloads with no decodable
    timeline byte-slice deterministically."""
    if not payload:
        return []
    kind = sniff(payload)
    if kind in ("wav", "avi", "mp3"):
        try:
            return {"wav": wav_frames, "avi": avi_frames,
                    "mp3": mp3_frames}[kind](payload, n)
        except MediaFormatError:
            pass
    b = bytes(payload)
    step = max(len(b) // n, 1)
    return [b[i * step:(i + 1) * step] for i in range(min(n, len(b)))]


def frame_sample(df: DataFrame, binary_col: str = "html", n_frames: int = 4,
                 frame_fn: Callable[[bytes, int], list] | None = None
                 ) -> DataFrame:
    """Explode a media payload into <=n sampled frames
    (frame_idx, frame_bytes). WAV audio is sliced into real block-aligned
    PCM segments; other payloads byte-slice deterministically."""
    if n_frames < 1:
        # validate on the driver: inside the executors this becomes a
        # ZeroDivisionError in the slicers, which is outside the
        # MediaFormatError downgrade policy and would fail the whole task
        raise ValueError(f"n_frames must be >= 1, got {n_frames}")
    fn = frame_fn or _default_frames
    out_schema = StructType(df.schema.fields + [
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # columnar explode: frame extraction runs per payload (the
            # pluggable decode hook is payload-granular by nature), but row
            # materialization is a single vectorized take + two appended
            # columns — no per-row pandas objects
            frames = [fn(p, n_frames) for p in pdf[binary_col].tolist()]
            counts = np.fromiter((len(f) for f in frames), dtype=np.int64,
                                 count=len(frames))
            total = int(counts.sum())
            if total == 0:
                continue
            out = pdf.iloc[np.repeat(np.arange(len(pdf)), counts)] \
                     .reset_index(drop=True)
            out["frame_idx"] = np.concatenate(
                [np.arange(c, dtype=np.int32) for c in counts])
            out["frame_bytes"] = [fb for f in frames for fb in f]
            yield out

    return df.mapInPandas(run, schema=out_schema)

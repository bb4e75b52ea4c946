"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery (schema, partition sizing, Arrow batch shape,
mapInPandas signatures) is real and tested; the actual media decode is
STUBBED (image/audio libs are not in this container) behind
``decode_fn`` hooks — a deterministic fake by default, or
NotImplementedError when ``strict=True``.

At 100 TB: binary payloads dominate partition size, so the operators set
``spark.sql.files.maxPartitionBytes``-friendly batch shapes (few rows per
Arrow batch) and never copy payload bytes through Python more than once.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, IntegerType,
                               LongType, StringType, StructField, StructType)

MEDIA_META_SCHEMA = StructType([
    StructField("media_type", StringType()),
    StructField("n_bytes", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", LongType()),
])


def _fake_decode(payload: bytes) -> dict:
    """Deterministic fake decode: derives metadata from the payload bytes.
    Replace with a real decoder (PIL/ffmpeg) where available."""
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
    """Add a typed ``media`` struct decoded from an opaque binary column."""
    if strict and decode_fn is None:
        raise NotImplementedError(
            "real media decode requires an image/audio library not present "
            "in this environment; pass decode_fn=")
    fn = decode_fn or _fake_decode
    out_schema = StructType(df.schema.fields + [StructField("media", MEDIA_META_SCHEMA)])

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

    Default feature_fn is a deterministic byte-histogram sketch (stands in
    for a real CNN/audio embedding; the Spark plumbing — Arrow batches, fixed
    output dim, null handling — is exactly what a real extractor needs).
    """
    def default_fn(payload: bytes) -> np.ndarray:
        if not payload:
            return np.zeros(dim)
        arr = np.frombuffer(bytes(payload), dtype=np.uint8)
        hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
        s = hist.sum()
        return hist / s if s else hist.astype(float)

    fn = feature_fn or default_fn
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
    """Resize an image/binary payload to (width, height): adds ``out_col``
    (binary) plus ``resized_width``/``resized_height``. The Spark plumbing
    (Arrow batch shape, schema, columnar assembly) is real; the pixel
    transform is STUBBED — the deterministic fake strides the payload down
    to exactly width*height bytes (pad-repeats when shorter) so downstream
    size accounting behaves like a real thumbnailer. A real implementation
    passes ``resize_fn`` (e.g. PIL Image.resize); ``strict=True`` raises
    instead of faking."""
    if strict and resize_fn is None:
        raise NotImplementedError(
            "real image resize requires an imaging library not present in "
            "this environment; pass resize_fn=")

    def default_fn(payload: bytes, w: int, h: int) -> bytes:
        if not payload:
            return b"\x00" * (w * h)
        b = np.frombuffer(bytes(payload), dtype=np.uint8)
        # stride-sample to exactly w*h bytes (repeat-pad short payloads)
        idx = (np.arange(w * h, dtype=np.int64) * max(len(b) // (w * h), 1)) \
            % len(b)
        return b[idx].tobytes()

    fn = resize_fn or default_fn
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
            out[out_col] = [fn(p, width, height)
                            for p in pdf[binary_col].tolist()]
            out["resized_width"] = np.int32(width)
            out["resized_height"] = np.int32(height)
            yield out

    return df.mapInPandas(run, schema=out_schema)


def frame_sample(df: DataFrame, binary_col: str = "html", n_frames: int = 4,
                 frame_fn: Callable[[bytes, int], list] | None = None
                 ) -> DataFrame:
    """Explode a video/binary payload into n sampled 'frames'
    (frame_idx, frame_bytes). Stub frame_fn slices the payload
    deterministically; a real one would ffmpeg-seek."""
    def default_fn(payload: bytes, n: int) -> list:
        if not payload:
            return []
        b = bytes(payload)
        step = max(len(b) // n, 1)
        return [b[i * step:(i + 1) * step] for i in range(min(n, len(b)))]

    fn = frame_fn or default_fn
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

"""Multimodal column plumbing: images/audio/video as opaque binary columns
with typed metadata.

Beyond-reference capability. The Spark-side machinery — schema, batch
iteration, partition sizing, UDF signatures — is real and tested; the
actual media decoding is STUBBED (``NotImplementedError``) because media
libraries are not available in this environment. A deployment swaps
``_decode_image_stub`` for a PIL/ffmpeg call without touching the
dataflow.

Design for 100 TB of media:

* media bytes ride an opaque ``binary`` column next to typed metadata —
  column pruning means metadata-only queries never read the bytes;
* all per-item work happens in ``mapInPandas`` over Arrow batches —
  tune bytes-per-batch with ``spark.sql.execution.arrow.maxRecordsPerBatch``
  and partition input by size so a batch of large videos fits in memory;
* derived features are plain numeric/array columns → every downstream
  operator (dedup, similarity, filtering) applies unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, LongType, StringType, StructField, StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "media_table",
    "decode_image",
    "resize_image",
    "extract_features",
    "frame_sample",
]

# typed metadata + opaque payload: the storage contract for media columns
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("kind", StringType(), False),        # image | audio | video
    StructField("mime", StringType(), True),
    StructField("width", LongType(), True),           # images/video
    StructField("height", LongType(), True),
    StructField("duration_ms", LongType(), True),     # audio/video
    StructField("data", BinaryType(), True),          # opaque payload
])


def media_table(spark, rows) -> DataFrame:
    """Construct a media table conforming to :data:`MEDIA_SCHEMA`."""
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_image_stub(data: bytes, fake: bool) -> bytes:
    """Decode stub: the real implementation would return raw pixels via an
    image library. ``fake=True`` produces a deterministic stand-in (the
    payload itself) so the surrounding dataflow is testable."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "environment; pass fake=True to exercise the dataflow")
    return data


def decode_image(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode the payload of image rows into a ``pixels`` binary column.
    Arrow-batched ``mapInPandas``; non-image rows pass through with null
    pixels. Batch shape: one pandas DataFrame per Arrow batch."""
    schema = StructType(list(df.schema.fields) + [StructField("pixels", BinaryType(), True)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["pixels"] = [
                _decode_image_stub(d, fake) if k == "image" and d is not None else None
                for k, d in zip(pdf["kind"], pdf["data"])
            ]
            yield out

    return df.mapInPandas(run, schema=schema)


def resize_image(df: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Resize image payloads to ``width``×``height``: output mirrors the
    input schema with the payload replaced and the size metadata updated.
    The pixel resample is stubbed (``fake=True`` digests payload+dims so
    distinct targets yield distinct deterministic bytes); non-image rows
    pass through untouched. Same Arrow-batch contract as decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            data, ws, hs = [], [], []
            for k, d, w, h in zip(pdf["kind"], pdf["data"], pdf["width"], pdf["height"]):
                if k != "image" or d is None:
                    data.append(d)
                    ws.append(w)
                    hs.append(h)
                    continue
                if not fake:
                    raise NotImplementedError(
                        "image resampling requires an image library not present "
                        "in this environment; pass fake=True")
                data.append(hashlib.md5(
                    bytes(d) + f"{width}x{height}".encode()).digest())
                ws.append(width)
                hs.append(height)
            out["data"] = data
            out["width"] = pd.array(ws, dtype="Int64")
            out["height"] = pd.array(hs, dtype="Int64")
            yield out

    return df.mapInPandas(run, schema=df.schema)


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """Deterministic feature extraction over the payload: an md5-seeded
    pseudo-embedding (stands in for a real vision/audio encoder; the
    shape — binary in, fixed-dim double array out, Arrow-batched — is the
    production contract)."""
    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, sizes = [], []
            for d in pdf["data"]:
                if d is None:
                    sizes.append(None)
                    feats.append(None)
                    continue
                sizes.append(len(d))
                h = hashlib.md5(bytes(d)).digest()
                feats.append([round(h[i] / 255.0, 6) for i in range(dim)])
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pd.array(sizes, dtype="Int64"),
                "features": feats,
            })

    return df.mapInPandas(run, schema=schema)


def frame_sample(df: DataFrame, every_ms: int = 1000, fake: bool = False) -> DataFrame:
    """Sample frames from video payloads: one output row per sampled
    timestamp. Frame extraction is stubbed; with ``fake=True`` each frame
    is a deterministic digest of (payload, timestamp) so downstream
    dedup/similarity over frames is exercisable end to end."""
    schema = StructType([
        StructField("media_id", LongType(), False),
        StructField("frame_ms", LongType(), False),
        StructField("frame", BinaryType(), True),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ts, frames = [], [], []
            for mid, kind, dur, data in zip(
                pdf["media_id"], pdf["kind"], pdf["duration_ms"], pdf["data"]
            ):
                if kind != "video" or data is None or dur is None:
                    continue
                if not fake:
                    raise NotImplementedError(
                        "video frame extraction requires a media library not "
                        "present in this environment; pass fake=True")
                for t in range(0, int(dur), every_ms):
                    ids.append(mid)
                    ts.append(t)
                    frames.append(hashlib.md5(bytes(data) + str(t).encode()).digest())
            yield pd.DataFrame({"media_id": ids, "frame_ms": ts, "frame": frames})

    return df.mapInPandas(run, schema=schema)

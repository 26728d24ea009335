"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_image``/``decode_audio`` raise NotImplementedError unless
``fake=True``, which substitutes a deterministic fake decoder so the
Spark-side plumbing — schema, batch iteration, partitioning — is fully
exercised by tests.

Scale notes: mapInPandas streams Arrow batches (no per-row Python
overhead); binary payloads never pass through a shuffle — derive features
first, then aggregate the (small) feature columns.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),        # image | audio | video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),      # opaque bytes
    T.StructField("width", T.IntegerType(), True),       # typed metadata
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

IMAGE_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("mean_byte", T.DoubleType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def _fake_decode(payload: bytes, feat_dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: byte-histogram-ish
    features so tests get stable values. Replace with PIL/torchvision in
    a real deployment."""
    if payload is None:
        return [0.0] * feat_dim
    acc = [0] * feat_dim
    for i, b in enumerate(payload):
        acc[i % feat_dim] += b
    return [float(x) for x in acc]


def extract_image_features(
    df: DataFrame,
    *,
    feat_dim: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Decode + feature-extract images via mapInPandas (Arrow batches).

    ``fake=False`` raises NotImplementedError at execution time — the
    real decoder needs PIL/libjpeg, absent in this container. The plan
    shape (schema in/out, batching, no shuffle) is identical either way.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL/torchvision — not in this container"
                )
            feats = pdf["payload"].map(lambda p: _fake_decode(p, feat_dim))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "n_bytes": pdf["payload"].map(lambda p: 0 if p is None else len(p)).astype("int64"),
                "mean_byte": pdf["payload"].map(
                    lambda p: float(sum(p)) / len(p) if p else 0.0
                ),
                "feature": feats,
            })

    return df.select("media_id", "payload").mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def sample_video_frames(
    df: DataFrame,
    *,
    every_ms: int = 1000,
) -> DataFrame:
    """Frame-sampling plan: one output row per sampled timestamp, computed
    from typed metadata only (no decode): the downstream decoder receives
    (media_id, frame_ts_ms, payload) partitioned by media_id. Decode
    itself is the stubbed step."""
    n_frames = (F.col("duration_ms") / F.lit(every_ms)).cast("int")
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            "payload",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx").cast("long") * every_ms)
    )


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
])

AUDIO_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("duration_ms", T.LongType(), True),
    T.StructField("rms", T.DoubleType(), True),
    T.StructField("peak", T.IntegerType(), True),
])


def resize_images(
    df: DataFrame,
    *,
    width: int = 64,
    height: int = 64,
    fake: bool = False,
) -> DataFrame:
    """Image resize via mapInPandas. Real path is STUBBED (needs
    PIL/libvips); ``fake=True`` substitutes a deterministic byte
    truncate/pad to width*height so the schema, Arrow batch flow, and
    output contract are real and testable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires PIL/libvips — not in this container"
                )
            resized = pdf["payload"].map(
                lambda p: (p or b"")[:target].ljust(target, b"\0")
            )
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": resized,
                "width": width,
                "height": height,
            })

    return df.select("media_id", "payload").mapInPandas(run, RESIZED_SCHEMA)


def extract_audio_features(
    df: DataFrame,
    *,
    fake: bool = False,
) -> DataFrame:
    """Audio decode + loudness features via mapInPandas. Real decode is
    STUBBED (needs ffmpeg/librosa); ``fake=True`` treats the payload
    bytes as 8-bit samples and computes real RMS/peak over them."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio decode requires ffmpeg/librosa — not in this container"
                )
            rows = {"media_id": [], "duration_ms": [], "rms": [], "peak": []}
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                b = payload or b""
                rows["media_id"].append(mid)
                rows["duration_ms"].append(dur)
                rows["rms"].append(
                    math.sqrt(sum(x * x for x in b) / len(b)) if b else 0.0
                )
                rows["peak"].append(max(b) if b else 0)
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload", "duration_ms").mapInPandas(
        run, AUDIO_FEATURE_SCHEMA
    )

"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is REAL for the formats a pure-stdlib container can
handle (uncompressed BMP, PPM/PGM, 8-bit PNG, baseline JPEG images,
PCM WAV audio — see functions/codecs.py and functions/jpeg.py):
``fake=False`` dispatches on magic bytes and produces true
width/height/pixel stats and duration/PCM loudness. Formats that need
external codec libraries (MP3/MP4, progressive/arithmetic JPEG) still
raise NotImplementedError naming the variant; ``fake=True`` substitutes
a deterministic fake decoder so plumbing tests and the gated
multimodal_features oracle stay payload-format-agnostic.

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
    T.StructField("width", T.IntegerType(), True),   # real decode only
    T.StructField("height", T.IntegerType(), True),  # (null on fake path)
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

    ``fake=False`` REALLY decodes BMP/PPM/PNG/baseline-JPEG payloads
    (functions/codecs, functions/jpeg): width/height from the header,
    mean_byte = mean pixel value, feature = L1-normalized ``feat_dim``
    -bin grayscale histogram (ITU-R 601 luma). Progressive JPEG raises
    NotImplementedError naming the variant. The
    plan shape (schema in/out, batching, no shuffle) is identical on
    the fake path, which keeps byte-level stats and null width/height.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from replicadb_spark.functions import codecs

        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "n_bytes": pdf["payload"]
                .map(lambda p: 0 if p is None else len(p))
                .astype("int64"),
            }
            if fake:
                out["mean_byte"] = pdf["payload"].map(
                    lambda p: float(sum(p)) / len(p) if p else 0.0
                )
                out["feature"] = pdf["payload"].map(
                    lambda p: _fake_decode(p, feat_dim)
                )
                out["width"] = pd.array([None] * len(pdf), dtype="Int32")
                out["height"] = pd.array([None] * len(pdf), dtype="Int32")
            else:
                means, feats, ws, hs = [], [], [], []
                for p in pdf["payload"]:
                    if p is None:
                        means.append(0.0)
                        feats.append([0.0] * feat_dim)
                        ws.append(None)
                        hs.append(None)
                        continue
                    rgb = codecs.decode_image(bytes(p))
                    gray = (
                        0.299 * rgb[:, :, 0]
                        + 0.587 * rgb[:, :, 1]
                        + 0.114 * rgb[:, :, 2]
                    )
                    hist, _ = np.histogram(gray, bins=feat_dim, range=(0, 256))
                    n_px = gray.size or 1
                    means.append(float(rgb.mean()))
                    feats.append((hist / n_px).astype("float32").tolist())
                    hs.append(rgb.shape[0])
                    ws.append(rgb.shape[1])
                out["mean_byte"] = means
                out["feature"] = feats
                out["width"] = pd.array(ws, dtype="Int32")
                out["height"] = pd.array(hs, dtype="Int32")
            yield pd.DataFrame(out)

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
    """Image resize via mapInPandas. ``fake=False`` REALLY resizes
    BMP/PPM/PNG/baseline-JPEG payloads: decode (functions/codecs) →
    nearest-neighbor resample in numpy → re-encode as binary PPM (P6),
    the stdlib-only round-trip format; progressive JPEG raises
    NotImplementedError. ``fake=True`` keeps the deterministic byte
    truncate/pad so format-agnostic plumbing tests still run."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from replicadb_spark.functions import codecs

        target = width * height
        for pdf in batches:
            if fake:
                resized = pdf["payload"].map(
                    lambda p: (p or b"")[:target].ljust(target, b"\0")
                )
            else:
                resized = pdf["payload"].map(
                    lambda p: None
                    if p is None
                    else codecs.encode_ppm(
                        codecs.resize_nearest(
                            codecs.decode_image(bytes(p)), width, height
                        )
                    )
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
    """Audio decode + loudness features via mapInPandas. ``fake=False``
    REALLY decodes PCM WAV payloads (functions/codecs, stdlib ``wave``):
    duration_ms from frame count / sample rate, rms over the normalized
    [-1, 1] mono mix, peak as the TRUE raw-integer sample magnitude at
    the source bit depth (normalized amplitude × 2^(8·sw−1): max ~128
    for 8-bit, ~32768 for 16-bit — an 8-bit peak is directly the byte
    deviation from the 128 center, comparable to the fake path);
    compressed audio (MP3/AAC) raises NotImplementedError (needs
    ffmpeg/librosa). ``fake=True`` treats the payload bytes as 8-bit
    samples and computes RMS/peak over them, format-agnostic."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        from replicadb_spark.functions import codecs

        for pdf in batches:
            rows = {"media_id": [], "duration_ms": [], "rms": [], "peak": []}
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                rows["media_id"].append(mid)
                if fake:
                    b = payload or b""
                    rows["duration_ms"].append(dur)
                    rows["rms"].append(
                        math.sqrt(sum(x * x for x in b) / len(b)) if b else 0.0
                    )
                    rows["peak"].append(max(b) if b else 0)
                    continue
                if payload is None:
                    rows["duration_ms"].append(0)
                    rows["rms"].append(0.0)
                    rows["peak"].append(0)
                    continue
                if codecs.sniff_format(bytes(payload)) != "wav":
                    raise NotImplementedError(
                        "audio decode beyond PCM WAV requires ffmpeg/librosa"
                        " — not in this container"
                    )
                x, rate, sw = codecs.decode_wav_full(bytes(payload))
                rows["duration_ms"].append(
                    int(round(len(x) * 1000.0 / rate)) if rate else 0
                )
                rows["rms"].append(
                    float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
                )
                # true raw-sample magnitude: [-1,1] × 2^(8·sw−1) — the
                # source bit depth's full scale (128 for 8-bit, 32768
                # for 16-bit), clamped into the Int32 output field
                rows["peak"].append(
                    min(
                        int(round(float(np.abs(x).max()) * 2 ** (8 * sw - 1))),
                        2**31 - 1,
                    )
                    if len(x)
                    else 0
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload", "duration_ms").mapInPandas(
        run, AUDIO_FEATURE_SCHEMA
    )


GIF_FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("n_frames", T.IntegerType(), False),
    T.StructField("delay_ms", T.LongType(), True),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("mean_r", T.DoubleType(), True),
    T.StructField("mean_g", T.DoubleType(), True),
    T.StructField("mean_b", T.DoubleType(), True),
])


def extract_gif_frames(
    df: DataFrame,
    *,
    every_n: int = 1,
) -> DataFrame:
    """REAL animated-frame sampling: decode every ``every_n``-th
    composited frame of each GIF payload (functions/codecs.
    decode_gif_animation — LZW, transparency, disposal all real) into
    one feature row per sampled frame. This is sample_video_frames'
    plumbing with an actual decoder behind it — the one animation
    container a pure-stdlib environment can open; video containers
    (mp4/webm) stay behind the honest codec gate.

    Scale: payload bytes never leave the executor that scanned them
    (mapInPandas, Arrow batches); one input row fans out to its
    sampled frames worker-side, so there is no explode shuffle; only
    the small feature rows move. Non-GIF payloads yield zero rows —
    callers pre-filter on kind/magic for clearer accounting."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from replicadb_spark.functions import codecs

        for pdf in batches:
            rows = {k.name: [] for k in GIF_FRAME_SCHEMA.fields}
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if p is None or codecs.sniff_format(bytes(p)) != "gif":
                    continue
                frames = codecs.decode_gif_animation(bytes(p))
                for i in range(0, len(frames), every_n):
                    rgb, delay = frames[i]
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["n_frames"].append(len(frames))
                    rows["delay_ms"].append(delay)
                    rows["height"].append(rgb.shape[0])
                    rows["width"].append(rgb.shape[1])
                    rows["mean_r"].append(float(rgb[:, :, 0].mean()))
                    rows["mean_g"].append(float(rgb[:, :, 1].mean()))
                    rows["mean_b"].append(float(rgb[:, :, 2].mean()))
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(
        run, GIF_FRAME_SCHEMA
    )

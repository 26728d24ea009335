"""Multimodal plumbing (functions/multimodal.py) — schema, Arrow batch
shape, stub gating."""

import pytest

from pyspark.sql import functions as F

from replicadb_spark.functions import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", "image/png", bytearray(b"\x89PNG fake"), 4, 4, None),
        (2, "image", "image/jpeg", bytearray(b"\xff\xd8 fake jpeg"), 8, 8, None),
        (3, "video", "video/mp4", bytearray(b"\x00mp4 fake"), 640, 480, 3500),
        (4, "image", "image/png", None, None, None, None),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_fake_feature_extraction(media):
    out = MM.extract_image_features(media, feat_dim=4, fake=True)
    assert [f.name for f in out.schema.fields] == [
        "media_id", "n_bytes", "mean_byte", "feature", "width", "height",
    ]
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == 9
    assert rows[4]["n_bytes"] == 0
    assert len(rows[2]["feature"]) == 4
    # deterministic fake: byte sums are reproducible
    again = {r["media_id"]: r for r in MM.extract_image_features(media, feat_dim=4, fake=True).collect()}
    assert rows[1]["feature"] == again[1]["feature"]


def test_real_decode_rejects_codec_formats(media):
    # PNG/JPEG still need external codec libs — the real path must say
    # so, not silently fake anything (BMP/PPM/WAV decode for real; see
    # test_multimodal_codecs.py)
    with pytest.raises(Exception, match="UnsupportedMediaError|NotImplementedError|PIL"):
        MM.extract_image_features(media, fake=False).collect()


def test_video_frame_sampling_plan(media):
    out = MM.sample_video_frames(media, every_ms=1000).collect()
    # 3500ms video at 1fps → frames at 0,1000,2000 (and idx 3 if ceil) — spec: n = duration//1000
    ts = sorted(r["frame_ts_ms"] for r in out)
    assert ts == [0, 1000, 2000]
    assert all(r["media_id"] == 3 for r in out)


def test_resize_images_fake_contract(spark):
    from replicadb_spark.functions.multimodal import resize_images

    df = spark.createDataFrame(
        [(1, b"abcdef"), (2, None), (3, b"x" * 100)],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in resize_images(df, width=4, height=2, fake=True).collect()}
    assert len(out[1]["payload"]) == 8 and out[1]["payload"].startswith(b"abcdef")
    assert out[2]["payload"] == b"\0" * 8          # null payload → zero canvas
    assert len(out[3]["payload"]) == 8              # truncated to target
    assert (out[1]["width"], out[1]["height"]) == (4, 2)


def test_resize_images_real_path_raises(spark):
    from replicadb_spark.functions.multimodal import resize_images

    df = spark.createDataFrame([(1, b"abc")], "media_id long, payload binary")
    with pytest.raises(Exception, match="NotImplementedError|not supported"):
        resize_images(df, fake=False).collect()


def test_extract_audio_features_fake(spark):
    import math

    from replicadb_spark.functions.multimodal import extract_audio_features

    df = spark.createDataFrame(
        [(1, bytes([10, 20, 30]), 3000), (2, None, 0)],
        "media_id long, payload binary, duration_ms long",
    )
    got = {r["media_id"]: r for r in extract_audio_features(df, fake=True).collect()}
    assert got[1]["peak"] == 30
    assert got[1]["rms"] == pytest.approx(math.sqrt((100 + 400 + 900) / 3))
    assert got[2]["rms"] == 0.0 and got[2]["peak"] == 0


def test_extract_gif_frames_real_decode(spark):
    """extract_gif_frames: real animated-GIF decode behind the frame-
    sampling plumbing — per-frame rows with composited means, delays,
    every_n sampling; non-GIF payloads contribute zero rows."""
    import numpy as np

    from replicadb_spark.functions.multimodal import extract_gif_frames
    from tests.test_multimodal_codecs import PAL4, _gif_bytes

    frames = [
        (0, 0, 2, 2, [0, 0, 0, 0], {"delay_cs": 10}),
        (0, 0, 2, 2, [1, 1, 1, 1], {"delay_cs": 20}),
        (0, 0, 2, 2, [2, 2, 2, 2], {"delay_cs": 30}),
    ]
    gif = _gif_bytes(2, 2, PAL4, frames)
    df = spark.createDataFrame(
        [(1, bytearray(gif)), (2, bytearray(b"not a gif")), (3, None)],
        "media_id long, payload binary",
    )
    out = extract_gif_frames(df).collect()
    assert {r["media_id"] for r in out} == {1}
    rows = sorted(out, key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]
    assert all(r["n_frames"] == 3 for r in rows)
    assert [r["delay_ms"] for r in rows] == [100, 200, 300]
    assert rows[0]["width"] == 2 and rows[0]["height"] == 2
    want = [PAL4[0], PAL4[1], PAL4[2]]
    for r, (wr, wg, wb) in zip(rows, want):
        assert (r["mean_r"], r["mean_g"], r["mean_b"]) == (wr, wg, wb)

    sampled = extract_gif_frames(df, every_n=2).collect()
    assert sorted(r["frame_idx"] for r in sampled) == [0, 2]

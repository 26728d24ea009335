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
    assert [f.name for f in out.schema.fields] == ["media_id", "n_bytes", "mean_byte", "feature"]
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["n_bytes"] == 9
    assert rows[4]["n_bytes"] == 0
    assert len(rows[2]["feature"]) == 4
    # deterministic fake: byte sums are reproducible
    again = {r["media_id"]: r for r in MM.extract_image_features(media, feat_dim=4, fake=True).collect()}
    assert rows[1]["feature"] == again[1]["feature"]


def test_real_decode_is_stubbed(media):
    with pytest.raises(Exception) as exc_info:
        MM.extract_image_features(media, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_video_frame_sampling_plan(media):
    out = MM.sample_video_frames(media, every_ms=1000).collect()
    # 3500ms video at 1fps → frames at 0,1000,2000 (and idx 3 if ceil) — spec: n = duration//1000
    ts = sorted(r["frame_ts_ms"] for r in out)
    assert ts == [0, 1000, 2000]
    assert all(r["media_id"] == 3 for r in out)

"""Multimodal plumbing: schema, batch shape and plan fan-out are real; the
decode is a deterministic stub (media codecs unavailable here)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluent_plugin_detect_exceptions_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    frame_sample_plan,
    resize_metadata,
)


def media_df(spark):
    rows = [
        (0, "image", "image/png", "payload-image-0", 1024, 768, None),
        (1, "image", "image/jpeg", "p1", 400, 200, None),
        (2, "video", "video/mp4", "vid-bytes", 1920, 1080, 3500),
        (3, "audio", "audio/wav", "aud", None, None, 2000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_features_stub(spark):
    df = media_df(spark)
    feats = extract_features(df).collect()
    assert len(feats) == 4
    by_id = {r["media_id"]: r for r in feats}
    assert len(by_id[0]["feature"]) == 64
    assert by_id[0]["n_bytes"] == len("payload-image-0")
    # deterministic: same payload -> same feature
    again = {r["media_id"]: r["feature"] for r in extract_features(df).collect()}
    assert again[0] == by_id[0]["feature"]


def test_frame_sample_plan(spark):
    frames = frame_sample_plan(media_df(spark), every_ms=1000)
    rows = frames.select("media_id", "frame_idx", "frame_ms").collect()
    assert {r["media_id"] for r in rows} == {2}
    assert sorted(r["frame_ms"] for r in rows) == [0, 1000, 2000]


def test_resize_metadata(spark):
    out = {r["media_id"]: r for r in resize_metadata(media_df(spark)).collect()}
    assert out[0]["target_width"] == 512 and out[0]["target_height"] == 384
    assert out[1]["target_width"] == 400  # under the cap: unchanged

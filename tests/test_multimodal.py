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


# ---------------------------------------------------------------------------
# REAL decode: pure-python BMP / WAV codecs through the same Spark plan
# ---------------------------------------------------------------------------

import struct

import numpy as np

from fluent_plugin_detect_exceptions_spark.operators.multimodal import (
    decode_bmp,
    decode_wav_pcm16,
    real_decode,
)


def make_bmp(w, h, rgb_fn):
    """Minimal bottom-up 24bpp BMP."""
    stride = (w * 3 + 3) // 4 * 4
    px = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up storage
        row = bytearray()
        for x in range(w):
            r, g, b = rgb_fn(x, y)
            row += bytes((b, g, r))  # BGR
        row += b"\0" * (stride - len(row))
        px += row
    header = b"BM" + struct.pack("<IHHI", 54 + len(px), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(px), 2835, 2835, 0, 0)
    return bytes(header + info + px)


def make_wav(samples, rate=8000, nch=1):
    data = (np.asarray(samples) * 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, nch, rate, rate * nch * 2, nch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_bmp_roundtrip():
    img = decode_bmp(make_bmp(4, 3, lambda x, y: (x * 50, y * 70, 200)))
    assert img.shape == (3, 4, 3)
    assert abs(img[0, 2, 0] - 100 / 255) < 1e-6  # R = x*50 at x=2, top row y=0
    assert abs(img[2, 0, 1] - 140 / 255) < 1e-6  # G = y*70 at y=2
    assert abs(img[1, 1, 2] - 200 / 255) < 1e-6  # constant B


def test_decode_wav_roundtrip():
    t = np.arange(800) / 8000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    out = decode_wav_pcm16(make_wav(sig))
    assert out.shape == (800, 1)
    assert np.abs(out[:, 0] - sig).max() < 1e-3


def test_real_decode_through_spark_plan(spark):
    # production shape: payload is a real binary column
    bmp = make_bmp(16, 16, lambda x, y: (x * 10, y * 10, 50))
    wav = make_wav(0.25 * np.sin(np.arange(1600) / 4.0))
    rows = [
        (10, "image", "image/bmp", bytearray(bmp), 16, 16, None),
        (11, "audio", "audio/wav", bytearray(wav), None, None, 200),
        (12, "image", "image/png", bytearray(b"not-a-real-png"), 8, 8, None),
    ]
    schema = ("media_id long, kind string, mime string, payload binary, "
              "width int, height int, duration_ms long")
    df = spark.createDataFrame(rows, schema)

    feats = {r["media_id"]: r for r in
             extract_features(df, decode_fn=real_decode).collect()}
    assert len(feats[10]["feature"]) == 64 and len(feats[11]["feature"]) == 64
    # image feature = mean-pooled grayscale of the real pixels
    img = decode_bmp(bmp)
    want = img.mean(axis=-1).reshape(8, 2, 8, 2).mean(axis=(1, 3)).ravel()
    got = np.asarray(feats[10]["feature"])
    assert np.abs(got - want).max() < 1e-5
    # audio feature = RMS envelope, constant-ish amplitude -> all bins ~0.177
    aud = np.asarray(feats[11]["feature"])
    assert aud.shape == (64,) and np.all(aud > 0.1) and np.all(aud < 0.25)
    # unknown codec falls back to the deterministic stub (still 64 floats)
    assert len(feats[12]["feature"]) == 64

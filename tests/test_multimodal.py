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


def _encode_png(img, ctype, row_filters, palette=None):
    """Minimal test-side PNG encoder: applies the REQUESTED filter per row
    (so the decoder's unfilter paths are each exercised), zlib-compresses,
    wraps chunks with CRCs."""
    import struct
    import zlib

    import numpy as np

    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    flat = img.reshape(h, w * ch).astype(np.int64)
    raw = bytearray()
    prev = np.zeros(w * ch, np.int64)
    for y in range(h):
        cur = flat[y]
        ft = row_filters[y % len(row_filters)]
        if ft == 0:
            out = cur
        elif ft == 1:
            left = np.concatenate((np.zeros(ch, np.int64), cur[:-ch]))
            out = (cur - left) & 0xFF
        elif ft == 2:
            out = (cur - prev) & 0xFF
        elif ft == 3:
            left = np.concatenate((np.zeros(ch, np.int64), cur[:-ch]))
            out = (cur - ((left + prev) >> 1)) & 0xFF
        else:  # paeth
            out = np.empty(w * ch, np.int64)
            for i in range(w * ch):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[i] = (cur[i] - pr) & 0xFF
        raw.append(ft)
        raw.extend(out.astype(np.uint8).tobytes())
        prev = cur

    def chunk(typ, body):
        return (
            struct.pack(">I", len(body)) + typ + body
            + struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += chunk(b"IDAT", zlib.compress(bytes(raw)))
    return out + chunk(b"IEND", b"")


def test_png_decode_all_filters_and_color_types():
    """decode_png inverts every scanline filter and maps every supported
    color type to RGB, bit-exactly."""
    import numpy as np

    from fluent_plugin_detect_exceptions_spark.operators.multimodal import (
        decode_png,
    )

    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, (13, 9, 3), np.uint8)
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        got = decode_png(_encode_png(rgb, 2, filters))
        assert np.array_equal((got * 255).round().astype(np.uint8), rgb), filters
    gray = rng.randint(0, 256, (6, 5), np.uint8)
    got = decode_png(_encode_png(gray.reshape(6, 5, 1), 0, [0, 1, 2, 3, 4]))
    assert np.array_equal(
        (got * 255).round().astype(np.uint8), np.repeat(gray[..., None], 3, -1)
    )
    rgba = rng.randint(0, 256, (5, 4, 4), np.uint8)
    got = decode_png(_encode_png(rgba, 6, [4, 3, 2, 1, 0]))
    assert np.array_equal((got * 255).round().astype(np.uint8), rgba[..., :3])
    pal = rng.randint(0, 256, (16, 3), np.uint8)
    idx = rng.randint(0, 16, (7, 6), np.uint8)
    got = decode_png(_encode_png(idx.reshape(7, 6, 1), 3, [0, 1, 2], palette=pal))
    assert np.array_equal((got * 255).round().astype(np.uint8), pal[idx])


def test_png_through_spark_plan(spark):
    """Real PNG bytes through the exact extract_features plan shape."""
    import numpy as np

    from fluent_plugin_detect_exceptions_spark.operators.multimodal import (
        extract_features,
        real_decode,
    )

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (16, 16, 3), np.uint8)
    png = _encode_png(img, 2, [0, 1, 2, 3, 4])
    rows = [(1, "image", png.decode("latin-1"))]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload string")
    # string payloads round-trip via latin-1 inside extract_features, so
    # real_decode sees the exact PNG bytes
    out = extract_features(df, decode_fn=real_decode).collect()
    assert len(out) == 1 and len(out[0]["feature"]) == 64
    want = (img.astype(np.float32) / 255.0).mean(axis=-1)
    got8 = np.asarray(out[0]["feature"], np.float32).reshape(8, 8)
    # pooled feature of a 16x16 image = 2x2 block means
    ref = want.reshape(8, 2, 8, 2).mean(axis=(1, 3))
    assert np.allclose(got8, ref, atol=1e-6)


def test_probe_mp4_metadata():
    """probe_mp4 reads brand/duration/tracks from a hand-built ISO-BMFF
    tree (ftyp + moov{mvhd, trak, trak})."""
    import struct

    from fluent_plugin_detect_exceptions_spark.operators.multimodal import (
        probe_mp4,
    )

    def box(typ, body):
        return struct.pack(">I", 8 + len(body)) + typ + body

    mvhd = bytes([0, 0, 0, 0]) + b"\0" * 8 + struct.pack(">II", 1000, 7500) + b"\0" * 80
    moov = box(b"mvhd", mvhd) + box(b"trak", b"") + box(b"trak", b"")
    payload = box(b"ftyp", b"isom" + b"\0" * 12) + box(b"moov", moov)
    info = probe_mp4(payload)
    assert info["brand"] == "isom"
    assert info["timescale"] == 1000 and info["duration_ms"] == 7500
    assert info["n_tracks"] == 2
    import pytest as _pt

    with _pt.raises(ValueError, match="ftyp"):
        probe_mp4(b"\x00\x00\x00\x08free")


def test_probe_media_through_spark(spark):
    """probe_media extracts real container metadata inside the plan (before
    any shuffle) and joins into frame_sample_plan for real durations."""
    import struct

    from fluent_plugin_detect_exceptions_spark.operators.multimodal import (
        frame_sample_plan,
        probe_media,
    )
    from pyspark.sql import functions as F

    def box(typ, body):
        return struct.pack(">I", 8 + len(body)) + typ + body

    mvhd = bytes([0, 0, 0, 0]) + b"\0" * 8 + struct.pack(">II", 1000, 3200) + b"\0" * 80
    mp4 = box(b"ftyp", b"mp42" + b"\0" * 12) + box(b"moov", box(b"mvhd", mvhd))
    rows = [
        (1, "video", mp4.decode("latin-1")),
        (2, "image", "not a container"),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload string")
    probed = {r["media_id"]: (r["brand"], r["duration_ms"], r["n_tracks"])
              for r in probe_media(df).collect()}
    assert probed[1] == ("mp42", 3200, 0)
    assert probed[2] == (None, None, None)
    # probed duration drives the frame fan-out: 3200ms / 1000ms -> 3 frames
    vids = df.join(probe_media(df).select("media_id", "duration_ms"), "media_id")
    frames = frame_sample_plan(
        vids.withColumn("width", F.lit(None).cast("int"))
        .withColumn("height", F.lit(None).cast("int"))
    ).collect()
    assert sorted(r["frame_ms"] for r in frames) == [0, 1000, 2000]

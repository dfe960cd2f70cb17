"""Multimodal column operators: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct.  The
Spark-side plumbing — schema, partition sizing, Arrow batch shape, UDF
signatures — is real and tested.  Decoding is a ``decode_fn`` hook with
FOUR real pure-python codecs (uncompressed 24-bit BMP; 8-bit PNG across
all five scanline filters and color types 0/2/3/4/6 via stdlib zlib;
baseline sequential JPEG — huffman entropy decode, numpy IDCT, 4:4:4/
4:2:2/4:2:0 sampling, restart markers; PCM16 WAV — all verified against
synthesized bytes, JPEG via a test-side encoder with the spec's standard
tables) plus REAL MP4 metadata probing (``probe_mp4``: ISO-BMFF box walk
for brand/duration/track count) and REAL video frame decode for MJPEG AVI
(``mjpeg_frames``/``extract_frame_features``: each ``??dc`` chunk is a
standalone JPEG).  Only inter-frame codecs (H.264 etc.) remain stubbed
behind a clearly marked deterministic fake (entropy models not
reimplementable here; ffmpeg absent and unfetchable — no network);
swapping one in is a one-function change and does not alter the plan
shape.

Scale notes: media rows are orders of magnitude wider than text rows, so
every operator here (a) goes through ``mapInPandas`` with small Arrow
batches (``spark.sql.execution.arrow.maxRecordsPerBatch`` should be lowered
for wide payloads), (b) never shuffles raw bytes — features are extracted
first, then only the (id, feature) projection moves.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", StringType(), True),  # binary in real tables
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)


def _stub_decode(payload: bytes, kind: str) -> np.ndarray:
    """STUB: deterministic fake 'decode' — now only the fallback for
    inter-frame video codecs (H.264 etc., which need ffmpeg); BMP/PNG/
    JPEG/WAV/MJPEG decode for real above.  The fake is deterministic in
    the payload bytes so tests are reproducible.
    """
    if payload is None:
        raise NotImplementedError("null payload: nothing to decode")
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return (arr.astype(np.float32) / 255.0).reshape(8, 8)


# ---------------------------------------------------------------------------
# REAL decoders (pure python/numpy — no media libraries needed): uncompressed
# 24-bit BMP and PCM16 WAV.  These run behind the exact same plan/UDF shape
# as the stub, demonstrating the decode hook end-to-end with real bytes.
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24bpp BMP → (H, W, 3) float32 RGB in [0, 1]."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only uncompressed 24bpp BMP supported")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) // 4 * 4
    buf = np.frombuffer(payload, np.uint8, count=stride * h, offset=off)
    img = buf.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[..., ::-1]  # BGR→RGB
    if bottom_up:
        img = img[::-1]
    return img.astype(np.float32) / 255.0


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → (H, W, 3) float32 RGB in [0, 1] — PURE python/numpy + stdlib
    zlib (no PIL).  Supports the common web subset: 8-bit depth,
    non-interlaced, color types 0 (gray), 2 (RGB), 3 (palette), 4
    (gray+alpha), 6 (RGBA); all five scanline filters (None/Sub/Up/
    Average/Paeth).  Sub unfilters via a vectorized per-channel cumsum;
    Average/Paeth keep a per-byte loop on only the rows that use them.
    Alpha is dropped (features pool over RGB)."""
    import struct
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, idat, plte, ihdr = 8, [], None, None
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif typ == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    w, h, depth, ctype, comp, filt, inter = ihdr
    if depth != 8 or inter != 0 or comp != 0 or filt != 0:
        raise ValueError("only 8-bit non-interlaced PNG supported")
    if ctype not in (0, 2, 3, 4, 6):
        raise ValueError(f"unsupported color type {ctype}")
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) < h * (stride + 1):
        raise ValueError("truncated PNG scanline data")
    rec = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int64)
        if ft == 0:
            cur = line
        elif ft == 1:  # Sub: per-channel running sum
            cur = (line.reshape(w, ch).cumsum(axis=0) & 0xFF).ravel()
        elif ft == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ft == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {ft}")
        rec[y] = cur.astype(np.uint8)
        prev = cur
    img = rec.reshape(h, w, ch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        rgb = plte[img[..., 0]]
    elif ctype in (0, 4):
        rgb = np.repeat(img[..., :1], 3, axis=-1)
    else:
        rgb = img[..., :3]
    return rgb.astype(np.float32) / 255.0


#: zigzag scan order: ZIGZAG[i] = block index (row*8+col) of the i-th
#: coefficient in transmission order (JPEG spec figure A.6)
_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _dct_matrix():
    import numpy as np

    a = np.zeros((8, 8))
    for k in range(8):
        for n in range(8):
            a[k, n] = np.cos(np.pi * (2 * n + 1) * k / 16.0)
    a *= 0.5
    a[0, :] *= 1.0 / np.sqrt(2.0)
    return a


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    stuffing removed on the fly; RSTn markers byte-align and signal a
    restart (DC predictors reset by the caller)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.bits = 0
        self.acc = 0

    def read_bit(self) -> int:
        if self.bits == 0:
            if self.pos >= len(self.buf):
                raise ValueError("truncated JPEG entropy stream")
            b = self.buf[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.buf):
                    raise ValueError("truncated JPEG entropy stream")
                nxt = self.buf[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed
                else:
                    raise _MarkerHit(nxt)
            self.acc = b
            self.bits = 8
        self.bits -= 1
        return (self.acc >> self.bits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.bits = 0


class _MarkerHit(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: map the ``size``-bit amplitude to its signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _build_huffman(bits: list[int], vals: list[int]) -> dict:
    """Canonical (length, code) → symbol map from the DHT BITS/HUFFVAL
    lists."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | r.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in JPEG stream")


def decode_jpeg(payload: bytes) -> "np.ndarray":
    """Baseline sequential JPEG (SOF0) → (H, W, 3) float32 RGB in [0, 1] —
    PURE python/numpy, no libjpeg/PIL.  Supports 8-bit grayscale and YCbCr
    with sampling factors up to 2 (4:4:4, 4:2:2, 4:2:0), restart markers,
    and 0xFF00 stuffing.  Progressive (SOF2) and arithmetic coding are
    rejected with a clear error.  The entropy loop is per-symbol Python —
    correctness-first (the Spark plan batches decodes per executor); the
    IDCT is one numpy matrix sandwich per block."""
    import struct

    import numpy as np

    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None  # list of (cid, h, v, tq)
    w = h = 0
    restart_interval = 0
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("bad marker alignment in JPEG stream")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                if pq:  # 16-bit table
                    vals = struct.unpack_from(f">{64}H", body, p)
                    p += 128
                else:
                    vals = body[p : p + 64]
                    p += 64
                t = np.zeros(64, np.float64)
                for i, v in enumerate(vals):
                    t[_ZIGZAG[i]] = v
                qt[tq] = t.reshape(8, 8)
        elif marker == 0xC0:  # SOF0 baseline
            h, w = struct.unpack_from(">HH", body, 1)
            n_comp = body[5]
            comps = []
            for i in range(n_comp):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 0xF, tq))
        elif marker in (0xC2, 0xC1, 0xC3):
            raise ValueError("only baseline sequential JPEG (SOF0) supported")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(body):
                tc, th = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                huff[(tc, th)] = _build_huffman(bits, vals)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan = {}
            for i in range(ns):
                cid, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan[cid] = (tt >> 4, tt & 0xF)
            data_pos = pos + 2 + seg_len
            return _decode_scan(
                payload, data_pos, w, h, comps, qt, huff, scan,
                restart_interval,
            )
        pos += 2 + seg_len
    raise ValueError("no SOS scan found in JPEG stream")


def _decode_scan(payload, data_pos, w, h, comps, qt, huff, scan,
                 restart_interval):
    import numpy as np

    A = _dct_matrix()
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {}
    for cid, ch, cv, _tq in comps:
        planes[cid] = np.zeros((mcuy * cv * 8, mcux * ch * 8), np.float64)
    r = _BitReader(payload, data_pos)
    pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                r.align()
                if not (
                    r.buf[r.pos] == 0xFF and 0xD0 <= r.buf[r.pos + 1] <= 0xD7
                ):
                    raise ValueError("expected RST marker")
                r.pos += 2
                pred = {cid: 0 for cid in pred}
            for cid, ch, cv, tq in comps:
                dc_tab = huff[(0, scan[cid][0])]
                ac_tab = huff[(1, scan[cid][1])]
                for by in range(cv):
                    for bx in range(ch):
                        blk = np.zeros(64, np.float64)
                        t = _huff_decode(r, dc_tab)
                        diff = _extend(r.receive(t), t) if t else 0
                        pred[cid] += diff
                        blk[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(r, ac_tab)
                            rrr, ssss = rs >> 4, rs & 0xF
                            if ssss == 0:
                                if rrr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rrr
                            if k > 63:
                                raise ValueError("AC run past block end")
                            blk[_ZIGZAG[k]] = _extend(r.receive(ssss), ssss)
                            k += 1
                        coeffs = blk.reshape(8, 8) * qt[tq]
                        pix = A.T @ coeffs @ A + 128.0
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    # upsample to full resolution and crop
    full = []
    for cid, ch, cv, _tq in comps:
        p = planes[cid]
        p = np.repeat(np.repeat(p, vmax // cv, axis=0), hmax // ch, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        rgb = np.repeat(full[0][..., None], 3, axis=-1)
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        rgb = np.stack(
            [
                y + 1.402 * cr,
                y - 0.344136 * cb - 0.714136 * cr,
                y + 1.772 * cb,
            ],
            axis=-1,
        )
    return (np.clip(rgb, 0, 255) / 255.0).astype(np.float32)


def mjpeg_frames(payload: bytes) -> list[bytes]:
    """Video frames from an MJPEG AVI container — pure python: walk the
    RIFF chunk tree to the ``movi`` list and return every compressed video
    chunk (``??dc``), each of which is a standalone JPEG for MJPEG streams.
    With ``decode_jpeg`` this makes video FRAME pixel decode real for the
    one codec family that needs no entropy-model reimplementation; other
    codecs (H.264 etc.) still require a library."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    frames: list[bytes] = []

    def walk(buf, start, end):
        pos = start
        while pos + 8 <= end:
            cid = buf[pos : pos + 4]
            sz = struct.unpack_from("<I", buf, pos + 4)[0]
            body_start, body_end = pos + 8, min(pos + 8 + sz, end)
            if cid == b"LIST":
                walk(buf, body_start + 4, body_end)  # skip list type tag
            elif cid[2:4] == b"dc":
                frames.append(bytes(buf[body_start:body_end]))
            pos += 8 + sz + (sz & 1)

    walk(payload, 12, len(payload))
    return frames


def extract_frame_features(
    df: DataFrame,
    every: int = 1,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Per-FRAME features from MJPEG videos: one output row per sampled
    frame (media_id, frame_idx, n_bytes, feature) — the row fan-out
    happens INSIDE the Python stage (each container's bytes are read once,
    frames decoded in place), so raw video bytes never duplicate or
    shuffle; downstream sees only narrow feature rows.  Non-AVI payloads
    are skipped (no rows)."""
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("n_bytes", LongType(), False),
            StructField("feature", ArrayType(FloatType()), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import logging

        for pdf in batches:
            ids, idxs, nbytes, feats = [], [], [], []
            skipped = 0
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = (
                    payload.encode("latin-1", "replace")
                    if isinstance(payload, str)
                    else (payload or b"")
                )
                try:
                    frames = mjpeg_frames(raw)
                except ValueError:
                    skipped += 1
                    continue
                for i, fr in enumerate(frames):
                    if i % every:
                        continue
                    # a corrupt/truncated embedded frame skips THAT frame,
                    # not the whole Spark task (ADVICE r4): decode_jpeg
                    # raises ValueError on any malformed stream (including
                    # _BitReader truncation, which now raises ValueError
                    # rather than IndexError)
                    try:
                        feat = pooled_feature(decode_jpeg(fr)).ravel().tolist()
                    except (ValueError, IndexError):
                        skipped += 1
                        continue
                    ids.append(mid)
                    idxs.append(i)
                    nbytes.append(len(fr))
                    feats.append(feat)
            if skipped:
                # no-silent-drops convention (ADVICE r5): corrupt payloads /
                # frames are visible in the executor log with a count, so a
                # mostly-corrupt corpus is distinguishable from a healthy one
                logging.getLogger(__name__).warning(
                    "extract_frame_features: skipped %d corrupt payload(s)/"
                    "frame(s) in a %d-row batch", skipped, len(pdf)
                )
            yield pd.DataFrame(
                {
                    "media_id": np.asarray(ids, dtype=np.int64),
                    "frame_idx": np.asarray(idxs, dtype=np.int32),
                    "n_bytes": np.asarray(nbytes, dtype=np.int64),
                    # object dtype even when empty: an empty plain list
                    # defaults the column to float64, which Arrow cannot
                    # convert to list<float>
                    "feature": pd.Series(feats, dtype=object),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=schema)


def probe_mp4(payload: bytes) -> dict:
    """MP4/ISO-BMFF metadata WITHOUT ffmpeg: walk the box tree and read
    ftyp brand, mvhd duration/timescale, and the track count.  Pixel decode
    still needs a codec library (the one genuinely environment-blocked
    piece); this gives ``frame_sample_plan`` a REAL duration instead of a
    trusted metadata column."""
    import struct

    def walk(buf, start, end, depth=0):
        out = []
        pos = start
        while pos + 8 <= end:
            sz, typ = struct.unpack_from(">I4s", buf, pos)
            hdr = 8
            if sz == 1:  # 64-bit largesize
                if pos + 16 > end:
                    break
                sz = struct.unpack_from(">Q", buf, pos + 8)[0]
                hdr = 16
            elif sz == 0:  # to end of enclosing box
                sz = end - pos
            if sz < hdr or pos + sz > end:
                break
            out.append((typ, pos + hdr, pos + sz))
            pos += sz
        return out

    top = walk(payload, 0, len(payload))
    if not any(t == b"ftyp" for t, _, _ in top):
        raise ValueError("not an ISO-BMFF payload (no ftyp box)")
    info: dict = {"n_tracks": 0}
    for typ, s, e in top:
        if typ == b"ftyp":
            info["brand"] = payload[s : s + 4].decode("ascii", "replace")
        elif typ == b"moov":
            for t2, s2, e2 in walk(payload, s, e, 1):
                if t2 == b"mvhd":
                    ver = payload[s2]
                    if ver == 1:
                        ts, dur = (
                            int.from_bytes(payload[s2 + 20 : s2 + 24], "big"),
                            int.from_bytes(payload[s2 + 24 : s2 + 32], "big"),
                        )
                    else:
                        ts, dur = (
                            int.from_bytes(payload[s2 + 12 : s2 + 16], "big"),
                            int.from_bytes(payload[s2 + 16 : s2 + 20], "big"),
                        )
                    info["timescale"] = ts
                    info["duration_ms"] = int(dur * 1000 / ts) if ts else None
                elif t2 == b"trak":
                    info["n_tracks"] += 1
    return info


def decode_wav_pcm16(payload: bytes) -> np.ndarray:
    """PCM16 WAV → (n_samples, n_channels) float32 in [-1, 1]."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        sz = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, nch = struct.unpack_from("<HH", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_fmt != 1 or bits != 16:
        raise ValueError("only PCM16 WAV supported")
    samples = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
    return samples.reshape(-1, nch)


def pooled_feature(arr: np.ndarray, bins: int = 64) -> np.ndarray:
    """Fixed-width feature from a decoded array: 8x8 mean-pooled grayscale
    for images (ndim 3), ``bins``-segment RMS envelope for audio (ndim 2)."""
    if arr.ndim == 3:
        gray = arr.mean(axis=-1)
        rows = np.array_split(gray, 8, axis=0)
        out = np.empty((8, 8), dtype=np.float32)
        for i, r in enumerate(rows):
            for j, block in enumerate(np.array_split(r, 8, axis=1)):
                out[i, j] = block.mean() if block.size else 0.0
        return out.ravel()
    mono = arr.mean(axis=-1)
    segs = np.array_split(mono, bins)
    return np.asarray(
        [np.sqrt((s * s).mean()) if s.size else 0.0 for s in segs], dtype=np.float32
    )


def real_decode(payload: bytes, kind: str) -> np.ndarray:
    """Magic-byte dispatch to a real pure-python decoder; only video FRAME
    pixel decode (codec libraries) falls through to the deterministic
    stub."""
    if payload is None:
        raise NotImplementedError("null payload: nothing to decode")
    if payload[:2] == b"BM":
        return pooled_feature(decode_bmp(payload))
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return pooled_feature(decode_png(payload))
    if payload[:2] == b"\xff\xd8":
        return pooled_feature(decode_jpeg(payload))
    if payload[:4] == b"RIFF":
        if payload[8:12] == b"AVI ":
            frames = mjpeg_frames(payload)
            if not frames:
                raise ValueError("AVI payload with no video frames")
            return pooled_feature(decode_jpeg(frames[0]))
        return pooled_feature(decode_wav_pcm16(payload))
    return _stub_decode(payload, kind)


def extract_features(
    df: DataFrame,
    decode_fn: Callable[[bytes, str], np.ndarray] | None = None,
    payload_col: str = "payload",
    id_col: str = "media_id",
    kind_col: str = "kind",
) -> DataFrame:
    """binary payloads → fixed-width feature vectors via mapInPandas.

    The projection drops the payload immediately after decode, so downstream
    shuffles move only (id, 64-float feature).
    """
    decode = decode_fn or _stub_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for payload, kind in zip(pdf[payload_col], pdf[kind_col]):
                # latin-1 is the bytes<->str bijection: string-typed payload
                # columns (test tables) round-trip the exact bytes, keeping
                # magic-byte dispatch intact — utf-8 would mangle \x80-\xff
                # (code-review r4); production tables use BinaryType and
                # skip this branch entirely
                raw = (
                    payload.encode("latin-1", "replace")
                    if isinstance(payload, str)
                    else (payload or b"")
                )
                nbytes.append(len(raw))
                feats.append(decode(raw, kind).ravel().tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "kind": pdf[kind_col],
                    "n_bytes": np.asarray(nbytes, dtype=np.int64),
                    "feature": feats,
                }
            )

    return df.select(id_col, kind_col, payload_col).mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


PROBE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("brand", StringType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("n_tracks", IntegerType(), True),
    ]
)


def probe_media(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Container-level metadata extracted from the BYTES (probe_mp4), not
    trusted from metadata columns — (media_id, brand, duration_ms,
    n_tracks); non-ISO-BMFF payloads yield nulls.  Runs before any shuffle
    so raw bytes never move; feed the probed duration into
    ``frame_sample_plan`` via a join on media_id to fan frame decode out
    over REAL durations."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": pdf[id_col], "brand": [], "duration_ms": [],
                   "n_tracks": []}
            for payload in pdf[payload_col]:
                raw = (
                    payload.encode("latin-1", "replace")
                    if isinstance(payload, str)
                    else (payload or b"")
                )
                try:
                    info = probe_mp4(raw)
                except ValueError:
                    info = {}
                out["brand"].append(info.get("brand"))
                out["duration_ms"].append(info.get("duration_ms"))
                out["n_tracks"].append(info.get("n_tracks"))
            yield pd.DataFrame(out)

    return df.select(id_col, payload_col).mapInPandas(run, schema=PROBE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame offset.

    JVM-side sequence/explode so the (heavy) per-frame decode fans out across
    executors; the decode itself is the stubbed ``extract_features`` stage.
    """
    n_frames = F.greatest(
        (F.coalesce(F.col("duration_ms"), F.lit(0)) / every_ms).cast("int"), F.lit(1)
    )
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .withColumn("frame_ms", F.col("frame_idx") * every_ms)
    )


def resize_metadata(df: DataFrame, max_side: int = 512) -> DataFrame:
    """Pure-plan resize bookkeeping: target dimensions preserving aspect
    ratio, computed JVM-side (the pixel work would live in the decode UDF)."""
    w, h = F.col("width"), F.col("height")
    scale = F.when(
        F.greatest(w, h) > max_side, F.greatest(w, h) / F.lit(float(max_side))
    ).otherwise(F.lit(1.0))
    return df.withColumn("target_width", (w / scale).cast("int")).withColumn(
        "target_height", (h / scale).cast("int")
    )

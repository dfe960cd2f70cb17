"""Multimodal column operators: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct.  The
Spark-side plumbing — schema, partition sizing, Arrow batch shape, UDF
signatures — is real and tested; the actual codec work is stubbed behind
``decode_fn`` hooks because media libraries are not available in this
environment (clearly marked below).  Swapping in a real decoder is a
one-function change and does not alter the plan shape.

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
    """STUB: deterministic fake 'decode' (media codecs unavailable here).

    Real deployment replaces this with PIL/torchaudio/ffmpeg decode.  The
    fake is deterministic in the payload bytes so tests are reproducible.
    """
    if payload is None:
        raise NotImplementedError("null payload: nothing to decode")
    arr = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8)
    return (arr.astype(np.float32) / 255.0).reshape(8, 8)


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
            for payload in pdf[payload_col]:
                raw = payload.encode() if isinstance(payload, str) else (payload or b"")
                nbytes.append(len(raw))
                feats.append(decode(raw, "image").ravel().tolist())
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

"""Structured Streaming variant: micro-batched execution through
applyInPandasWithState must equal the batch pipeline on the same rows."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from fluent_plugin_detect_exceptions_spark.config import PipelineConfig
from fluent_plugin_detect_exceptions_spark.plans.pipeline import detect_exceptions
from fluent_plugin_detect_exceptions_spark.sources.transcripts import synth_transcripts
from fluent_plugin_detect_exceptions_spark.streaming.stream_pipeline import (
    detect_exceptions_stream,
)


def run_stream(spark, src_dir, ckpt, cfg, schema):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(src_dir)
    )
    out = detect_exceptions_stream(stream, cfg)
    q = (
        out.writeStream.format("memory")
        .queryName("routed_stream")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql("select * from routed_stream")


def test_streaming_equals_batch(spark, tmp_path):
    df = synth_transcripts(spark, 8, repeats=2)
    src = str(tmp_path / "src")
    # write one file per conversation-ish slice so state must persist across
    # micro-batches (maxFilesPerTrigger=1)
    for i in range(4):
        df.filter(F.crc32(F.col("conv_id").cast("binary")) % 4 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/part={i}")
    full = spark.read.parquet(f"{src}/part=*")
    assert full.count() == df.count()

    cfg = PipelineConfig()
    got_df = run_stream(spark, f"{src}/part=*", str(tmp_path / "ckpt"), cfg, df.schema)
    got = sorted(
        (r["conv_id"], r["first_turn_idx"], r["text"], r["lang"], r["n_lines"], r["sink"])
        for r in got_df.collect()
    )
    batch = detect_exceptions(full, cfg)
    want = sorted(
        (r["conv_id"], r["first_turn_idx"], r["text"], r["lang"], r["n_lines"], r["sink"])
        for r in batch.select(
            "conv_id", "first_turn_idx", "text", "lang", "n_lines", "sink"
        ).collect()
    )
    # the stream never sees end-of-input, so segments still open at the end
    # remain in state; everything else must match exactly
    open_tail = [w for w in want if w not in got]
    assert all(g in want for g in got)
    missing_convs = {w[0] for w in open_tail}
    assert len(open_tail) <= len(missing_convs) * 1  # at most the final open segment per conv
    assert len(got) + len(open_tail) == len(want)


def test_streaming_within_single_batch_exact(spark, tmp_path):
    # single micro-batch: output must be exactly the closed segments of batch
    df = synth_transcripts(spark, 4, repeats=1)
    src = str(tmp_path / "one")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    cfg = PipelineConfig()
    got_df = run_stream(spark, src, str(tmp_path / "ckpt1"), cfg, df.schema)
    got = {(r["conv_id"], r["first_turn_idx"]): (r["text"], r["n_lines"]) for r in got_df.collect()}
    batch = detect_exceptions(spark.read.parquet(src), cfg)
    want = {
        (r["conv_id"], r["first_turn_idx"]): (r["text"], r["n_lines"])
        for r in batch.collect()
    }
    for k, v in got.items():
        assert want[k] == v

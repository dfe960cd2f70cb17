"""Distributed segmentation operator (SURVEY.md O3/O6/O8/O10/O11/O13/O18).

Turns the transcripts DataFrame into per-row segmentation metadata with a
bounded-shuffle plan:

1. **Salted chunking for skew** (north rule): conversations are split into
   ``chunk_size``-turn chunks via ``chunk_id = turn_idx // C`` so a single
   huge conversation spreads across executors.  Rows in each chunk-boundary
   zone (the last ``warmup`` turns before a boundary) are duplicated into the
   next chunk as warm-up via a JVM-side ``explode`` (single scan, no Python).
2. **Synchronization**: a chunk's scan is exact despite the unknown FSM entry
   state because the warm-up contains a *universally absorbing* line — one
   that drives every state to start_state and empties the buffer regardless
   of history (see ``fsm.last_absorbing``).  A cheap pre-pass over only the
   boundary zones finds conversations with a non-absorbing warm-up (rare:
   wall-to-wall stack traces); those are processed whole (chunk 0).
3. **applyInPandas per (conv_id[, stream], chunk_id)**: sorts the group by
   turn, classifies with the vectorized pattern bank, runs the windowed
   FSM-composition scan, and emits per body row: ``seg_flag`` (start-of-block
   flag), ``seg_start_turn`` (running-maximum of flagged turns — the
   running-sum segment id in a chunk-stitchable form), ``emit`` and
   ``lang_id``.

Segment identity is ``(conv_id, seg_start_turn)``: segments spanning chunk
boundaries stitch automatically in the downstream groupBy, with no
per-conversation window (which would re-serialize skewed conversations).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    LongType,
    StructField,
    StructType,
)

from ..config import PipelineConfig
from ..functions.classify import classify
from ..rules import FAMILIES, STATE_FAMILY, STATES, CompiledRules, compile_rules
from . import fsm

FAMILY_ID = {fam: i for i, fam in enumerate(FAMILIES)}
#: per-state family id; -1 for start_state / no family
STATE_FAMILY_ID = np.array(
    [FAMILY_ID.get(STATE_FAMILY.get(s), -1) for s in STATES], dtype=np.int8
)

META_FIELDS = [
    StructField("seg_start_turn", LongType(), False),
    StructField("seg_flag", BooleanType(), False),
    StructField("emit", BooleanType(), False),
    StructField("lang_id", ByteType(), False),
    StructField("sync_ok", BooleanType(), False),
]


def _scan_pdf(pdf: pd.DataFrame, cfg: PipelineConfig, rules: CompiledRules,
              msg_field: str | None) -> pd.DataFrame:
    """Segment one sorted (conv[, stream], chunk) group; returns body rows +
    metadata columns."""
    pdf = pdf.sort_values(cfg.order_col, kind="mergesort").reset_index(drop=True)
    warm = pdf["__warmup"].to_numpy(dtype=bool) if "__warmup" in pdf else np.zeros(len(pdf), bool)

    texts = pdf[msg_field] if msg_field is not None else pd.Series([None] * len(pdf), dtype=object)
    cls, g_tab, b_tab, absorbing = classify(texts, rules)

    sync_ok = True
    start = 0
    if warm.any():
        nwarm = int(warm.sum())  # warm-up rows sort first (lower turn_idx)
        j = fsm.last_absorbing(cls[:nwarm], absorbing)
        if j < 0:
            sync_ok = False  # defensive; the pre-pass routes these to chunk 0
            start = nwarm
        else:
            start = j + 1

    n = len(pdf)
    sl = slice(start, n)
    tvals = texts.iloc[sl]
    rawlen = tvals.str.len().fillna(0).to_numpy(dtype=np.int64)
    has_nl = tvals.str.contains("\n", regex=False).fillna(False).to_numpy(dtype=bool)
    gap = np.zeros(n - start, dtype=bool)
    if cfg.multiline_flush_interval is not None and n - start > 1:
        tsv = pdf[cfg.ts_col].iloc[sl].to_numpy(dtype="datetime64[us]").astype(np.int64)
        gap[1:] = (tsv[1:] - tsv[:-1]) > cfg.multiline_flush_interval * 1_000_000

    res = fsm.scan(
        cls[sl], g_tab, b_tab, rawlen, has_nl, gap,
        force_line_breaks=cfg.force_line_breaks,
        max_lines=cfg.max_lines,
        max_bytes=cfg.max_bytes,
    )

    turns = pdf[cfg.order_col].iloc[sl].to_numpy(dtype=np.int64)
    seg_start_turn = np.maximum.accumulate(np.where(res.seg_start, turns, np.int64(-1)))
    lang_id = STATE_FAMILY_ID[res.state_after]

    out = pdf.iloc[sl].copy()
    out["seg_start_turn"] = seg_start_turn
    out["seg_flag"] = res.seg_start
    out["emit"] = res.emit
    out["lang_id"] = lang_id
    out["sync_ok"] = sync_ok
    body = ~warm[sl]
    out = out[body]
    return out.drop(columns=[c for c in ("__warmup",) if c in out.columns])


def _with_chunks(df: DataFrame, cfg: PipelineConfig, fallback_convs) -> DataFrame:
    """Add chunk_id / __warmup via a single-pass JVM-side explode (no extra
    scan, stays inside whole-stage codegen)."""
    c, o = cfg.chunk_size, cfg.warmup
    turn = F.col(cfg.order_col)
    in_zone = (turn % c) >= (c - o)
    if fallback_convs:
        is_fb = F.col(cfg.conv_col).isin(list(fallback_convs))
        in_zone = in_zone & ~is_fb
    dup = F.when(in_zone, F.array(F.lit(0), F.lit(1))).otherwise(F.array(F.lit(0)))
    df = df.withColumn("__d", F.explode(dup))
    chunk = F.expr(f"{cfg.order_col} div {c}") + F.col("__d")
    if fallback_convs:
        chunk = F.when(F.col(cfg.conv_col).isin(list(fallback_convs)), F.lit(0)).otherwise(chunk)
    return (
        df.withColumn("chunk_id", chunk)
        .withColumn("__warmup", F.col("__d") == 1)
        .drop("__d")
    )


def find_fallback_convs(df: DataFrame, cfg: PipelineConfig, rules: CompiledRules,
                        msg_field: str | None) -> list:
    """Pre-pass over chunk-boundary zones only: conversations whose warm-up
    zone for some chunk contains no universally absorbing line cannot be
    chunk-scanned exactly and are processed whole.  Cheap: touches only
    ``warmup/chunk_size`` of the rows, column-pruned to (conv, turn, text)."""
    if msg_field is None:
        return []
    c, o = cfg.chunk_size, cfg.warmup
    zone = df.filter((F.col(cfg.order_col) % c) >= (c - o)).select(
        F.col(cfg.conv_col).alias("conv"),
        F.expr(f"{cfg.order_col} div {c}").cast("long").alias("zchunk"),
        F.col(msg_field).alias("msg"),
    )

    out_schema = StructType([
        StructField("conv", zone.schema["conv"].dataType, False),
        StructField("zchunk", LongType(), False),
        StructField("ab", BooleanType(), False),
    ])

    def check(batches):
        for pdf in batches:
            clsb, g_tab, _, absorbing = classify(pdf["msg"], rules)
            ab = np.where(clsb < 0, True, absorbing[np.clip(clsb, 0, None)])
            yield pd.DataFrame({"conv": pdf["conv"], "zchunk": pdf["zchunk"], "ab": ab})

    bad = (
        zone.mapInPandas(check, schema=out_schema)
        .groupBy("conv", "zchunk")
        .agg(F.max("ab").alias("any_ab"))
        .filter(~F.col("any_ab"))
        .select("conv")
        .distinct()
        .limit(cfg.max_fallback_convs + 1)
        .collect()
    )
    return [r["conv"] for r in bad]


def segment(df: DataFrame, cfg: PipelineConfig, rules: CompiledRules | None = None) -> DataFrame:
    """Full segmentation: returns the input rows (body only) plus metadata
    columns (seg_start_turn, seg_flag, emit, lang_id, sync_ok)."""
    rules = rules or compile_rules(cfg.languages)
    msg_field = cfg.resolve_message_field(df.columns)
    if cfg.multiline_flush_interval is not None and cfg.ts_col not in df.columns:
        raise ValueError(
            f"multiline_flush_interval requires the event-time column "
            f"{cfg.ts_col!r}, which is missing from the input schema {df.columns}"
        )
    if cfg.order_col not in df.columns or cfg.conv_col not in df.columns:
        raise ValueError(
            f"input schema {df.columns} lacks {cfg.conv_col!r}/{cfg.order_col!r}"
        )

    group_keys = cfg.group_keys()
    if cfg.chunking_active:
        fallback = find_fallback_convs(df, cfg, rules, msg_field)
        if len(fallback) > cfg.max_fallback_convs:
            # adversarial input: too many unsynchronizable conversations —
            # process everything whole rather than blow up the driver list
            df = df.withColumn("chunk_id", F.lit(0)).withColumn("__warmup", F.lit(False))
        else:
            df = _with_chunks(df, cfg, fallback)
        group_keys = group_keys + ["chunk_id"]
    else:
        df = df.withColumn("chunk_id", F.lit(0)).withColumn("__warmup", F.lit(False))

    out_schema = StructType(
        [f for f in df.schema.fields if f.name != "__warmup"] + META_FIELDS
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return _scan_pdf(pdf, cfg, rules, msg_field)

    return df.groupBy(*group_keys).applyInPandas(run, schema=out_schema)

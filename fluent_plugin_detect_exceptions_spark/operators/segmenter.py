"""Distributed segmentation operator (SURVEY.md O3/O6/O8/O10/O11/O13/O18).

Turns the transcripts DataFrame into per-row segmentation metadata with a
bounded-shuffle, skew-proof plan:

1. **Salted chunking** (north rule): ``chunk_id = turn_idx div C`` spreads a
   huge conversation across executors.  Rows in each chunk-boundary zone (the
   last ``warmup`` turns before a boundary) are duplicated into the next
   chunk as warm-up via a JVM-side ``explode`` — single scan, whole-stage
   codegen, no Python.
2. **Synchronization**: a chunk scan is exact despite its unknown FSM entry
   state and unknown carried buffer because the warm-up contains a
   *synchronization point* — a row after which subset simulation proves the
   state is start_state and the buffer empty under every possible history
   (``fsm.subset_sync``).  A cheap pre-pass over only the boundary zones
   finds conversations with an unsynchronizable warm-up (wall-to-wall stack
   traces); those are processed whole (chunk 0).
3. **Partition-level scan**: ``repartition(conv, chunk)`` +
   ``sortWithinPartitions(conv, chunk, turn)`` + ``mapInPandas``.  Each
   partition is classified ONCE (pattern bank over pandas-interned distinct
   lines — log data repeats lines heavily) and scanned ONCE: group runs are
   gathered into a single contiguous array with forced resets at group
   starts, so there is no per-group Python overhead and no per-row Python
   anywhere (north rule).

Per-row outputs: ``seg_start_turn`` (the running-maximum-of-flagged-turns
form of the running-sum segment id — stitches segments across chunk
boundaries with no per-conversation window), ``seg_flag``, ``emit``,
``lang_id``, ``sync_ok``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..config import PipelineConfig
from ..functions.classify import classify, classify_encoded
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

_TURN_OFFSET = np.int64(1) << 40  # group separator for the global cummax


def ride_along_cols(df_columns, cfg: PipelineConfig, msg_field: str | None) -> list[str]:
    """Columns that ride along unchanged (first-row semantics at flush)."""
    skip = {cfg.conv_col, cfg.order_col, "chunk_id", "__warmup"}
    if cfg.stream is not None:
        skip.add(cfg.stream)
    if msg_field is not None:
        skip.add(msg_field)
    return [c for c in df_columns if c not in skip]


def partial_schema(df_schema: StructType, cfg: PipelineConfig, msg_field: str | None,
                   emit_text: bool = True) -> StructType:
    """Output schema of the fused scan+coalesce stage: one row per segment
    *partial* (a segment's rows within one chunk).  ``emit_text=False``
    omits the combined-text column for counts-only consumers — a Python
    stage is opaque to Catalyst, so column pruning cannot reach inside it
    and the only way to not ship unused text back over the Arrow boundary
    is to not produce it (r6; guide §4.1)."""
    cols = [f.name for f in df_schema.fields]
    fields = [df_schema[cfg.conv_col]]
    if cfg.stream is not None:
        fields.append(df_schema[cfg.stream])
    fields += [
        StructField("seg_start_turn", LongType(), False),
        StructField("part_min_turn", LongType(), False),
        StructField("n_part", LongType(), False),
    ]
    if emit_text:
        fields.append(StructField("text_part", StringType(), True))
    fields += [
        StructField("lang_id", ByteType(), False),
        StructField("sync_ok", BooleanType(), False),
    ]
    fields += [df_schema[c] for c in ride_along_cols(cols, cfg, msg_field)]
    return StructType(fields)


def _empty_partials(pdf: pd.DataFrame, cfg: PipelineConfig, msg_field: str | None,
                    emit_text: bool = True) -> pd.DataFrame:
    cols = {cfg.conv_col: pdf[cfg.conv_col].iloc[:0]}
    if cfg.stream is not None:
        cols[cfg.stream] = pdf[cfg.stream].iloc[:0]
    for name, typ in (("seg_start_turn", "int64"), ("part_min_turn", "int64"),
                      ("n_part", "int64")):
        cols[name] = pd.Series([], dtype=typ)
    if emit_text:
        cols["text_part"] = pd.Series([], dtype=object)
    cols["lang_id"] = pd.Series([], dtype="int8")
    cols["sync_ok"] = pd.Series([], dtype=bool)
    for c in ride_along_cols(pdf.columns, cfg, msg_field):
        cols[c] = pdf[c].iloc[:0]
    return pd.DataFrame(cols)


def _scan_core(pdf: pd.DataFrame, cfg: PipelineConfig, rules: CompiledRules,
               msg_field: str | None):
    """Classify + scan one sorted partition holding whole (conv[,stream],
    chunk) groups.  Returns (warm, texts, sync_ok, gathered) where gathered
    is None for empty scans or a dict of aligned arrays over the scanned
    row indices."""
    n = len(pdf)
    warm = pdf["__warmup"].to_numpy(dtype=bool) if "__warmup" in pdf else np.zeros(n, bool)
    texts = (
        pdf[msg_field]
        if msg_field is not None
        else pd.Series([None] * n, dtype=object)
    ).reset_index(drop=True)
    cls, g_tab, b_tab, _ = classify(texts, rules)

    # group boundaries: change in (conv[, stream], chunk)
    keys = [pdf[cfg.conv_col].to_numpy()]
    if cfg.stream is not None and cfg.stream in pdf.columns:
        keys.append(pdf[cfg.stream].to_numpy())
    keys.append(pdf["chunk_id"].to_numpy())
    new_group = np.ones(n, dtype=bool)
    if n > 1:
        new_group[1:] = ~np.logical_and.reduce([k[1:] == k[:-1] for k in keys])
    group_starts = np.flatnonzero(new_group)
    group_ends = np.append(group_starts[1:], n)

    # per group: find the scan start (after the warm-up sync point)
    chunk_ids = pdf["chunk_id"].to_numpy() if "chunk_id" in pdf else np.zeros(n, np.int64)
    scan_ranges = []
    sync_ok = np.ones(n, dtype=bool)
    for gs, ge in zip(group_starts, group_ends):
        nwarm = int(warm[gs:ge].sum())  # warm-up rows sort first (lower turn)
        if nwarm == 0:
            # A chunk>0 group with NO warm-up rows means the zone turn range
            # before its boundary was empty — either the conversation starts
            # mid-chunk (forced reset is exact) or a turn_idx hole wider than
            # `warmup` spans the boundary (carried FSM/buffer state would be
            # silently split).  The two are indistinguishable partition-
            # locally, so flag conservatively (ADVICE r1): never report an
            # unverifiable scan as synced.
            if chunk_ids[gs] > 0:
                sync_ok[gs:ge] = False
            scan_ranges.append((gs, ge))
            continue
        j = fsm.subset_sync(cls[gs : gs + nwarm], g_tab)
        if j < 0:
            # defensive: the pre-pass routes unsynchronizable convs to
            # chunk 0; if one slips through, flag it (never emit bad data)
            sync_ok[gs:ge] = False
            scan_ranges.append((gs + nwarm, ge))
        else:
            scan_ranges.append((gs + j + 1, ge))

    # gather scan ranges into one contiguous array; forced reset at each
    # group's first scanned row makes one scan() call exact for all groups
    idx = np.concatenate([np.arange(s, e) for s, e in scan_ranges if e > s]) if scan_ranges else np.empty(0, np.intp)
    m = len(idx)
    if m == 0:
        return warm, texts, sync_ok, None

    first_of_group = np.zeros(m, dtype=bool)
    pos = 0
    gidx = np.zeros(m, dtype=np.int64)
    for _gnum, (s, e) in enumerate(sr for sr in scan_ranges if sr[1] > sr[0]):
        ln = e - s
        first_of_group[pos] = True
        gidx[pos : pos + ln] = _gnum
        pos += ln

    tv = texts.iloc[idx]
    rawlen = tv.str.len().fillna(0).to_numpy(dtype=np.int64)
    has_nl = (tv.str.contains("\n", regex=False) == True).to_numpy(dtype=bool)  # noqa: E712 — null-safe without object-downcast fillna (pandas FutureWarning)
    gap = np.zeros(m, dtype=bool)
    if cfg.multiline_flush_interval is not None and m > 1:
        tsg = pdf[cfg.ts_col].iloc[idx].to_numpy(dtype="datetime64[us]").astype(np.int64)
        gap[1:] = (tsg[1:] - tsg[:-1]) > cfg.multiline_flush_interval * 1_000_000
        gap[first_of_group] = False
    gap |= first_of_group  # hard reset + buffer clear at each group start

    res = fsm.scan(
        cls[idx], g_tab, b_tab, rawlen, has_nl, gap,
        force_line_breaks=cfg.force_line_breaks,
        max_lines=cfg.max_lines,
        max_bytes=cfg.max_bytes,
    )

    turns = pdf[cfg.order_col].to_numpy(dtype=np.int64)[idx]
    adj = turns + gidx * _TURN_OFFSET
    sst = np.maximum.accumulate(np.where(res.seg_start, adj, np.int64(-1)))
    sst -= gidx * _TURN_OFFSET

    gathered = {
        "idx": idx,
        "gidx": gidx,
        "res": res,
        "sst": sst,
        "turns": turns,
        "has_nl": has_nl,
        "lang": STATE_FAMILY_ID[res.state_after],
    }
    return warm, texts, sync_ok, gathered


def _scan_partition(
    pdf: pd.DataFrame, cfg: PipelineConfig, rules: CompiledRules, msg_field: str | None
) -> pd.DataFrame:
    """Per-row output mode: body rows plus metadata columns."""
    n = len(pdf)
    if n == 0:
        out = pdf.copy()
        for name, typ in (("seg_start_turn", "int64"), ("seg_flag", "bool"),
                          ("emit", "bool"), ("lang_id", "int8"), ("sync_ok", "bool")):
            out[name] = pd.Series([], dtype=typ)
        return out.drop(columns=[c for c in ("__warmup",) if c in out.columns])

    warm, _texts, sync_ok, g = _scan_core(pdf, cfg, rules, msg_field)
    seg_start_turn = np.zeros(n, dtype=np.int64)
    seg_flag = np.zeros(n, dtype=bool)
    emit = np.ones(n, dtype=bool)
    lang_id = np.full(n, -1, dtype=np.int8)
    if g is not None:
        idx = g["idx"]
        seg_start_turn[idx] = g["sst"]
        seg_flag[idx] = g["res"].seg_start
        emit[idx] = g["res"].emit
        lang_id[idx] = g["lang"]

    out = pdf.copy()
    out["seg_start_turn"] = seg_start_turn
    out["seg_flag"] = seg_flag
    out["emit"] = emit
    out["lang_id"] = lang_id
    out["sync_ok"] = sync_ok
    out = out[~warm]
    return out.drop(columns=[c for c in ("__warmup",) if c in out.columns])


def _scan_partition_fused(
    pdf: pd.DataFrame, cfg: PipelineConfig, rules: CompiledRules, msg_field: str | None,
    emit_text: bool = True,
) -> pd.DataFrame:
    """Fused scan+coalesce output mode: one row per segment *partial* (the
    segment's emitted body rows within one chunk).  The downstream groupBy
    only stitches the rare chunk-spanning segments, so the second shuffle
    carries per-segment rows instead of per-turn rows."""
    if len(pdf) == 0:
        return _empty_partials(pdf, cfg, msg_field, emit_text)
    warm, texts, sync_ok, g = _scan_core(pdf, cfg, rules, msg_field)
    if g is None:
        return _empty_partials(pdf, cfg, msg_field, emit_text)

    idx, gidx, res, sst = g["idx"], g["gidx"], g["res"], g["sst"]
    keep = res.emit & ~warm[idx]  # emitted body rows only
    k_idx = idx[keep]
    if len(k_idx) == 0:
        return _empty_partials(pdf, cfg, msg_field, emit_text)
    k_gidx = gidx[keep]
    k_sst = sst[keep]
    k_turn = g["turns"][keep]
    k_lang = g["lang"][keep]
    k_has_nl = g["has_nl"][keep]
    k_texts = texts.iloc[k_idx].tolist()

    p = len(k_idx)
    pb = np.ones(p, dtype=bool)
    if p > 1:
        pb[1:] = (k_gidx[1:] != k_gidx[:-1]) | (k_sst[1:] != k_sst[:-1])
    starts = np.flatnonzero(pb)
    ends = np.append(starts[1:], p)

    if cfg.force_line_breaks:
        prepend = (~k_has_nl) & (k_turn != k_sst)
    else:
        prepend = np.zeros(p, dtype=bool)

    parts: list[str | None] = []
    if emit_text:
        for s, e in zip(starts, ends):
            if e - s == 1:
                t = k_texts[s]
                parts.append(
                    ("\n" + t) if (prepend[s] and t is not None) else t
                )
                continue
            buf = []
            for i in range(s, e):
                t = k_texts[i]
                if t is None:
                    continue
                buf.append("\n" + t if prepend[i] else t)
            parts.append("".join(buf))

    firsts = k_idx[starts]
    out = {cfg.conv_col: pdf[cfg.conv_col].to_numpy()[firsts]}
    if cfg.stream is not None:
        out[cfg.stream] = pdf[cfg.stream].to_numpy()[firsts]
    out["seg_start_turn"] = k_sst[starts]
    out["part_min_turn"] = k_turn[starts]
    out["n_part"] = (ends - starts).astype(np.int64)
    if emit_text:
        out["text_part"] = parts
    out["lang_id"] = k_lang[starts]
    out["sync_ok"] = sync_ok[firsts]
    for c in ride_along_cols(pdf.columns, cfg, msg_field):
        out[c] = pdf[c].to_numpy()[firsts]
    return pd.DataFrame(out)


def _empty_partials_arrow(tbl, cfg: PipelineConfig, msg_field: str | None,
                          emit_text: bool = True):
    import pyarrow as pa

    names, cols = [], []

    def add(name, arr):
        names.append(name)
        cols.append(arr)

    add(cfg.conv_col, tbl.column(cfg.conv_col).combine_chunks().slice(0, 0))
    if cfg.stream is not None:
        add(cfg.stream, tbl.column(cfg.stream).combine_chunks().slice(0, 0))
    add("seg_start_turn", pa.array([], pa.int64()))
    add("part_min_turn", pa.array([], pa.int64()))
    add("n_part", pa.array([], pa.int64()))
    if emit_text:
        add("text_part", pa.array([], pa.string()))
    add("lang_id", pa.array([], pa.int8()))
    add("sync_ok", pa.array([], pa.bool_()))
    for c in ride_along_cols(tbl.schema.names, cfg, msg_field):
        add(c, tbl.column(c).combine_chunks().slice(0, 0))
    return pa.table(cols, names=names)


def _scan_partition_fused_arrow(tbl, cfg: PipelineConfig, rules: CompiledRules,
                                msg_field: str | None, emit_text: bool = True):
    """Arrow-native fused scan+coalesce: the hot stage of the pipeline.

    The pandas form pays three Python-object taxes the profile showed
    dominate at scale (arrow→pandas conversion of every string column,
    whole-DataFrame reordering, and per-row string access): here the strings
    stay dictionary-encoded in C++ — only the DISTINCT lines become Python
    objects (for the regex bank and the final concat), row ordering is pure
    numpy index arithmetic, and ride-along columns are gathered with
    ``pyarrow.compute.take`` at segment-first positions only."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n = tbl.num_rows
    if n == 0:
        return _empty_partials_arrow(tbl, cfg, msg_field, emit_text)

    def codes_of(col_name):
        enc = pc.dictionary_encode(tbl.column(col_name).combine_chunks())
        return enc.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)

    conv_c = codes_of(cfg.conv_col)
    turn = tbl.column(cfg.order_col).combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    chunk = tbl.column("chunk_id").combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    warm = (
        tbl.column("__warmup").combine_chunks().to_numpy(zero_copy_only=False).astype(bool)
        if "__warmup" in tbl.schema.names
        else np.zeros(n, dtype=bool)
    )
    strm_c = codes_of(cfg.stream) if cfg.stream is not None else None

    # text: dictionary-encode once; classify / length / newline checks run
    # per DISTINCT line only
    if msg_field is not None:
        t_enc = pc.dictionary_encode(tbl.column(msg_field).combine_chunks())
        tcodes = t_enc.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        uniq_arr = t_enc.dictionary
        uniqs = pd.Series(uniq_arr.to_pylist(), dtype=object)
        ulen = pc.utf8_length(uniq_arr).fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        unl = pc.match_substring(uniq_arr, "\n").fill_null(False).to_numpy(zero_copy_only=False).astype(bool)
    else:
        tcodes = np.full(n, -1, dtype=np.int64)
        uniq_arr = pa.array([], pa.string())  # all codes are -1 (null)
        uniqs = pd.Series([], dtype=object)
        ulen = np.zeros(1, dtype=np.int64)
        unl = np.zeros(1, dtype=bool)
    cls_row, g_tab, b_tab, _ = classify_encoded(tcodes, uniqs, rules)
    safe = np.clip(tcodes, 0, None)
    rawlen_row = np.where(tcodes >= 0, ulen[safe] if len(ulen) else 0, 0).astype(np.int64)
    hasnl_row = np.where(tcodes >= 0, unl[safe] if len(unl) else False, False).astype(bool)

    # sort = integer index arithmetic only; no column is reordered
    keys = [turn, chunk]
    if strm_c is not None:
        keys.insert(1, strm_c)
    order = np.lexsort(tuple(keys) + (conv_c,))
    conv_s = conv_c[order]
    chunk_s = chunk[order]
    turn_s = turn[order]
    warm_s = warm[order]
    cls_s = cls_row[order]
    strm_s = strm_c[order] if strm_c is not None else None

    new_group = np.ones(n, dtype=bool)
    if n > 1:
        same = (conv_s[1:] == conv_s[:-1]) & (chunk_s[1:] == chunk_s[:-1])
        if strm_s is not None:
            same &= strm_s[1:] == strm_s[:-1]
        new_group[1:] = ~same
    group_starts = np.flatnonzero(new_group)
    group_ends = np.append(group_starts[1:], n)

    scan_ranges = []
    sync_ok = np.ones(n, dtype=bool)  # in SORTED order
    for gs, ge in zip(group_starts, group_ends):
        nwarm = int(warm_s[gs:ge].sum())
        if nwarm == 0:
            if chunk_s[gs] > 0:
                sync_ok[gs:ge] = False  # empty warm-up zone: unverifiable
            scan_ranges.append((gs, ge))
            continue
        j = fsm.subset_sync(cls_s[gs : gs + nwarm], g_tab)
        if j < 0:
            sync_ok[gs:ge] = False
            scan_ranges.append((gs + nwarm, ge))
        else:
            scan_ranges.append((gs + j + 1, ge))

    ranges = [(s, e) for s, e in scan_ranges if e > s]
    if not ranges:
        return _empty_partials_arrow(tbl, cfg, msg_field, emit_text)
    idx = np.concatenate([np.arange(s, e) for s, e in ranges])
    m = len(idx)
    first_of_group = np.zeros(m, dtype=bool)
    gidx = np.zeros(m, dtype=np.int64)
    pos = 0
    for gnum, (s, e) in enumerate(ranges):
        ln = e - s
        first_of_group[pos] = True
        gidx[pos : pos + ln] = gnum
        pos += ln

    orig = order[idx]  # positions in the ORIGINAL table
    rawlen = rawlen_row[orig]
    has_nl = hasnl_row[orig]
    gap = np.zeros(m, dtype=bool)
    if cfg.multiline_flush_interval is not None and m > 1:
        tsv = (
            tbl.column(cfg.ts_col).combine_chunks().cast(pa.timestamp("us"))
            .to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        )
        tsg = tsv[orig]
        gap[1:] = (tsg[1:] - tsg[:-1]) > cfg.multiline_flush_interval * 1_000_000
        gap[first_of_group] = False
    gap |= first_of_group

    res = fsm.scan(
        cls_s[idx], g_tab, b_tab, rawlen, has_nl, gap,
        force_line_breaks=cfg.force_line_breaks,
        max_lines=cfg.max_lines,
        max_bytes=cfg.max_bytes,
    )

    turns = turn_s[idx]
    adj = turns + gidx * _TURN_OFFSET
    sst = np.maximum.accumulate(np.where(res.seg_start, adj, np.int64(-1)))
    sst -= gidx * _TURN_OFFSET
    lang = STATE_FAMILY_ID[res.state_after]

    keep = res.emit & ~warm_s[idx]
    k_pos = np.flatnonzero(keep)
    if len(k_pos) == 0:
        return _empty_partials_arrow(tbl, cfg, msg_field, emit_text)
    k_gidx = gidx[k_pos]
    k_sst = sst[k_pos]
    k_turn = turns[k_pos]
    k_lang = lang[k_pos]
    k_has_nl = has_nl[k_pos]
    k_orig = orig[k_pos]
    k_tcode = tcodes[k_orig]

    p = len(k_pos)
    pb = np.ones(p, dtype=bool)
    if p > 1:
        pb[1:] = (k_gidx[1:] != k_gidx[:-1]) | (k_sst[1:] != k_sst[:-1])
    starts = np.flatnonzero(pb)
    ends = np.append(starts[1:], p)

    if cfg.force_line_breaks:
        prepend = (~k_has_nl) & (k_turn != k_sst)
    else:
        prepend = np.zeros(p, dtype=bool)

    # per-segment concat entirely in Arrow C++ (r6, guide §4.2 — this was a
    # per-row Python loop over every emitted member): take the member
    # strings from the dictionary (nulls ride through), prepend "\n" where
    # force_line_breaks demands it, then ONE binary_join per segment over a
    # ListArray view.  Null members contribute nothing (fill_null("")),
    # except a single-row all-null segment which stays null — matching the
    # reference's pass-through of nil-message records.
    parts = None
    if emit_text:
        v = pc.take(uniq_arr, pa.array(k_tcode, mask=k_tcode < 0))
        if cfg.force_line_breaks and prepend.any():
            pre = pc.binary_join_element_wise(
                pa.scalar("\n"), v, pa.scalar(""), null_handling="emit_null"
            )
            v = pc.if_else(pa.array(prepend), pre, v)
        offsets = pa.array(np.append(starts, p).astype(np.int32), pa.int32())
        lists = pa.ListArray.from_arrays(offsets, v.fill_null(""))
        parts = pc.binary_join(lists, "")
        single_null = (ends - starts == 1) & (k_tcode[starts] < 0)
        if single_null.any():
            parts = pc.if_else(
                pa.array(single_null), pa.scalar(None, pa.string()), parts
            )

    firsts_orig = pa.array(k_orig[starts])
    names, cols = [], []

    def add(name, arr):
        names.append(name)
        cols.append(arr)

    add(cfg.conv_col, pc.take(tbl.column(cfg.conv_col).combine_chunks(), firsts_orig))
    if cfg.stream is not None:
        add(cfg.stream, pc.take(tbl.column(cfg.stream).combine_chunks(), firsts_orig))
    add("seg_start_turn", pa.array(k_sst[starts], pa.int64()))
    add("part_min_turn", pa.array(k_turn[starts], pa.int64()))
    add("n_part", pa.array((ends - starts).astype(np.int64), pa.int64()))
    if emit_text:
        add("text_part", parts)
    add("lang_id", pa.array(k_lang[starts], pa.int8()))
    add("sync_ok", pa.array(sync_ok[idx][k_pos][starts], pa.bool_()))
    for c in ride_along_cols(tbl.schema.names, cfg, msg_field):
        add(c, pc.take(tbl.column(c).combine_chunks(), firsts_orig))
    return pa.table(cols, names=names)


def _with_chunks(df: DataFrame, cfg: PipelineConfig, fallback_convs) -> DataFrame:
    """Add chunk_id / __warmup via a single-pass JVM-side explode (stays
    inside whole-stage codegen, no second scan of the source)."""
    c, o = cfg.chunk_size, cfg.warmup
    turn = F.col(cfg.order_col)
    in_zone = (turn % c) >= (c - o)
    if fallback_convs:
        in_zone = in_zone & ~F.col(cfg.conv_col).isin(list(fallback_convs))
    dup = F.when(in_zone, F.array(F.lit(0), F.lit(1))).otherwise(F.array(F.lit(0)))
    df = df.withColumn("__d", F.explode(dup))
    chunk = F.expr(f"{cfg.order_col} div {c}") + F.col("__d")
    if fallback_convs:
        chunk = F.when(
            F.col(cfg.conv_col).isin(list(fallback_convs)), F.lit(0)
        ).otherwise(chunk)
    return (
        df.withColumn("chunk_id", chunk.cast("long"))
        .withColumn("__warmup", F.col("__d") == 1)
        .drop("__d")
    )


def find_fallback_convs(
    df: DataFrame, cfg: PipelineConfig, rules: CompiledRules, msg_field: str | None
) -> list:
    """Pre-pass: conversations that cannot be chunk-scanned exactly and must
    be processed whole.  Two independent detections, unioned:

    1. **Unsynchronizable warm-up** — a zone with rows but no synchronization
       point (wall-to-wall stack traces).  Scans only ``warmup/chunk_size``
       of the rows, column-pruned to (conv[, stream], turn, text).
    2. **Expected-but-empty warm-up zone** (ADVICE r2) — a (conv[, stream])
       occupies some chunk b>0 whose preceding zone ``[b*C-W, b*C)`` holds no
       rows at all (sparse stream, a turn hole wider than ``warmup`` spanning
       the boundary, or a conversation starting mid-chunk).  Such a group is
       invisible to check 1 (no zone rows → no group), and the chunk scan
       cannot verify its forced reset — route it whole so output is CORRECT
       rather than merely flagged sync_ok=False.  This half scans only the
       narrow (conv[, stream], turn) integer/key columns.
    """
    if msg_field is None:
        return []
    c, o = cfg.chunk_size, cfg.warmup
    # the explicit range conjunct is parquet-pushable (row-group stats prune
    # whole files of short conversations); the modulo half is evaluated post-scan
    sel = [
        F.col(cfg.conv_col).alias("conv"),
        F.expr(f"{cfg.order_col} div {c}").cast("long").alias("zchunk"),
        F.col(cfg.order_col).alias("turn"),
        F.col(msg_field).alias("msg"),
    ]
    group = ["conv", "zchunk"]
    if cfg.stream is not None:
        sel.insert(1, F.col(cfg.stream).alias("strm"))
        group = ["conv", "strm", "zchunk"]
    zone = df.filter(
        (F.col(cfg.order_col) >= (c - o)) & ((F.col(cfg.order_col) % c) >= (c - o))
    ).select(*sel)

    out_schema = StructType(
        [StructField("conv", zone.schema["conv"].dataType, False)]
    )

    def check_batches(batches):
        # r6: the former one-group-per-call applyInPandas paid per-group
        # conversion machinery (~0.9 s of a 1.0 s pre-pass at sf1.0); this
        # mirrors the main stage — one Arrow table per task, text
        # dictionary-encoded so the regex bank runs per DISTINCT line, all
        # groups scanned off one lexsort.  Emits one row per UNSYNCED
        # (conv[, stream], zchunk) group.
        import pyarrow as pa
        import pyarrow.compute as pc

        chunks = list(batches)
        if not chunks:
            return
        tbl = pa.Table.from_batches(chunks)
        n = tbl.num_rows
        if n == 0:
            return

        def codes_of(name):
            enc = pc.dictionary_encode(tbl.column(name).combine_chunks())
            return enc.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)

        conv_c = codes_of("conv")
        zchunk = tbl.column("zchunk").combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        turn = tbl.column("turn").combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        strm_c = codes_of("strm") if cfg.stream is not None else None
        t_enc = pc.dictionary_encode(tbl.column("msg").combine_chunks())
        tcodes = t_enc.indices.fill_null(-1).to_numpy(zero_copy_only=False).astype(np.int64)
        uniqs = pd.Series(t_enc.dictionary.to_pylist(), dtype=object)
        cls, g_tab, _, _ = classify_encoded(tcodes, uniqs, rules)

        keys = [turn, zchunk]
        if strm_c is not None:
            keys.insert(1, strm_c)
        order = np.lexsort(tuple(keys) + (conv_c,))
        conv_s = conv_c[order]
        z_s = zchunk[order]
        cls_s = cls[order]
        strm_s = strm_c[order] if strm_c is not None else None
        new_group = np.ones(n, dtype=bool)
        if n > 1:
            same = (conv_s[1:] == conv_s[:-1]) & (z_s[1:] == z_s[:-1])
            if strm_s is not None:
                same &= strm_s[1:] == strm_s[:-1]
            new_group[1:] = ~same
        gs = np.flatnonzero(new_group)
        ge = np.append(gs[1:], n)
        bad = [
            int(order[s])
            for s, e in zip(gs, ge)
            if fsm.subset_sync(cls_s[s:e], g_tab) < 0
        ]
        if bad:
            conv_arr = tbl.column("conv").combine_chunks()
            yield pa.record_batch(
                [pc.take(conv_arr, pa.array(np.asarray(bad, dtype=np.int64)))],
                names=["conv"],
            )

    bad_sync = zone.repartition(*group).mapInArrow(check_batches, schema=out_schema)

    # check 2: chunk occupancy vs zone presence per (conv[, stream]).  One
    # map-side-combinable groupBy over the narrow key columns (collect_set
    # dedupes in the partial aggregate, so the shuffle carries a handful of
    # chunk ids per group, not rows); bad = some occupied chunk b>0 whose
    # preceding zone chunk (b-1) has no zone row.  Skipped under the
    # assume_dense_turns contract (empty expected zones impossible).
    if cfg.assume_dense_turns:
        bad = (
            bad_sync.distinct().limit(cfg.max_fallback_convs + 1).collect()
        )
        return [r["conv"] for r in bad]
    chk = F.expr(f"{cfg.order_col} div {c}").cast("long")
    z = (F.col(cfg.order_col) % c) >= (c - o)
    occ_keys = ["conv"] if cfg.stream is None else ["conv", "strm"]
    occ_sel = [F.col(cfg.conv_col).alias("conv")]
    if cfg.stream is not None:
        occ_sel.append(F.col(cfg.stream).alias("strm"))
    occ = (
        df.select(*occ_sel, chk.alias("chk"), F.when(z, chk).alias("zchk"))
        .groupBy(*occ_keys)
        .agg(
            F.collect_set("chk").alias("chunks"),
            F.collect_set("zchk").alias("zchunks"),
        )
    )
    missing = F.array_except(
        F.transform(F.filter(F.col("chunks"), lambda x: x > 0), lambda x: x - 1),
        F.col("zchunks"),
    )
    bad_zone = occ.filter(F.size(missing) > 0).select("conv")

    bad = (
        bad_sync.unionByName(bad_zone)
        .distinct()
        .limit(cfg.max_fallback_convs + 1)
        .collect()
    )
    return [r["conv"] for r in bad]


def segment(
    df: DataFrame, cfg: PipelineConfig, rules: CompiledRules | None = None,
    emit_text: bool = True,
) -> DataFrame:
    """Full segmentation: returns the input rows (body only) plus metadata
    columns (seg_start_turn, seg_flag, emit, lang_id, sync_ok).

    ``emit_text=False`` (fused modes only) omits the combined-text column
    from the partials — counts-only consumers then never pay the Arrow
    transfer or the per-segment concat for text nobody reads (r6)."""
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

    chunking = cfg.chunking_active
    if chunking and not cfg.assume_long_convs:
        # near-free gate (one max() — parquet aggregate pushdown reads only
        # footers when enabled): if no conversation reaches chunk_size, skip
        # the pre-pass, warm-up duplication and salted keys entirely
        max_turn = df.agg(F.max(cfg.order_col)).first()[0]
        if max_turn is None or max_turn < cfg.chunk_size:
            chunking = False

    if chunking:
        fallback = (
            list(cfg.known_fallback_convs)
            if cfg.known_fallback_convs is not None
            else find_fallback_convs(df, cfg, rules, msg_field)
        )
        if len(fallback) > cfg.max_fallback_convs:
            # adversarial input: too many unsynchronizable conversations —
            # process everything whole rather than blow up the driver list
            df = df.withColumn("chunk_id", F.lit(0)).withColumn("__warmup", F.lit(False))
        else:
            df = _with_chunks(df, cfg, fallback)
    else:
        df = df.withColumn("chunk_id", F.lit(0)).withColumn("__warmup", F.lit(False))

    group_cols = cfg.group_keys() + ["chunk_id"]
    if cfg.fuse_coalesce:
        out_schema = partial_schema(df.schema, cfg, msg_field, emit_text)
        scan_fn = _scan_partition_fused
    else:
        out_schema = StructType(
            [f for f in df.schema.fields if f.name != "__warmup"] + META_FIELDS
        )
        scan_fn = _scan_partition

    if cfg.fuse_coalesce and cfg.arrow_stage:
        def run_arrow(batches):
            import pyarrow as pa

            chunks = list(batches)
            if not chunks:
                return
            tbl = pa.Table.from_batches(chunks)
            out = _scan_partition_fused_arrow(tbl, cfg, rules, msg_field, emit_text)
            yield from out.to_batches()

        if cfg.input_clustered:
            # caller asserts each input partition holds whole conversations
            # (bucketed/SPJ layout): no grouping exchange at all
            return df.mapInArrow(run_arrow, schema=out_schema)
        return df.repartition(*group_cols).mapInArrow(run_arrow, schema=out_schema)

    def run(batches):
        # one partition may arrive as several Arrow batches and a group may
        # span them — concatenate so each (conv, chunk) group scans whole.
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]
        # sort in Python: factorize + integer lexsort beats the JVM's
        # row-based string-key Sort by ~20% of whole-pipeline time (the JVM
        # side is the saturated resource; Python has headroom)
        codes, _ = pd.factorize(pdf[cfg.conv_col])
        keys = [pdf[cfg.order_col].to_numpy(), pdf["chunk_id"].to_numpy()]
        if cfg.stream is not None:
            scodes, _ = pd.factorize(pdf[cfg.stream])
            keys.insert(1, scodes)
        order = np.lexsort(tuple(keys) + (codes,))
        pdf = pdf.take(order).reset_index(drop=True)
        if scan_fn is _scan_partition_fused:
            yield scan_fn(pdf, cfg, rules, msg_field, emit_text)
        else:
            yield scan_fn(pdf, cfg, rules, msg_field)

    return df.repartition(*group_cols).mapInPandas(run, schema=out_schema)

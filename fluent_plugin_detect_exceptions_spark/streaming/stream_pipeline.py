"""Structured Streaming variant of the exception pipeline.

The batch north rule doesn't need streaming, but the reference is a stream
plugin, so the capability is provided: ``readStream`` source →
``applyInPandasWithState`` per conversation → routed micro-batch output.

Per-group state is the FSM/buffer carry (fsm.ScanCarry) plus the open
segment's first-row fields and accumulated text.  Each micro-batch is
classified with the same vectorized pattern bank and scanned with
``fsm.scan(entry_carry=...)`` — the carry-chaining invariant (tested in
test_fsm.py) guarantees micro-batch boundaries are invisible, i.e. streaming
output ≡ batch output on the same rows.  The idle-timeout flush
(out_detect_exceptions.rb:116-132) maps to GroupStateTimeout.ProcessingTimeTimeout
*plus* the event-time gap predicate within batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..config import PipelineConfig
from ..functions.classify import classify
from ..operators import fsm
from ..operators.segmenter import STATE_FAMILY_ID
from ..rules import FAMILIES, CompiledRules, compile_rules

OUTPUT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType(), False),
        StructField("first_turn_idx", LongType(), False),
        StructField("role", StringType(), True),
        StructField("tool", StringType(), True),
        StructField("ts", LongType(), True),
        StructField("text", StringType(), True),
        StructField("n_lines", LongType(), False),
        StructField("lang", StringType(), True),
        StructField("sink", StringType(), False),
    ]
)

#: State-format version (ADVICE r3): v2 switched ``last_ts`` from epoch
#: SECONDS to MICROSECONDS.  The explicit ``ver`` field makes checkpoints
#: written by a different format fail LOUDLY — adding the field changed the
#: state schema, so Spark's checkpoint state-schema check rejects a pre-v2
#: resume outright; any future unit/semantics change bumps this constant and
#: the guard below discards (not misreads) stale state.
STATE_VERSION = 2

#: state: FSM carry + open-segment accumulator
STATE_SCHEMA = StructType(
    [
        StructField("ver", IntegerType(), False),
        StructField("fsm_state", IntegerType(), False),
        StructField("open", BooleanType(), False),
        StructField("cnt", LongType(), False),
        StructField("nbytes", LongType(), False),
        StructField("prev_status", IntegerType(), False),
        StructField("first_turn", LongType(), True),
        StructField("first_role", StringType(), True),
        StructField("first_tool", StringType(), True),
        StructField("first_ts", LongType(), True),
        StructField("msgs", StringType(), True),
        StructField("lang_id", IntegerType(), False),
        StructField("last_ts", LongType(), True),
    ]
)

_EMPTY_STATE = (
    STATE_VERSION, 0, False, 0, 0, int(fsm.NO_TRACE),
    None, None, None, None, None, -1, None,
)


def _lang_of(lang_id: int) -> str | None:
    return FAMILIES[lang_id] if lang_id >= 0 else None


def _mk_out(conv, first_turn, role, tool, ts, text, n, lang_id):
    lang = _lang_of(lang_id)
    return (
        conv,
        int(first_turn),
        role,
        tool,
        None if ts is None else int(ts),
        text,
        int(n),
        lang,
        f"lang_{lang}" if lang else "passthrough",
    )


def make_state_func(cfg: PipelineConfig, rules: CompiledRules | None = None,
                    event_time: bool = False):
    rules = rules or compile_rules(cfg.languages)
    timeout_ms = (
        int(cfg.multiline_flush_interval * 1000)
        if cfg.multiline_flush_interval is not None
        else None
    )

    def func(key, pdfs, state: GroupState):
        conv = key[0]
        rows = []

        if state.hasTimedOut:
            (_ver, fsm_state, opened, cnt, nbytes, prev_status, ft, fr_, fo, fts,
             msgs, lang_id, _last) = state.get
            if opened and cnt > 0:
                rows.append(_mk_out(conv, ft, fr_, fo, fts, msgs, cnt, lang_id))
            state.remove()
            yield pd.DataFrame(rows, columns=OUTPUT_SCHEMA.names)
            return

        st = state.get if state.exists else _EMPTY_STATE
        if st[0] != STATE_VERSION:
            # stale-format state (schema-compatible but semantically older):
            # discard rather than misread — the carried trace re-opens from
            # scratch, which loses at most one in-flight segment vs silently
            # emitting a corrupted one
            st = _EMPTY_STATE
        (_ver, fsm_state, opened, cnt, nbytes, prev_status, ft, fr_, fo, fts,
         msgs, lang_id, last_ts) = st
        carry = fsm.ScanCarry(
            state=fsm_state, open=bool(opened), count=int(cnt),
            bytes=int(nbytes), prev_status=int(prev_status),
        )

        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(cfg.order_col, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        texts = pdf[cfg.message] if cfg.message in pdf.columns else pd.Series([None] * n)
        cls, g_tab, b_tab, _ = classify(texts, rules)
        rawlen = texts.str.len().fillna(0).to_numpy(np.int64)
        has_nl = (texts.str.contains("\n", regex=False) == True).to_numpy(bool)  # noqa: E712 — null-safe without object-downcast fillna (pandas FutureWarning)
        # MICROSECOND event times (code-review r3): second-truncation made
        # the gap predicate coarser than the batch path's microsecond compare
        # (stream/batch divergence on fractional-second gaps) and could set
        # an event-time timeout below the current watermark for sub-second
        # intervals.  State carries last_ts in µs; outputs convert to epoch
        # seconds at emit.
        tsv = (
            pdf[cfg.ts_col].to_numpy(dtype="datetime64[us]").astype(np.int64)
            if cfg.ts_col in pdf.columns
            else np.zeros(n, dtype=np.int64)
        )
        gap = np.zeros(n, dtype=bool)
        if cfg.multiline_flush_interval is not None:
            prev_ts = np.empty(n, dtype=np.int64)
            prev_ts[0] = last_ts if last_ts is not None else tsv[0]
            prev_ts[1:] = tsv[:-1]
            gap = (tsv - prev_ts) > cfg.multiline_flush_interval * 1_000_000

        res = fsm.scan(
            cls, g_tab, b_tab, rawlen, has_nl, gap,
            force_line_breaks=cfg.force_line_breaks,
            max_lines=cfg.max_lines,
            max_bytes=cfg.max_bytes,
            entry_carry=carry,
        )

        tarr = texts.to_numpy(dtype=object)
        turns = pdf[cfg.order_col].to_numpy(np.int64)
        roles = pdf["role"].tolist() if "role" in pdf.columns else [None] * n
        tools = pdf["tool"].tolist() if "tool" in pdf.columns else [None] * n
        seg = np.cumsum(res.seg_start)
        row_lang = STATE_FAMILY_ID[res.state_after]

        # A carried-open segment whose first continuation row starts a NEW
        # segment (status no_trace/start_trace, a nil message, or a gap
        # flush) closes with no rows in this batch: seg==0 is then empty and
        # the loop below would never visit it.  Emit it here as a closed
        # record (reference: the pending buffer force-flushes before such a
        # row — exception_detector.rb:335-356).
        if opened and cnt > 0 and bool(res.seg_start[0]):
            rows.append(_mk_out(conv, ft, fr_, fo, fts, msgs, cnt, lang_id))

        # rows with seg==0 continue the carried-open segment from state
        for sid in range(0, int(seg[-1]) + 1):
            mask = (seg == sid) & res.emit
            idxs = np.flatnonzero(mask)
            if sid == 0:
                if idxs.size == 0:
                    continue
            elif idxs.size == 0:
                continue
            if sid == 0 and not opened:
                continue
            if sid == 0:
                seg_first = (ft, fr_, fo, fts)
                seg_msgs = msgs or ""
                seg_cnt = int(cnt)
                seg_lang = int(lang_id)
            else:
                f0 = int(idxs[0])
                seg_first = (int(turns[f0]), roles[f0], tools[f0],
                             int(tsv[f0]) // 1_000_000)
                seg_msgs = ""
                seg_cnt = 0
                seg_lang = int(row_lang[f0])
            # one ''.join per segment per batch, not seg_msgs += t per row —
            # a giant trace in one micro-batch would otherwise go quadratic
            # in the Python string concat (VERDICT r2)
            tv = tarr[idxs]
            vals = tv[pd.notna(tv)].tolist()
            if cfg.force_line_breaks and vals:
                vals = [
                    ("\n" + t) if (seg_cnt + j > 0 and "\n" not in t) else t
                    for j, t in enumerate(vals)
                ]
            if vals:
                seg_msgs += "".join(vals)
                seg_cnt += len(vals)
            closed = sid < seg[-1] or not res.carry.open
            if closed:
                if seg_cnt == 0 and idxs.size:
                    # nil pass-through rows: emit original (null text)
                    for i in idxs:
                        rows.append(
                            _mk_out(conv, int(turns[i]), roles[int(i)], tools[int(i)],
                                    int(tsv[int(i)]) // 1_000_000, None, 1, -1)
                        )
                elif seg_cnt > 0:
                    rows.append(
                        _mk_out(conv, seg_first[0], seg_first[1], seg_first[2],
                                seg_first[3], seg_msgs, seg_cnt, seg_lang)
                    )
            else:
                state.update(
                    (
                        STATE_VERSION, int(res.carry.state), True, seg_cnt,
                        int(res.carry.bytes), int(res.carry.prev_status),
                        seg_first[0], seg_first[1], seg_first[2], seg_first[3],
                        seg_msgs, seg_lang, int(tsv[-1]),
                    )
                )

        if not res.carry.open:
            state.update(
                (
                    STATE_VERSION, int(res.carry.state), False, 0, 0,
                    int(res.carry.prev_status),
                    None, None, None, None, None, -1, int(tsv[-1]),
                )
            )
        if timeout_ms is not None:
            if event_time:
                # flush once the watermark passes the last seen event + the
                # interval (replay-deterministic, unlike wall clock).  MAX of
                # the batch's event times, not the last row in turn order:
                # with non-monotonic event times tsv[-1] could set a timestamp
                # the watermark has already passed, flushing the pending trace
                # early (ADVICE r2).  The gap predicate keeps using
                # turn-order-previous ts (batch semantics).  Clamped above
                # the current watermark (code-review r3): with a short
                # interval and another conversation driving the watermark
                # ahead, the naive timestamp can land at/below it, which
                # Spark rejects and kills the query — the clamp flushes at
                # the very next batch instead (the trace is already idle
                # past the interval, so that IS the correct flush time).
                cand = int(tsv.max()) // 1000 + timeout_ms
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(cand, wm + 1))
            else:
                state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame(rows, columns=OUTPUT_SCHEMA.names)

    return func


def _state_rows_of(progress_dicts) -> list[dict]:
    out = []
    for d in progress_dicts:
        for so in d.get("stateOperators") or []:
            out.append(
                {
                    "batch": d.get("batchId"),
                    "state_rows": so.get("numRowsTotal"),
                    "state_bytes": so.get("stateMemory") or so.get("memoryUsedBytes"),
                    "rows_updated": so.get("numRowsUpdated"),
                    "rows_removed": so.get("numRowsRemoved"),
                }
            )
    return out


def state_metrics(query) -> list[dict]:
    """Per-micro-batch state-store metrics from StreamingQueryProgress —
    the observability hook for the bounded-state claim (VERDICT r2): one
    entry per (batch, state operator) with the total state rows, state
    bytes, and rows updated/removed that batch.  Under a timeout config,
    ``rows_removed`` > 0 once idle conversations flush and ``state_rows``
    stays bounded by the number of live conversations.

    Reads ``query.recentProgress`` (the last ~100 batches).  For complete
    history on long-running queries, attach a ``StateMetricsListener``
    before starting the query instead."""
    import json as _json

    dicts = [p if isinstance(p, dict) else _json.loads(p.json) for p in query.recentProgress]
    return _state_rows_of(dicts)


def make_state_metrics_listener():
    """A StreamingQueryListener capturing EVERY batch's progress (not just
    the recentProgress ring buffer): attach with
    ``spark.streams.addListener(listener)`` before ``start()``; read
    ``listener.metrics()`` any time.  Factory form because the listener base
    class lives in pyspark.sql.streaming and importing it at module load
    would cost every batch-only user the streaming import."""
    import json as _json

    from pyspark.sql.streaming import StreamingQueryListener

    class StateMetricsListener(StreamingQueryListener):
        def __init__(self):
            self.progress: list[dict] = []

        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            self.progress.append(_json.loads(event.progress.json))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

        def metrics(self, query_id=None) -> list[dict]:
            """State metrics; pass ``query_id=str(query.id)`` to restrict to
            one query — the listener is SESSION-GLOBAL and receives every
            query's progress events."""
            dicts = self.progress
            if query_id is not None:
                dicts = [d for d in dicts if d.get("id") == str(query_id)]
            return _state_rows_of(dicts)

    return StateMetricsListener()


def detect_exceptions_stream(
    stream_df: DataFrame, cfg: PipelineConfig, event_time: bool = False
) -> DataFrame:
    """streaming transcripts → streaming routed records (append mode).

    ``event_time=True`` switches the idle flush from wall clock to the
    event-time watermark (out_detect_exceptions.rb:116-132 uses wall clock —
    the watermark variant is the replayable/backfill-safe analogue: a
    pending trace flushes once the watermark passes its last event + the
    flush interval, so reprocessing history produces identical output
    instead of depending on processing speed)."""
    func = make_state_func(cfg, event_time=event_time)
    if cfg.multiline_flush_interval is None:
        timeout = GroupStateTimeout.NoTimeout
    elif event_time:
        timeout = GroupStateTimeout.EventTimeTimeout
        # millisecond granularity: int(interval) seconds would truncate
        # fractional intervals while the in-batch gap predicate uses the
        # float value — inconsistent flush semantics below 1s (ADVICE r2)
        stream_df = stream_df.withWatermark(
            cfg.ts_col, f"{int(cfg.multiline_flush_interval * 1000)} milliseconds"
        )
    else:
        timeout = GroupStateTimeout.ProcessingTimeTimeout
    return stream_df.groupBy(cfg.conv_col).applyInPandasWithState(
        func, OUTPUT_SCHEMA, STATE_SCHEMA, "append", timeout
    )

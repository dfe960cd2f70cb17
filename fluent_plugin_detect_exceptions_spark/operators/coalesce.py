"""Trace coalescing: ordered separator-less concat per segment (SURVEY O9/O12).

Entirely JVM-side built-ins — no Python in this stage:

* segment identity is ``(conv_id[, stream], seg_start_turn)``; the groupBy
  shuffles on those keys, so even a skewed conversation's segments hash-spread
  across reducers (a segment itself is bounded by max_lines/max_bytes);
* ordered concat = ``array_join(transform(array_sort(collect_list(struct(
  turn_idx, text))), x -> x.text), '')`` — deterministic order without a
  window sort;
* single-row segments emit the **original record unchanged**
  (exception_detector.rb:298-299): all first-row fields ride along via
  ``min_by(struct(*cols), turn_idx)`` and the 1-row case takes the original
  text;
* force_line_breaks (exception_detector.rb:366-371): prepend ``\\n`` to
  non-first member lines that contain none.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..config import PipelineConfig
from ..rules import FAMILIES

META_COLS = ("seg_start_turn", "seg_flag", "emit", "lang_id", "sync_ok", "chunk_id")


def segment_ids_window(seg: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Running-sum segment ids over the start-of-block flag — the window
    formulation: ``sum(seg_flag) OVER (PARTITION BY conv ORDER BY turn)``.

    ``seg_start_turn`` (used by the pipeline) is the same assignment in a
    chunk-stitchable form: two rows share a window-sum segment id iff they
    share (conv, seg_start_turn) — asserted by test_window_segment_ids.
    This helper exists for consumers who want dense per-conversation segment
    numbers; note the window re-sorts each conversation in one task, so
    prefer seg_start_turn keys at skew scale."""
    w = Window.partitionBy(*cfg.group_keys()).orderBy(cfg.order_col)
    return seg.withColumn("segment_id", F.sum(F.col("seg_flag").cast("long")).over(w))


def coalesce_partials(partials: DataFrame, cfg: PipelineConfig, msg_field: str | None = "text") -> DataFrame:
    """Stitch fused-mode segment partials (one row per segment per chunk)
    into final records.  Almost every segment has exactly one partial; only
    chunk-spanning segments aggregate >1, so this groupBy moves per-segment
    volume, not per-turn volume."""
    keys = cfg.group_keys() + ["seg_start_turn"]
    ride = [c for c in partials.columns
            if c not in (*keys, "part_min_turn", "n_part", "text_part", "lang_id", "sync_ok")]
    # lang comes from a PACKED primitive min — (first partial's turn, lang_id)
    # in one bigint — rather than from the min_by struct: aggregations that
    # only need lang/sink (per-sink counts) then prune the min_by +
    # collect_list entirely and run as a pure primitive-buffer HashAggregate
    # (min_by alone would force SortAggregate: an extra per-partition sort)
    pack = F.col("part_min_turn") * 256 + (F.col("lang_id").cast("long") + 1)
    agg = partials.groupBy(*keys).agg(
        F.sum("n_part").alias("n_lines"),
        F.min(pack).alias("__first_pack"),
        F.min_by(F.struct(*ride, "text_part"), F.col("part_min_turn")).alias("__first"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("part_min_turn", "text_part"))),
                lambda x: x["text_part"],
            ),
            "",
        ).alias("__combined"),
        F.min("sync_ok").alias("sync_ok"),
    )
    first = F.col("__first")
    first_lang = (F.col("__first_pack") % 256 - 1).cast("int")
    lang = F.when(
        first_lang >= 0,
        F.element_at(F.array(*[F.lit(x) for x in FAMILIES]), first_lang + 1),
    )
    sel = [F.col(k) for k in cfg.group_keys()]
    sel.append(F.col("seg_start_turn").alias("first_turn_idx"))
    for c in ride:
        sel.append(first[c].alias(c))
    if msg_field is not None:
        sel.append(
            F.when(F.col("n_lines") == 1, first["text_part"])
            .otherwise(F.col("__combined"))
            .alias(msg_field)
        )
    sel.append(F.col("n_lines"))
    sel.append(lang.alias("lang"))
    sel.append(F.col("sync_ok"))
    return agg.select(*sel)


def coalesce_segments(seg: DataFrame, cfg: PipelineConfig, msg_field: str | None = "text") -> DataFrame:
    """seg: output of ``segmenter.segment``.  Returns one row per emitted
    record with first-row fields, combined text, n_lines and lang."""
    keys = cfg.group_keys() + ["seg_start_turn"]
    orig_cols = [c for c in seg.columns if c not in META_COLS]

    text = F.col(msg_field) if msg_field is not None else F.lit(None).cast("string")
    if cfg.force_line_breaks:
        member = F.when(
            (F.col(cfg.order_col) != F.col("seg_start_turn"))
            & ~text.contains("\n")
            & text.isNotNull(),
            F.concat(F.lit("\n"), text),
        ).otherwise(text)
    else:
        member = text

    rows = seg.filter(F.col("emit")).withColumn("__member", member)

    agg = rows.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min_by(F.struct(*orig_cols, "lang_id"), F.col(cfg.order_col)).alias("__first"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(cfg.order_col, "__member"))),
                lambda x: x["__member"],
            ),
            "",
        ).alias("__combined"),
        F.min("sync_ok").alias("sync_ok"),
    )

    first = F.col("__first")
    out_text = (
        F.when(F.col("n_lines") == 1, first[msg_field]).otherwise(F.col("__combined"))
        if msg_field is not None
        else None  # no message field: every record passes through unchanged
    )
    lang = F.when(
        first["lang_id"] >= 0,
        F.element_at(F.array(*[F.lit(x) for x in FAMILIES]), (first["lang_id"] + 1).cast("int")),
    )

    sel = [F.col(k) for k in cfg.group_keys()]
    sel.append(F.col("seg_start_turn").alias("first_turn_idx"))
    for c in orig_cols:
        if c in (*cfg.group_keys(), cfg.order_col):
            continue
        if c == msg_field and out_text is not None:
            sel.append(out_text.alias(msg_field))
        else:
            sel.append(first[c].alias(c))
    sel.append(F.col("n_lines"))
    sel.append(lang.alias("lang"))
    sel.append(F.col("sync_ok"))
    return agg.select(*sel)

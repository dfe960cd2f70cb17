"""End-to-end plan assembly: scan → classify+segment → coalesce → enrich →
route → aggregate (SURVEY §3.1 hot path, Spark-first).

Shuffle budget (north rule 'bounded-shuffle'):
  1. hash exchange on (conv_id[, stream], chunk_id) for the applyInPandas
     segmentation — the salted key spreads skewed conversations;
  2. hash exchange on (conv_id[, stream], seg_start_turn) for the coalesce
     groupBy — segment keys are fine-grained, so no residual skew;
  3. a tiny map-side-combined exchange for per-sink counts.
The enrich join is broadcast; everything else is narrow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..config import PipelineConfig
from ..operators.coalesce import coalesce_partials, coalesce_segments
from ..operators.enrich import enrich_with_lang
from ..operators.route import sink_counts, with_out_tag, with_sink
from ..operators.segmenter import segment
from ..rules import compile_rules


def slim_split(df: DataFrame, cfg: PipelineConfig, msg_field: str | None):
    """Slim-stage rewrite (VERDICT r2 item 7, measured keep): split the
    input into the columns the scan stage actually consumes and a narrow
    ride table of first-row fields keyed by (group keys, first_turn_idx).
    Returns ``(stage_df, ride_df)``; ``ride_df`` is None when the rewrite is
    inactive (forced off, per-row path, clustered input, no message field,
    or nothing to drop) and the caller proceeds unchanged."""
    active = cfg.slim_stage
    if active is None:
        active = cfg.fuse_coalesce and not cfg.input_clustered and msg_field is not None
    if not active:
        return df, None
    keep = cfg.scan_columns(df.columns, msg_field)
    ride_cols = [c for c in df.columns if c not in keep]
    if not ride_cols:
        return df, None
    ride = df.select(
        *cfg.group_keys(),
        F.col(cfg.order_col).alias("first_turn_idx"),
        *ride_cols,
    )
    return df.select(*[c for c in df.columns if c in keep]), ride


def rejoin_ride(grouped: DataFrame, ride: DataFrame | None, cfg: PipelineConfig) -> DataFrame:
    """Attach first-row ride-along fields to coalesced records.  Exact by
    construction: ``first_turn_idx`` is the segment's first row's turn, and
    (conv[, stream], turn) is unique in the input, so the left join matches
    exactly the row ``min_by`` would have picked."""
    if ride is None:
        return grouped
    return grouped.join(ride, [*cfg.group_keys(), "first_turn_idx"], "left")


def detect_exceptions(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """transcripts → one routed row per emitted record.

    Output columns: group keys, first_turn_idx, ride-along first-row fields,
    <message field> (combined text), n_lines, lang, sink, out_tag, sync_ok.
    """
    rules = compile_rules(cfg.languages)
    msg_field = cfg.resolve_message_field(df.columns)
    stage_df, ride = slim_split(df, cfg, msg_field)
    seg = segment(stage_df, cfg, rules)
    if cfg.fuse_coalesce:
        grouped = coalesce_partials(seg, cfg, msg_field)
    else:
        grouped = coalesce_segments(seg, cfg, msg_field)
    routed = with_sink(with_out_tag(rejoin_ride(grouped, ride, cfg), cfg))
    return routed


def detect_exceptions_enriched(df: DataFrame, cfg: PipelineConfig, spark: SparkSession) -> DataFrame:
    return enrich_with_lang(detect_exceptions(df, cfg), spark)


def detect_with_counts(df: DataFrame, cfg: PipelineConfig) -> tuple[DataFrame, DataFrame]:
    routed = detect_exceptions(df, cfg)
    return routed, sink_counts(routed)

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

from pyspark.sql import DataFrame, SparkSession

from ..config import PipelineConfig
from ..operators.coalesce import coalesce_partials, coalesce_segments
from ..operators.enrich import enrich_with_lang
from ..operators.route import sink_counts, with_out_tag, with_sink
from ..operators.segmenter import segment
from ..rules import compile_rules


def detect_exceptions(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """transcripts → one routed row per emitted record.

    Output columns: group keys, first_turn_idx, ride-along first-row fields,
    <message field> (combined text), n_lines, lang, sink, out_tag, sync_ok.
    """
    rules = compile_rules(cfg.languages)
    msg_field = cfg.resolve_message_field(df.columns)
    seg = segment(df, cfg, rules)
    if cfg.fuse_coalesce:
        grouped = coalesce_partials(seg, cfg, msg_field)
    else:
        grouped = coalesce_segments(seg, cfg, msg_field)
    routed = with_sink(with_out_tag(grouped, cfg))
    return routed


def detect_exceptions_enriched(df: DataFrame, cfg: PipelineConfig, spark: SparkSession) -> DataFrame:
    return enrich_with_lang(detect_exceptions(df, cfg), spark)


def detect_with_counts(df: DataFrame, cfg: PipelineConfig) -> tuple[DataFrame, DataFrame]:
    routed = detect_exceptions(df, cfg)
    return routed, sink_counts(routed)

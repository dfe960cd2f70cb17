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
    exactly the row ``min_by`` would have picked.

    The MERGE hint pins a sort-merge join (r6, guide §3.1): the ride table
    has the same cardinality as the input, but Catalyst's size estimate
    after column pruning routinely drops under the auto-broadcast
    threshold, and the resulting BroadcastExchange collects every input row
    to the driver and builds the hash relation single-threaded — a measured
    3.4 s driver stall at 8.5M rows (event-log evidence in
    OPTIMIZATION_r06.md), and a driver OOM waiting to happen at scale.  A
    per-input-row table is never a sane broadcast, so SMJ is the right plan
    at every size; the grouped side reuses its aggregation partitioning, so
    the hint adds no exchange."""
    if ride is None:
        return grouped
    return grouped.join(ride.hint("merge"), [*cfg.group_keys(), "first_turn_idx"], "left")


def detect_exceptions(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """transcripts → one routed row per emitted record.

    Output columns: group keys, first_turn_idx, ride-along first-row fields,
    <message field> (combined text), n_lines, lang, sink, out_tag, sync_ok.
    """
    rules = compile_rules(cfg.languages)
    msg_field = cfg.resolve_message_field(df.columns)
    stage_df, ride = slim_split(df, cfg, msg_field)
    if ride is not None and cfg.slim_check_unique:
        # opt-in EXACT duplicate-key guard (ADVICE r3): the rejoin is exact
        # only under (conv[, stream], turn) uniqueness; a replayed duplicate
        # would fan the first-row join out.  One narrow groupBy job — the
        # ride table is already projected to keys + ride columns.
        key = [*cfg.group_keys(), "first_turn_idx"]
        dup = (
            ride.groupBy(*key)
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") > 1)
            .limit(1)
            .collect()
        )
        if dup:
            d = dup[0]
            raise ValueError(
                f"slim_stage uniqueness precondition violated: duplicate "
                f"input rows for key {tuple(d[k] for k in key)} "
                f"({d['__n']}x); dedupe the input on (conv[, stream], turn) "
                f"or set slim_stage=False"
            )
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
    """(routed records, per-sink counts).  The counts leg uses the fused
    2-exchange fast path (``route.detect_sink_counts``) whenever the fused
    stage is on: counts never read ride-along columns, so they should not
    pay the coalesce groupBy or the slim-stage rejoin (VERDICT r3 item 6).

    The two legs are INDEPENDENT plans over the same input: a caller that
    collects only counts runs just the cheap path; a caller that collects
    both runs the scan+segment stage twice (Spark has no cross-action CSE) —
    if you materialize ``routed`` anyway, derive counts from it with
    ``sink_counts(routed)`` (or from its written output) instead."""
    routed = detect_exceptions(df, cfg)
    if cfg.fuse_coalesce:
        from ..operators.route import detect_sink_counts

        return routed, detect_sink_counts(df, cfg)
    return routed, sink_counts(routed)

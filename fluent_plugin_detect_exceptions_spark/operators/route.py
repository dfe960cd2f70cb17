"""Routing: tag rewrite, sink fan-out and per-sink aggregate counts
(SURVEY O14/O15).

* ``out_tag`` strips only a complete leading tag part plus dot, exactly like
  the reference's ``tag.sub(/^#{Regexp.escape(prefix)}\\./, '')``
  (out_detect_exceptions.rb:92; semantics tested at
  test_out_detect_exceptions.rb:259-273);
* ``sink`` fans grouped traces to per-language sinks and everything else to
  ``passthrough`` (north-star fan-out);
* ``sink_counts`` is a map-side-combinable groupBy — the per-sink aggregate
  the correctness gate compares against reference fixture counts.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

from ..config import PipelineConfig


def with_out_tag(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    if cfg.remove_tag_prefix is None:
        return df.withColumn("out_tag", F.col(cfg.conv_col))
    pat = "^" + re.escape(cfg.remove_tag_prefix) + r"\."
    return df.withColumn("out_tag", F.regexp_replace(F.col(cfg.conv_col), pat, ""))


def with_sink(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "sink",
        F.when(F.col("lang").isNotNull(), F.concat(F.lit("lang_"), F.col("lang"))).otherwise(
            F.lit("passthrough")
        ),
    )


def sink_counts(routed: DataFrame) -> DataFrame:
    return routed.groupBy("sink").agg(F.count(F.lit(1)).alias("n"))


def fused_sink_counts(partials: DataFrame) -> DataFrame:
    """Per-sink record counts DIRECTLY from fused segment partials, skipping
    the coalesce groupBy: 2 exchanges total instead of 3 (VERDICT r2).

    Correctness rests on two invariants of the fused scan stage:

    * exactly ONE partial per final record has ``part_min_turn ==
      seg_start_turn`` — the segment-start row is always an emitted body row
      (a dropped nil row isolates into a zero-partial segment, and the
      warm-up replay of a boundary-spanning start is excluded from partials),
      so the first partial carries the segment-start turn and later chunks'
      partials carry strictly greater turns;
    * a record's lang/sink is its FIRST partial's ``lang_id`` (the same
      packed-min rule ``coalesce_partials`` uses).

    Plan: scan-stage exchange → Filter → partial HashAggregate → one tiny
    exchange of ≤(#sinks) rows per partition.  The segment-stitching
    exchange on (conv, seg_start_turn) never happens.  Asserted by
    test_fused_sink_counts_plan_has_two_exchanges."""
    from ..rules import FAMILIES

    sink = F.when(
        F.col("lang_id") >= 0,
        F.concat(
            F.lit("lang_"),
            F.element_at(
                F.array(*[F.lit(x) for x in FAMILIES]),
                F.col("lang_id").cast("int") + 1,
            ),
        ),
    ).otherwise(F.lit("passthrough"))
    return (
        partials.filter(F.col("part_min_turn") == F.col("seg_start_turn"))
        .select(sink.alias("sink"))
        .groupBy("sink")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def detect_sink_counts(df: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Counts-only entry point: transcripts → per-sink record counts via the
    fused partials fast path (requires ``cfg.fuse_coalesce``).

    Projects the input to exactly the columns the scan needs before the
    stage: a Python map stage is OPAQUE to Catalyst, so column pruning does
    not push through it — without the explicit select, ride-along columns
    the counts never use would ride shuffle #1 and both Arrow transfers."""
    from .segmenter import segment

    if not cfg.fuse_coalesce:
        raise ValueError("detect_sink_counts requires cfg.fuse_coalesce=True")
    # emit_text=False: counts never read the combined text, and the Python
    # stage is opaque to Catalyst's column pruning — not PRODUCING the text
    # is the only way to keep it off the Arrow boundary (r6, guide §4.1),
    # and it also skips the per-segment concat work entirely
    return fused_sink_counts(
        segment(df.select(*cfg.scan_columns(df.columns)), cfg, emit_text=False)
    )


def write_sinks(routed: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Fan-out write: one partition directory per sink (downstream readers
    consume a single sink via partition pruning)."""
    routed.write.mode(mode).partitionBy("sink").parquet(path)

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


def write_sinks(routed: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Fan-out write: one partition directory per sink (downstream readers
    consume a single sink via partition pruning)."""
    routed.write.mode(mode).partitionBy("sink").parquet(path)

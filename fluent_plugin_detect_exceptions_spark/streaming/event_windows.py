"""Watermarked tumbling-window aggregation over a stream of events — the
built-in-operator streaming path (vs stream_pipeline.py's custom stateful
operator): ``readStream → withWatermark → groupBy(window(...)) → agg``.

Late data handling is Spark's own: rows later than the watermark delay are
dropped from their (closed) window; windows finalize and emit (append mode)
once the watermark passes window.end.  This is the streaming twin of the
batch ``events_window_agg`` gate query — the batch aggregation restricted to
closed windows equals the stream's append-mode output on the same rows
(asserted in test_streaming.test_event_window_stream_equals_batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def event_window_counts(
    stream_df: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming per-(window, event_type) counts and integerized value sums.

    Output (append mode): w_start (epoch seconds), event_type, n, sum_cents.
    State is bounded by the watermark: closed windows are evicted once the
    watermark passes, so state size is O(open windows × types) regardless of
    stream length.
    """
    return (
        stream_df.withWatermark(ts_col, watermark)
        .withColumn("cents", F.floor(F.col("value") * 100).cast("long"))
        .groupBy(F.window(ts_col, window).alias("w"), type_col)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("sum_cents"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("w_start"),
            type_col,
            "n",
            "sum_cents",
        )
    )

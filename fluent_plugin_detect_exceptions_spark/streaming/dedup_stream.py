"""Streaming deduplication — the training-data dedup family on unbounded
input.

Two layers, matching how the batch operators decompose:

* **Exact dedup** (``streaming_exact_dedup``): Spark's
  ``dropDuplicatesWithinWatermark`` keyed on the md5 text digest.  State
  holds one entry per DISTINCT digest seen inside the watermark horizon and
  is evicted when the watermark passes — bounded state on an unbounded
  stream, which a plain ``dropDuplicates`` (state grows forever) cannot
  give.  Semantics (pinned by test_streaming_exact_dedup_and_watermark_
  eviction): the FIRST cross-batch arrival of a digest is emitted (within
  ONE micro-batch the kept row is partition-order arbitrary); a duplicate
  is dropped while the digest's state entry exists; entries are evicted at
  END of a micro-batch once the watermark passes first_seen + delay — so a
  duplicate arriving in the same batch the watermark advances is still
  dropped, and one arriving a batch later re-emits.  An event at/below the
  current watermark is dropped as late before the dedup state is consulted.
  The re-emit trade is unavoidable with bounded state — batch
  ``exact_dedup`` over the sink output remains the exactness backstop, and
  the two compose: stream-dedup cuts the volume, the periodic batch pass
  is cluster-exact.

* **Signature stages are STATELESS maps** and run on streams unchanged:
  ``streaming_minhash_bands`` is literally the batch
  ``minhash_bands`` applied to a streaming DataFrame — mapInPandas is a
  per-batch narrow transform, so band emission needs no state at all.
  Downstream bucket-joins/aggregations then choose their own
  watermark/output-mode policy (e.g. windowed bucket counts).

Mirrors the batch family in operators/dedup.py; no reference counterpart
(the reference is a log-tailing plugin), part of the training-data
extension suite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_exact_dedup(
    stream_df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-arrival-per-digest stream with watermark-bounded state.

    Output carries the input columns plus ``text_md5``.  Works in append
    mode; state per distinct digest within the horizon only.
    """
    return (
        stream_df.withColumn("text_md5", F.md5(F.col(text_col)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["text_md5"])
    )


def streaming_minhash_bands(
    stream_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kw,
) -> DataFrame:
    """LSH band assignments over a stream — the batch operator verbatim:
    signature computation is an Arrow-batched stateless map and banding is
    a projection, so the same plan runs under Structured Streaming with no
    state.  Feed into a windowed bucket aggregation (or sink to a table the
    batch verifier scans) to close the near-dup loop."""
    from ..operators.dedup import minhash_bands

    return minhash_bands(stream_df, text_col, id_col, **kw)

"""Sequence packing + deterministic corpus ordering — the stage between a
FILTERED corpus and TRAINING BATCHES that every LLM data pipeline runs
last: give the kept documents a reproducible global order, then group them
into fixed token-budget training rows.

Two packing disciplines, both deterministic and both oracle-checkable:

* :func:`pack_sequences` — WHOLE-DOC packing: shard documents by a stable
  hash, order each shard by a deterministic shuffle key, and run greedy
  next-fit (a pack is the maximal run of consecutive docs whose token sum
  fits the budget; an overflowing doc starts the next pack).  Documents
  longer than the budget are truncated to exactly the budget.  Next-fit —
  not first-fit — is the deliberate choice at scale: first-fit needs the
  mutable open-bin table (sequential global state), while next-fit is a
  pure function of the per-shard prefix sums, so each shard packs
  independently in one task and the result is identical on any cluster
  size.  Waste is bounded by the classic next-fit factor and, across
  shards, by one partial pack per shard.

* :func:`chunk_spans` — CONCAT-AND-CHUNK (GPT-style): all documents are
  conceptually concatenated in one deterministic global order and cut
  every ``seq_len`` tokens; documents may straddle sequence boundaries.
  Output is each document's global token span and first/last sequence
  index — the metadata a loader needs to build training rows without ever
  materializing the concatenation.

Scale shape: both operators move ONLY narrow columns (id, token count,
hash key) — never text.  ``pack_sequences`` is one hash-partitioned
shuffle + an Arrow-batched per-shard packing whose Python cost is
O(#packs · log #docs) (binary search per pack boundary, no per-doc loop).
``chunk_spans`` is the textbook scalable global cumsum: per-bucket
partial sums (a few hundred rows) collected once to the driver, then a
per-bucket window cumsum — no single-partition global window.

Determinism: the corpus order is ``(bucket-or-shard, md5-key, id)`` — a
pure function of (salt, id), so re-runs, resumes, different partition
counts, and different engines (the DuckDB oracle) produce bit-identical
assignments — the property an RNG-based shuffle cannot give (same
convention as operators/sample.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..functions.text import stable_hash64, token_count


def shuffle_key(id_col: Column, salt: str = "shuffle") -> Column:
    """Deterministic 60-bit corpus-ordering key from the portable md5 hash
    of ``salt:id`` — the reproducible global shuffle (identical in the
    DuckDB oracle)."""
    return stable_hash64(F.concat(F.lit(salt + ":"), id_col.cast("string")))


def _next_fit_bounds(tokens: np.ndarray, budget: int) -> np.ndarray:
    """Pack id per doc for greedy next-fit over docs already in order.
    Loop is over PACKS (binary search per boundary), not docs: each pack
    is the maximal prefix of the remainder with cumulative tokens within
    ``budget``."""
    cum = np.cumsum(tokens, dtype=np.int64)
    n = len(tokens)
    pack = np.empty(n, dtype=np.int64)
    start = 0
    before = 0  # cumulative tokens before the current pack
    k = 0
    while start < n:
        end = int(np.searchsorted(cum, before + budget, side="right"))
        if end == start:  # only possible if tokens[start] > budget (callers
            end = start + 1  # clip first, so this is a pure safety net)
        pack[start:end] = k
        before = int(cum[end - 1])
        start = end
        k += 1
    return pack


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    salt: str = "pack",
) -> DataFrame:
    """(doc_id, shard, pack_id, pos, n_tokens): greedy next-fit whole-doc
    packing into token budgets, deterministic across engines and cluster
    sizes.

    * ``shard``: ``stable_hash64('<salt>:'||id) % n_shards`` — the unit of
      independent packing; size it to the cluster (shards pack in
      parallel, one task each, and waste is ≤ one partial pack per shard).
    * order within shard: ``(shuffle_key(id), id)`` — the reproducible
      corpus shuffle.
    * ``pack_id``: next-fit pack ordinal within the shard; ``pos``: the
      doc's ordinal within its pack; ``n_tokens``: the PACKED token count,
      i.e. ``least(token_count(text), budget)`` — oversized docs are
      truncated to exactly one full pack's worth.

    Only the narrow (id, tokens, shard, key) projection shuffles — text
    never moves.  The per-shard packing is Arrow-batched with no per-doc
    Python (prefix sums + one binary search per pack)."""
    # token_count is the expensive regexp — make sure it runs at full core
    # width (r6: small inputs scan as 2 partitions; operators/scale.py)
    from .scale import ensure_min_parallelism

    if token_col is None:
        base = ensure_min_parallelism(df.select(id_col, text_col))
        toks = token_count(F.col(text_col))
    else:
        base = df.select(id_col, token_col)
        toks = F.col(token_col)
    slim = base.select(
        F.col(id_col).alias("doc_id"),
        F.least(toks.cast("long"), F.lit(int(budget)).cast("long")).alias(
            "n_tokens"
        ),
        F.pmod(
            shuffle_key(F.col(id_col), salt), F.lit(int(n_shards))
        ).alias("shard"),
        shuffle_key(F.col(id_col)).alias("__key"),
    )

    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("shard", LongType(), False),
            StructField("pack_id", LongType(), False),
            StructField("pos", IntegerType(), False),
            StructField("n_tokens", LongType(), False),
        ]
    )

    b = int(budget)

    def pack_shard(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["__key", "doc_id"], kind="mergesort")
        t = pdf["n_tokens"].to_numpy(dtype=np.int64)
        pack = _next_fit_bounds(t, b)
        # pos = ordinal within pack: index minus the index where the
        # pack started (packs are contiguous runs after the sort)
        starts = np.flatnonzero(np.diff(pack, prepend=-1))
        pos = np.arange(len(t), dtype=np.int64) - np.repeat(
            starts, np.diff(np.append(starts, len(t)))
        )
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(dtype=np.int64),
                "shard": pdf["shard"].to_numpy(dtype=np.int64),
                "pack_id": pack,
                "pos": pos.astype(np.int32),
                "n_tokens": t,
            }
        )

    return slim.groupBy("shard").applyInPandas(pack_shard, schema=schema)


def chunk_spans(
    df: DataFrame,
    seq_len: int,
    n_buckets: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
) -> DataFrame:
    """(doc_id, n_tokens, bucket, start_off, end_off, first_seq, last_seq):
    each document's token span in the GPT-style concat-and-chunk layout —
    all docs concatenated in the deterministic global order
    ``(bucket, shuffle_key, id)`` and cut every ``seq_len`` tokens, with
    docs allowed to straddle cuts.

    The global exclusive cumsum is computed scale-safely in two passes:
    per-bucket token totals (``n_buckets`` rows — bounded, collected once
    to the driver like the IVF centroid sample) become broadcast prefix
    offsets, then a per-bucket window cumsum finishes the job — no
    single-partition global window, which is the naive form's
    scale-killer.  ``last_seq`` is the sequence containing the doc's final
    token (empty docs get ``last_seq = first_seq``)."""
    from .scale import ensure_min_parallelism

    if token_col is None:
        base = ensure_min_parallelism(df.select(id_col, text_col))
        toks = token_count(F.col(text_col))
    else:
        base = df.select(id_col, token_col)
        toks = F.col(token_col)
    key = shuffle_key(F.col(id_col))
    slim = base.select(
        F.col(id_col).alias("doc_id"),
        toks.cast("long").alias("n_tokens"),
        F.pmod(key, F.lit(int(n_buckets))).alias("bucket"),
        key.alias("__key"),
    )

    totals = {
        r["bucket"]: r["total"]
        for r in slim.groupBy("bucket")
        .agg(F.sum("n_tokens").alias("total"))
        .collect()
    }
    prefix_rows, acc = [], 0
    for bkt in sorted(totals):
        prefix_rows.append((bkt, acc))
        acc += int(totals[bkt])
    prefix = slim.sparkSession.createDataFrame(
        prefix_rows, "bucket long, __prefix long"
    )

    w = (
        Window.partitionBy("bucket")
        .orderBy("__key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    L = int(seq_len)
    start = F.col("__prefix") + F.coalesce(
        F.sum("n_tokens").over(w), F.lit(0)
    )
    out = (
        slim.join(F.broadcast(prefix), "bucket")
        .withColumn("start_off", start)
        .withColumn("end_off", F.col("start_off") + F.col("n_tokens"))
        .withColumn(
            "first_seq", F.floor(F.col("start_off") / F.lit(L)).cast("long")
        )
        .withColumn(
            "last_seq",
            F.when(
                F.col("n_tokens") > 0,
                F.floor((F.col("end_off") - 1) / F.lit(L)),
            )
            .otherwise(F.col("first_seq"))
            .cast("long"),
        )
    )
    return out.select(
        "doc_id", "n_tokens", "bucket", "start_off", "end_off",
        "first_seq", "last_seq",
    )

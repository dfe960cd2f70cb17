"""Stage-isolated benchmarks (guide §1.4): noop-sink timings for the pieces
inside each headline query, so optimization targets the stage that actually
costs, not the query total.  NOT the graded bench — bench.py is frozen; this
file exists so OPTIMIZATION_r06.md can cite per-stage evidence.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 SPARK_GRAFT_CPUS=32 \
      python bench_extra.py [stage ...]
Stages default to all.  Prints one JSON line: {"stages": {name: best_sec}}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import build_spark  # same session config as the graded bench


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1").rstrip("/")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    only = set(sys.argv[1:])

    from pyspark.sql import functions as F

    from fluent_plugin_detect_exceptions_spark.config import PipelineConfig
    from fluent_plugin_detect_exceptions_spark.functions.pii import pii_scrub
    from fluent_plugin_detect_exceptions_spark.operators.coalesce import (
        coalesce_partials,
    )
    from fluent_plugin_detect_exceptions_spark.operators.dedup import (
        lsh_candidate_buckets,
        minhash_bands,
        minhash_signatures_df,
    )
    from fluent_plugin_detect_exceptions_spark.operators.pack import pack_sequences
    from fluent_plugin_detect_exceptions_spark.operators.route import (
        detect_sink_counts,
        sink_counts,
    )
    from fluent_plugin_detect_exceptions_spark.operators.segmenter import (
        find_fallback_convs,
        segment,
    )
    from fluent_plugin_detect_exceptions_spark.operators.similarity import cosine_topk
    from fluent_plugin_detect_exceptions_spark.plans.pipeline import detect_exceptions
    from fluent_plugin_detect_exceptions_spark.rules import compile_rules
    from fluent_plugin_detect_exceptions_spark.sources.transcripts import (
        skewed_tail,
        synth_transcripts,
    )

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        sf = float(sf_dir.rsplit("sf", 1)[-1])
    except ValueError:
        sf = 0.1

    # same transcripts materialization as bench.py
    scale = float(os.environ.get("SPARK_GRAFT_BENCH_SCALE", "1"))
    n_convs = max(200, int(sf * scale * 120_000))
    skew_convs = max(2, int(sf * scale * 40))
    tmp = tempfile.mkdtemp(prefix="benchx_transcripts_")
    tpath = f"{tmp}/transcripts.parquet"
    base = synth_transcripts(spark, n_convs, repeats=2)
    tail = skewed_tail(spark, skew_convs, 50_000)
    (
        base.unionByName(tail)
        .repartition(max(8, 2 * cpus), "conv_id")
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.mode("overwrite")
        .parquet(tpath)
    )
    transcripts = spark.read.parquet(tpath)

    # worker warm-up (mirrors bench.py)
    def _warm(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        from fluent_plugin_detect_exceptions_spark.functions import classify  # noqa: F401

        for b in batches:
            yield b

    spark.range(cpus * 8).repartition(cpus * 4).mapInPandas(_warm, schema="id long").count()

    cfg = PipelineConfig(
        remove_tag_prefix="conv", chunk_size=16_384, warmup=2_048,
        assume_long_convs=True, assume_dense_turns=True,
    )
    rules = compile_rules(cfg.languages)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    timings = {}

    def timed(name, fn):
        if only and name not in only:
            return
        best = None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"benchx:{name}")
            t = time.perf_counter()
            fn()
            dt = time.perf_counter() - t
            best = dt if best is None else min(best, dt)
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)

    msg = cfg.resolve_message_field(transcripts.columns)

    # --- exception pipeline pieces -----------------------------------------
    timed("prepass_only", lambda: find_fallback_convs(transcripts, cfg, rules, msg))
    scan_in = transcripts.select(*cfg.scan_columns(transcripts.columns))

    # JVM-only: chunk explode + the grouping exchange, no Python stage
    from fluent_plugin_detect_exceptions_spark.operators.segmenter import (
        _with_chunks,
    )

    timed(
        "chunked_shuffle_noop",
        lambda: noop(
            _with_chunks(scan_in, cfg, []).repartition("conv_id", "chunk_id")
        ),
    )

    # + Arrow round-trip through an identity Python stage (same schema)
    def arrow_identity():
        chunked = _with_chunks(scan_in, cfg, [])
        part = chunked.repartition("conv_id", "chunk_id")

        def ident(batches):
            yield from batches

        noop(part.mapInArrow(ident, schema=part.schema))

    timed("arrow_identity_noop", arrow_identity)
    timed("scan_stage_noop", lambda: noop(segment(scan_in, cfg, rules)))
    timed(
        "coalesce_noop",
        lambda: noop(coalesce_partials(segment(transcripts, cfg, rules), cfg, msg)),
    )
    timed("routed_full_noop", lambda: noop(detect_exceptions(transcripts, cfg)))
    timed(
        "pipeline_counts_collect",
        lambda: sink_counts(detect_exceptions(transcripts, cfg)).collect(),
    )
    timed("sink_counts_fast", lambda: detect_sink_counts(transcripts, cfg).collect())

    # --- minhash pieces ----------------------------------------------------
    timed("minhash_sigs_noop", lambda: noop(minhash_signatures_df(docs)))
    timed("minhash_bands_noop", lambda: noop(minhash_bands(docs)))
    timed("minhash_lsh_count", lambda: lsh_candidate_buckets(docs).count())

    # --- pack pieces -------------------------------------------------------
    from fluent_plugin_detect_exceptions_spark.functions.text import token_count
    from fluent_plugin_detect_exceptions_spark.operators.pack import shuffle_key

    def pack_slim():
        noop(
            docs.select(
                "doc_id",
                F.least(token_count(F.col("text")), F.lit(1024)).alias("n_tokens"),
                F.pmod(shuffle_key(F.col("doc_id"), "pack"), F.lit(cpus)).alias("shard"),
                shuffle_key(F.col("doc_id")).alias("__key"),
            )
        )

    timed("pack_slim_noop", pack_slim)
    timed("pack_full_count", lambda: pack_sequences(docs, budget=1024, n_shards=cpus).count())

    # --- small queries -----------------------------------------------------
    timed("dedup_exact", lambda: docs.groupBy(F.md5("text")).count().count())
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    timed("embedding_topk", lambda: cosine_topk(emb, qv, 10).collect())
    timed("pii_scrub", lambda: pii_scrub(docs).count())

    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"sf": sf, "cpus": cpus, "stages": timings}))


if __name__ == "__main__":
    main()

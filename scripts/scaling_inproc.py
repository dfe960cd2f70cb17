"""In-process two-cluster-size scaling evidence (north rule).

Methodology: ONE warm Spark JVM, one materialized input, identical physical
plan; between measurements the whole process tree (JVM task threads, Python
daemon and workers) is re-pinned with sched_setaffinity to N or 4N cores.
This isolates the variable the north rule cares about — compute parallelism —
from JVM startup, JIT warm-up, Python worker spawn and page-cache state,
which a subprocess-per-level harness conflates with cluster size (and which
this sandbox's noisy co-tenancy amplifies to 2-4x swings).

Levels are interleaved (N, 4N, N, 4N, ...) so slow drift affects both
equally; the best rep per level is reported alongside all reps.

Usage: python scripts/scaling_inproc.py [N] [scale] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


def pin_tree(cpus: set[int]) -> int:
    """Set affinity of every thread of this process and all descendants."""
    pids = [os.getpid()]
    seen = set()
    count = 0
    while pids:
        pid = pids.pop()
        if pid in seen:
            continue
        seen.add(pid)
        try:
            for tid in os.listdir(f"/proc/{pid}/task"):
                try:
                    os.sched_setaffinity(int(tid), cpus)
                    count += 1
                except OSError:
                    pass
                try:
                    with open(f"/proc/{pid}/task/{tid}/children") as f:
                        pids.extend(int(c) for c in f.read().split())
                except OSError:
                    pass
        except OSError:
            continue
    return count


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    scale = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    n4 = 4 * n

    from pyspark.sql import SparkSession, functions as F

    from fluent_plugin_detect_exceptions_spark.config import PipelineConfig
    from fluent_plugin_detect_exceptions_spark.operators.route import sink_counts
    from fluent_plugin_detect_exceptions_spark.plans.pipeline import detect_exceptions
    from fluent_plugin_detect_exceptions_spark.sources.transcripts import (
        skewed_tail,
        synth_transcripts,
    )

    spark = (
        SparkSession.builder.master(f"local[{n4}]")
        .appName("scaling-inproc")
        # partitions = width, 256k Arrow batches: the r4 knob sweep (see
        # bench.build_spark) — constant across both pin levels, so the
        # efficiency ratio stays apples-to-apples
        .config("spark.sql.shuffle.partitions", str(n4))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "262144")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "64m")
        # tmpfs shuffle dirs: on one box the single disk is a *shared*
        # resource that saturates at high core counts — a cluster has
        # per-node disks, so RAM-backed shuffle is the honest per-node analogue
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        .config("spark.sql.warehouse.dir", "/dev/shm/spark-warehouse")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_convs = max(200, int(0.1 * scale * 120_000))
    skew_convs = max(2, int(0.1 * scale * 40))
    tmp = tempfile.mkdtemp(prefix="scaling_inproc_")
    (
        synth_transcripts(spark, n_convs, repeats=2)
        .unionByName(skewed_tail(spark, skew_convs, 50_000))
        .repartition(64, "conv_id")
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.mode("overwrite")
        .parquet(f"{tmp}/t.parquet")
    )
    transcripts = spark.read.parquet(f"{tmp}/t.parquet")
    n_turns = transcripts.count()
    # dense synthetic turns -> occupancy pre-pass provably unnecessary
    cfg = PipelineConfig(remove_tag_prefix="conv", chunk_size=16_384, warmup=2_048,
                     assume_long_convs=True, assume_dense_turns=True)
    # production layout: conv-bucketed table, shuffle #1 elided
    spark.sql("DROP TABLE IF EXISTS scaling_bucketed")
    (transcripts.write.mode("overwrite").format("parquet")
     .option("path", f"{tmp}/bucketed")
     .bucketBy(64, "conv_id").sortBy("conv_id", "turn_idx")
     .saveAsTable("scaling_bucketed"))
    bucketed = spark.table("scaling_bucketed")
    cfg_b = PipelineConfig(remove_tag_prefix="conv", chunk_size=16_384, warmup=2_048,
                           assume_long_convs=True, assume_dense_turns=True,
                           input_clustered=True)

    def run_counts(df_in, c) -> float:
        # counts derived from the FULL routed plan (detect_with_counts'
        # counts leg now takes the 2-exchange fast path — the scaling study
        # must keep measuring the whole pipeline, same as bench's headline)
        t0 = time.perf_counter()
        sink_counts(detect_exceptions(df_in, c)).collect()
        return time.perf_counter() - t0

    def pipeline_once() -> float:
        return run_counts(transcripts, cfg)

    def pipeline_clustered() -> float:
        return run_counts(bucketed, cfg_b)

    # warm both the JVM and the python workers at full width
    pin_tree(set(range(n4)))
    pipeline_once()

    results: dict[int, list[float]] = {n: [], n4: []}
    results_c: dict[int, list[float]] = {n: [], n4: []}
    pipeline_clustered()  # warm the bucketed-scan path too
    for _ in range(reps):
        for level in (n, n4):
            pin_tree(set(range(level)))
            # re-pin shortly after start too: the python daemon forks new
            # workers lazily and forks inherit affinity from the daemon,
            # which pin_tree already covered — but belt and braces
            results[level].append(pipeline_once())
            results_c[level].append(pipeline_clustered())
    pin_tree(set(range(os.cpu_count() or n4)))

    sec_n, sec_4n = min(results[n]), min(results[n4])
    tp_n, tp_4n = n_turns / sec_n, n_turns / sec_4n
    sec_cn, sec_c4n = min(results_c[n]), min(results_c[n4])
    out = {
        "method": "in-process repin (sched_setaffinity over the JVM+python tree)",
        "turns": n_turns,
        "n_cores": n,
        "sec_n": round(sec_n, 2),
        "tp_n": round(tp_n, 1),
        "all_n": [round(x, 2) for x in results[n]],
        "n4_cores": n4,
        "sec_4n": round(sec_4n, 2),
        "tp_4n": round(tp_4n, 1),
        "all_4n": [round(x, 2) for x in results[n4]],
        "scaling_efficiency": round(tp_4n / (4 * tp_n), 3),
        "clustered": {
            "sec_n": round(sec_cn, 2),
            "sec_4n": round(sec_c4n, 2),
            "tp_n": round(n_turns / sec_cn, 1),
            "tp_4n": round(n_turns / sec_c4n, 1),
            "all_n": [round(x, 2) for x in results_c[n]],
            "all_4n": [round(x, 2) for x in results_c[n4]],
            "scaling_efficiency": round((n_turns / sec_c4n) / (4 * n_turns / sec_cn), 3),
        },
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""Transcripts source (SURVEY O1).

Two entry points:

* ``read_transcripts``: Iceberg table (``catalog.db.table``) when an Iceberg
  catalog is configured, else a parquet path — the batch scan Catalyst
  prunes/pushes down into;
* ``synth_transcripts``: the deterministic synthetic generator mandated by
  BASELINE.json's input_hint — conversations composed from the reference's
  exception fixtures, built from ``spark.range`` with **zero external data**
  and no randomness, so the identical table is reproducible in any engine
  (the DuckDB correctness oracle re-derives it from the same literals).

Row mapping per FIXTURES.md §1: each fixture line is one turn and ``text``
retains its trailing newline; ``ts = BASE_EPOCH + turn_idx`` seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import fixtures as fx

BASE_EPOCH = 1_767_225_600  # 2026-01-01T00:00:00Z

#: Scenario library: conversation shapes covering every language family,
#: pass-through noise, and back-to-back traces (FIXTURES.md §3).
SCENARIOS: tuple[tuple[str, ...], ...] = (
    (fx.ARBITRARY_TEXT, fx.JAVA_EXC, fx.ARBITRARY_TEXT),
    (fx.PYTHON_EXC, fx.ARBITRARY_TEXT, fx.GO_EXC),
    (fx.PHP_ON_GAE_EXC, fx.RUBY_EXC, fx.ARBITRARY_TEXT),
    (fx.DART_ERR, fx.ARBITRARY_TEXT, fx.CSHARP_ASYNC_EXC),
    (fx.NESTED_JAVA_EXC, fx.NODE_JS_EXC),
    (fx.GO_HTTP, fx.RAILS_EXC),
    (fx.V8_JS_EXC, fx.PLUGIN_PYTHON_EXC, fx.PHP_EXC),
    (fx.ARBITRARY_TEXT, fx.ARBITRARY_TEXT),
    (fx.JAVA_EXC, fx.JAVA_EXC, fx.PYTHON_EXC),
    (fx.CLIENT_JS_EXC, fx.GO_SIGNAL_EXC, fx.DART_TYPE_ERR),
)

N_SCENARIOS = len(SCENARIOS)


def scenario_lines(repeats: int = 1) -> list[tuple[int, int, str]]:
    """(scenario_id, turn_idx, text) rows — the literal seed table."""
    rows = []
    for sid, blocks in enumerate(SCENARIOS):
        turn = 0
        for _ in range(repeats):
            for block in blocks:
                for line in fx.lines(block):
                    rows.append((sid, turn, line))
                    turn += 1
    return rows


def conv_id_expr(c, width: int = 6):
    return F.format_string(f"conv.%0{width}d", c)


def synth_transcripts(spark: SparkSession, n_convs: int, repeats: int = 1) -> DataFrame:
    """Deterministic transcripts table with the input_hint schema
    (conv_id string, turn_idx int, role string, text string, tool string,
    ts timestamp).  Conversation ``c`` plays scenario ``c % N_SCENARIOS``."""
    rows = scenario_lines(repeats)
    lines_df = spark.createDataFrame(rows, "scn int, turn_idx int, text string")
    convs = spark.range(n_convs).select(F.col("id").alias("c"))
    return (
        convs.join(F.broadcast(lines_df), F.col("scn") == (F.col("c") % N_SCENARIOS))
        .select(
            conv_id_expr(F.col("c")).alias("conv_id"),
            F.col("turn_idx").cast("int").alias("turn_idx"),
            F.when(F.col("turn_idx") % 2 == 0, F.lit("user"))
            .otherwise(F.lit("assistant"))
            .alias("role"),
            F.col("text"),
            F.concat(F.lit("tool"), (F.col("turn_idx") % 3).cast("string")).alias("tool"),
            F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("turn_idx")).alias("ts"),
        )
    )


def local_rows(n_convs: int, repeats: int = 1) -> list[dict]:
    """Same rows as ``synth_transcripts`` built locally (for the oracle)."""
    lines = scenario_lines(repeats)
    out = []
    for c in range(n_convs):
        sid = c % N_SCENARIOS
        for scn, turn, text in lines:
            if scn != sid:
                continue
            out.append(
                {
                    "conv_id": f"conv.{c:06d}",
                    "turn_idx": turn,
                    "role": "user" if turn % 2 == 0 else "assistant",
                    "text": text,
                    "tool": f"tool{turn % 3}",
                    "ts": BASE_EPOCH + turn,
                }
            )
    return out


def skewed_tail(spark: SparkSession, n_convs: int, turns_per_conv: int) -> DataFrame:
    """Skew-tail conversations (FIXTURES.md §4): very long conversations of
    repeated Java traces (mirroring bench_exception_detector.rb:50-53) with a
    plain line between repetitions so chunk scans can synchronize."""
    block = fx.lines(fx.JAVA_EXC) + ["no trace here\n"]
    lines_df = spark.createDataFrame(
        [(i, line) for i, line in enumerate(block)], "off int, text string"
    )
    n = len(block)
    return (
        spark.range(n_convs)
        .select(F.col("id").alias("c"))
        .join(spark.range(turns_per_conv).select(F.col("id").alias("t")))
        .join(F.broadcast(lines_df), F.col("off") == (F.col("t") % n))
        .select(
            F.format_string("skew.%04d", F.col("c")).alias("conv_id"),
            F.col("t").cast("int").alias("turn_idx"),
            F.lit("assistant").alias("role"),
            F.col("text"),
            F.lit("tool0").alias("tool"),
            F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("t")).alias("ts"),
        )
    )


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the session's classpath.
    (This sandbox ships without the jar; clusters add
    ``--packages org.apache.iceberg:iceberg-spark-runtime-...``.)"""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def configure_hadoop_catalog(spark: SparkSession, name: str, warehouse: str) -> None:
    """Register an Iceberg hadoop catalog on the live session, with
    storage-partitioned join/read settings so a table bucketed by conv_id is
    scanned one bucket per task WITHOUT a repartition exchange before the
    segmentation stage (SPJ; deletes shuffle #1 of the pipeline)."""
    spark.conf.set(f"spark.sql.catalog.{name}", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set(f"spark.sql.catalog.{name}.type", "hadoop")
    spark.conf.set(f"spark.sql.catalog.{name}.warehouse", warehouse)
    # storage-partitioned reads: let the v2 scan report its bucket(N, conv_id)
    # distribution so the grouping exchange is elided when keys line up
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForDistribution", "false")


def read_transcripts(spark: SparkSession, source: str) -> DataFrame:
    """Iceberg table name (dotted, no slash — read through the configured
    catalog so partition/file pruning and SPJ metadata survive) or parquet
    path/glob."""
    if "/" in source or source.endswith(".parquet"):
        return spark.read.parquet(source)
    return spark.read.table(source)

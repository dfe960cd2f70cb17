"""End-to-end Spark pipeline vs the pure-Python oracle on deterministic
synthetic transcripts — routed-row equality (per-turn text equality under
stable (conv_id, first_turn_idx) ordering) and per-sink aggregate counts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from fluent_plugin_detect_exceptions_spark import fixtures as fx
from fluent_plugin_detect_exceptions_spark.config import PipelineConfig
from fluent_plugin_detect_exceptions_spark.oracle import Accumulator
from fluent_plugin_detect_exceptions_spark.plans.pipeline import (
    detect_exceptions,
    detect_with_counts,
)
from fluent_plugin_detect_exceptions_spark.sources.transcripts import (
    BASE_EPOCH,
    local_rows,
    synth_transcripts,
)


def oracle_routed(rows_by_key, cfg: PipelineConfig):
    """Run the oracle accumulator per logical stream; return the comparable
    row set."""
    out = []
    for _, rows in rows_by_key.items():
        acc = Accumulator(
            "text",
            cfg.languages,
            force_line_breaks=cfg.force_line_breaks,
            max_lines=cfg.max_lines,
            max_bytes=cfg.max_bytes,
            flush_interval=cfg.multiline_flush_interval,
        )
        for r in sorted(rows, key=lambda x: x["turn_idx"]):
            acc.push(r["ts"], dict(r))
        acc.force_flush()
        for e in acc.out:
            rec = e.record
            out.append(
                (
                    rec["conv_id"],
                    rec["turn_idx"],
                    rec["role"],
                    rec["tool"],
                    e.ts,
                    rec["text"],
                    e.lang,
                    e.n_lines,
                )
            )
    return sorted(out)


def group_rows(rows, cfg: PipelineConfig):
    by_key = {}
    for r in rows:
        key = (r["conv_id"], r[cfg.stream]) if cfg.stream else r["conv_id"]
        by_key.setdefault(key, []).append(r)
    return by_key


def spark_routed(df, cfg: PipelineConfig):
    routed = detect_exceptions(df, cfg)
    assert routed.filter(~F.col("sync_ok")).count() == 0
    got = routed.select(
        "conv_id",
        "first_turn_idx",
        "role",
        "tool",
        F.unix_timestamp("ts").alias("ts"),
        "text",
        "lang",
        "n_lines",
    ).collect()
    return sorted(tuple(r) for r in got)


def assert_pipeline_matches(spark, cfg, n_convs=20, repeats=1):
    df = synth_transcripts(spark, n_convs, repeats)
    rows = local_rows(n_convs, repeats)
    assert spark_routed(df, cfg) == oracle_routed(group_rows(rows, cfg), cfg)


def test_flagship_default_config(spark):
    assert_pipeline_matches(spark, PipelineConfig(), n_convs=20, repeats=2)


def test_chunked_equals_unchunked(spark):
    df = synth_transcripts(spark, 12, repeats=3)
    base = spark_routed(df, PipelineConfig(chunk_size=0))
    for chunk_size, warmup in ((64, 16), (32, 8), (128, 64)):
        cfg = PipelineConfig(chunk_size=chunk_size, warmup=warmup)
        assert spark_routed(df, cfg) == base, (chunk_size, warmup)
    # latency knobs: skipping the max-turn gate and replaying a previously
    # discovered fallback list (manifest scenario) must not change results
    from fluent_plugin_detect_exceptions_spark.operators.segmenter import (
        find_fallback_convs,
    )
    from fluent_plugin_detect_exceptions_spark.rules import compile_rules

    probe = PipelineConfig(chunk_size=64, warmup=16)
    fallback = find_fallback_convs(df, probe, compile_rules(probe.languages), "text")
    cfg = PipelineConfig(
        chunk_size=64, warmup=16, assume_long_convs=True,
        known_fallback_convs=tuple(fallback),
    )
    assert spark_routed(df, cfg) == base
    rows = local_rows(12, 3)
    cfg = PipelineConfig()
    assert base == oracle_routed(group_rows(rows, cfg), cfg)


@pytest.mark.parametrize("languages", [("java",), ("python", "go"), ("ruby",)])
def test_language_subsets(spark, languages):
    assert_pipeline_matches(spark, PipelineConfig(languages=languages), n_convs=10)


def test_max_lines(spark):
    assert_pipeline_matches(spark, PipelineConfig(max_lines=2), n_convs=10)
    assert_pipeline_matches(spark, PipelineConfig(max_lines=3, chunk_size=32, warmup=16), n_convs=10)


def test_max_bytes(spark):
    assert_pipeline_matches(spark, PipelineConfig(max_bytes=len(fx.JAVA_EXC_PART1)), n_convs=10)


def test_force_line_breaks(spark):
    # feed without trailing newlines; force_line_breaks reconstructs them
    rows = [
        {
            "conv_id": "c0",
            "turn_idx": i,
            "role": "user",
            "text": line.rstrip("\n"),
            "tool": "t",
            "ts": BASE_EPOCH + i,
        }
        for i, line in enumerate(fx.lines(fx.PLUGIN_JAVA_EXC))
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.timestamp_seconds("ts"))
    cfg = PipelineConfig(force_line_breaks=True)
    got = spark_routed(df, cfg)
    assert got == oracle_routed(group_rows(rows, cfg), cfg)
    assert got[0][5] == fx.PLUGIN_JAVA_EXC.rstrip("\n")


def test_timeout_gap_split(spark):
    lines = fx.lines(fx.PLUGIN_JAVA_EXC) + ["  at x\n", "  at y\n"]
    ts = [BASE_EPOCH + i for i in range(5)] + [BASE_EPOCH + 20, BASE_EPOCH + 21]
    rows = [
        {"conv_id": "c0", "turn_idx": i, "role": "user", "text": line, "tool": "t", "ts": ts[i]}
        for i, line in enumerate(lines)
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.timestamp_seconds("ts"))
    cfg = PipelineConfig(multiline_flush_interval=1)
    got = spark_routed(df, cfg)
    assert got == oracle_routed(group_rows(rows, cfg), cfg)
    assert len(got) == 3  # JAVA_EXC combined + two singles
    nosplit = spark_routed(df, PipelineConfig())
    assert len(nosplit) == 1


def test_separate_streams(spark):
    # interleaved java/python streams demuxed by the tool column
    # (test_out_detect_exceptions.rb:328-351)
    ja, py = fx.lines(fx.PLUGIN_JAVA_EXC), fx.lines(fx.PLUGIN_PYTHON_EXC)
    seq = (
        [("java", ja[0])]
        + [("python", line) for line in py[0:2]]
        + [("java", line) for line in ja[1:]]
        + [("java", line) for line in ja]
        + [("python", line) for line in py[2:]]
        + [("java", "something else")]
    )
    rows = [
        {"conv_id": "c0", "turn_idx": i, "role": "user", "text": line, "tool": stream,
         "ts": BASE_EPOCH + i}
        for i, (stream, line) in enumerate(seq)
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.timestamp_seconds("ts"))
    cfg = PipelineConfig(stream="tool")
    got = spark_routed(df, cfg)
    assert got == oracle_routed(group_rows(rows, cfg), cfg)
    texts = [g[5] for g in got]
    assert texts.count(fx.PLUGIN_JAVA_EXC) == 2
    assert fx.PLUGIN_PYTHON_EXC in texts


def test_separate_streams_chunked_equals_unchunked(spark):
    """Salted chunking with a stream column (VERDICT r1 #5): a long
    dual-stream conversation must chunk-scan per (conv, stream, chunk) and
    match both the unchunked plan and the oracle — previously a streamed
    conversation disabled chunking entirely and serialized into one task."""
    ja, py = fx.lines(fx.PLUGIN_JAVA_EXC), fx.lines(fx.PLUGIN_PYTHON_EXC)
    cyc0 = ja + ["no exception t0\n"]
    cyc1 = py + ["plain line t1\n", "another plain t1\n"]
    rows = []
    for i in range(600):
        if i % 2 == 0:
            stream, line = "t0", cyc0[(i // 2) % len(cyc0)]
        else:
            stream, line = "t1", cyc1[(i // 2) % len(cyc1)]
        rows.append(
            {"conv_id": "c0", "turn_idx": i, "role": "user", "text": line,
             "tool": stream, "ts": BASE_EPOCH + i}
        )
    df = spark.createDataFrame(rows).withColumn("ts", F.timestamp_seconds("ts"))
    chunked = PipelineConfig(stream="tool", chunk_size=64, warmup=16)
    unchunked = PipelineConfig(stream="tool", chunk_size=0)
    got = spark_routed(df, chunked)
    assert got == spark_routed(df, unchunked)
    assert got == oracle_routed(group_rows(rows, chunked), chunked)
    texts = [g[5] for g in got]
    assert fx.PLUGIN_JAVA_EXC in texts and fx.PLUGIN_PYTHON_EXC in texts


def test_sink_counts_and_tag_rewrite(spark):
    df = synth_transcripts(spark, 10, repeats=1)
    cfg = PipelineConfig(remove_tag_prefix="conv")
    routed, counts = detect_with_counts(df, cfg)
    routed = routed.cache()
    tags = routed.select("out_tag").distinct().collect()
    assert all("." not in t["out_tag"] and not t["out_tag"].startswith("conv") for t in tags)
    cnt = {r["sink"]: r["n"] for r in counts.collect()}
    # scenario library guarantees all families appear across 10 convs
    rows = local_rows(10, 1)
    want = {}
    for (_, _, _, _, _, _, lang, _n) in oracle_routed(group_rows(rows, cfg), cfg):
        sink = f"lang_{lang}" if lang else "passthrough"
        want[sink] = want.get(sink, 0) + 1
    assert cnt == want
    routed.unpersist()


def test_wrong_message_field_passthrough(spark):
    # configured-but-missing message field: every record passes through
    df = synth_transcripts(spark, 4, repeats=1)
    cfg = PipelineConfig(message="doesnotexist")
    routed = detect_exceptions(df, cfg)
    assert routed.count() == df.count()
    assert routed.filter(F.col("lang").isNotNull()).count() == 0


def test_field_learning(spark):
    # message='' probes DEFAULT_FIELDS then 'text' (plan-time learning)
    df = synth_transcripts(spark, 4, repeats=1)
    cfg = PipelineConfig(message="")
    rows = local_rows(4, 1)
    assert spark_routed(df, cfg) == oracle_routed(group_rows(rows, PipelineConfig()), PipelineConfig())


def test_pure_trace_conv_falls_back_and_stays_exact(spark):
    # wall-to-wall Java traces, no plain lines: no sync point exists, the
    # pre-pass must route the conversation to whole-conv processing and the
    # result must still match the oracle
    from fluent_plugin_detect_exceptions_spark.operators.segmenter import (
        find_fallback_convs,
    )
    from fluent_plugin_detect_exceptions_spark.rules import compile_rules

    lines = fx.lines(fx.JAVA_EXC) * 30
    rows = [
        {"conv_id": "pure", "turn_idx": i, "role": "u", "text": t, "tool": "t",
         "ts": BASE_EPOCH + i}
        for i, t in enumerate(lines)
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.timestamp_seconds("ts"))
    cfg = PipelineConfig(chunk_size=32, warmup=16)
    fb = find_fallback_convs(df, cfg, compile_rules(cfg.languages), "text")
    assert fb == ["pure"]
    got = spark_routed(df, cfg)
    assert got == oracle_routed(group_rows(rows, cfg), cfg)
    assert len(got) == 30  # each repeated trace start_trace-splits


def test_skew_tail_chunks_without_fallback(spark):
    # the bench skew shape (traces + a plain line) must synchronize: salted
    # chunking stays active and matches the unchunked result
    from fluent_plugin_detect_exceptions_spark.operators.segmenter import (
        find_fallback_convs,
    )
    from fluent_plugin_detect_exceptions_spark.rules import compile_rules
    from fluent_plugin_detect_exceptions_spark.sources.transcripts import skewed_tail

    df = skewed_tail(spark, 2, 400)
    cfg = PipelineConfig(chunk_size=64, warmup=32)
    fb = find_fallback_convs(df, cfg, compile_rules(cfg.languages), "text")
    assert fb == []
    assert spark_routed(df, cfg) == spark_routed(df, PipelineConfig(chunk_size=0))


def test_fused_equals_unfused_coalesce(spark):
    df = synth_transcripts(spark, 15, repeats=2)
    fused = spark_routed(df, PipelineConfig(fuse_coalesce=True, chunk_size=64, warmup=32))
    unfused = spark_routed(df, PipelineConfig(fuse_coalesce=False, chunk_size=64, warmup=32))
    assert fused == unfused
    # and with limits + force_line_breaks
    cfgf = PipelineConfig(fuse_coalesce=True, max_lines=3)
    cfgu = PipelineConfig(fuse_coalesce=False, max_lines=3)
    assert spark_routed(df, cfgf) == spark_routed(df, cfgu)


def test_input_clustered_bucketed_table_elides_shuffle(spark, tmp_path):
    """input_clustered over a conv_id-bucketed table: shuffle #1 disappears
    (no Exchange below the scan stage) and results are identical — the plain-
    parquet analogue of Iceberg SPJ."""
    import io
    from contextlib import redirect_stdout

    df = synth_transcripts(spark, 12, repeats=2)
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        (df.write.mode("overwrite").format("parquet")
           .option("path", str(tmp_path / "bt"))
           .bucketBy(4, "conv_id").sortBy("conv_id", "turn_idx")
           .saveAsTable("bucketed_transcripts"))
        tbl = spark.table("bucketed_transcripts")
        base = spark_routed(df, PipelineConfig())
        clustered_cfg = PipelineConfig(input_clustered=True)
        got = spark_routed(tbl, clustered_cfg)
        assert got == base
        plan_df = detect_exceptions(tbl, clustered_cfg)
        buf = io.StringIO()
        with redirect_stdout(buf):
            plan_df.explain("formatted")
        plan = buf.getvalue()
        # tree is printed top-down: operators BELOW MapInArrow (between it
        # and the scan) must contain no Exchange — shuffle #1 is gone
        tree = plan.split("\n\n")[0].splitlines()
        mi = next(i for i, ln in enumerate(tree) if "MapInArrow" in ln)
        below = "\n".join(tree[mi + 1 :])
        assert "Exchange" not in below, below
        assert "Scan" in below
        assert "SelectedBucketsCount" in plan or "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "true")
        spark.sql("DROP TABLE IF EXISTS bucketed_transcripts")


def test_arrow_stage_equals_pandas_stage(spark):
    """The mapInArrow fused stage (default) must be row-identical to the
    pandas fused stage across chunking, limits, FLB and gap configs."""
    df = synth_transcripts(spark, 12, repeats=2)
    for kw in (
        dict(),
        dict(chunk_size=64, warmup=16),
        dict(max_lines=3),
        dict(max_bytes=120),
        dict(force_line_breaks=True),
        dict(multiline_flush_interval=5.0),
        dict(stream="tool", chunk_size=64, warmup=16),
    ):
        a = spark_routed(df, PipelineConfig(arrow_stage=True, **kw))
        b = spark_routed(df, PipelineConfig(arrow_stage=False, **kw))
        assert a == b, kw


def test_slim_stage_equals_ride_through(spark):
    """VERDICT r2 item 7 (measured keep): dropping ride-along columns before
    the scan stage and re-joining first-row fields after coalesce must be
    row-identical to riding them through, across config shapes — including
    nil messages (pass-through records join their own turn's fields)."""
    extra = [
        {"conv_id": "niltest", "turn_idx": i, "role": "u", "tool": "t",
         "ts": BASE_EPOCH + i, "text": t}
        for i, t in enumerate(
            [fx.lines(fx.JAVA_EXC)[0], fx.lines(fx.JAVA_EXC)[1], None,
             "plain\n", None]
        )
    ]
    df = synth_transcripts(spark, 12, repeats=2).unionByName(
        spark.createDataFrame(extra).withColumn("ts", F.timestamp_seconds("ts"))
        .select(*synth_transcripts(spark, 1, 1).columns)
    )
    for kw in (
        dict(),
        dict(chunk_size=64, warmup=16),
        dict(max_lines=3),
        dict(force_line_breaks=True),
        dict(multiline_flush_interval=5.0),
        dict(stream="tool", chunk_size=64, warmup=16),
    ):
        a = spark_routed(df, PipelineConfig(slim_stage=True, **kw))
        b = spark_routed(df, PipelineConfig(slim_stage=False, **kw))
        assert a == b, kw


def test_fused_sink_counts_matches_full_path(spark):
    """The 2-exchange counts fast path (route.fused_sink_counts) must equal
    sink_counts over the full pipeline for every config shape, including
    dropped/pass-through nil messages and chunk-spanning segments."""
    from fluent_plugin_detect_exceptions_spark.operators.route import (
        detect_sink_counts,
        sink_counts,
    )

    extra = [
        {"conv_id": "niltest", "turn_idx": i, "role": "u", "tool": "t",
         "ts": BASE_EPOCH + i, "text": t}
        for i, t in enumerate(
            [fx.lines(fx.JAVA_EXC)[0], fx.lines(fx.JAVA_EXC)[1], None,
             "plain\n", None]
        )
    ]
    df = synth_transcripts(spark, 15, repeats=2).unionByName(
        spark.createDataFrame(extra).withColumn("ts", F.timestamp_seconds("ts"))
        .select(*synth_transcripts(spark, 1, 1).columns)
    )
    for kw in (
        dict(),
        dict(chunk_size=64, warmup=16),
        dict(max_lines=3),
        dict(max_bytes=120),
        dict(force_line_breaks=True),
        dict(multiline_flush_interval=5.0),
        dict(stream="tool", chunk_size=64, warmup=16),
    ):
        cfg = PipelineConfig(**kw)
        fast = {r["sink"]: r["n"] for r in detect_sink_counts(df, cfg).collect()}
        full = {
            r["sink"]: r["n"]
            for r in sink_counts(detect_exceptions(df, cfg)).collect()
        }
        assert fast == full, (kw, fast, full)


def _simple_plan(plan_df) -> str:
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        plan_df.explain(mode="simple")
    return buf.getvalue()


def test_fused_sink_counts_plan_elides_stitch_exchange(spark):
    """VERDICT r2 item 5 / ADVICE r3: the counts-only plan must NOT contain
    the segment-stitching exchange — no hash partitioning on seg_start_turn
    and no SortMergeJoin/rejoin machinery.  Asserting the specific ABSENT
    exchange (not an exact total-exchange count) so AQE re-planning or
    explain-rendering changes across Spark versions can't flake the test."""
    from fluent_plugin_detect_exceptions_spark.operators.route import (
        detect_sink_counts,
    )

    df = synth_transcripts(spark, 10, 1)
    plan = _simple_plan(detect_sink_counts(df, PipelineConfig()))
    stitch = [
        ln
        for ln in plan.splitlines()
        if "Exchange hashpartitioning" in ln and "seg_start_turn" in ln
    ]
    assert not stitch, plan
    assert "SortMergeJoin" not in plan, plan


def test_detect_with_counts_counts_leg_is_fast_path(spark):
    """VERDICT r3 item 6: detect_with_counts' counts leg uses the fused
    fast path even when slim_stage is on — no seg_start_turn exchange, no
    ride-table rejoin — while the routed leg still carries the full plan,
    and the two legs agree."""
    from fluent_plugin_detect_exceptions_spark.operators.route import sink_counts

    df = synth_transcripts(spark, 12, 1)
    cfg = PipelineConfig(slim_stage=True)
    routed, counts = detect_with_counts(df, cfg)
    cplan = _simple_plan(counts)
    stitch = [
        ln
        for ln in cplan.splitlines()
        if "Exchange hashpartitioning" in ln and "seg_start_turn" in ln
    ]
    assert not stitch, cplan
    assert "first_turn_idx" not in cplan, cplan  # no slim rejoin on counts
    fast = {r["sink"]: r["n"] for r in counts.collect()}
    full = {r["sink"]: r["n"] for r in sink_counts(routed).collect()}
    assert fast == full


def test_window_segment_ids_equal_seg_start_turn(spark):
    # the window running-sum segment id and the (conv, seg_start_turn) key
    # induce the same partition of rows into segments
    from fluent_plugin_detect_exceptions_spark.operators.coalesce import (
        segment_ids_window,
    )
    from fluent_plugin_detect_exceptions_spark.operators.segmenter import segment
    from fluent_plugin_detect_exceptions_spark.rules import compile_rules

    df = synth_transcripts(spark, 10, repeats=2)
    cfg = PipelineConfig(fuse_coalesce=False, chunk_size=64, warmup=32)
    seg = segment(df, cfg, compile_rules(cfg.languages))
    rows = segment_ids_window(seg, cfg).select(
        "conv_id", "turn_idx", "seg_start_turn", "segment_id"
    ).collect()
    by_window = {}
    by_sst = {}
    for r in rows:
        by_window.setdefault((r["conv_id"], r["segment_id"]), set()).add(
            (r["conv_id"], r["turn_idx"])
        )
        by_sst.setdefault((r["conv_id"], r["seg_start_turn"]), set()).add(
            (r["conv_id"], r["turn_idx"])
        )
    assert sorted(by_window.values(), key=sorted) == sorted(by_sst.values(), key=sorted)


def _hole_and_cont_rows():
    hole_rows = [
        {"conv_id": "hole", "turn_idx": i, "role": "u", "text": t, "tool": "t",
         "ts": BASE_EPOCH + i}
        for i, t in enumerate(fx.lines(fx.JAVA_EXC))
    ] + [
        {"conv_id": "hole", "turn_idx": 100, "role": "u", "text": "plain\n",
         "tool": "t", "ts": BASE_EPOCH + 100}
    ]
    cont_rows = [
        {"conv_id": "cont", "turn_idx": i, "role": "u", "text": "line %d\n" % i,
         "tool": "t", "ts": BASE_EPOCH + i}
        for i in range(131)
    ]
    return hole_rows + cont_rows


def test_turn_hole_spanning_chunk_boundary_routes_to_fallback(spark):
    """ADVICE r2: a turn_idx hole wider than `warmup` across a chunk boundary
    leaves the warm-up zone EMPTY — no zone rows means the conversation is
    invisible to the zone-sync check.  The occupancy half of the pre-pass
    must route it to whole-conversation fallback, so output is CORRECT and
    fully synced (spark_routed asserts no sync_ok=False rows) instead of
    split-and-flagged.  The continuous conversation stays chunk-scanned."""
    from fluent_plugin_detect_exceptions_spark.operators.segmenter import (
        find_fallback_convs,
    )
    from fluent_plugin_detect_exceptions_spark.rules import compile_rules

    df = spark.createDataFrame(_hole_and_cont_rows()).withColumn(
        "ts", F.timestamp_seconds("ts")
    )
    cfg = PipelineConfig(chunk_size=64, warmup=8)
    fb = find_fallback_convs(df, cfg, compile_rules(cfg.languages), "text")
    assert fb == ["hole"]
    assert spark_routed(df, cfg) == spark_routed(df, PipelineConfig(chunk_size=0))
    # the assume_dense_turns contract knob skips the occupancy half — on a
    # (contract-violating) holey input the conv is then NOT discovered
    dense_cfg = PipelineConfig(chunk_size=64, warmup=8, assume_dense_turns=True)
    assert find_fallback_convs(df, dense_cfg, compile_rules(cfg.languages), "text") == []


def test_turn_hole_defensive_flag_without_prepass(spark):
    """Defense-in-depth kept from r1: if an (incorrect) externally supplied
    fallback list bypasses the pre-pass, the scan stage still never reports
    an unverifiable chunk scan as synced — the empty-warm-up group carries
    sync_ok=False."""
    df = spark.createDataFrame(_hole_and_cont_rows()).withColumn(
        "ts", F.timestamp_seconds("ts")
    )
    cfg = PipelineConfig(chunk_size=64, warmup=8, assume_long_convs=True,
                         known_fallback_convs=())
    routed = detect_exceptions(df, cfg)
    flagged = routed.filter(~F.col("sync_ok")).collect()
    assert {r["conv_id"] for r in flagged} == {"hole"}
    assert all(r["first_turn_idx"] >= 100 for r in flagged)
    cont = sorted(
        (r["first_turn_idx"], r["text"]) for r in routed.filter(F.col("conv_id") == "cont").collect()
    )
    assert len(cont) == 131 and all(t == "line %d\n" % ft for ft, t in cont)


def test_sparse_stream_empty_zone_routes_to_fallback(spark):
    """ADVICE r2 exact scenario: with a stream column active, a sparse
    stream whose warm-up zone at a chunk boundary is empty (a single trace
    interrupted by a >warmup turn hole) while another stream is dense.  The
    pre-pass must detect the expected-but-empty zone PER STREAM and fall
    back, producing the same single stitched trace as the unchunked run."""
    from fluent_plugin_detect_exceptions_spark.operators.segmenter import (
        find_fallback_convs,
    )
    from fluent_plugin_detect_exceptions_spark.rules import compile_rules

    trace = fx.lines(fx.JAVA_EXC)
    rows = [
        {"conv_id": "c", "turn_idx": 30 + i, "role": "u", "tool": "a",
         "text": t, "ts": BASE_EPOCH + 30 + i}
        for i, t in enumerate(trace[:3])
    ] + [
        {"conv_id": "c", "turn_idx": 100 + i, "role": "u", "tool": "a",
         "text": t, "ts": BASE_EPOCH + 100 + i}
        for i, t in enumerate(trace[3:])
    ] + [
        {"conv_id": "c", "turn_idx": i, "role": "u", "tool": "b",
         "text": "line %d\n" % i, "ts": BASE_EPOCH + i}
        for i in range(131)
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.timestamp_seconds("ts"))
    cfg = PipelineConfig(stream="tool", chunk_size=64, warmup=8)
    fb = find_fallback_convs(df, cfg, compile_rules(cfg.languages), "text")
    assert fb == ["c"]
    got = spark_routed(df, cfg)
    assert got == spark_routed(df, PipelineConfig(stream="tool", chunk_size=0))
    # the interrupted trace coalesces into ONE record spanning the hole
    trace_recs = [r for r in got if r[5] and r[5].startswith(trace[0][:20])]
    assert len(trace_recs) == 1 and trace_recs[0][7] == 6  # n_lines


def test_sparse_turn_idx(spark):
    # turn numbering with holes (input_hint promises dense, but the engine
    # must not corrupt ordering if upstream deletes turns)
    lines = fx.lines(fx.JAVA_EXC) + fx.lines(fx.ARBITRARY_TEXT)
    rows = [
        {"conv_id": "c0", "turn_idx": 3 * i + 7, "role": "u", "text": t,
         "tool": "t", "ts": BASE_EPOCH + i}
        for i, t in enumerate(lines)
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.timestamp_seconds("ts"))
    for cfg in (PipelineConfig(), PipelineConfig(chunk_size=8, warmup=4)):
        got = spark_routed(df, cfg)
        texts = [g[5] for g in got]
        assert fx.JAVA_EXC in texts
        assert len(got) == 1 + len(fx.lines(fx.ARBITRARY_TEXT))

def test_slim_check_unique_guard(spark):
    """ADVICE r3: opt-in exact duplicate-key guard for the slim rejoin —
    a replayed duplicate (conv, turn) row raises instead of silently
    fanning out the first-row join; clean input passes."""
    df = synth_transcripts(spark, 5, 1)
    cfg = PipelineConfig(slim_stage=True, slim_check_unique=True)
    detect_exceptions(df, cfg)  # unique input: constructs fine

    dup = df.unionByName(df.limit(1))
    with pytest.raises(ValueError, match="uniqueness precondition"):
        detect_exceptions(dup, cfg)


def test_counts_fast_path_emits_no_text(spark):
    """r6: the counts-only fast path asks the fused stage for text-free
    partials (emit_text=False) — combined text must not cross the Arrow
    boundary when nobody reads it.  Counts equality vs the full path is
    covered by test_fused_sink_counts_matches_full_path."""
    from fluent_plugin_detect_exceptions_spark.operators.segmenter import segment

    df = synth_transcripts(spark, 6, 1)
    cfg = PipelineConfig()
    partials = segment(df.select(*cfg.scan_columns(df.columns)), cfg, emit_text=False)
    assert "text_part" not in partials.columns
    # and the default keeps it
    full = segment(df.select(*cfg.scan_columns(df.columns)), cfg)
    assert "text_part" in full.columns

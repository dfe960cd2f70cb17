"""Resumable bucketed job: manifest skip semantics, outputs, lineage and
metrics tables."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from fluent_plugin_detect_exceptions_spark import job as jobmod
from fluent_plugin_detect_exceptions_spark.checkpoint import BucketManifest
from fluent_plugin_detect_exceptions_spark.config import PipelineConfig
from fluent_plugin_detect_exceptions_spark.plans.pipeline import detect_exceptions
from fluent_plugin_detect_exceptions_spark.sources.transcripts import synth_transcripts


def test_job_end_to_end_and_resume(spark, tmp_path, monkeypatch):
    src = str(tmp_path / "transcripts.parquet")
    out = str(tmp_path / "out")
    synth_transcripts(spark, 12, repeats=1).write.mode("overwrite").parquet(src)

    # avoid job.main building its own session
    monkeypatch.setattr(
        "pyspark.sql.SparkSession.Builder.getOrCreate", lambda self: spark
    )
    stopped = []
    monkeypatch.setattr(type(spark), "stop", lambda self: stopped.append(1))

    argv = [
        "--input", src, "--output", out, "--buckets", "3",
        "--remove-tag-prefix", "conv",
    ]
    jobmod.main(argv)
    manifest = BucketManifest(f"{out}/_checkpoint")
    done = manifest.completed()
    assert sorted(done) == [0, 1, 2]

    routed = spark.read.parquet(f"{out}/routed")
    direct = detect_exceptions(
        spark.read.parquet(src), PipelineConfig(remove_tag_prefix="conv")
    )
    assert routed.count() == direct.count()
    got_counts = {
        r["sink"]: r["n"]
        for r in routed.groupBy("sink").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    want_counts = {
        r["sink"]: r["n"]
        for r in direct.groupBy("sink").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got_counts == want_counts

    # lineage + metrics tables exist and reconcile
    lineage = spark.read.parquet(f"{out}/lineage")
    assert lineage.agg(F.sum("n_rows")).first()[0] == spark.read.parquet(src).count()
    metrics = spark.read.parquet(f"{out}/metrics")
    assert metrics.agg(F.sum("rows_emitted")).first()[0] >= routed.count()

    # resume: simulate a crash that lost bucket 2's manifest entry
    lines = open(f"{out}/_checkpoint/manifest.jsonl").read().strip().splitlines()
    entries = [json.loads(x) for x in lines]
    with open(f"{out}/_checkpoint/manifest.jsonl", "w") as f:
        for e in entries:
            if e["bucket"] != 2:
                f.write(json.dumps(e) + "\n")
    jobmod.main(argv)  # reprocesses only bucket 2
    done2 = BucketManifest(f"{out}/_checkpoint").completed()
    assert sorted(done2) == [0, 1, 2]
    routed2 = spark.read.parquet(f"{out}/routed")
    assert routed2.count() == direct.count()

    # resume under a different --buckets or config must refuse (ADVICE r1):
    # old bucket ids under a new partitioning would drop/duplicate convs
    import pytest

    from fluent_plugin_detect_exceptions_spark.checkpoint import ManifestMismatch

    with pytest.raises(ManifestMismatch):
        jobmod.main(["--input", src, "--output", out, "--buckets", "5",
                     "--remove-tag-prefix", "conv"])
    with pytest.raises(ManifestMismatch):
        jobmod.main(argv + ["--max-lines", "7"])


def test_prepass_persisted_and_replayed_on_resume(spark, tmp_path, monkeypatch):
    """VERDICT r2: the max-turn gate + fallback discovery run ONCE; a resumed
    run over the same input snapshot + config replays the persisted result
    with zero pre-pass jobs.  A changed input file set invalidates it."""
    src = str(tmp_path / "t.parquet")
    out = str(tmp_path / "out3")
    synth_transcripts(spark, 10, repeats=2).write.mode("overwrite").parquet(src)
    monkeypatch.setattr(
        "pyspark.sql.SparkSession.Builder.getOrCreate", lambda self: spark
    )
    monkeypatch.setattr(type(spark), "stop", lambda self: None)

    calls = []
    orig_prepass = jobmod.run_prepass

    def counting_prepass(*a, **k):
        calls.append(1)
        return orig_prepass(*a, **k)

    monkeypatch.setattr(jobmod, "run_prepass", counting_prepass)

    argv = ["--input", src, "--output", out, "--buckets", "2",
            "--chunk-size", "32", "--warmup", "8"]
    jobmod.main(argv)
    assert calls == [1]
    pre = json.load(open(f"{out}/_checkpoint/prepass.json"))
    assert pre["data"]["max_turn"] >= 32  # gate actually fired + discovery ran
    assert pre["data"]["fallback_convs"] is not None

    # partial resume: drop bucket 1's manifest entry — the bucket reruns but
    # the pre-pass is REPLAYED from the checkpoint, not recomputed
    lines = open(f"{out}/_checkpoint/manifest.jsonl").read().strip().splitlines()
    with open(f"{out}/_checkpoint/manifest.jsonl", "w") as f:
        for ln in lines:
            if json.loads(ln)["bucket"] != 1:
                f.write(ln + "\n")
    jobmod.main(argv)
    assert calls == [1]
    routed = spark.read.parquet(f"{out}/routed")
    direct = detect_exceptions(
        spark.read.parquet(src), PipelineConfig(chunk_size=32, warmup=8)
    )
    assert routed.count() == direct.count()

    # a new input file invalidates the prepass fingerprint -> re-discovers
    synth_transcripts(spark, 2, repeats=1).write.mode("append").parquet(src)
    with open(f"{out}/_checkpoint/manifest.jsonl", "w"):
        pass  # clear buckets so the run proceeds (input changed)
    jobmod.main(argv)
    assert calls == [1, 1]


def test_job_with_stream_and_limits(spark, tmp_path, monkeypatch):
    """Non-default configs through the spark-submit entry point: stream
    demux + max_lines, bucketed resume machinery and observed metrics all
    compose with the hoisted pre-pass."""
    src = str(tmp_path / "t.parquet")
    out = str(tmp_path / "out2")
    synth_transcripts(spark, 9, repeats=1).write.mode("overwrite").parquet(src)
    monkeypatch.setattr(
        "pyspark.sql.SparkSession.Builder.getOrCreate", lambda self: spark
    )
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    jobmod.main([
        "--input", src, "--output", out, "--buckets", "2",
        "--stream", "tool", "--max-lines", "4", "--chunk-size", "64",
        "--warmup", "16",
    ])
    routed = spark.read.parquet(f"{out}/routed")
    direct = detect_exceptions(
        spark.read.parquet(src),
        PipelineConfig(stream="tool", max_lines=4, chunk_size=64, warmup=16),
    )
    got = sorted(
        (r["conv_id"], r["tool"], r["first_turn_idx"], r["text"], r["n_lines"])
        for r in routed.collect()
    )
    want = sorted(
        (r["conv_id"], r["tool"], r["first_turn_idx"], r["text"], r["n_lines"])
        for r in direct.collect()
    )
    assert got == want and len(got) > 0
    metrics = spark.read.parquet(f"{out}/metrics")
    assert metrics.count() == 2  # one row per bucket

def test_prepass_fingerprint_tracks_content_not_just_names(spark, tmp_path):
    """ADVICE r3: an in-place overwrite that keeps the same file NAMES must
    still invalidate the pre-pass fingerprint (size/mtime are part of the
    digest), so a stale fallback list cannot be silently replayed."""
    import os
    import time

    from fluent_plugin_detect_exceptions_spark.checkpoint import (
        prepass_fingerprint,
    )

    src = str(tmp_path / "fp.parquet")
    synth_transcripts(spark, 4, repeats=1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    df = spark.read.parquet(src)
    fp1 = prepass_fingerprint("cfg", src, df)
    assert fp1 == prepass_fingerprint("cfg", src, spark.read.parquet(src))

    # overwrite every data file in place with identical names
    names = sorted(
        f for f in os.listdir(src) if f.endswith(".parquet")
    )
    tmp2 = str(tmp_path / "fp2.parquet")
    synth_transcripts(spark, 5, repeats=1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp2)
    names2 = sorted(f for f in os.listdir(tmp2) if f.endswith(".parquet"))
    time.sleep(0.01)
    for old, new in zip(names, names2):
        os.replace(os.path.join(tmp2, new), os.path.join(src, old))
    for crc in os.listdir(src):  # stale RawLocalFS checksum sidecars
        if crc.endswith(".crc"):
            os.remove(os.path.join(src, crc))
    fp2 = prepass_fingerprint("cfg", src, spark.read.parquet(src))
    assert fp2 != fp1


def test_data_job_end_to_end_and_resume(spark, tmp_path, monkeypatch):
    """Corpus-prep job: two-phase checkpointing — global gate ids computed
    ONCE, buckets resumable, output equal to prepare_training_data run
    directly; a dropped bucket reruns without recomputing gates; a changed
    input snapshot refuses to resume."""
    import fluent_plugin_detect_exceptions_spark.data_job as dj
    from fluent_plugin_detect_exceptions_spark.plans.training_data import (
        prepare_training_data,
    )

    src = str(tmp_path / "docs.parquet")
    out = str(tmp_path / "prepared")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.mode("overwrite").parquet(src)
    monkeypatch.setattr(
        "pyspark.sql.SparkSession.Builder.getOrCreate", lambda self: spark
    )
    monkeypatch.setattr(type(spark), "stop", lambda self: None)
    gate_calls = []
    orig_gates = dj.compute_gate_ids

    def counting_gates(*a, **k):
        gate_calls.append(1)
        return orig_gates(*a, **k)

    monkeypatch.setattr(dj, "compute_gate_ids", counting_gates)

    argv = ["--input", src, "--output", out, "--buckets", "4",
            "--rate", "src0=1000", "--rate", "src1=250", "--default-rate", "500"]
    dj.main(argv)
    assert gate_calls == [1]
    got = {r["doc_id"] for r in spark.read.parquet(out + "/bucket=*").collect()}
    direct = prepare_training_data(
        spark.read.parquet(src),
        threshold_millis=500, max_bucket=16,
        rates_millis={"src0": 1000, "src1": 250}, default_millis=500,
    )
    want = {r["doc_id"] for r in direct.collect()}
    assert got == want and got

    # drop bucket 2 -> only that bucket reruns; gates replayed, not rebuilt
    lines = open(f"{out}/_checkpoint/manifest.jsonl").read().strip().splitlines()
    with open(f"{out}/_checkpoint/manifest.jsonl", "w") as f:
        for ln in lines:
            if json.loads(ln)["bucket"] != 2:
                f.write(ln + "\n")
    dj.main(argv)
    assert gate_calls == [1]
    got2 = {r["doc_id"] for r in spark.read.parquet(out + "/bucket=*").collect()}
    assert got2 == want

    # changed input snapshot -> refuse to resume over stale buckets
    import pytest

    docs.limit(50).write.mode("overwrite").parquet(src)
    from fluent_plugin_detect_exceptions_spark.checkpoint import ManifestMismatch

    with pytest.raises(ManifestMismatch, match="snapshot changed"):
        dj.main(argv)


def test_data_job_gates_parquet_partition_pruned(spark, tmp_path):
    """VERDICT r4 item 6: the checkpointed keep-id parquet is partitioned
    by doc_bucket, so each bucket's semi join reads ONLY its own slice
    (PartitionFilters at plan time) instead of scanning/broadcasting the
    full keep set."""
    from pyspark.sql import functions as F

    import fluent_plugin_detect_exceptions_spark.data_job as dj

    out = str(tmp_path / "prep")
    dj.run(
        spark, "/root/testdata/sf0.001/documents.parquet", out, buckets=4
    )
    gates = spark.read.parquet(f"{out}/_gates/keep_ids")
    assert "doc_bucket" in gates.columns
    plan = (
        gates.filter(F.col("doc_bucket") == 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert pf and any("doc_bucket" in ln and "= 2" in ln for ln in pf)
    # and the job output equals the direct composition (run() path, no CLI)
    from fluent_plugin_detect_exceptions_spark.plans.training_data import (
        prepare_training_data,
    )

    got = {r["doc_id"] for r in spark.read.parquet(f"{out}/bucket=*").collect()}
    want = {
        r["doc_id"]
        for r in prepare_training_data(
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
            threshold_millis=500, max_bucket=16,
        ).collect()
    }
    assert got == want and got


def test_data_job_migrates_unpartitioned_gates_checkpoint(spark, tmp_path):
    """Code-review r5: a checkpoint whose gate phase was written by the
    pre-r5 UNPARTITIONED gates layout must migrate in place on resume
    (gate ids are deterministic) instead of crashing on the missing
    doc_bucket column — and without recomputing the gate phase."""
    import json as _json

    import fluent_plugin_detect_exceptions_spark.data_job as dj

    out = str(tmp_path / "prep")
    src = "/root/testdata/sf0.001/documents.parquet"
    dj.run(spark, src, out, buckets=4)
    gates_path = f"{out}/_gates/keep_ids"

    # rewrite the gates checkpoint in the OLD unpartitioned layout
    old_ids = spark.read.parquet(gates_path).select("doc_id")
    tmp_old = str(tmp_path / "old_gates")
    old_ids.write.mode("overwrite").parquet(tmp_old)
    import shutil

    shutil.rmtree(gates_path)
    shutil.copytree(tmp_old, gates_path)
    assert "doc_bucket" not in spark.read.parquet(gates_path).columns

    # drop one bucket from the manifest so the resume has work to do
    man = f"{out}/_checkpoint/manifest.jsonl"
    lines = open(man).read().strip().splitlines()
    with open(man, "w") as f:
        for ln in lines:
            if _json.loads(ln)["bucket"] != 2:
                f.write(ln + "\n")
    before = {r["doc_id"] for r in spark.read.parquet(f"{out}/bucket=*").collect()}

    gate_calls = []
    orig = dj.compute_gate_ids
    dj.compute_gate_ids = lambda *a, **k: (gate_calls.append(1), orig(*a, **k))[1]
    try:
        dj.run(spark, src, out, buckets=4)
    finally:
        dj.compute_gate_ids = orig
    assert not gate_calls  # migrated, not recomputed
    assert "doc_bucket" in spark.read.parquet(gates_path).columns
    after = {r["doc_id"] for r in spark.read.parquet(f"{out}/bucket=*").collect()}
    assert after == before

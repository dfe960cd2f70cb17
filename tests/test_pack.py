"""Sequence packing + deterministic corpus ordering (operators/pack.py):
next-fit whole-doc packing and GPT-style concat-and-chunk spans.

Test strategy mirrors the dedup family: a pure-python single-process
reference implements the packing contract, Spark must match it
bit-for-bit, and invariants (budget never exceeded, every doc exactly
once, determinism under re-partitioning) are asserted independently so a
reference bug can't hide a Spark bug."""

from __future__ import annotations

import hashlib
import re

import pytest

from pyspark.sql import functions as F

from fluent_plugin_detect_exceptions_spark.operators import pack as P


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _ref_pack(rows, budget, n_shards, salt="pack"):
    """Single-process next-fit reference: {doc_id: (shard, pack, pos, t)}."""
    enriched = [
        (
            did,
            min(len(re.findall(r"\S+", text)), budget),
            _h64(f"{salt}:{did}") % n_shards,
            _h64(f"shuffle:{did}"),
        )
        for did, text in rows
    ]
    out = {}
    for sh in range(n_shards):
        pack, cum, pos = 0, 0, -1
        for did, t, _, _ in sorted(
            (r for r in enriched if r[2] == sh), key=lambda r: (r[3], r[0])
        ):
            if cum + t > budget:
                pack, cum, pos = pack + 1, t, 0
            else:
                cum, pos = cum + t, pos + 1
            out[did] = (sh, pack, pos, t)
    return out


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


TEXTS = (
    ["word " * n for n in (1, 3, 7, 12, 25, 40, 64, 65, 90, 130)]
    + ["a b c", "", "x" * 50, "lone"]
    + [f"doc {i} " + "tok " * (i % 37) for i in range(60)]
)


@pytest.mark.parametrize("budget,n_shards", [(64, 8), (160, 3), (16, 1)])
def test_pack_sequences_matches_reference(spark, budget, n_shards):
    docs = _mk_docs(spark, TEXTS)
    got = {
        r["doc_id"]: (r["shard"], r["pack_id"], r["pos"], r["n_tokens"])
        for r in P.pack_sequences(docs, budget, n_shards).collect()
    }
    assert got == _ref_pack(list(enumerate(TEXTS)), budget, n_shards)


def test_pack_sequences_budget_and_coverage(spark):
    """The two contract invariants from VERDICT r4 item 1: per-pack token
    sums never exceed the budget, and every doc lands in exactly one pack
    (oversized docs truncated to exactly one full pack's worth)."""
    docs = _mk_docs(spark, TEXTS)
    out = P.pack_sequences(docs, 64, 8).collect()
    assert len(out) == len(TEXTS)
    assert len({r["doc_id"] for r in out}) == len(TEXTS)
    sums: dict[tuple, int] = {}
    for r in out:
        sums[(r["shard"], r["pack_id"])] = (
            sums.get((r["shard"], r["pack_id"]), 0) + r["n_tokens"]
        )
    assert max(sums.values()) <= 64
    truncated = [r for r in out if r["n_tokens"] == 64]
    assert truncated  # the 65/90/130-token docs clip to exactly the budget


def test_pack_sequences_partitioning_invariant(spark):
    """Engine-independence half of the contract: the assignment is a pure
    function of (salt, id, tokens), so input partitioning must not leak
    into the result."""
    docs = _mk_docs(spark, TEXTS)
    a = sorted(
        map(tuple, P.pack_sequences(docs.repartition(7), 64, 4).collect())
    )
    b = sorted(
        map(tuple, P.pack_sequences(docs.coalesce(1), 64, 4).collect())
    )
    assert a == b


def test_chunk_spans_contiguous_and_deterministic(spark):
    docs = _mk_docs(spark, TEXTS)
    rows = sorted(
        P.chunk_spans(docs, seq_len=32, n_buckets=4).collect(),
        key=lambda r: r["start_off"],
    )
    expect = 0
    for r in rows:
        assert r["start_off"] == expect  # concatenation has no gaps/overlaps
        expect = r["end_off"]
        assert r["first_seq"] == r["start_off"] // 32
        if r["n_tokens"] > 0:
            assert r["last_seq"] == (r["end_off"] - 1) // 32
        else:
            assert r["last_seq"] == r["first_seq"]
    total = sum(len(re.findall(r"\S+", t)) for t in TEXTS)
    assert expect == total
    # determinism under re-partitioning
    again = sorted(
        map(tuple, P.chunk_spans(docs.repartition(5), 32, 4).collect())
    )
    assert again == sorted(map(tuple, rows))


def test_pack_plan_shuffles_narrow_columns_only(spark):
    """Scale assertion: the packing exchange carries only the slim
    (id, tokens, shard, key) projection — the text column must be pruned
    before the shuffle."""
    docs = _mk_docs(spark, TEXTS)
    plan = (
        P.pack_sequences(docs, 64, 8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    exchange = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert exchange and all("text" not in ln for ln in exchange)


from hypothesis import given, settings
from hypothesis import strategies as st

import numpy as np


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 50), min_size=0, max_size=200),
    st.integers(1, 120),
)
def test_next_fit_bounds_hypothesis(tokens, budget):
    """The searchsorted pack-boundary kernel against a naive per-doc
    next-fit, over random token sequences including zeros and
    over-budget values (callers clip, but the kernel's safety net must
    still terminate and keep packs contiguous)."""
    t = np.asarray([min(x, budget) for x in tokens], dtype=np.int64)
    got = P._next_fit_bounds(t, budget) if len(t) else np.empty(0, np.int64)
    pack, cum = 0, 0
    want = []
    for x in t:
        if cum + x > budget:
            pack, cum = pack + 1, int(x)
        else:
            cum += int(x)
        want.append(pack)
    assert got.tolist() == want
    # invariants: contiguous non-decreasing ids starting at 0; per-pack
    # sums within budget
    if len(t):
        assert got[0] == 0
        assert ((np.diff(got) == 0) | (np.diff(got) == 1)).all()
        for p in range(int(got[-1]) + 1):
            assert t[got == p].sum() <= budget

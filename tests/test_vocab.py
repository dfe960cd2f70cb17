"""vocab_top_terms (functions/text.py): oracle portability on the edge the
synthetic corpus never exercises — vertical tab, where Java's \\s and
RE2's \\s disagree (code-review r5)."""

from __future__ import annotations

import duckdb
import pandas as pd

from fluent_plugin_detect_exceptions_spark.functions.text import vocab_top_terms
from fluent_plugin_detect_exceptions_spark.plans.oracle_sql import (
    vocab_top_terms_sql,
)


def test_vocab_portable_on_vertical_tab(spark):
    """A \\x0B between words must produce the SAME terms on both engines.
    The explicit class NAMES \\x0B as whitespace (the BPE_TOKEN_RE
    convention): Java's \\s would agree but RE2's \\s would not, so the
    portable form spells it out — and this doc shape is exactly where a
    \\s-based oracle would diverge."""
    rows = [
        (1, "alpha\x0bbeta gamma"),
        (2, "alpha beta\tgamma\ngamma"),
        (3, "  gamma  GAMMA\x0b "),
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in vocab_top_terms(sdf, n=100).collect()
    )

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = sorted(tuple(r) for r in con.sql(vocab_top_terms_sql(100)).fetchall())
    assert got == want
    terms = {t for t, _, _ in got}
    # VT splits words on BOTH engines (it is in the explicit class)
    assert terms == {"alpha", "beta", "gamma"}
    counts = {t: (n, d) for t, n, d in got}
    assert counts["gamma"] == (5, 3)  # incl. lowercased GAMMA, VT-stripped


def test_vocab_counts_and_tiebreak(spark):
    rows = [(1, "b a a"), (2, "a c b B")]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = [tuple(r) for r in vocab_top_terms(sdf, n=2).collect()]
    # a: 3 occurrences in 2 docs; b: 3 (lowercased) in 2 docs — tie on
    # occurrences broken by term asc; limit cuts c
    assert got == [("a", 3, 2), ("b", 3, 2)]

"""PII scrubbing — the redaction pass every production training-data
pipeline runs before text leaves the preparation boundary: emails, phone
numbers, IP addresses, credit-card-shaped digit runs, and US-SSN-shaped
ids replaced with stable placeholder tokens, with per-category match
counts for the audit rollup.

Pure ``regexp_replace``/``regexp_count`` built-ins — JVM-side, no UDFs,
and every pattern is written in the RE2-compatible subset shared by
Spark's Java regex and the DuckDB oracle (no lookarounds, no unicode
class flags; ``\\d``/``\\b`` mean the same in both — the engine-portability
rule from functions/text.py).

Semantics are the SEQUENTIAL CASCADE: category k is counted on the text
as it stands after categories 1..k-1 were replaced, then replaced itself.
That makes overlap behavior exact and engine-independent (a digit run
inside an already-redacted credit card can't be re-counted as a phone
number) — the oracle nests the same replacements in the same order.

Scale shape: one stateless projection — no shuffle, no state; folds into
whatever scan it is composed with, and Catalyst keeps it inside
whole-stage codegen."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: (category, pattern, replacement) in CASCADE ORDER.  Email first (it can
#: contain digit runs); card before SSN/phone (the longest digit shapes
#: first); IP last (shortest digit shape).
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("card", r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b", "<CARD>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\(?\b\d{3}\)?[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_scrub_cols(text: Column) -> tuple[Column, dict[str, Column]]:
    """(scrubbed_text, {category: match_count}) as lazy Column
    expressions — counts follow the cascade semantics above."""
    cur = text
    counts: dict[str, Column] = {}
    for name, pat, repl in PII_PATTERNS:
        counts[name] = F.regexp_count(cur, F.lit(pat)).cast("long")
        cur = F.regexp_replace(cur, pat, repl)
    return cur, counts


def pii_scrub(
    df: DataFrame, text_col: str = "text", keep_original: bool = False
) -> DataFrame:
    """Replace ``text_col`` with its scrubbed form and append
    ``n_<category>`` count columns (audit trail).  ``keep_original=True``
    retains the raw text as ``<text_col>_raw`` — off by default, because
    the whole point is that raw PII does not flow downstream."""
    scrubbed, counts = pii_scrub_cols(F.col(text_col))
    out = df
    if keep_original:
        out = out.withColumn(f"{text_col}_raw", F.col(text_col))
    # counts BEFORE the text column is overwritten: the count expressions
    # reference text_col by NAME, so adding them after the replacement
    # would silently count over the already-scrubbed text (always zero)
    for name, c in counts.items():
        out = out.withColumn(f"n_{name}", c)
    return out.withColumn(text_col, scrubbed)

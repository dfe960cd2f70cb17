"""PII scrubbing (functions/pii.py): redaction categories, cascade
overlap semantics, and audit counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluent_plugin_detect_exceptions_spark.functions.pii import (
    PII_PATTERNS,
    pii_scrub,
)


def _scrub_one(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return pii_scrub(df).collect()[0]


def test_each_category_redacts(spark):
    r = _scrub_one(
        spark,
        "mail a.b+c@ex-1.org, call (555) 123-4567, card 4111 1111 1111 1234, "
        "ssn 078-05-1120, from 192.168.0.1 done",
    )
    assert r["text"] == (
        "mail <EMAIL>, call <PHONE>, card <CARD>, ssn <SSN>, from <IP> done"
    )
    assert (r["n_email"], r["n_phone"], r["n_card"], r["n_ssn"], r["n_ip"]) == (
        1, 1, 1, 1, 1
    )


def test_cascade_prevents_double_counting(spark):
    """A credit-card digit run must NOT be re-counted as a phone number or
    IP, and an SSN must not be re-counted as a phone — the cascade counts
    each category on the already-redacted text."""
    r = _scrub_one(spark, "4111-1111-1111-1234 and 078-05-1120")
    assert r["n_card"] == 1 and r["n_ssn"] == 1
    assert r["n_phone"] == 0 and r["n_ip"] == 0
    assert r["text"] == "<CARD> and <SSN>"


def test_clean_text_untouched(spark):
    r = _scrub_one(spark, "nothing sensitive here, version 1.2 at 3 pm")
    assert r["text"] == "nothing sensitive here, version 1.2 at 3 pm"
    assert all(r[f"n_{name}"] == 0 for name, _, _ in PII_PATTERNS)


def test_keep_original_and_multiple_matches(spark):
    df = spark.createDataFrame(
        [(1, "a@b.co then c@d.io")], "doc_id long, text string"
    )
    r = pii_scrub(df, keep_original=True).collect()[0]
    assert r["text"] == "<EMAIL> then <EMAIL>"
    assert r["text_raw"] == "a@b.co then c@d.io"
    assert r["n_email"] == 2


def test_no_python_udf_in_plan(spark):
    """The scrub is pure JVM built-ins — no BatchEvalPython/ArrowEvalPython
    stage may appear (the repo-wide no-per-row-Python rule)."""
    df = spark.createDataFrame([(1, "x@y.zz")], "doc_id long, text string")
    plan = (
        pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan

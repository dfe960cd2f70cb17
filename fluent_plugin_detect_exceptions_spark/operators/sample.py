"""Deterministic stratified sampling — the source-mixing step of a
training-data pipeline: each stratum (source/domain/language) keeps a
configured fraction of its documents, decided by a content-stable hash so
the sample is reproducible across runs, engines, and cluster sizes (no RNG
state, no sort order dependence — the property ``df.sample`` cannot give).

Scale shape: one stateless projection + filter, no shuffle at all; the
keep decision is a pure function of (salt, id), so partition pruning,
pushdown, and resumable re-runs all compose.  Rates quantize to 1/1000ths
(the integerized-for-oracle convention used across this repo).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import stable_hash64


def sample_bucket(id_col: Column, salt: str = "sample") -> Column:
    """Deterministic bucket in [0, 1000) from the portable md5 hash of
    ``salt:id`` — the same value DuckDB computes, so sampling decisions
    are oracle-checkable bit-for-bit."""
    return F.pmod(
        stable_hash64(F.concat(F.lit(salt + ":"), id_col.cast("string"))),
        F.lit(1000),
    )


def stratified_sample(
    df: DataFrame,
    rates_millis: dict[str, int],
    default_millis: int = 1000,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep each row iff its deterministic bucket < its stratum's rate
    (in 1/1000ths).  ``rates_millis`` maps stratum values to rates;
    unlisted strata use ``default_millis``.  The rate table compiles into
    the projection as a CASE cascade — no join, no shuffle, and Catalyst
    folds it into the scan filter."""
    rate = None
    for val, millis in sorted(rates_millis.items()):
        cond = F.col(stratum_col) == val
        rate = (
            F.when(cond, F.lit(millis))
            if rate is None
            else rate.when(cond, F.lit(millis))
        )
    rate = (
        rate.otherwise(F.lit(default_millis))
        if rate is not None
        else F.lit(default_millis)
    )
    return df.filter(sample_bucket(F.col(id_col), salt) < rate)

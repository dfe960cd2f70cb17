"""Regression test for the HUGEINT oracle-typing class (VERDICT r5 items
1-2): an oracle whose SELECT list exposes an un-CAST SUM/window aggregate
comes out of DuckDB as HUGEINT → Arrow decimal128(38,0), which a
driver-side value hasher serializes differently from Spark's int64 even
when every value is equal.  run_gate.oracle_type_issues must flag that
class builder-side — unless the Spark query emits the identical Arrow type
(the chunk_spans alignment)."""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from run_gate import oracle_type_issues  # noqa: E402


def _duck_schema(sql: str):
    import duckdb

    con = duckdb.connect()
    try:
        return con.sql(sql).fetch_arrow_table().schema
    finally:
        con.close()


def _spark_arrow_schema(fields):
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import StructType

    return to_arrow_schema(StructType(fields))


def test_uncast_sum_oracle_is_flagged():
    from pyspark.sql.types import LongType, StructField

    osch = _duck_schema("SELECT sum(x) AS s FROM (VALUES (1), (2)) t(x)")
    assert str(osch.field("s").type) == "decimal128(38, 0)"
    issues = oracle_type_issues(osch, _spark_arrow_schema([StructField("s", LongType())]))
    assert issues and issues[0].startswith("s:")


def test_cast_sum_oracle_passes():
    from pyspark.sql.types import LongType, StructField

    osch = _duck_schema(
        "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (1), (2)) t(x)"
    )
    assert not oracle_type_issues(
        osch, _spark_arrow_schema([StructField("s", LongType())])
    )


def test_decimal_oracle_passes_when_spark_type_matches():
    # the chunk_spans alignment: the oracle SQL is frozen with a window-SUM
    # (HUGEINT) output, so the Spark query casts to decimal(38,0) — both
    # sides then hash the identical Arrow representation
    from pyspark.sql.types import DecimalType, StructField

    osch = _duck_schema("SELECT sum(x) AS start_off FROM (VALUES (1), (2)) t(x)")
    assert not oracle_type_issues(
        osch, _spark_arrow_schema([StructField("start_off", DecimalType(38, 0))])
    )


def test_no_declared_oracle_trips_the_type_gate():
    """Every declared oracle's Arrow output must be hash-safe against its
    query's plan schema.  Schema-only: LIMIT 0 keeps DuckDB from computing
    rows, and the Spark side never executes (plan schema via
    to_arrow_schema), so this covers all 51 oracles in seconds."""
    import duckdb

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    import __spark_entry__ as em

    con = duckdb.connect()
    sf_dir = "/root/testdata/sf0.001"
    for t in ("events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    allowed_decimal = {"chunk_spans": {"start_off", "end_off"}}
    bad = {}
    for name, sql in em.oracle_sql().items():
        sch = con.sql(f"SELECT * FROM ({sql}) __q LIMIT 0").fetch_arrow_table().schema
        issues = []
        for f in sch:
            t = str(f.type)
            if t in {"int32", "int64", "double", "bool", "string", "large_string"}:
                continue
            if t.startswith("timestamp"):
                continue
            if t == "decimal128(38, 0)" and f.name in allowed_decimal.get(name, ()):
                continue
            issues.append(f"{f.name}={t}")
        if issues:
            bad[name] = issues
    assert not bad, bad

"""Broadcast-hash-join enrichment against the language/tool metadata dim
(SURVEY §2.6: the north-star 'broadcast lookup').

The dim is tiny (one row per language family) so the join is always an
explicit ``F.broadcast`` — no shuffle, no sort, survives any fact-side scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..rules import FAMILIES, RULES_BY_LANG, STATE_FAMILY

#: family -> (display name, detects_end, n_rules, n_states)
LANG_DIM_ROWS = [
    (
        "java",
        "Java/JavaScript/C#",
        False,
        len(RULES_BY_LANG["java"]),
        sum(1 for s, f in STATE_FAMILY.items() if f == "java"),
    ),
    ("python", "Python", True, len(RULES_BY_LANG["python"]),
     sum(1 for s, f in STATE_FAMILY.items() if f == "python")),
    ("php", "PHP", True, len(RULES_BY_LANG["php"]),
     sum(1 for s, f in STATE_FAMILY.items() if f == "php")),
    ("go", "Go", False, len(RULES_BY_LANG["go"]),
     sum(1 for s, f in STATE_FAMILY.items() if f == "go")),
    ("ruby", "Ruby", False, len(RULES_BY_LANG["ruby"]),
     sum(1 for s, f in STATE_FAMILY.items() if f == "ruby")),
    ("dart", "Dart", False, len(RULES_BY_LANG["dart"]),
     sum(1 for s, f in STATE_FAMILY.items() if f == "dart")),
]

LANG_DIM_COLUMNS = ["lang", "lang_name", "detects_end", "n_rules", "n_states"]


def lang_dim(spark: SparkSession) -> DataFrame:
    assert tuple(r[0] for r in LANG_DIM_ROWS) == FAMILIES
    return spark.createDataFrame(LANG_DIM_ROWS, LANG_DIM_COLUMNS)


def enrich_with_lang(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Left broadcast join on the detected language family."""
    return df.join(F.broadcast(lang_dim(spark)), on="lang", how="left")

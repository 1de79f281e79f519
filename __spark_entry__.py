"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship schema-validation query on sf0.001;
`queries()` exposes one callable per implemented operator (SURVEY.md §2 +
training-data extensions); `oracle_sql()` gives the DuckDB-equivalent SQL
for every query — the xxhash64-signature ops carry derived oracles
(planted-clone constructions whose expected output is ANSI-SQL id
arithmetic), so every entry is oracle-checked.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from json_schema_clj_spark.queries import LAZY_ORACLES, ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: compile the lineitem schema
    to Catalyst predicates, validate the table, return the per-keyword
    violation breakdown."""
    return QUERIES["validate_lineitem_keywords"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    out = dict(ORACLES)
    for name, build in LAZY_ORACLES.items():
        out[name] = build()
    return out

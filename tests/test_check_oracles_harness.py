"""The local oracle replica must be harness-faithful (round-3 verdict #2).

The driver's correctness gate fetches the DuckDB side through pandas/numpy,
which converts HUGEINT (DuckDB's `sum()` over integers) to float64 — so an
un-cast `sum()` whose value is 5 hashes as "5.0" against Spark's bigint
"5".  Round 3's replica used `fetchall()` and passed 106/106 while the
driver was red on exactly this class.  These tests pin the fixed replica:

  * an injected un-cast `sum()` oracle MUST come back red (value divergence
    via the pandas path AND the decimal-schema assertion);
  * the same oracle with `CAST(... AS BIGINT)` MUST be green;
  * `decimal_columns` flags HUGEINT/decimal projections on their own.
"""

import duckdb
import pytest

from tools.check_oracles import compare_one, decimal_columns


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


def _spark_five(spark, _sf_dir):
    return spark.sql("SELECT CAST(5 AS BIGINT) AS s")


UNCAST = "SELECT sum(CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END) AS s FROM range(10) t(i)"
CAST_OK = (
    "SELECT CAST(sum(CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS s "
    "FROM range(10) t(i)"
)


def test_decimal_columns_flags_hugeint(con):
    # DESCRIBE-based detection reports the DuckDB type name (the query
    # is planned once, not executed twice)
    assert decimal_columns(con, UNCAST) == [("s", "HUGEINT")]
    assert decimal_columns(con, CAST_OK) == []


def test_uncast_sum_oracle_goes_red(spark, con):
    ok, d = compare_one(spark, con, _spark_five, UNCAST, sf_dir=None)
    assert not ok
    assert d["decimal_cols"], "schema assertion must flag the HUGEINT column"
    # the value itself diverges through the pandas path: 5 vs 5.0
    assert d["spark_rows"] != d["duck_rows"]
    assert d["duck_rows"] == [("5.0",)]
    assert d["spark_rows"] == [("5",)]


def test_cast_sum_oracle_stays_green(spark, con):
    ok, d = compare_one(spark, con, _spark_five, CAST_OK, sf_dir=None)
    assert ok, d

"""Bloom-prefiltered referential checks: exactness vs the plain anti-join,
degenerate inputs, and the plan shape that makes it the big-dim scale path."""

import pytest
from pyspark.sql import functions as F

from json_schema_clj_spark.operators import bloom as B
from json_schema_clj_spark.operators import referential as R

M_BITS, K = 1 << 12, 4


@pytest.fixture(scope="module")
def tables(spark):
    fact = spark.range(0, 5000).select(
        F.col("id").alias("row_id"), (F.col("id") % 700).alias("fk")
    )
    dim = spark.range(0, 700).where(F.col("id") % 3 != 0).select(F.col("id").alias("pk"))
    return fact, dim


def _keys(df, col="fk"):
    return sorted(r[0] for r in df.select(col).collect())


def test_matches_plain_anti_join(tables):
    fact, dim = tables
    expected = _keys(R.dangling(fact, "fk", dim, "pk"))
    got = _keys(B.dangling_bloom(fact, "fk", dim, "pk", m_bits=M_BITS, k=K))
    assert got == expected and len(got) > 0


def test_null_keys_pass(tables, spark):
    _, dim = tables
    fact = spark.createDataFrame([(1, None), (2, 3000)], "row_id long, fk long")
    got = _keys(B.dangling_bloom(fact, "fk", dim, "pk", m_bits=M_BITS, k=K))
    assert got == [3000]


def test_empty_dim_all_dangling(tables, spark):
    fact, _ = tables
    empty = spark.createDataFrame([], "pk long")
    got = B.dangling_bloom(fact, "fk", empty, "pk", m_bits=M_BITS, k=K)
    assert got.count() == fact.count()


def test_bloom_has_no_false_negatives(tables):
    """Every fact key present in dim must survive the prefilter — the
    definite-reject branch may never contain a matching key."""
    fact, dim = tables
    probed = B.with_might_contain(fact, "fk", B.bloom_words(dim, "pk", M_BITS, K), M_BITS, K)
    rejected = probed.where(~F.col("__maybe")).select("fk").distinct()
    matching = rejected.join(dim.select(F.col("pk").alias("fk")), on="fk", how="inner")
    assert matching.count() == 0


def test_probe_plan_is_broadcast_only(tables):
    """The prefilter itself must not shuffle the fact side: k broadcast
    hash joins, no sort-merge join anywhere in the probe plan."""
    fact, dim = tables
    probed = B.with_might_contain(fact, "fk", B.bloom_words(dim, "pk", M_BITS, K), M_BITS, K)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == K
    assert "SortMergeJoin" not in plan


def test_exact_verify_is_not_broadcast(tables):
    """The residual anti-join models a dimension too big to broadcast —
    it must be the sort-merge path, fed by the reduced candidate set."""
    fact, dim = tables
    out = B.dangling_bloom(fact, "fk", dim, "pk", m_bits=M_BITS, k=K)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin LeftAnti" in plan or "SortMergeJoin" in plan

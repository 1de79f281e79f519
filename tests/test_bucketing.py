"""Bucketed-layout joins: result equivalence + the shuffle-free plan."""

from pyspark.sql import functions as F

from json_schema_clj_spark.operators.bucketing import bucketed_dangling, write_bucketed

SF_DIR = "/root/testdata/sf0.001"


def test_bucketed_anti_join_is_shuffle_free_and_exact(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select("l_orderkey", "l_partkey")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet").select("p_partkey").where(
        F.pmod(F.col("p_partkey"), F.lit(10)) != 0
    )
    write_bucketed(li, "bk_lineitem", "l_partkey", 8)
    write_bucketed(part, "bk_part", "p_partkey", 8)
    try:
        out = bucketed_dangling(spark, "bk_lineitem", "l_partkey", "bk_part", "p_partkey")
        got = sorted((r["l_orderkey"], r["l_partkey"]) for r in out.collect())

        # result identical to the plain (shuffling) anti-join: bucketing
        # is pure layout
        plain = li.where(F.col("l_partkey").isNotNull()).join(
            part, li["l_partkey"] == part["p_partkey"], "left_anti"
        )
        expect = sorted((r["l_orderkey"], r["l_partkey"]) for r in plain.collect())
        assert got == expect and got  # non-trivial: some keys dangle

        # the layout contract: NO Exchange anywhere in the bucketed plan —
        # the shuffle was paid once at write time
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # the plain plan DOES shuffle (the thing bucketing removes)
        plain_plan = plain.hint("merge")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan, plain_plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_lineitem")
        spark.sql("DROP TABLE IF EXISTS bk_part")


def test_mismatched_bucket_counts_fall_back_to_shuffle(spark):
    """Different bucket counts break co-location: Spark must re-shuffle
    (documents the layout contract rather than silently relying on it)."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select("l_partkey").limit(200)
    part = spark.read.parquet(f"{SF_DIR}/part.parquet").select("p_partkey")
    write_bucketed(li, "bk_mis_fact", "l_partkey", 8)
    write_bucketed(part, "bk_mis_dim", "p_partkey", 5)
    try:
        out = bucketed_dangling(spark, "bk_mis_fact", "l_partkey", "bk_mis_dim", "p_partkey")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_mis_fact")
        spark.sql("DROP TABLE IF EXISTS bk_mis_dim")

"""Streaming referential monitor (streaming/referential_stream.py):
per-epoch dangling sink + summary, null-key guard, broadcast dim plan,
idempotent epoch replay."""

import glob

from pyspark.sql import functions as F

from json_schema_clj_spark.streaming.referential_stream import (
    batch_referential_rows,
    referential_stream,
)


def _mk_source(spark, path):
    """Two files = two epochs under maxFilesPerTrigger=1.  Dim holds keys
    0..99; file 0 is fully covered, file 1 plants 5 dangling keys (>=100)
    and 3 null keys."""
    f0 = spark.range(50).select(
        F.col("id").alias("row_id"), (F.col("id") % 100).alias("k")
    )
    f1 = spark.range(50, 100).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") < 55, F.col("id") + 50)  # 100..104 dangling
        .when(F.col("id") < 58, F.lit(None))        # 3 null keys
        .otherwise(F.col("id") % 100)
        .alias("k"),
    )
    f0.coalesce(1).write.parquet(f"{path}/f0")
    f1.coalesce(1).write.parquet(f"{path}/f1")


def test_referential_stream_epochs(spark, tmp_path):
    src = str(tmp_path / "src")
    _mk_source(spark, src)
    dim = spark.range(100).select(F.col("id").alias("dim_k"))

    dangling = str(tmp_path / "dangling")
    summary = str(tmp_path / "summary")
    stream = (
        spark.readStream.schema("row_id long, k long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = referential_stream(
        stream, "k", dim, "dim_k", dangling, summary, str(tmp_path / "ckpt")
    )
    q.awaitTermination(120)

    sums = sorted(glob.glob(f"{summary}/epoch=*"))
    assert len(sums) == 2, sums
    s0 = spark.read.parquet(sums[0]).collect()[0]
    s1 = spark.read.parquet(sums[1]).collect()[0]
    assert (s0["n_rows"], s0["n_null_key"], s0["n_dangling"]) == (50, 0, 0)
    assert (s1["n_rows"], s1["n_null_key"], s1["n_dangling"]) == (50, 3, 5)

    d1 = spark.read.parquet(f"{dangling}/epoch=e1")
    assert sorted(r["k"] for r in d1.collect()) == [100, 101, 102, 103, 104]
    # dangling sink keeps the original fact columns only (no join flags)
    assert d1.columns == ["row_id", "k"]
    # epoch 0 sink exists and is empty
    assert spark.read.parquet(f"{dangling}/epoch=e0").count() == 0


def test_referential_stream_replay_idempotent(spark, tmp_path):
    src = str(tmp_path / "src")
    _mk_source(spark, src)
    dim = spark.range(100).select(F.col("id").alias("dim_k"))
    dangling = str(tmp_path / "dangling")
    summary = str(tmp_path / "summary")
    stream = (
        spark.readStream.schema("row_id long, k long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    referential_stream(
        stream, "k", dim, "dim_k", dangling, summary, str(tmp_path / "ckpt")
    ).awaitTermination(120)

    before = sorted(map(tuple, spark.read.parquet(f"{dangling}/epoch=e1").collect()))
    # replay epoch 1 through the exact production path (at-least-once crash)
    batch1 = spark.read.parquet(f"{src}/f1").selectExpr("row_id", "k")
    dim_keys = dim.select(F.col("dim_k").alias("k")).distinct()
    flagged = batch_referential_rows(batch1, "k", dim_keys)
    flagged.where("__dangling").select("row_id", "k").write.mode(
        "overwrite"
    ).parquet(f"{dangling}/epoch=e1")
    after = sorted(map(tuple, spark.read.parquet(f"{dangling}/epoch=e1").collect()))
    assert before == after


def test_referential_batch_core_broadcasts_dim(spark):
    fact = spark.range(1000).select(F.col("id").alias("k"))
    dim_keys = spark.range(100).select(F.col("id").alias("k")).distinct()
    flagged = batch_referential_rows(fact, "k", dim_keys)
    plan = flagged._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan

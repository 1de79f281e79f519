"""Streaming drift monitor (streaming/drift_stream.py): cumulative
sketch-store scoring across epochs, all three lenses (KS/PSI/chi2), and
idempotent epoch replay."""

import glob

import pytest
from pyspark.sql import functions as F

from json_schema_clj_spark.operators.drift import histogram_sketch
from json_schema_clj_spark.streaming.drift_stream import drift_stream

LO, HI, NB = 0.0, 10.0, 10


def _mk_source(spark, path):
    """Two source files = two epochs under maxFilesPerTrigger=1: file 0
    draws from the baseline distribution, file 1 is shifted."""
    base = spark.range(2000).select(
        F.lit("g").alias("g"), (F.col("id") % 10).cast("double").alias("v")
    )
    shifted = spark.range(2000).select(
        F.lit("g").alias("g"),
        F.when(F.col("id") % 2 == 0, 9.0).otherwise((F.col("id") % 10).cast("double")).alias("v"),
    )
    base.coalesce(1).write.parquet(f"{path}/f0")
    shifted.coalesce(1).write.parquet(f"{path}/f1")
    return base


def test_drift_stream_cumulative_scores_and_replay(spark, tmp_path):
    src = str(tmp_path / "src")
    base = _mk_source(spark, src)
    baseline = histogram_sketch(base, "v", "g", LO, HI, NB).groupBy("bucket").agg(
        F.sum("n").alias("n")
    )

    store = str(tmp_path / "store")
    scores = str(tmp_path / "scores")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema("g string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = drift_stream(
        stream, baseline, "v", "g", LO, HI, store, scores, ckpt, buckets=NB
    )
    q.awaitTermination(120)

    epochs = sorted(glob.glob(f"{scores}/epoch=*"))
    assert len(epochs) == 2, epochs
    s0 = spark.read.parquet(epochs[0]).collect()[0]
    s1 = spark.read.parquet(epochs[1]).collect()[0]
    # epoch 0 cumulative == baseline distribution: all lenses ~0
    assert s0["ks"] < 0.01 and abs(s0["psi"]) < 0.01 and s0["chi2"] < 1.0
    # epoch 1 folds in the shifted file: every lens must move
    assert s1["ks"] > 0.15 and s1["psi"] > 0.1 and s1["chi2"] > 100.0
    assert s1["dof"] == NB - 1

    # replayed epoch (at-least-once) rewrites its own subdir idempotently
    before = sorted(map(tuple, spark.read.parquet(epochs[1]).collect()))
    batch1 = spark.read.parquet(f"{src}/f1").selectExpr("g", "v")
    from json_schema_clj_spark.streaming import drift_stream as DS

    sk = histogram_sketch(batch1, "v", "g", LO, HI, NB)
    sk.write.mode("overwrite").parquet(f"{store}/epoch=e1")
    cumulative = (
        spark.read.schema(sk.schema).parquet(store)
        .groupBy("group", "bucket").agg(F.sum("n").alias("n"))
    )
    DS.cumulative_drift_scores(baseline, cumulative).write.mode("overwrite").parquet(
        f"{scores}/epoch=e1"
    )
    after = sorted(map(tuple, spark.read.parquet(epochs[1]).collect()))
    assert before == after


def test_drift_stream_store_is_sketch_sized(spark, tmp_path):
    """The store holds |epochs|x|groups|x|buckets| rows, never raw rows —
    the property that keeps per-epoch cost O(batch + sketch)."""
    src = str(tmp_path / "src")
    base = _mk_source(spark, src)
    baseline = histogram_sketch(base, "v", "g", LO, HI, NB).groupBy("bucket").agg(
        F.sum("n").alias("n")
    )
    store = str(tmp_path / "store")
    stream = (
        spark.readStream.schema("g string, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/f*")
    )
    q = drift_stream(
        stream, baseline, "v", "g", LO, HI, store,
        str(tmp_path / "scores"), str(tmp_path / "ckpt"), buckets=NB,
    )
    q.awaitTermination(120)
    n = spark.read.parquet(store).count()
    assert n <= 2 * 1 * NB  # 2 epochs x 1 group x 10 buckets

"""Streaming as-of enrichment: per-epoch results equal the batch
operator on the same rows; replay idempotent."""

import os

from pyspark.sql import functions as F

from json_schema_clj_spark.operators.asof import asof_join
from json_schema_clj_spark.streaming.asof_stream import asof_stream

SCHEMA = "k long, ts long, fact_id long"
DIMS = [(1, 10, 11), (1, 20, 12), (2, 15, 21)]


def _dims(spark):
    return spark.createDataFrame(DIMS, "k long, vfrom long, val long")


def _run_once(spark, src, ckpt, out):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = asof_stream(
        stream, _dims(spark), ["k"], "ts", "vfrom", ["val"], out, ckpt, n_parts=2
    )
    q.awaitTermination(120)


def _results(spark, out):
    df = spark.read.parquet(out)
    return sorted((r["fact_id"], r["val"]) for r in df.collect())


def test_streaming_asof_matches_batch_and_replays_idempotently(spark, tmp_path):
    src, ckpt, out = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "out")
    os.makedirs(src)

    b1 = [(1, 5, 100), (1, 25, 101), (2, 16, 200)]
    spark.createDataFrame(b1, SCHEMA).write.mode("append").parquet(src)
    _run_once(spark, src, ckpt, out)

    b2 = [(1, 12, 102), (2, 14, 201)]
    spark.createDataFrame(b2, SCHEMA).write.mode("append").parquet(src)
    _run_once(spark, src, ckpt, out)

    got = _results(spark, out)
    batch = asof_join(
        spark.createDataFrame(b1 + b2, SCHEMA),
        _dims(spark), ["k"], "ts", "vfrom", ["val"], n_parts=2,
    )
    expect = sorted((r["fact_id"], r["val"]) for r in batch.collect())
    assert got == expect
    assert got == [(100, None), (101, 12), (102, 11), (200, 21), (201, None)]

    # replay with no new data: same rows, no duplicates
    _run_once(spark, src, ckpt, out)
    assert _results(spark, out) == got

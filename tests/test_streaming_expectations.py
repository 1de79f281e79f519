"""Streaming expectation monitor: per-epoch verdicts, planted violation
isolated to its epoch, idempotent replay."""

import os

from json_schema_clj_spark.streaming.expectations_stream import expectations_stream

SCHEMA = "k long, v long, s string"
SUITE = [
    {"type": "row_count_between", "lo": 1, "hi": 100},
    {"type": "values_in_set", "column": "s", "set": ["a", "b"]},
    {"type": "max_at_most", "column": "v", "hi": 50},
]


def _run_once(spark, src, ckpt, out):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = expectations_stream(stream, SUITE, out, ckpt)
    q.awaitTermination(120)


def _results(spark, out):
    df = spark.read.parquet(out)
    return {
        (r["epoch"], r["idx"]): (r["observed"], r["passed"]) for r in df.collect()
    }


def test_streaming_expectations_per_epoch_gate(spark, tmp_path):
    src, ckpt, out = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "out")
    os.makedirs(src)

    spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b")], SCHEMA
    ).write.mode("append").parquet(src)
    _run_once(spark, src, ckpt, out)
    got = _results(spark, out)
    assert got[("e0", 0)] == ("2", True)
    assert got[("e0", 1)] == ("0", True)
    assert got[("e0", 2)] == ("20", True)

    # epoch 1 violates the set AND the max — epoch 0's verdicts unchanged
    spark.createDataFrame(
        [(3, 99, "z")], SCHEMA
    ).write.mode("append").parquet(src)
    _run_once(spark, src, ckpt, out)
    got = _results(spark, out)
    assert got[("e0", 1)] == ("0", True)
    assert got[("e1", 1)] == ("1", False)
    assert got[("e1", 2)] == ("99", False)
    n_before = len(got)

    # replay with no new data: no duplicate epochs, same verdicts
    _run_once(spark, src, ckpt, out)
    got2 = _results(spark, out)
    assert got2 == got and len(got2) == n_before

"""applyInPandasWithState custom stateful operator: per-key violation
streaks accumulate across micro-batches and survive a restart via the
stream checkpoint."""

import os

from pyspark.sql import functions as F

from json_schema_clj_spark.streaming.validate_stream import violation_streaks

SCHEMA = {"type": "object", "properties": {"v": {"minimum": 0}}}


def _write_batch(spark, path, batch_id, bad_keys):
    rows = [("a", -1 if "a" in bad_keys else 1), ("b", -1 if "b" in bad_keys else 1)]
    spark.createDataFrame(rows, "k string, v int").withColumn(
        "batch", F.lit(batch_id)
    ).write.mode("append").parquet(path)


def _run_once(spark, src, ckpt, out_dir):
    stream = spark.readStream.schema("k string, v int, batch int").parquet(src)

    def sink(batch_df, epoch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        violation_streaks(stream, SCHEMA, "k", streak_threshold=2)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        return {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    except Exception:
        return set()


def test_streak_state_survives_restart(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    out = str(tmp_path / "out")

    # run 1: one batch where only 'a' violates → streak(a)=1, below threshold
    _write_batch(spark, src, 0, bad_keys={"a"})
    assert _run_once(spark, src, ckpt, out) == set()

    # run 2 (restart from checkpoint): 'a' violates again → restored state
    # makes streak(a)=2 → alert; 'b' stays clean
    _write_batch(spark, src, 1, bad_keys={"a"})
    got = _run_once(spark, src, ckpt, out)
    assert got == {("a", 2, 2)}

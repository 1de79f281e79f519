"""Structured Streaming validation + resumable manifest (kill/rerun)."""

import glob
import os

from pyspark.sql import functions as F

from json_schema_clj_spark.manifest import Manifest, run_resumable, snapshot_id_of
from json_schema_clj_spark.operators.validate import validate, verdicts, with_validation
from json_schema_clj_spark.sources.images import FLAGSHIP_SCHEMA, images_df
from json_schema_clj_spark.streaming.validate_stream import run_foreach_batch, violation_rate


def test_streaming_foreach_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    images_df(spark, 2000).write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)

    got = {}

    def sink(verd, viol, epoch_id):
        got["verdicts"] = verd.collect()
        got["n_viol"] = viol.count()

    q = run_foreach_batch(
        stream, FLAGSHIP_SCHEMA, id_cols=["image_id"], part_col="part_id",
        sink=sink, checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    assert sum(r["n_rows"] for r in got["verdicts"]) == 2000
    # batch equivalence: streaming micro-batch == batch run
    batch = validate(images_df(spark, 2000), FLAGSHIP_SCHEMA, ["image_id"], "part_id")
    assert got["n_viol"] == batch["violations"].count()


def test_streaming_violation_rate_plan(spark, tmp_path):
    src = str(tmp_path / "src2")
    df = images_df(spark, 100).withColumn("ts", F.current_timestamp())
    df.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    rate = violation_rate(stream, FLAGSHIP_SCHEMA, ts_col="ts", window="1 minute")
    assert rate.isStreaming
    assert "window" in rate.columns and "fail_rate" in rate.columns


def _process(chunk, parts):
    annotated = with_validation(chunk, FLAGSHIP_SCHEMA)
    return verdicts(annotated, "part_id").select(
        F.col("part_id").alias("part"), "n_rows", "n_fail"
    )


def test_manifest_resume_skips_committed(spark, tmp_path):
    df = images_df(spark, 4000, n_parts=8)
    mpath = str(tmp_path / "manifest")
    snap = snapshot_id_of(df)

    # first run: process only chunk 1 (simulate a kill after 1 chunk by
    # chunking at 4 parts and slicing the todo list via chunk_size)
    r1 = run_resumable(
        spark, df.where(F.col("part_id") < 4), "part_id", _process, mpath,
        run_id="r1", snapshot_id=snap, chunk_size=4,
    )
    assert r1["processed"] == [0, 1, 2, 3]

    # re-run over the FULL table: committed partitions are skipped
    r2 = run_resumable(
        spark, df, "part_id", _process, mpath, run_id="r1", snapshot_id=snap, chunk_size=4
    )
    assert r2["skipped"] == [0, 1, 2, 3]
    assert r2["processed"] == [4, 5, 6, 7]

    # a third run is a full no-op (idempotent)
    r3 = run_resumable(
        spark, df, "part_id", _process, mpath, run_id="r1", snapshot_id=snap, chunk_size=4
    )
    assert r3["processed"] == []
    assert r3["skipped"] == list(range(8))

    # manifest metrics match the injected violation rate
    m = Manifest(spark, mpath).read()
    assert m.count() == 8
    total_fail = m.agg(F.sum("n_fail")).collect()[0][0]
    assert total_fail == 4000 // 200 * 8  # 8 injected residues mod 200

    # a different snapshot id reprocesses everything (input changed)
    r4 = run_resumable(
        spark, df, "part_id", _process, mpath, run_id="r1", snapshot_id="other", chunk_size=8
    )
    assert r4["processed"] == list(range(8))


def test_snapshot_provider_injection(spark, tmp_path):
    # the manifest's input-version id is provider-pluggable: an Iceberg
    # snapshot_id() drops in where the parquet-listing fingerprint sits
    from json_schema_clj_spark import manifest as MF

    df = spark.range(10)
    base = MF.snapshot_id_of(df)

    MF.register_snapshot_provider(lambda d: "iceberg-snap-42")
    try:
        assert MF.snapshot_id_of(df) == "iceberg-snap-42"
        # a declining provider (None) falls through to the next layer
        MF.register_snapshot_provider(lambda d: None)
        assert MF.snapshot_id_of(df) == "iceberg-snap-42"
    finally:
        MF.clear_snapshot_providers()
    assert MF.snapshot_id_of(df) == base

"""Streaming dedup: first-seen-wins within the watermark, state survives
across micro-batches via the checkpoint, content-keyed variant agrees
with the batch exact-dedup canonical form."""

import os
from datetime import datetime, timedelta

from json_schema_clj_spark.streaming.dedup_stream import (
    dedup_stream,
    dedup_stream_by_content,
)

T0 = datetime(2026, 1, 1, 12, 0, 0)


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, ts timestamp"
    ).write.mode("append").parquet(path)


def _run_once(spark, src, ckpt, out_dir, op):
    stream = spark.readStream.schema("doc_id long, text string, ts timestamp").parquet(src)

    def sink(batch_df, epoch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        op(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        return sorted(
            (r["doc_id"], r["text"]) for r in spark.read.parquet(out_dir).collect()
        )
    except Exception:
        return []


def test_id_dedup_state_survives_restart(spark, tmp_path):
    src, ckpt, out = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "out")
    os.makedirs(src)
    op = lambda s: dedup_stream(s, ["doc_id"], "ts", watermark="1 hour")

    _write_batch(spark, src, [(1, "a", T0), (1, "a dup", T0 + timedelta(seconds=1)), (2, "b", T0)])
    got = _run_once(spark, src, ckpt, out, op)
    assert [d for d, _ in got] == [1, 2]

    # restart from checkpoint: id 1 within the horizon is still suppressed,
    # id 3 passes
    _write_batch(spark, src, [(1, "a again", T0 + timedelta(minutes=5)), (3, "c", T0)])
    got = _run_once(spark, src, ckpt, out, op)
    assert [d for d, _ in got] == [1, 2, 3]


def test_content_dedup_normalizes_like_batch(spark, tmp_path):
    src, ckpt, out = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "out")
    os.makedirs(src)
    op = lambda s: dedup_stream_by_content(s, "text", "ts", watermark="1 hour")

    # same canonical form (case/whitespace) → duplicates; helper column
    # does not leak into the output schema
    _write_batch(
        spark,
        src,
        [(1, "Hello  World", T0), (2, "hello world", T0 + timedelta(seconds=2)), (3, "other", T0)],
    )
    got = _run_once(spark, src, ckpt, out, op)
    assert [d for d, _ in got] == [1, 3]


def test_near_dedup_stream_cross_epoch(spark, tmp_path):
    """Two availableNow runs = two epochs; the second epoch's planted
    clones must pair with FIRST-epoch originals through the bucket store
    (no re-shingling of epoch 0), proving the streaming near-dedup path is
    epoch-split invariant."""
    from json_schema_clj_spark.streaming.dedup_stream import near_dedup_stream

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    pairs = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    def doc(d):  # disjoint per-doc vocabulary: only clones can collide
        return " ".join(f"w{d}{s}" for s in ("a", "b", "c", "d", "e"))

    def run():
        stream = spark.readStream.schema("doc_id long, text string").parquet(src)
        q = near_dedup_stream(stream, store, pairs, ckpt, threshold=0.9)
        q.awaitTermination(120)

    base = [(d, doc(d)) for d in range(6)]
    spark.createDataFrame(base, "doc_id long, text string").write.mode(
        "append"
    ).parquet(src)
    run()
    # epoch 0: disjoint vocabularies -> no pairs at all
    got0 = spark.read.parquet(pairs).collect()
    assert got0 == [], got0

    clones = [(d + 100, doc(d)) for d in range(6)]
    spark.createDataFrame(clones, "doc_id long, text string").write.mode(
        "append"
    ).parquet(src)
    run()
    got = sorted(
        (r["id_a"], r["id_b"], r["sim"]) for r in spark.read.parquet(pairs).collect()
    )
    assert got == [(d, d + 100, 1.0) for d in range(6)], got

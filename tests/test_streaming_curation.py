"""Streaming curation: cross-epoch exact + near dedup memory through the
epoch-keyed stores, the shared batch precedence tail, PII-redacted kept
sink, and the self-match guard (an epoch never dups against its own store
subdir)."""

from __future__ import annotations

from pyspark.sql import functions as F

from json_schema_clj_spark.operators.curation import CurationConfig
from json_schema_clj_spark.streaming.curate_stream import curate_stream


def doc(d, n=12):  # disjoint per-doc vocabulary: only planted clones collide
    return " ".join(f"w{d}t{i}" for i in range(n))


def _feed(spark, src, rows):
    spark.createDataFrame(rows, "doc_id long, text string").write.mode(
        "append"
    ).parquet(src)


def _run(spark, src, store, out, ckpt):
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = curate_stream(
        stream, store, out, ckpt,
        CurationConfig(min_tokens=5, near_threshold=0.5),
    )
    q.awaitTermination(120)


def test_curate_stream_cross_epoch(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # epoch 0: six distinct docs
    _feed(spark, src, [(d, doc(d)) for d in range(6)])
    _run(spark, src, store, out, ckpt)

    v0 = {r["doc_id"]: r["reason"]
          for r in spark.read.parquet(f"{out}/verdicts").collect()}
    # all kept — in particular nothing matched its OWN seen/LSH store rows
    assert v0 == {d: "kept" for d in range(6)}, v0

    # epoch 1: exact clone of 0, near clone of 1 (one appended token),
    # fresh PII doc, short doc, empty doc
    _feed(spark, src, [
        (100, doc(0)),
        (101, doc(1) + " extra"),
        (102, doc(7) + " mail bob@example.com"),
        (103, "just two"),
        (104, ""),
    ])
    _run(spark, src, store, out, ckpt)

    v = {r["doc_id"]: (r["verdict"], r["reason"])
         for r in spark.read.parquet(f"{out}/verdicts")
         .where(F.col("epoch") == "e1").collect()}
    assert v[100] == ("drop", "exact_dup")   # via the seen store, epoch 0
    assert v[101] == ("drop", "near_dup")    # via the LSH store, epoch 0
    assert v[102][1] == "kept"
    assert v[103] == ("drop", "too_short")
    assert v[104] == ("drop", "empty")

    kept1 = spark.read.parquet(f"{out}/kept").where(F.col("epoch") == "e1").collect()
    assert [r["doc_id"] for r in kept1] == [102]
    assert "bob@example.com" not in kept1[0]["text"]
    assert kept1[0]["n_redactions"] == 1
    # epoch 0's kept sink has all six, untouched by epoch 1
    assert spark.read.parquet(f"{out}/kept").where(F.col("epoch") == "e0").count() == 6


def test_curate_stream_in_batch_dups(spark, tmp_path):
    """Within one epoch: exact clones keep the min id, near clones drop the
    larger id — same tie-breaks as the batch path."""
    src = str(tmp_path / "src")
    _feed(spark, src, [
        (1, doc(1)), (2, doc(1)),            # in-batch exact pair -> 2 drops
        (3, doc(3)), (4, doc(3) + " tail"),  # in-batch near pair -> 4 drops
    ])
    _run(spark, src, str(tmp_path / "store"), str(tmp_path / "out"), str(tmp_path / "ckpt"))
    v = {r["doc_id"]: r["reason"]
         for r in spark.read.parquet(f"{tmp_path}/out/verdicts").collect()}
    assert v == {1: "kept", 2: "exact_dup", 3: "kept", 4: "near_dup"}, v

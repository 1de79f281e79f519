"""Streaming sessionization: native session_window emits finalized
sessions that agree exactly with the batch operator on the same rows;
late events inside the watermark merge; state survives restart."""

import os
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from json_schema_clj_spark.operators import sessions as SE
from json_schema_clj_spark.streaming.session_stream import session_stats_stream

T0 = datetime(2026, 2, 1, 9, 0, 0)
GAP = 60  # seconds
SCHEMA = "user long, ts timestamp_ntz"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(path)


def _run_once(spark, src, ckpt, out_dir):
    stream = spark.readStream.schema(SCHEMA).parquet(src)

    def sink(batch_df, epoch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        session_stats_stream(stream, "user", "ts", GAP, watermark="5 seconds")
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    try:
        return sorted(
            (r["key"], r["n_events"], r["start_s"], r["end_s"], r["duration_s"])
            for r in spark.read.parquet(out_dir).collect()
        )
    except Exception:
        return []


def test_streaming_sessions_match_batch(spark, tmp_path):
    src, ckpt, out = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "out")
    os.makedirs(src)

    batch1 = [
        (1, T0),
        (1, T0 + timedelta(seconds=30)),       # merges (30 < gap)
        (1, T0 + timedelta(seconds=200)),      # new session (170 > gap)
        (2, T0 + timedelta(seconds=10)),
    ]
    _write_batch(spark, src, batch1)
    got1 = _run_once(spark, src, ckpt, out)
    # watermark hasn't passed any session close yet within this run

    # a late event INSIDE the watermark horizon of run 2's input extends
    # user 1's open session; the far-future flush event closes everything
    batch2 = [
        (1, T0 + timedelta(seconds=230)),      # merges into the 200s session
        (9, T0 + timedelta(hours=2)),          # flush: advances watermark
    ]
    _write_batch(spark, src, batch2)
    got2 = _run_once(spark, src, ckpt, out)

    closed = [r for r in got2 if r[0] != 9]
    all_rows = [r for r in batch1 + batch2 if r[0] != 9]
    expect = sorted(
        (r["key"], r["n_events"], r["start_s"], r["end_s"], r["duration_s"])
        for r in SE.session_stats(
            spark.createDataFrame(all_rows, SCHEMA), "user", "ts", GAP
        ).collect()
    )
    assert closed == expect
    assert len(closed) == 3  # (1: 2 sessions) + (2: 1 session)
    # sanity on the merged late event: the 200s session spans 200..230
    import calendar

    t200 = calendar.timegm(T0.timetuple()) + 200  # wall-time epoch, tz-proof
    s1 = [r for r in closed if r[0] == 1 and r[2] == t200]
    assert len(s1) == 1 and s1[0][1] == 2 and s1[0][4] == 30

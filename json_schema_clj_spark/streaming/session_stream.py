"""Streaming sessionization — the unbounded-stream twin of
`operators/sessions.session_stats`, on Structured Streaming's NATIVE
session-window state machine (`session_window` + watermark): Spark merges
per-key windows incrementally in the state store and emits a session
exactly once, when the watermark passes its (last event + gap) end — no
custom state code, bounded state (open sessions only), late events inside
the watermark merge correctly.

The same timezone discipline as the batch operator: event time is
normalized to integer wall-time microseconds first (`_epoch_us`) and
rebuilt with `timestamp_micros`, so session placement and every emitted
epoch-second metric are bit-identical in any session timezone, and agree
with the batch operator on the same rows (pinned by
tests/test_streaming_sessions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sessions import _epoch_us


def session_stats_stream(
    stream_df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Aggregated streaming DataFrame: one row per finalized (key,
    session) with the batch operator's exact columns (n_events, start_s,
    end_s, duration_s — first/last event epoch seconds, NOT the
    gap-padded window end).  Append-mode downstream: a session row
    appears once, after the watermark passes its close.  `session_index`
    is intentionally absent — a global per-key ordinal over an unbounded
    stream would need unbounded state; callers needing it join on
    start_s after the fact."""
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    us = _epoch_us(stream_df, ts_col)
    evt = (
        stream_df.where(F.col(ts_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            us.alias("_us"),
            F.timestamp_micros(us).alias("_evt"),
        )
        .withWatermark("_evt", watermark)
    )
    return (
        evt.groupBy(
            "key",
            F.session_window("_evt", f"{int(gap_seconds)} seconds").alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.floor(F.min("_us") / 1_000_000).cast("long").alias("start_s"),
            F.floor(F.max("_us") / 1_000_000).cast("long").alias("end_s"),
        )
        .withColumn("duration_s", F.col("end_s") - F.col("start_s"))
        .drop("sw")
    )

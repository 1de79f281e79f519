"""Event sessionization — gap-based session assignment over a keyed event
stream (north-star extension; the reference is single-document and has no
temporal surface — analog: the per-value ordering contracts its
`formatMinimum`/`formatMaximum` keywords express, core.clj:1114-1151,
lifted to a per-key event sequence).

Two interchangeable paths, cross-checked in tests:

* `sessionize` — row-level tagging: the classic gaps-and-islands
  (lag-gap flag + running sum) over a window PARTITIONED BY the key.
  Parallel across keys; a single key's events do land in one task, which
  is the correct grain (a session is a per-key object) — skewed keys are
  a data property surfaced by `operators/skew.py`, not hidden here.
* `session_stats` — aggregate-level: Spark's native `session_window`
  grouping (Catalyst's built-in merging session-window operator, the
  same state machine Structured Streaming uses), producing one row per
  (key, session).  No window function over events at all — partial
  aggregated like any groupBy, so it's the 10^12-row path.

Timezone discipline: parquet event times are typically
isAdjustedToUTC=false (wall time), which Spark reads as TIMESTAMP_NTZ —
and any naive cast to TIMESTAMP would shift by the SESSION timezone,
making epoch outputs differ between two engines (or two runs) in
different zones.  `_epoch_us` therefore extracts integer wall-time
microseconds-since-epoch via pure timestamp arithmetic (`timestampdiff`
against an NTZ epoch literal) for NTZ inputs, and true-instant
`unix_micros` for real TIMESTAMP inputs; all session math and every
emitted metric runs on those integers, so results are bit-identical in
any zone.  Every output is integer (epoch seconds, counts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType


def _epoch_us(df: DataFrame, ts_col: str) -> Column:
    """Integer microseconds-since-epoch, timezone-independent: wall-time
    arithmetic for TIMESTAMP_NTZ columns, instant arithmetic otherwise."""
    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        return F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts_col}`)"
        ).cast("long")
    return F.unix_micros(F.col(ts_col).cast("timestamp"))


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """df + `session_index` (0-based per key, in time order): a new session
    starts when the gap since the key's previous event EXCEEDS
    `gap_seconds`.  The boundary matches `session_window` exactly
    (pinned by test_sessionize_gap_boundary_matches_session_window): that
    operator treats a session's window end as INCLUSIVE for merging — an
    event at precisely t+gap still merges — hence break iff diff > gap,
    on integer microseconds."""
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    us = _epoch_us(df, ts_col)
    w = Window.partitionBy(key_col).orderBy(us)
    prev = F.lag(us).over(w)
    gap_us = int(gap_seconds) * 1_000_000
    is_break = F.when(
        prev.isNull() | (us - prev > gap_us), F.lit(1)
    ).otherwise(F.lit(0))
    cum = Window.partitionBy(key_col).orderBy(us).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn(
        "session_index", (F.sum(is_break).over(cum) - F.lit(1)).cast("long")
    )


def session_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """One row per (key, session) via Spark's native `session_window`
    aggregation: n_events, start_s/end_s (epoch seconds of the first/last
    event — NOT session_window's gap-padded `end`), duration_s, plus a
    0-based `session_index` in time order (a window over the already
    aggregated |sessions| rows, not over events).

    The event time fed to session_window is reconstructed from the
    integer micros (`timestamp_micros`), so window placement is
    timezone-independent too."""
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    us = _epoch_us(df, ts_col)
    out = (
        df.where(F.col(ts_col).isNotNull())
        .select(F.col(key_col).alias("key"), us.alias("_us"))
        .groupBy(
            "key",
            F.session_window(
                F.timestamp_micros(F.col("_us")), f"{int(gap_seconds)} seconds"
            ).alias("sw"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.floor(F.min("_us") / 1_000_000).cast("long").alias("start_s"),
            F.floor(F.max("_us") / 1_000_000).cast("long").alias("end_s"),
        )
        .withColumn("duration_s", F.col("end_s") - F.col("start_s"))
        .drop("sw")
    )
    w = Window.partitionBy("key").orderBy("start_s")
    return out.withColumn(
        "session_index", (F.row_number().over(w) - F.lit(1)).cast("long")
    )

"""Streaming deduplication — exact-dup suppression over an unbounded
stream (an extension; the reference is batch-only, SURVEY.md §2.7).

``dropDuplicatesWithinWatermark`` keeps per-key state only within the
watermark horizon, so state stays bounded at any stream length — the
unbounded ``dropDuplicates`` variant would accumulate one state row per
distinct key forever, which at 10^12 events is a state-store OOM, not a
dedup strategy.  Keys are hashed (xxhash64 of the id columns / md5 of
normalized content) so the state store carries 8-16 bytes per key instead
of full document text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import text_hash


def dedup_stream(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-seen-wins per key within the watermark horizon: late
    duplicates inside the horizon are dropped; a key re-appearing after
    its state expired is treated as new (the documented
    at-least-once-per-horizon contract)."""
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(key_cols)


def dedup_stream_by_content(
    stream_df: DataFrame,
    text_col: str,
    ts_col: str,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Content dedup: key = md5 of the normalized text (the same canonical
    form as batch `exact_dedup`, so stream + batch agree on what counts as
    a duplicate)."""
    keyed = stream_df.withColumn("_content_key", text_hash(F.col(text_col)))
    return (
        keyed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_content_key"])
        .drop("_content_key")
    )

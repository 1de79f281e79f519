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


def near_dedup_stream(
    stream_df: DataFrame,
    store_path: str,
    pairs_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    trigger_once: bool = True,
):
    """Streaming NEAR-duplicate detection: each micro-batch ingests into
    the banded MinHash-LSH bucket store and writes the near-dup pairs
    touching the batch (new x new plus new x all previously ingested) to a
    parquet sink — :func:`..operators.dedup.lsh_incremental_near_duplicates`
    under Structured Streaming's foreachBatch contract.

    Old batches are never re-shingled: the store carries their narrow
    (id, band, bh) rows plus an (id, sig) sidecar, so per-epoch cost is
    O(|batch| + candidates), not O(|corpus|) — the property that makes a
    continuously-arriving 10^12-doc corpus dedupable at all.  foreachBatch
    is at-least-once; both the store subdirs and the pairs sink are keyed
    by epoch and written with overwrite, so a replayed epoch rewrites its
    own output idempotently (the same crash shape as the violations sink).
    Restart resumes from `checkpoint_dir`.
    """
    from ..operators.dedup import lsh_incremental_near_duplicates

    def process(batch_df: DataFrame, epoch_id: int):
        pairs = lsh_incremental_near_duplicates(
            batch_df, store_path, f"e{epoch_id}",
            text_col=text_col, id_col=id_col,
            k=k, num_hashes=num_hashes, bands=bands, threshold=threshold,
        )
        pairs.write.mode("overwrite").parquet(f"{pairs_path}/epoch=e{epoch_id}")

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()


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

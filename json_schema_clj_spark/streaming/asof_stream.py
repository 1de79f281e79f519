"""Streaming as-of enrichment — the streaming lift of the batch as-of
join (operators/asof.py): each micro-batch of facts is matched to the
dimension version that was current at its event time, and the enriched
rows land in an epoch-keyed sink.  The streaming shape of "validate this
fact against the `$ref` target as it existed when the fact happened".

10^12-row properties:

* per-epoch cost is O(|batch| + |versions|): the versioned dim is STATIC
  per the operator's contract (version updates = restart with the new
  table, exactly like the referential monitor's dim); nothing accumulates
  across epochs;
* the per-batch join is the batch operator itself, so the time-bucketed
  no-single-partition plan shape and the NULL-version/NULL-time semantics
  are identical by construction — the streaming test pins batch-equality
  on the same rows;
* the sink is an epoch-keyed overwrite subdir: at-least-once replays are
  idempotent (same crash contract as every sink in the streaming layer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.asof import asof_join


def asof_stream(
    stream_df: DataFrame,
    dims: DataFrame,
    key_cols: list[str],
    fact_ts: str,
    dim_ts: str,
    dim_cols: list[str],
    results_path: str,
    checkpoint_dir: str,
    n_parts: int | None = None,
    trigger_once: bool = True,
):
    """Start the enrichment stream: per micro-batch,
    `asof_join(batch, dims, ...)` into `results_path/epoch=e<id>`
    (overwrite = idempotent replay).  Returns the StreamingQuery."""

    def process(batch_df: DataFrame, epoch_id: int):
        out = asof_join(
            batch_df, dims, key_cols, fact_ts, dim_ts, dim_cols, n_parts=n_parts
        )
        out.write.mode("overwrite").parquet(f"{results_path}/epoch=e{epoch_id}")

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

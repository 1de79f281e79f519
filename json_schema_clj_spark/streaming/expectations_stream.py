"""Streaming expectation monitor — the per-epoch ingestion gate: every
micro-batch is checked against the declarative expectation suite
(operators/expectations.run_expectations) and the verdict rows land in
an epoch-keyed sink.  This is the contract an ingestion pipeline
actually wants from expectations on an unbounded stream: each arriving
batch either satisfies the table-shape assertions (null budget, value
ranges, set membership, per-batch row count) or is flagged BEFORE it is
merged downstream — a per-batch gate, not a cumulative one.  (Cumulative
table-level monitoring is the profile monitor's job,
streaming/profile_stream.py, whose stored measures are mergeable.)

Per-epoch cost is O(|batch|): one aggregation pass per batch, nothing
cross-epoch.  Each epoch overwrites its own sink subdir, so
foreachBatch's at-least-once replays are idempotent — the same crash
contract as every other sink in the streaming layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.expectations import run_expectations


def expectations_stream(
    stream_df: DataFrame,
    suite: list[dict],
    results_path: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """Start the monitor: per micro-batch, `run_expectations(batch,
    suite)` plus `epoch` and `n_rows` columns into
    `results_path/epoch=e<id>` (overwrite = idempotent replay).  Returns
    the StreamingQuery."""

    def process(batch_df: DataFrame, epoch_id: int):
        out = run_expectations(batch_df, suite).withColumn(
            "epoch", F.lit(f"e{epoch_id}")
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

"""Structured Streaming validation — the streaming lift of the batch
runner (an extension; the reference is batch-only, SURVEY.md §2.7).

The compiled Column check tree is stateless, so it applies unchanged to a
streaming DataFrame: readStream → withColumn(violations/valid) →

* `validated_stream`    — per-row annotated stream (append mode),
* `violation_rate`      — watermarked tumbling-window violation counts
                          (handles late data; update/append via the sink),
* `run_foreach_batch`   — micro-batch sink writing verdicts + violation
                          rows atomically per epoch_id (exactly-once via
                          idempotent epoch keys).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.validate import verdicts, violation_rows, with_validation


def validated_stream(stream_df: DataFrame, schema: dict, config: Optional[dict] = None) -> DataFrame:
    """Annotate a streaming DataFrame with violations + valid (stateless —
    identical plan to the batch path; whole-stage codegen per micro-batch)."""
    return with_validation(stream_df, schema, config=config)


def violation_rate(
    stream_df: DataFrame,
    schema: dict,
    ts_col: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    config: Optional[dict] = None,
) -> DataFrame:
    """Windowed violation-rate monitor with late-data handling:
    (window, n_rows, n_fail, fail_rate)."""
    v = validated_stream(stream_df, schema, config=config)
    return (
        v.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("window"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((~F.col("valid")).cast("long")).alias("n_fail"),
        )
        .withColumn("fail_rate", F.col("n_fail") / F.col("n_rows"))
    )


def run_foreach_batch(
    stream_df: DataFrame,
    schema: dict,
    id_cols: list[str],
    part_col: str,
    sink: Callable[[DataFrame, DataFrame, int], None],
    checkpoint_dir: str,
    config: Optional[dict] = None,
    trigger_once: bool = True,
):
    """Micro-batch validation sink: per epoch, compute verdict rollups and
    violation rows for the batch and hand both to `sink(verdicts_df,
    violations_df, epoch_id)`.  Restart resumes from the checkpoint."""

    def process(batch_df: DataFrame, epoch_id: int):
        annotated = with_validation(batch_df, schema, config=config)
        sink(verdicts(annotated, part_col), violation_rows(annotated, id_cols), epoch_id)

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

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


def violation_streaks(
    stream_df: DataFrame,
    schema: dict,
    key_col: str,
    streak_threshold: int = 3,
    config: Optional[dict] = None,
):
    """Custom stateful streaming operator via applyInPandasWithState: per
    key, carry a running streak of consecutive micro-batch appearances that
    contained at least one invalid row; emit (key, streak, n_fail_total)
    whenever the streak reaches `streak_threshold` (a flapping-source
    detector — state survives restarts through the stream checkpoint).

    The reference has no streaming surface (SURVEY.md §2.7); this is the
    `applyInPandasWithState` extension point the engine offers for custom
    stateful checks.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    v = validated_stream(stream_df, schema, config=config)
    grouped = v.select(F.col(key_col).alias("k"), "valid").groupBy("k")

    out_schema = "k string, streak long, n_fail_total long"
    state_schema = "streak long, n_fail_total long"

    def update(key, pdfs, state: GroupState):
        n_fail = 0
        for pdf in pdfs:
            n_fail += int((~pdf["valid"]).sum())
        streak, total = state.get if state.exists else (0, 0)
        if n_fail > 0:
            streak += 1
            total += n_fail
        else:
            streak = 0
        state.update((streak, total))
        if streak >= streak_threshold:
            yield pd.DataFrame({"k": [key[0]], "streak": [streak], "n_fail_total": [total]})

    return grouped.applyInPandasWithState(
        update, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )

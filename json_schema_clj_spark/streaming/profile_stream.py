"""Streaming schema-profile monitor — the streaming lift of the
inference family (operators/infer.py), watching for SCHEMA-space drift
the way drift_stream.py watches value distributions.

Per micro-batch the raw rows collapse to one WIDE mergeable profile row
(counts, typed min/max, one HLL sketch per column) appended to an
epoch-keyed parquet store; the cumulative profile is then re-derived by
merging the |epochs| stored rows (sum / min / max / hll_union_agg — every
measure is a mergeable aggregate, which is the point of storing sketches
instead of estimates) and diffed against a static baseline profile with
`profile_drift`.  Each epoch overwrites its own store + drift subdirs, so
foreachBatch's at-least-once replays are idempotent — the same crash
contract as the violations sink, the near-dedup store and the drift
monitor.

Scale: per-epoch cost is O(|batch| + |epochs|) — old batches are never
rescanned; the store row is a few hundred bytes per column per epoch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.infer import json_type_of, profile_drift

# hll_sketch_agg only accepts int/long/string/binary; other types are
# sketched through an injective cast-to-string (shortest-roundtrip
# rendering keeps distinct values distinct), matching the any-type
# coverage of the batch profile path
_SKETCHABLE = (T.IntegerType, T.LongType, T.ShortType, T.ByteType, T.StringType, T.BinaryType)

_PROFILE_SCHEMA = (
    "column string, json_type string, n_rows long, n_null long, "
    "required boolean, unique boolean, min_value string, max_value string, "
    "n_distinct long, enum_values string"
)


def epoch_profile_wide(batch_df: DataFrame, cols: list[str], lg_k: int = 12) -> DataFrame:
    """One wide row per batch: every column's mergeable profile state
    (null count, TYPED min/max — string min/max would merge

    lexicographically wrong for numbers — and an HLL sketch binary for
    distinct counting across epochs)."""
    dtypes = {f.name: f.dataType for f in batch_df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        col = F.col(c)
        sketch_col = col if isinstance(dtypes[c], _SKETCHABLE) else col.cast("string")
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.min(col).alias(f"{c}__min"))
        aggs.append(F.max(col).alias(f"{c}__max"))
        aggs.append(F.hll_sketch_agg(sketch_col, F.lit(lg_k)).alias(f"{c}__hll"))
    return batch_df.agg(*aggs)


def merged_profile(
    store: DataFrame, cols: list[str], dtypes: dict, spark, lg_k: int = 12
) -> DataFrame:
    """Merge the epoch store's wide rows into one cumulative
    `constraint_profile`-shaped DataFrame (no enum — a bounded enum set is
    not safely mergeable under HLL underestimates, and `profile_drift`
    simply skips enum rows when enum_values is NULL)."""
    aggs = [F.sum("n_rows").alias("n_rows")]
    for c in cols:
        aggs.append(F.sum(f"{c}__nulls").alias(f"{c}__nulls"))
        aggs.append(F.min(f"{c}__min").cast("string").alias(f"{c}__min"))
        aggs.append(F.max(f"{c}__max").cast("string").alias(f"{c}__max"))
        aggs.append(
            F.hll_sketch_estimate(F.hll_union_agg(F.col(f"{c}__hll"))).alias(
                f"{c}__distinct"
            )
        )
    row = store.agg(*aggs).collect()[0]
    # the distinct side is an HLL estimate while non_null is exact, so a
    # truly-unique column can estimate a few standard errors low; apply
    # the same ~3·RSE advisory tolerance as candidate_keys/fd_candidates
    # (RSE ≈ 1.04 / sqrt(2^lg_k) — pass the same lg_k the store's
    # sketches were built with)
    rse = 1.04 / (2 ** (lg_k / 2))
    out = []
    for c in cols:
        n_null = row[f"{c}__nulls"]
        non_null = row["n_rows"] - n_null
        out.append(
            (
                c,
                json_type_of(dtypes[c]),
                row["n_rows"],
                n_null,
                bool(n_null == 0),
                bool(non_null > 0 and row[f"{c}__distinct"] >= non_null * (1 - 3 * rse)),
                row[f"{c}__min"],
                row[f"{c}__max"],
                row[f"{c}__distinct"],
                None,
            )
        )
    return spark.createDataFrame(out, _PROFILE_SCHEMA)


def profile_stream(
    stream_df: DataFrame,
    baseline_profile: DataFrame,
    cols: list[str],
    store_path: str,
    drift_path: str,
    checkpoint_dir: str,
    lg_k: int = 12,
    trigger_once: bool = True,
):
    """foreachBatch schema monitor: per epoch, profile the batch into one
    mergeable wide row, overwrite the epoch's store subdir, merge the
    cumulative store, diff it against `baseline_profile` (a static
    `constraint_profile` result — e.g. the profile the current schema was
    inferred from) and overwrite the epoch's drift subdir with
    `(column, change, before, after)` rows.  An empty drift output means
    the stream still conforms to the baseline schema's constraints."""
    dtypes = {f.name: f.dataType for f in stream_df.schema.fields}

    def process(batch_df: DataFrame, epoch_id: int):
        spark = batch_df.sparkSession
        wide = epoch_profile_wide(batch_df, cols, lg_k)
        wide.write.mode("overwrite").parquet(f"{store_path}/epoch=e{epoch_id}")
        store = spark.read.schema(wide.schema).parquet(store_path)
        prof = merged_profile(store, cols, dtypes, spark, lg_k)
        drift = profile_drift(baseline_profile, prof)
        drift.write.mode("overwrite").parquet(f"{drift_path}/epoch=e{epoch_id}")

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

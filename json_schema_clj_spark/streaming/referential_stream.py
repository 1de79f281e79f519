"""Streaming referential-integrity monitoring — the streaming lift of the
batch anti-join check (operators/referential.py `dangling`; an extension,
the reference is batch-only, SURVEY.md §2.7).

Per micro-batch the incoming fact rows are LEFT-joined (broadcast) against
the distinct key projection of a STATIC dimension table; rows whose key
tuple finds no match land in an epoch-keyed dangling sink and a one-row
epoch summary (n_rows, n_null_key, n_dangling) lands next to it.  The
10^12-row properties:

* per-epoch cost is O(|batch|) — the dim side is a broadcast distinct key
  projection (|distinct keys|, not |dim rows|), and no state accumulates
  across epochs: referential checks are per-row, so unlike dedup/drift
  there is nothing cumulative to store;
* one join evaluation per epoch: the joined frame is persisted, both the
  dangling sink and the summary aggregate read it, then it is released;
* both sinks are epoch-keyed overwrite subdirs, so foreachBatch's
  at-least-once replays rewrite their own output idempotently (same crash
  contract as the violations sink and the streaming near-dedup store).

Null semantics mirror the batch operator and the keyword presence guard:
a row with ANY null key component cannot positively mismatch — it is
counted as ``n_null_key`` and never emitted as dangling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MARK = "__dim_hit"


def batch_referential_rows(
    batch_df: DataFrame,
    fact_key: str | list[str],
    dim_keys: DataFrame,
) -> DataFrame:
    """The shared per-batch core: `batch_df` LEFT-joined against the
    (already distinct, already aliased-to-fact-names) `dim_keys` frame,
    with derived boolean flags ``__null_key`` / ``__dangling``.  Exposed
    separately so tests can replay an epoch through the exact production
    path."""
    fact_keys = [fact_key] if isinstance(fact_key, str) else list(fact_key)
    null_key = F.lit(False)
    for k in fact_keys:
        null_key = null_key | F.col(k).isNull()
    joined = batch_df.join(
        F.broadcast(dim_keys.withColumn(_MARK, F.lit(1))), on=fact_keys, how="left"
    )
    return joined.withColumn("__null_key", null_key).withColumn(
        "__dangling", ~null_key & F.col(_MARK).isNull()
    )


def referential_stream(
    stream_df: DataFrame,
    fact_key: str | list[str],
    dim: DataFrame,
    dim_key: str | list[str],
    dangling_path: str,
    summary_path: str,
    checkpoint_dir: str,
    trigger_once: bool = True,
):
    """foreachBatch referential monitor: per epoch, anti-check the batch
    against the static `dim`, overwrite the epoch's dangling-rows subdir
    (original fact columns only) and the epoch's one-row summary subdir
    ``(epoch, n_rows, n_null_key, n_dangling)``.  Restart resumes from
    `checkpoint_dir`; a replayed epoch rewrites its own subdirs."""
    fact_keys = [fact_key] if isinstance(fact_key, str) else list(fact_key)
    dim_cols = [dim_key] if isinstance(dim_key, str) else list(dim_key)
    if len(fact_keys) != len(dim_cols):
        raise ValueError(
            f"fact_key/dim_key arity mismatch: {fact_keys} vs {dim_cols}"
        )
    dim_keys = dim.select(
        *[F.col(d).alias(f) for d, f in zip(dim_cols, fact_keys)]
    ).distinct()

    def process(batch_df: DataFrame, epoch_id: int):
        flagged = batch_referential_rows(batch_df, fact_keys, dim_keys)
        flagged.persist()
        try:
            flagged.where("__dangling").select(*batch_df.columns).write.mode(
                "overwrite"
            ).parquet(f"{dangling_path}/epoch=e{epoch_id}")
            summary = flagged.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("__null_key").cast("long")).alias("n_null_key"),
                F.sum(F.col("__dangling").cast("long")).alias("n_dangling"),
            ).select(F.lit(epoch_id).alias("epoch"), "*")
            summary.write.mode("overwrite").parquet(
                f"{summary_path}/epoch=e{epoch_id}"
            )
        finally:
            flagged.unpersist()

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

"""Streaming corpus curation — the curate() composition over an unbounded
document stream (an extension; the reference is batch-only, SURVEY.md §2.7).

Per micro-batch, under Structured Streaming's foreachBatch contract:

1. **exact dedup with cross-epoch memory** — the batch's normalized-text
   hashes land in an epoch-partitioned seen-hash store BEFORE the check
   (``seen/batch=e<N>/``, overwrite — the crash-idempotent shape shared
   with the LSH and violations stores); a doc is ``exact_dup`` if its hash
   exists in any OTHER epoch's subdir (first-seen-wins across epochs; a
   replayed epoch rewrites its own subdir and never matches itself) or if
   a smaller id in the same batch shares it.
2. **near-dup with cross-epoch memory** — the incremental banded
   MinHash-LSH store (``operators.dedup.lsh_incremental_near_duplicates``:
   narrow band rows + sig sidecar, per-epoch cost O(|batch| + candidates),
   old epochs never re-shingled).  Pairing a NEW doc with a STORED one
   drops the new doc regardless of id order (the stored doc already
   shipped downstream and cannot be recalled); new×new pairs drop the
   larger id, matching the batch path.
3. **verdicts + redacted kept corpus** — the flag frame feeds the same
   ``verdict_rows``/``redacted_kept`` precedence tail the batch
   ``curate()`` uses, so stream and batch agree on every gate; both
   outputs are epoch-keyed overwrite sinks (idempotent replay), and
   restart resumes from ``checkpoint_dir``.

State is all on-disk parquet keyed by epoch — no unbounded driver or
state-store growth; the streaming job's memory footprint is one batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.curation import CurationConfig, redacted_kept, verdict_rows
from ..operators.dedup import lsh_incremental_near_duplicates, text_hash


def curate_stream(
    stream_df: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint_dir: str,
    cfg: CurationConfig = CurationConfig(),
    text_col: str = "text",
    id_col: str = "doc_id",
    trigger_once: bool = True,
):
    """Start the streaming curation query; returns the StreamingQuery.

    Sinks: ``out_path/verdicts/epoch=e<N>/`` (id, verdict, reason) for
    every row of the epoch, and ``out_path/kept/epoch=e<N>/`` (id,
    redacted text, n_redactions, n_tokens) for its survivors.
    """

    def process(batch_df: DataFrame, epoch_id: int):
        spark = batch_df.sparkSession
        eb = f"e{epoch_id}"
        tcol = F.col(text_col)
        batch = batch_df.select(id_col, text_col)
        non_empty = batch.where(tcol.isNotNull() & (F.trim(tcol) != ""))
        hashed = non_empty.select(id_col, text_hash(tcol).alias("th"))

        # 1. exact: own subdir first, then first-seen-wins vs other epochs
        hashed.write.mode("overwrite").parquet(f"{store_path}/seen/batch={eb}")
        seen = (
            spark.read.parquet(f"{store_path}/seen")
            .where(F.col("batch") != eb)
            .select("th")
            .distinct()
        )
        keep_in_batch = hashed.groupBy("th").agg(F.min(id_col).alias("keep_id"))
        exact_ids = (
            hashed.join(keep_in_batch, "th")
            .where(F.col(id_col) != F.col("keep_id"))
            .select(id_col)
            .unionByName(hashed.join(seen, "th", "left_semi").select(id_col))
            .distinct()
            .withColumn("is_exact", F.lit(True))
        )

        # 2. near: incremental LSH; new×stored drops the new side.  Only
        # the exact-dedup KEEPERS enter the store (mirrors batch
        # curate()): an exact-dropped doc's keeper — in this batch or a
        # prior epoch's store — has identical text, so its buckets and
        # pairs subsume the clone's, and the store/bucket join never
        # carries exact-clone inflation.
        if cfg.near_threshold is not None:
            keeper_docs = non_empty.join(
                exact_ids.select(id_col), id_col, "left_anti"
            )
            pairs = lsh_incremental_near_duplicates(
                keeper_docs, f"{store_path}/lsh", eb,
                text_col=text_col, id_col=id_col,
                k=cfg.shingle_k, threshold=cfg.near_threshold,
                max_bucket_size=cfg.lsh_max_bucket_size,
            )
            ba = keeper_docs.select(F.col(id_col).alias("id_a"), F.lit(True).alias("a_in"))
            bb = keeper_docs.select(F.col(id_col).alias("id_b"), F.lit(True).alias("b_in"))
            flagged_pairs = pairs.join(ba, "id_a", "left").join(bb, "id_b", "left")
            drop_id = (
                F.when(F.col("a_in") & F.col("b_in"), F.col("id_b"))  # new×new: larger id
                .when(F.col("a_in"), F.col("id_a"))  # new×stored: the new side
                .otherwise(F.col("id_b"))
            )
            near_ids = (
                flagged_pairs.select(drop_id.alias(id_col))
                .distinct()
                .withColumn("is_near", F.lit(True))
            )
        else:
            near_ids = batch.select(id_col).limit(0).withColumn("is_near", F.lit(True))

        # 3. shared precedence tail + epoch-keyed idempotent sinks
        flagged = batch.join(exact_ids, id_col, "left").join(near_ids, id_col, "left")
        verdicts = verdict_rows(flagged, cfg, text_col, id_col)
        verdicts.write.mode("overwrite").parquet(f"{out_path}/verdicts/epoch={eb}")
        kept = redacted_kept(
            batch, spark.read.parquet(f"{out_path}/verdicts/epoch={eb}"), cfg,
            text_col, id_col,
        )
        kept.write.mode("overwrite").parquet(f"{out_path}/kept/epoch={eb}")

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

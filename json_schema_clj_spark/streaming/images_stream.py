"""Streaming multimodal ingestion gate — per-epoch image+caption health.

The graft cell's input shape (BASELINE.json input_hint: image_id, bytes,
w, h, fmt, caption, phash) arrives as a stream; each micro-batch gets a
layered health profile per format:

* magic-number conformance (declared `fmt` vs leading bytes) and HEADER
  conformance (PNG IHDR geometry + the JPEG marker-walk SOF mode/dims + the WebP RIFF chunk walk)
  run in pure Catalyst at scan speed — the cheap layers that gate the
  expensive one,
* REAL pixel decode on a deterministic xxhash64 sample of rows that
  passed the header gate (Arrow-batched `compute_phashes`; sampling
  keeps the Python stage a bounded fraction of each epoch),
* caption presence (the cross-modal claim of the pair table).

Results land in `results_path/epoch=e<id>` (overwrite = idempotent
replay, same protocol as the other nine streaming modules); the stream
itself carries NO state — all layers are per-row, so a 1000-executor
deployment scales by partitioning alone.

The reference is batch-only (SURVEY.md §2.7); this is part of the
streaming extension surface, mirroring streaming/validate_stream.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.multimodal import (
    compute_phashes,
    jpeg_header_dims,
    png_header_dims,
    webp_header_dims,
)

#: F.hex() emits uppercase
_PNG_MAGIC_HEX = "89504E470D0A1A0A"
_JPEG_MAGIC_HEX = "FFD8FF"


def image_health_profile(df: DataFrame, decode_sample_mod: int = 4) -> DataFrame:
    """Batch-shaped core (stateless → applies unchanged per micro-batch):
    one row per `fmt` with layered conformance counts.

    Columns: fmt, n, n_magic_ok, n_hdr_ok, n_dim_ok, n_caption_ok,
    n_sampled, n_decoded.  `n_hdr_ok`/`n_dim_ok` come from the pure-
    Catalyst header parsers; `n_decoded` from the Arrow decode of the
    1-in-`decode_sample_mod` xxhash64 sample of header-clean rows."""
    head = F.hex(F.substring(F.col("bytes"), 1, 8))
    magic_ok = (
        F.when(F.col("fmt").isin("png", "qpng"), head == F.lit(_PNG_MAGIC_HEX))
        .when(F.col("fmt") == "jpeg", head.startswith(_JPEG_MAGIC_HEX))
        .when(F.col("fmt") == "webp", head.startswith("52494646"))  # "RIFF"
        .otherwise(F.lit(False))
    )
    p = png_header_dims(df)
    p = p.select(
        *df.columns,
        F.col("hdr_ok").alias("_p_ok"),
        F.col("w_hdr").alias("_p_w"),
        F.col("h_hdr").alias("_p_h"),
    )
    jq = jpeg_header_dims(p)
    jq = jq.select(
        *df.columns, "_p_ok", "_p_w", "_p_h",
        F.col("sof_marker").alias("_sof"),
        F.col("w_hdr").alias("_j_w"),
        F.col("h_hdr").alias("_j_h"),
    )
    j = webp_header_dims(jq)
    hdr_ok = (
        F.when(F.col("fmt").isin("png", "qpng"), F.col("_p_ok"))
        .when(F.col("fmt") == "jpeg", F.col("_sof") != 0)
        .when(F.col("fmt") == "webp", F.col("webp_kind") != "none")
        .otherwise(F.lit(False))
    )
    dim_ok = (
        F.when(
            F.col("fmt").isin("png", "qpng"),
            F.col("_p_ok") & (F.col("_p_w") == F.col("w")) & (F.col("_p_h") == F.col("h")),
        )
        .when(
            F.col("fmt") == "jpeg",
            (F.col("_sof") != 0)
            & (F.col("_j_w") == F.col("w"))
            & (F.col("_j_h") == F.col("h")),
        )
        .when(
            F.col("fmt") == "webp",
            (F.col("webp_kind") != "none")
            & (F.col("w_hdr") == F.col("w"))
            & (F.col("h_hdr") == F.col("h")),
        )
        .otherwise(F.lit(False))
    )
    annotated = j.select(
        *df.columns,
        magic_ok.alias("_magic_ok"),
        hdr_ok.alias("_hdr_ok"),
        dim_ok.alias("_dim_ok"),
        (F.col("caption").isNotNull() & (F.length("caption") > 0)).alias("_cap_ok"),
        (F.pmod(F.xxhash64(F.col("image_id")), F.lit(decode_sample_mod)) == 0).alias(
            "_sampled"
        ),
    )
    sampled = annotated.where(F.col("_sampled") & F.col("_hdr_ok"))
    decoded = compute_phashes(sampled).select(
        "image_id", F.col("decoded").alias("_decoded")
    )
    joined = annotated.join(decoded, "image_id", "left")
    return (
        joined.groupBy("fmt")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_magic_ok").cast("long")).alias("n_magic_ok"),
            F.sum(F.col("_hdr_ok").cast("long")).alias("n_hdr_ok"),
            F.sum(F.col("_dim_ok").cast("long")).alias("n_dim_ok"),
            F.sum(F.col("_cap_ok").cast("long")).alias("n_caption_ok"),
            F.sum((F.col("_sampled") & F.col("_hdr_ok")).cast("long")).alias("n_sampled"),
            F.sum(F.coalesce(F.col("_decoded"), F.lit(False)).cast("long")).alias(
                "n_decoded"
            ),
        )
        .orderBy("fmt")
    )


def image_health_stream(
    stream_df: DataFrame,
    results_path: str,
    checkpoint_dir: str,
    decode_sample_mod: int = 4,
    trigger_once: bool = True,
):
    """Start the ingestion-gate stream: per micro-batch,
    `image_health_profile(batch)` into `results_path/epoch=e<id>`
    (overwrite = idempotent replay).  Returns the StreamingQuery."""

    def process(batch_df: DataFrame, epoch_id: int):
        out = image_health_profile(batch_df, decode_sample_mod=decode_sample_mod)
        out.write.mode("overwrite").parquet(f"{results_path}/epoch=e{epoch_id}")

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()

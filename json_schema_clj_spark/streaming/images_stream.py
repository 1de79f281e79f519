"""Streaming multimodal ingestion gate — per-epoch image+caption health.

The graft cell's input shape (BASELINE.json input_hint: image_id, bytes,
w, h, fmt, caption, phash) arrives as a stream; each micro-batch gets a
layered health profile per format:

* magic-number conformance (declared `fmt` vs leading bytes) and HEADER
  conformance (PNG IHDR geometry + the JPEG marker-walk SOF mode/dims + the WebP RIFF chunk walk)
  run in pure Catalyst at scan speed — the cheap layers that gate the
  expensive one,
* REAL pixel decode on a deterministic xxhash64 sample of rows that
  passed the header gate (one Arrow-batched mapInPandas; sampling
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
    jpeg_header_struct,
    png_header_struct,
    webp_header_struct,
)

#: F.hex() emits uppercase
_PNG_MAGIC_HEX = "89504E470D0A1A0A"
_JPEG_MAGIC_HEX = "FFD8FF"


def image_health_profile(df: DataFrame, decode_sample_mod: int = 4) -> DataFrame:
    """Batch-shaped core (stateless → applies unchanged per micro-batch):
    one row per `fmt` with layered conformance counts.

    Columns: fmt, n, n_magic_ok, n_hdr_ok, n_dim_ok, n_caption_ok,
    n_sampled, n_decoded.  `n_hdr_ok`/`n_dim_ok` come from the pure-
    Catalyst header parsers, each GATED on its format (a PNG row never
    pays the JPEG marker walk); `n_decoded` from an Arrow decode of the
    1-in-`decode_sample_mod` xxhash64 sample of header-clean rows,
    carried ROW-FOR-ROW through one mapInPandas (no join: duplicate or
    NULL image_ids can't double-count or drop decode results, and the
    corpus is scanned exactly once).  Unsampled rows ship a NULL instead
    of their bytes, so the Arrow transfer stays proportional to the
    sample fraction."""
    fmt, b = F.col("fmt"), F.col("bytes")
    head = F.hex(F.substring(b, 1, 8))
    magic_ok = (
        F.when(fmt.isin("png", "qpng"), head == F.lit(_PNG_MAGIC_HEX))
        .when(fmt == "jpeg", head.startswith(_JPEG_MAGIC_HEX))
        .when(
            fmt == "webp",
            (F.hex(F.substring(b, 1, 4)) == "52494646")  # "RIFF"
            & (F.hex(F.substring(b, 9, 4)) == "57454250"),  # "WEBP"
        )
        .otherwise(F.lit(False))
    )
    # each walk materialized ONCE as a struct column, its init gated on
    # the row's format (non-matching rows start in the dead state and
    # short-circuit every step at runtime).  Downstream expressions touch
    # only column references — wrapping the struct in an outer CASE and
    # extracting fields would copy the whole walk per field and blow up
    # Catalyst canonicalization (observed: OOM in buildCanonicalizedPlan).
    with_structs = df.select(
        *df.columns,
        png_header_struct(b, only=fmt.isin("png", "qpng")).alias("_ps"),
        jpeg_header_struct(b, only=fmt == "jpeg").alias("_js"),
        webp_header_struct(b, only=fmt == "webp").alias("_ws"),
    )
    ps, js, ws = F.col("_ps"), F.col("_js"), F.col("_ws")
    hdr_ok = (
        F.when(fmt.isin("png", "qpng"), ps["ok"])
        .when(fmt == "jpeg", js["sof"] != 0)
        .when(fmt == "webp", ws["kind"] != "none")
        .otherwise(F.lit(False))
    )
    w_hdr = F.when(fmt.isin("png", "qpng"), ps["w"]).when(fmt == "jpeg", js["w"]).when(fmt == "webp", ws["w"])
    h_hdr = F.when(fmt.isin("png", "qpng"), ps["h"]).when(fmt == "jpeg", js["h"]).when(fmt == "webp", ws["h"])
    dim_ok = hdr_ok & (w_hdr == F.col("w")) & (h_hdr == F.col("h"))
    sampled = F.pmod(F.xxhash64(F.col("image_id")), F.lit(decode_sample_mod)) == 0
    annotated = with_structs.select(
        "fmt",
        "w",
        "h",
        magic_ok.alias("_magic_ok"),
        hdr_ok.alias("_hdr_ok"),
        F.coalesce(dim_ok, F.lit(False)).alias("_dim_ok"),
        (F.col("caption").isNotNull() & (F.length("caption") > 0)).alias("_cap_ok"),
        (sampled & hdr_ok).alias("_sampled"),
        F.when(sampled & hdr_ok, b).alias("_b"),
    )

    out_schema = (
        "fmt string, _magic_ok boolean, _hdr_ok boolean, _dim_ok boolean, "
        "_cap_ok boolean, _sampled boolean, _decoded boolean"
    )

    def decode_leg(batches):
        from ..operators.multimodal import decode_image

        for pdf in batches:
            decoded = []
            for data, f, w, h in zip(pdf["_b"], pdf["fmt"], pdf["w"], pdf["h"]):
                if data is None:
                    decoded.append(False)
                else:
                    try:
                        decode_image(bytes(data), f, int(w), int(h), False)
                        decoded.append(True)
                    except Exception:
                        decoded.append(False)
            pdf = pdf.assign(_decoded=decoded)
            yield pdf[
                ["fmt", "_magic_ok", "_hdr_ok", "_dim_ok", "_cap_ok", "_sampled", "_decoded"]
            ]

    flagged = annotated.mapInPandas(decode_leg, out_schema)
    return (
        flagged.groupBy("fmt")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("_magic_ok").cast("long")).alias("n_magic_ok"),
            F.sum(F.col("_hdr_ok").cast("long")).alias("n_hdr_ok"),
            F.sum(F.col("_dim_ok").cast("long")).alias("n_dim_ok"),
            F.sum(F.col("_cap_ok").cast("long")).alias("n_caption_ok"),
            F.sum(F.col("_sampled").cast("long")).alias("n_sampled"),
            F.sum(F.col("_decoded").cast("long")).alias("n_decoded"),
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

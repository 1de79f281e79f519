"""Streaming image ingestion gate: per-epoch health profiles equal the
batch operator on the same rows; replay idempotent; decode layer runs on
the deterministic sample only."""

import os

from pyspark.sql import functions as F

from json_schema_clj_spark.streaming.images_stream import (
    image_health_profile,
    image_health_stream,
)

SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def _corpus(spark, n, seed, corrupt_every=None):
    from json_schema_clj_spark.sources.images import png_images_df

    return png_images_df(spark, n, seed=seed, corrupt_every=corrupt_every)


def _mixed_batch(spark, n, seed):
    """pngs (some corrupted) + progressive jpegs + one lying-dims png +
    one captionless row — every health layer has signal."""
    from json_schema_clj_spark.sources.images import (
        jpeg_progressive_images_df,
        png_images_df,
    )

    png = png_images_df(spark, n, seed=seed, corrupt_every=10)
    jpg = jpeg_progressive_images_df(spark, n, seed=seed + 1).withColumn(
        "image_id", F.concat(F.lit("j-"), F.col("image_id"))
    )
    tampered = (
        png_images_df(spark, 2, seed=seed + 2)
        .withColumn("image_id", F.concat(F.lit("t-"), F.col("image_id")))
        .withColumn("w", F.col("w") + 1)  # dims claim disagrees with IHDR
    )
    nocap = (
        png_images_df(spark, 1, seed=seed + 3)
        .withColumn("image_id", F.concat(F.lit("c-"), F.col("image_id")))
        .withColumn("caption", F.lit(None).cast("string"))
    )
    return png.unionAll(jpg).unionAll(tampered).unionAll(nocap)


def _run_once(spark, src, ckpt, out):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = image_health_stream(stream, out, ckpt, decode_sample_mod=2)
    q.awaitTermination(120)


def _rows(spark, out):
    # drop the partition-discovered epoch column: batch comparison is on
    # the health payload; idempotency still shows as no duplicate rows
    df = spark.read.parquet(out).drop("epoch")
    return sorted(tuple(r) for r in df.collect())


def test_batch_profile_layers(spark):
    prof = {
        r["fmt"]: r
        for r in image_health_profile(_mixed_batch(spark, 20, 5), decode_sample_mod=2).collect()
    }
    png, jpg = prof["png"], prof["jpeg"]
    # 20 pngs (2 truncated at id%10==7) + 2 tampered + 1 captionless = 23
    assert png["n"] == 23
    assert png["n_magic_ok"] == 23  # truncation keeps the magic prefix
    # truncation halves the bytes: signature + IHDR survive (the header
    # gate is METADATA-only by design), the DECODE layer catches them
    assert png["n_hdr_ok"] == 23
    assert png["n_dim_ok"] == 21  # tampered rows claim wrong width
    assert png["n_caption_ok"] == 22
    # decode failures = exactly the truncated rows that landed in the
    # deterministic xxhash64 sample (derive, don't hardcode the hash)
    n_corrupt_sampled = (
        _mixed_batch(spark, 20, 5)
        .where(
            (F.pmod(F.xxhash64("image_id"), F.lit(2)) == 0)
            & F.col("image_id").isin("img-00000007", "img-00000017")
        )
        .count()
    )
    assert png["n_sampled"] > 0
    assert png["n_decoded"] == png["n_sampled"] - n_corrupt_sampled
    assert jpg["n"] == 20
    assert jpg["n_hdr_ok"] == 20 and jpg["n_dim_ok"] == 20
    assert jpg["n_decoded"] == jpg["n_sampled"] > 0


def test_streaming_matches_batch_and_replays_idempotently(spark, tmp_path):
    src, ckpt, out = str(tmp_path / "src"), str(tmp_path / "ckpt"), str(tmp_path / "out")
    os.makedirs(src)

    b1 = _corpus(spark, 12, seed=5, corrupt_every=10)
    b1.write.mode("append").parquet(src)
    _run_once(spark, src, ckpt, out)

    b2 = _mixed_batch(spark, 8, seed=9)
    b2.write.mode("append").parquet(src)
    _run_once(spark, src, ckpt, out)

    got = _rows(spark, out)
    # each epoch's rows equal the batch operator over that epoch's data
    e0 = image_health_profile(b1, decode_sample_mod=2).collect()
    e1 = image_health_profile(b2, decode_sample_mod=2).collect()
    expect = sorted(tuple(r) for r in e0 + e1)
    assert got == expect

    # replay with no new data: same rows, no duplicates
    _run_once(spark, src, ckpt, out)
    assert _rows(spark, out) == got


def test_duplicate_and_null_ids_do_not_corrupt_counts(spark):
    """The decode flag is carried row-for-row (no id join), so duplicate
    image_ids count once each and NULL ids keep their decode result."""
    from json_schema_clj_spark.sources.images import png_images_df

    base = png_images_df(spark, 6, seed=5)
    dup = base.limit(2)  # same image_ids appear twice
    nulled = base.limit(1).withColumn("image_id", F.lit(None).cast("string"))
    prof = image_health_profile(base.unionAll(dup).unionAll(nulled), decode_sample_mod=1)
    row = prof.collect()[0]
    assert row["n"] == 9
    assert row["n_hdr_ok"] == 9
    assert row["n_sampled"] == 9
    assert row["n_decoded"] == 9  # NULL-id row's decode isn't lost

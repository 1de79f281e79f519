"""Merkle-style table diff — find the differing rows between two snapshots
of a table WITHOUT shuffling the (overwhelmingly identical) bulk.

The reference's closest surface is `verdict_reconcile_except`-style set
reconciliation (exceptAll), which at 10^12 rows shuffles BOTH full tables.
This operator is the scale path: each side collapses to `n_buckets`
checksum rows in one partial-aggregated pass (bucket = hash of the key,
checksum = order-insensitive sum of row fingerprints), the two checksum
frames join at driver-trivial size, and only the rows of buckets whose
(count, checksum) disagree — for a mostly-identical pair, a vanishing
fraction — pay the exceptAll shuffle.  A clean diff of two identical
100 TB snapshots costs two scans and a 4096-row join, nothing else.

Fingerprint notes:
* `xxhash64(c1, …, cn)` chains per-column hashes from a seed and SKIPS
  null columns (a null leaves the running seed unchanged), so (a, NULL)
  and (NULL, a) would collide.  A null-bitmap column is therefore hashed
  in first, making every null layout distinct.
* The per-bucket checksum is an order-insensitive SUM of 64-bit
  fingerprints (as decimal(38,0), overflow-free to ~10^18 rows/bucket) —
  a multiset-hash with ~2^-64 collision odds, the same tradeoff as the
  connected-components convergence checksum (dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def row_fingerprint(cols: list[str]) -> Column:
    """64-bit row fingerprint over `cols`: xxhash64 of a null-bitmap plus
    every column (bitmap first, so null layouts can't alias each other).

    Wide tables: the bitmap is chunked into one signed-long-safe 63-bit
    word per 63 columns, each hashed as its own leading argument —
    ``1 << 63`` would overflow LongType (and alias bits), so a single
    bitmap column caps at 63 columns while this form does not."""
    bitmaps = []
    for start in range(0, len(cols), 63):
        chunk = cols[start : start + 63]
        bitmap = None
        for i, c in enumerate(chunk):
            bit = F.when(F.col(c).isNull(), F.lit(1 << i)).otherwise(F.lit(0))
            bitmap = bit if bitmap is None else bitmap + bit
        bitmaps.append(bitmap.cast("long"))
    return F.xxhash64(*bitmaps, *[F.col(c) for c in cols])


def _bucket(key_cols: list[str], n_buckets: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(n_buckets))


def bucket_checksums(
    df: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    n_buckets: int = 4096,
) -> DataFrame:
    """(bucket, n_rows, checksum): one partial+final hash aggregate, output
    size `n_buckets` regardless of input size.

    The fingerprint always covers ``key_cols`` PLUS the compare columns —
    keys are part of row identity.  Fingerprinting only compare_cols
    would let a deleted key A and an inserted key B with identical
    compared values in the same bucket cancel out (equal n_rows AND
    checksum), silently skipping a genuinely dirty bucket."""
    cols = compare_cols or df.columns
    fp_cols = [*key_cols] + [c for c in cols if c not in key_cols]
    return df.groupBy(_bucket(key_cols, n_buckets).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(row_fingerprint(fp_cols).cast(_DEC)).alias("checksum"),
    )


def snapshot_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    n_buckets: int = 4096,
) -> DataFrame:
    """Multiset difference of the two snapshots restricted to provably
    dirty buckets: rows only in `left` tagged side='left_only', rows only
    in `right` tagged side='right_only' (a changed row appears once on
    each side, keyed alike — callers join the two sides on the key if
    they want old/new pairs).  Exact: the bucket screen only ever SKIPS
    buckets whose multisets match (up to the documented 2^-64 checksum
    collision); every genuinely differing row is inside a dirty bucket.
    """
    if left.columns != right.columns:
        raise ValueError(
            f"snapshot schemas differ: {left.columns} vs {right.columns}"
        )
    cols = compare_cols or left.columns
    lb = bucket_checksums(left, key_cols, cols, n_buckets)
    rb = bucket_checksums(right, key_cols, cols, n_buckets)
    j = lb.alias("l").join(rb.alias("r"), on="bucket", how="full_outer")
    dirty = j.where(
        ~(
            F.col("l.n_rows").eqNullSafe(F.col("r.n_rows"))
            & F.col("l.checksum").eqNullSafe(F.col("r.checksum"))
        )
    )
    # driver-sized by construction: <= n_buckets rows, whatever the input
    dirty_ids = [r["bucket"] for r in dirty.select("bucket").collect()]
    proj = [*key_cols] + [c for c in cols if c not in key_cols]
    empty = (
        left.select(*proj).limit(0).withColumn("side", F.lit("left_only"))
    )
    if not dirty_ids:
        return empty
    b = _bucket(key_cols, n_buckets)
    lf = left.where(b.isin(dirty_ids)).select(*proj)
    rf = right.where(b.isin(dirty_ids)).select(*proj)
    return lf.exceptAll(rf).withColumn("side", F.lit("left_only")).unionAll(
        rf.exceptAll(lf).withColumn("side", F.lit("right_only"))
    )

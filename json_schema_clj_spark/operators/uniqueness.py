"""Table-level uniqueness — the distributed analog of `uniqueItems`
(/root/reference/src/json_schema/core.clj:1159-1183), lifted from one
array value to a 10^12-row key column (north rule: "uniqueness on image_id
and phash via salted repartition + hash aggregation").

Skew story: `phash` clusters (near-duplicate images) make some keys hot.
A plain groupBy(key).count() already does map-side partial aggregation —
each task emits one row per distinct key it saw, so a key appearing 10^6
times in one task costs one shuffle row.  The residual hot spot is a key
spread across MANY tasks; `salted=True` makes the two-stage shape explicit:
stage 1 aggregates on (key, salt) — salt fans each key over S reducers —
stage 2 merges the S partials.  With AQE skew handling enabled this is
belt-and-braces, but it is the shape that survives a 1000-executor run
where a single reducer would otherwise own the hottest phash bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_counts(df: DataFrame, keys: list[str], salted: bool = True, salt_buckets: int = 64) -> DataFrame:
    """Count of rows per key tuple, skew-safe."""
    if not salted:
        return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    # stage 1: partial count per (key, salt); salt derived from the full row
    # hash so it's deterministic and uniform
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.monotonically_increasing_id()), F.lit(salt_buckets))
    partial = (
        df.select(*keys, salt.alias("_salt"))
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_pn"))
    )
    # stage 2: merge partials per key — at most salt_buckets rows per key
    return partial.groupBy(*keys).agg(F.sum("_pn").alias("n"))


def duplicates(df: DataFrame, keys: list[str], salted: bool = True, salt_buckets: int = 64) -> DataFrame:
    """Keys violating uniqueness: (keys..., n) with n > 1."""
    return key_counts(df, keys, salted=salted, salt_buckets=salt_buckets).where(F.col("n") > 1)


def uniqueness_violations(
    df: DataFrame,
    keys: list[str],
    id_cols: list[str],
    salted: bool = True,
) -> DataFrame:
    """Violation rows in the engine's standard shape: every row whose key
    tuple is duplicated, tagged keyword_path ['uniqueItems', <key>].

    The dup-key set is usually tiny relative to the table → Spark/AQE picks
    a broadcast join of the duplicates back onto the fact side; no second
    full shuffle of the big table.
    """
    dups = duplicates(df, keys, salted=salted).select(*keys)
    joined = df.join(F.broadcast(dups), on=keys, how="left_semi")
    return joined.select(
        *id_cols,
        F.array(F.lit("uniqueItems"), *[F.lit(k) for k in keys]).alias("keyword_path"),
        F.array(*[F.lit(k) for k in keys]).alias("instance_path"),
        F.lit("uniqueItems").alias("keyword"),
        F.lit("expected unique items").alias("message"),
        F.lit("error").alias("severity"),
    )

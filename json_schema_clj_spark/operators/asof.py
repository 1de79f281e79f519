"""As-of join — attach to each fact row the most recent dimension version
with `dim_ts <= fact_ts` per key (the temporal-referential operator: a
fact validates against the dim version THAT WAS CURRENT when it
happened).  The table-level analog of the reference's external `$ref`
resolution (core.clj:941-954) when the referenced schema itself has
versions.

Spark has no native ASOF JOIN; a naive range join explodes to
|facts|·|versions| per key.  This is the classic union-tag formulation,
time-bucketed so no key ever serializes:

  1. fact timestamps are split at global approxQuantile boundaries into
     ordered time buckets (plan literals — deterministic, the same trick
     as packing.py's distributed prefix sum);
  2. each dim version lands in its own bucket AND is replicated into
     every LATER bucket (the carry: bucket p's facts may need a version
     that opened in an earlier bucket).  Replication is |versions| ×
     |buckets| rows — dim versions are the small side by contract; a
     per-(key, bucket) max-prune of the carries would tighten this and
     is left to callers with pathological version counts;
  3. facts and dims union (tagged), one window per (key, bucket) ordered
     by (time, is_fact) — dim sorts FIRST at equal time, giving the
     inclusive `dim_ts <= fact_ts` boundary (DuckDB ASOF semantics) —
     and `last(struct(dim_cols), ignorenulls=True)` carries the current
     version onto every fact row as ONE atomic record (per-column lasts
     would mix attributes of different versions when the newest match
     holds NULLs).

One shuffle on (key, bucket); parallel across keys AND across time
within a key.  Facts with NULL timestamps match nothing (they sort
before every version).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .packing import _bucket_of


def asof_join(
    facts: DataFrame,
    dims: DataFrame,
    key_cols: list[str],
    fact_ts: str,
    dim_ts: str,
    dim_cols: list[str],
    n_parts: int | None = None,
) -> DataFrame:
    """facts + `dim_cols` from the latest dim row with dim_ts <= fact_ts
    (per key_cols); NULL where no version was open yet.  `fact_ts` /
    `dim_ts` must be numeric or castable to long micros by the caller —
    pass integer epoch columns for timezone-proof behavior (see
    operators/sessions._epoch_us).  Both time columns are compared as
    doubles (approxQuantile's own domain) — exact for |t| < 2^53, i.e.
    any epoch-micros value for the next two centuries.  Ties among dim
    versions at the same (key, dim_ts) are broken arbitrarily — keep
    version times unique."""
    clash = set(dim_cols) & set(facts.columns)
    if clash:
        raise ValueError(f"dim_cols collide with fact columns: {sorted(clash)}")
    reserved = {"_t", "_is_fact", "_pid"} & (set(facts.columns) | set(dims.columns))
    if reserved:
        raise ValueError(f"reserved internal column names in input: {sorted(reserved)}")
    # a version with a NULL open-time matches nothing (DuckDB ASOF parity:
    # the range predicate is never true for NULL) — without this filter the
    # NULL row sorts first and masquerades as open-since-forever
    dims = dims.where(F.col(dim_ts).isNotNull())
    spark = facts.sparkSession
    n_parts = n_parts or spark.sparkContext.defaultParallelism
    probs = [i / n_parts for i in range(1, n_parts)]
    bounds = (
        sorted(set(facts.stat.approxQuantile(fact_ts, probs, 0.001))) if probs else []
    )
    n_buckets = len(bounds) + 1

    fact_cols = [c for c in facts.columns if c not in key_cols]
    f_side = facts.select(
        *key_cols,
        F.col(fact_ts).cast("double").alias("_t"),
        F.lit(1).alias("_is_fact"),
        _bucket_of(fact_ts, bounds).alias("_pid"),
        *[F.col(c) for c in fact_cols],
        *[F.lit(None).cast(dims.schema[c].dataType).alias(c) for c in dim_cols],
    )
    # dim native bucket + carry into every later bucket
    d_side = (
        dims.select(
            *key_cols,
            F.col(dim_ts).cast("double").alias("_t"),
            F.lit(0).alias("_is_fact"),
            _bucket_of(dim_ts, bounds).alias("_pid0"),
            *[F.col(c) for c in dim_cols],
        )
        .withColumn(
            "_pid", F.explode(F.sequence(F.col("_pid0"), F.lit(n_buckets - 1)))
        )
        .drop("_pid0")
        .select(
            *key_cols,
            "_t",
            "_is_fact",
            "_pid",
            *[F.lit(None).cast(facts.schema[c].dataType).alias(c) for c in fact_cols],
            *dim_cols,
        )
    )
    u = f_side.unionByName(d_side)
    w = (
        Window.partitionBy(*key_cols, "_pid")
        .orderBy(F.col("_t").asc_nulls_first(), F.col("_is_fact"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # carry ONE struct, not per-column lasts: last(c, ignorenulls) per
    # column would back-fill a NULL attribute of the newest matching
    # version from an OLDER version — a mixed-version record no single
    # dim row ever held, diverging from ASOF row semantics.  The struct
    # is NULL on fact rows (so they never shadow a version) and carries
    # the whole matched version row atomically, NULL attributes included.
    rec = F.last(
        F.when(
            F.col("_is_fact") == 0, F.struct(*[F.col(c) for c in dim_cols])
        ),
        ignorenulls=True,
    ).over(w)
    carried = u.select(
        *key_cols,
        "_is_fact",
        *fact_cols,
        rec.alias("_rec"),
    )
    return carried.where(F.col("_is_fact") == 1).select(
        *key_cols,
        *fact_cols,
        *[F.col("_rec").getField(c).alias(c) for c in dim_cols],
    )

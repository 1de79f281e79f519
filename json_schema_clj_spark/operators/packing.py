"""Sequence packing — assign documents to fixed token-budget bins, the
step that turns a curated corpus into training batches (concat-and-chunk
semantics: documents are laid out end-to-end in a global deterministic
order and the stream is cut every `capacity` tokens; a document may
straddle a bin boundary, exactly like causal-LM pretraining packing).

The core primitive is a GLOBAL EXCLUSIVE PREFIX SUM of the size column in
`order_col` order.  A single global window (`Window.orderBy(col)`) drags
the whole table through ONE partition — the classic anti-scale trap — so
this implements the textbook two-stage distributed prefix sum:

  1. split the order-key domain into ordered buckets at quantile
     boundaries (one `approxQuantile` pre-pass; the boundaries are
     collected ONCE and become literals in the plan, so — unlike
     `repartitionByRange`, whose sampled boundaries can differ between
     the two jobs below and silently mis-join — every job sees the SAME
     deterministic bucket assignment);
  2. within-bucket exclusive cumsum (window partitioned by bucket —
     parallel across buckets);
  3. per-bucket totals (|buckets| rows) to the driver, folded into
     exclusive bucket offsets, broadcast-joined back.

The result is exact and INVARIANT to the bucket count (pytest pins
2-bucket vs 8-bucket equality) — the property the scaling evidence
requires from every stage.  At 10^12 rows stage 3 collects one row per
bucket, never data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _bucket_of(order_col: str, bounds: list[float]) -> Column:
    """Ordered bucket index = how many boundaries this key exceeds.  One
    vectorized array expression (JVM-side), O(|bounds|) per row — fine for
    thousands of buckets; boundaries are literals, so Catalyst folds the
    array once."""
    if not bounds:
        return F.lit(0)
    arr = F.array(*[F.lit(b) for b in bounds])
    return F.size(F.filter(arr, lambda b: F.col(order_col) > b))


def global_exclusive_cumsum(
    df: DataFrame,
    size_col: str,
    order_col: str,
    out_col: str = "start_offset",
    n_parts: int | None = None,
) -> DataFrame:
    """df + `out_col` = sum of `size_col` over all rows strictly before this
    row in `order_col` order.  `order_col` must be a globally unique
    NUMERIC column (ties would make "before" ambiguous; approxQuantile
    needs numerics)."""
    spark = df.sparkSession
    n_parts = n_parts or spark.sparkContext.defaultParallelism
    probs = [i / n_parts for i in range(1, n_parts)]
    bounds = sorted(set(df.stat.approxQuantile(order_col, probs, 0.001))) if probs else []
    within = df.withColumn("_pid", _bucket_of(order_col, bounds)).withColumn(
        "_cum_in",
        F.coalesce(
            F.sum(size_col).over(
                Window.partitionBy("_pid")
                .orderBy(order_col)
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long"),
    )
    # one row per bucket — driver-sized at any data scale; deterministic
    # bucketing means this job and the join below agree row-for-row
    totals = within.groupBy("_pid").agg(F.sum(size_col).alias("_tot")).collect()
    offsets, run = [], 0
    for r in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((r["_pid"], run))
        run += r["_tot"] or 0
    off_df = spark.createDataFrame(offsets or [(0, 0)], schema="_pid int, _off long")
    return (
        within.join(F.broadcast(off_df), on="_pid")
        .withColumn(out_col, (F.col("_cum_in") + F.col("_off")).cast("long"))
        .drop("_pid", "_cum_in", "_off")
    )


def grouped_exclusive_cumsum(
    df: DataFrame,
    size_col: str,
    order_col: str,
    group_col: str,
    out_col: str = "start_offset",
    n_parts: int | None = None,
) -> DataFrame:
    """Per-group exclusive prefix sum of `size_col` in `order_col` order —
    `global_exclusive_cumsum` generalized so no single group ever becomes
    one task's window.  Bucket boundaries come from ONE global
    approxQuantile over `order_col` (shared across groups: within any
    group the buckets are still ordered and deterministic, which is all
    exactness needs); windows partition by (group, bucket); the totals
    fold collects |groups|·|buckets| rows — driver-sized while the group
    count is (sources, shards, …), which is this operator's contract."""
    spark = df.sparkSession
    n_parts = n_parts or spark.sparkContext.defaultParallelism
    probs = [i / n_parts for i in range(1, n_parts)]
    bounds = sorted(set(df.stat.approxQuantile(order_col, probs, 0.001))) if probs else []
    within = df.withColumn("_pid", _bucket_of(order_col, bounds)).withColumn(
        "_cum_in",
        F.coalesce(
            F.sum(size_col).over(
                Window.partitionBy(group_col, "_pid")
                .orderBy(order_col)
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).cast("long"),
    )
    totals = (
        within.groupBy(group_col, "_pid").agg(F.sum(size_col).alias("_tot")).collect()
    )
    offsets, runs = [], {}
    for r in sorted(totals, key=lambda r: (str(r[group_col]), r["_pid"])):
        g = r[group_col]
        offsets.append((g, r["_pid"], runs.get(g, 0)))
        runs[g] = runs.get(g, 0) + (r["_tot"] or 0)
    gtype = df.schema[group_col].dataType.simpleString()
    # the offsets join back NULL-SAFELY: groupBy kept a NULL group in the
    # totals, and a plain equality join on group_col would silently drop
    # every NULL-group row from the output (they'd never match off_df)
    reserved = {"_g", "_p", "_pid", "_cum_in", "_off"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with internal temp names {sorted(reserved)}"
        )
    off_df = spark.createDataFrame(
        offsets or [(None, 0, 0)], schema=f"`_g` {gtype}, _p int, _off long"
    )
    joined = within.join(
        F.broadcast(off_df),
        F.col(group_col).eqNullSafe(F.col("_g")) & (F.col("_pid") == F.col("_p")),
    )
    return (
        joined.withColumn(out_col, (F.col("_cum_in") + F.col("_off")).cast("long"))
        .drop("_g", "_p", "_pid", "_cum_in", "_off")
    )


def pack_documents(
    df: DataFrame,
    size_col: str,
    order_col: str,
    capacity: int,
    n_parts: int | None = None,
) -> DataFrame:
    """(row, bin_id, offset_in_bin): bin_id = the bin the document STARTS
    in (floor(start/capacity)); offset_in_bin = start % capacity.  A doc
    with offset_in_bin + size > capacity straddles into the next bin(s) —
    concat-and-chunk, not first-fit (first-fit's "skip to next bin if it
    doesn't fit" is a sequential recurrence with no closed form; the
    chunking layout is what LM pipelines actually use)."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    out = global_exclusive_cumsum(df, size_col, order_col, n_parts=n_parts)
    # `div`, not floor(/): float division loses exactness past 2^53 total
    # tokens (10^12 docs x 10k tokens crosses it) and can land a bin off
    return out.withColumn(
        "bin_id", F.expr(f"start_offset div {int(capacity)}")
    ).withColumn("offset_in_bin", (F.col("start_offset") % capacity).cast("long"))


def pack_chunks(
    df: DataFrame,
    size_col: str,
    order_col: str,
    capacity: int,
    n_parts: int | None = None,
) -> DataFrame:
    """The shard-manifest view of `pack_documents`: one row per
    (document, bin) span — which slice of the document fills which slice
    of the bin.  This is what a shard writer actually consumes: every bin
    except the trailing one is exactly `capacity` tokens, assembled from
    `(doc, doc_off, len)` reads.

    Columns: order/size cols + bin_id, doc_off (start of the span inside
    the document), bin_off (start inside the bin), span_len.  Derived
    arithmetically from the prefix sum — the explode emits
    ceil(size/capacity)+1 rows per document at most, no extra shuffle.
    Zero-size rows contribute no spans."""
    packed = pack_documents(df, size_col, order_col, capacity, n_parts=n_parts)
    s = F.col("start_offset")
    end = s + F.col(size_col)
    # integer `div` for the same >2^53 exactness reason as pack_documents
    c = int(capacity)
    b0 = F.expr(f"start_offset div {c}")
    b1 = F.expr(f"(start_offset + `{size_col}` - 1) div {c}")
    out = packed.where(F.col(size_col) > 0).withColumn(
        "bin_id", F.explode(F.sequence(b0, b1))
    )
    seg_start = F.greatest(s, F.col("bin_id") * capacity)
    seg_end = F.least(end, (F.col("bin_id") + 1) * capacity)
    return (
        out.withColumn("doc_off", (seg_start - s).cast("long"))
        .withColumn("bin_off", (seg_start - F.col("bin_id") * capacity).cast("long"))
        .withColumn("span_len", (seg_end - seg_start).cast("long"))
        .drop("offset_in_bin")
    )

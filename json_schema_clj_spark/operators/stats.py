"""Per-column statistics profiling (north-star table extension).

The reference validates one document at a time and has no aggregate view
(SURVEY.md §2.7); at 10^12 rows the FIRST artifact a validation run needs
is a per-column profile: null rate, min/max, distinct cardinality.

Everything is one Spark hash-aggregate pass: partial aggregation map-side,
a single tiny shuffle, one output row per column after unpivot.  Distinct
counts use HyperLogLog (`approx_count_distinct`) by default — a mergeable
sketch, so the same pass scales to any cluster size; `exact=True` switches
to exact distinct (for oracle comparison at test scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def partition_hll_sketches(
    df: DataFrame, col: str, part_col: str, lg_k: int = 12
) -> DataFrame:
    """(part, sketch binary): one Apache DataSketches HLL per partition —
    the INCREMENTAL distinct-count pattern: persist these next to the
    per-partition manifest rows, and when new partitions land only they are
    sketched; the corpus-wide cardinality is re-derived by unioning stored
    sketches (`merge_hll_sketches`) without rescanning 10^12 rows.
    `approx_count_distinct` gives the same estimate in one pass but
    discards the sketch; storing it is what makes the count maintainable.
    """
    return df.groupBy(F.col(part_col).alias("part")).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("sketch")
    )


def merge_hll_sketches(sketches: DataFrame, sketch_col: str = "sketch") -> DataFrame:
    """Union stored partition sketches → one-row global estimate
    (`n_distinct_est`).  Input is |partitions| rows regardless of corpus
    size; mergeability is exact (union of HLLs = HLL of the union)."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col))).alias("n_distinct_est")
    )


def quantile_profile(
    df: DataFrame,
    cols: list[str],
    probs: tuple[float, ...] = (0.25, 0.5, 0.75),
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """One row per column: (column, q25, q50, q75, ...) quantiles.

    All columns' quantiles come from ONE aggregation pass (partial+final,
    single tiny shuffle).  `exact=False` (the 10^12-row path) uses
    `percentile_approx` — a mergeable rank sketch, so partial aggregates
    combine across any executor count without a global sort;
    `exact=True` uses `percentile` (exact linear interpolation at rank
    p·(n-1), the same "continuous quantile" definition DuckDB's
    quantile_cont implements) for oracle comparison at test scale.
    """
    aggs = []
    parr = F.array(*[F.lit(p) for p in probs])
    for c in cols:
        col = F.col(c)
        if exact:
            aggs.append(F.percentile(col, parr).alias(f"{c}__q"))
        else:
            aggs.append(F.percentile_approx(col, list(probs), accuracy).alias(f"{c}__q"))
    wide = df.agg(*aggs)
    qnames = [f"q{int(p * 100)}" for p in probs]
    stack_args = ", ".join(
        f"'{c}', " + ", ".join(f"`{c}__q`[{i}]" for i in range(len(probs))) for c in cols
    )
    expr = f"stack({len(cols)}, {stack_args}) as (column, {', '.join(qnames)})"
    return wide.select(F.expr(expr))


def column_profile(df: DataFrame, cols: list[str] | None = None, exact: bool = False) -> DataFrame:
    """One row per column: (column, n_rows, n_null, null_rate, min_value,
    max_value, n_distinct).  min/max stringified for heterogeneous columns.

    Single aggregation (no per-column passes): all measures for all columns
    are computed in one partial+final hash agg over the scan.
    """
    cols = cols or [f.name for f in df.schema.fields if not isinstance(f.dataType, T.BinaryType)]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.min(col).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(col).cast("string").alias(f"{c}__max"))
        if exact:
            aggs.append(F.count_distinct(col).alias(f"{c}__distinct"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"{c}__distinct"))
    wide = df.agg(*aggs)

    # unpivot the single wide row into one row per column (stack is
    # evaluated on the 1-row aggregate — negligible)
    stack_args = []
    for c in cols:
        stack_args.append(f"'{c}', `{c}__nulls`, `{c}__min`, `{c}__max`, `{c}__distinct`")
    expr = f"stack({len(cols)}, {', '.join(stack_args)}) as (column, n_null, min_value, max_value, n_distinct)"
    return (
        wide.select(F.col("n_rows"), F.expr(expr))
        .withColumn("null_rate", F.col("n_null") / F.col("n_rows"))
        .select("column", "n_rows", "n_null", "null_rate", "min_value", "max_value", "n_distinct")
    )


def column_profile_by(
    df: DataFrame,
    part_col: str,
    cols: list[str] | None = None,
    exact: bool = False,
) -> DataFrame:
    """Per-partition column profile: one row per (part, column) with
    (n_rows, n_null, min_value, max_value, n_distinct) — the profile that
    backs per-partition verdicts and the partition-lineage manifest.

    Same single-pass shape as `column_profile`, but keyed: ONE partial+
    final hash agg shuffles |parts| wide rows (each holding every
    column's measures), then stack unpivots on the aggregate output —
    |parts|×|cols| rows, never the data.  HLL by default; `exact=True`
    (oracle/test scale only) pays Spark's multi-count-distinct Expand.
    """
    cols = cols or [
        f.name
        for f in df.schema.fields
        if f.name != part_col and not isinstance(f.dataType, T.BinaryType)
    ]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(F.min(col).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(col).cast("string").alias(f"{c}__max"))
        if exact:
            aggs.append(F.count_distinct(col).alias(f"{c}__distinct"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"{c}__distinct"))
    wide = df.groupBy(F.col(part_col).alias("part")).agg(*aggs)

    stack_args = ", ".join(
        f"'{c}', `{c}__nulls`, `{c}__min`, `{c}__max`, `{c}__distinct`" for c in cols
    )
    expr = (
        f"stack({len(cols)}, {stack_args}) "
        "as (column, n_null, min_value, max_value, n_distinct)"
    )
    return wide.select("part", "n_rows", F.expr(expr)).select(
        "part", "column", "n_rows", "n_null", "min_value", "max_value", "n_distinct"
    )


def outlier_profile(
    df: DataFrame,
    cols: list[str],
    factor: float = 1.5,
    exact: bool = False,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-column robust outlier counts via Tukey IQR fences: one row per
    column with (n_rows, n_low, n_high, lo_fence, hi_fence), where the
    fences are [q1 − factor·IQR, q3 + factor·IQR].

    Two bounded passes: pass 1 computes q1/q3 for every column in ONE
    aggregation (mergeable rank sketch via `percentile_approx` on the
    10^12-row path, exact `percentile` for oracle parity); the |cols|·2
    quantiles come to the driver, fences fold into literals, and pass 2
    counts fence violations for all columns in ONE more aggregation.
    IQR beats mean±k·σ here twice over: it is robust to the very outliers
    being counted, and (exact mode) it is bit-reproducible against DuckDB's
    quantile_cont — stddev's summation-order drift is not.
    Fences are reported rounded to 6 dp as fixed-point strings (display
    only; counting uses the unrounded values).
    """
    q = quantile_profile(df, cols, probs=(0.25, 0.75), exact=exact, accuracy=accuracy)
    fences = {}
    for r in q.collect():
        q1, q3 = r["q25"], r["q75"]
        if q1 is None or q3 is None:
            fences[r["column"]] = (None, None)
        else:
            iqr = q3 - q1
            fences[r["column"]] = (q1 - factor * iqr, q3 + factor * iqr)

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        lo, hi = fences[c]
        col = F.col(c)
        if lo is None:
            aggs.append(F.lit(0).cast("long").alias(f"{c}__low"))
            aggs.append(F.lit(0).cast("long").alias(f"{c}__high"))
        else:
            aggs.append(F.sum((col < F.lit(lo)).cast("long")).alias(f"{c}__low"))
            aggs.append(F.sum((col > F.lit(hi)).cast("long")).alias(f"{c}__high"))
    wide = df.agg(*aggs)

    def _fmt(v):
        return (
            "CAST(NULL AS STRING)"
            if v is None
            else f"CAST(CAST({v!r} AS DECIMAL(28,6)) AS STRING)"
        )

    stack_args = ", ".join(
        f"'{c}', `{c}__low`, `{c}__high`, {_fmt(fences[c][0])}, {_fmt(fences[c][1])}"
        for c in cols
    )
    expr = (
        f"stack({len(cols)}, {stack_args}) "
        "as (column, n_low, n_high, lo_fence, hi_fence)"
    )
    return wide.select("n_rows", F.expr(expr)).select(
        "column", "n_rows", "n_low", "n_high", "lo_fence", "hi_fence"
    )


def format_conformance_profile(df: DataFrame, col_formats: dict[str, str]) -> DataFrame:
    """Per-column format-conformance rates (the north star's "format
    conformance" stat): for each (column → format name) mapping, count
    non-null values matching the engine's own `format` regex table
    (functions/formats.py — the same table the `format` keyword compiles
    against, so profiling and validation cannot disagree on semantics).

    One aggregation pass for every column; output rows carry integer
    counts only (n_rows, n_null, n_match, n_mismatch) — hash-stable, no
    rate formatting.
    """
    from ..functions.formats import FORMAT_REGEX

    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, fmt in col_formats.items():
        col = F.col(c)
        rx = FORMAT_REGEX[fmt]
        aggs.append(F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"))
        aggs.append(
            F.sum((col.isNotNull() & col.rlike(rx)).cast("long")).alias(f"{c}__match")
        )
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', '{fmt}', `{c}__nulls`, `{c}__match`" for c, fmt in col_formats.items()
    )
    expr = (
        f"stack({len(col_formats)}, {stack_args}) "
        "as (column, format, n_null, n_match)"
    )
    return wide.select("n_rows", F.expr(expr)).select(
        "column",
        "format",
        "n_rows",
        "n_null",
        "n_match",
        (F.col("n_rows") - F.col("n_null") - F.col("n_match")).alias("n_mismatch"),
    )


def metrics_anomaly(
    df: DataFrame,
    value_col: str,
    key_cols: list[str],
    k: int = 3,
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Median/MAD outlier flags over a metrics history — the ops layer
    that watches the manifest's per-epoch metric rows (row counts, null
    counts, violation counts per partition/epoch) and flags the epochs
    whose value deviates more than ``k`` median-absolute-deviations from
    that key's own history.  Median/MAD rather than mean/stddev: a real
    metrics history CONTAINS the anomalies being hunted, and the
    breakdown point of the mean is zero.

    Input rows are ``(key_cols..., value_col)`` with an INTEGER metric;
    output keeps every row plus ``(med4, dev4, mad8, anomaly)``.  All
    derived columns are integer fixed-point so any engine agrees
    bit-exactly: the exact median of integers is a multiple of 0.5, so
    ``med4 = 4·median`` is an even integer; ``dev4 = |4·x − med4|`` is
    integer; the median of integer dev4 is again a multiple of 0.5, so
    ``mad8 = 2·median(dev4)`` is integer; and the flag
    ``|x − med| > k·MAD`` cross-multiplies to ``2·dev4 > k·mad8`` —
    no division or float threshold anywhere.

    Two bounded passes (the deviation needs the median first), each a
    partial-agg'd shuffle on the key; with ``exact=False`` the medians
    come from the mergeable ``percentile_approx`` rank sketch (the
    10^12-row path; flags near the fence can then differ from exact).
    """
    pct = (
        (lambda c: F.percentile(c, F.lit(0.5)))
        if exact
        else (lambda c: F.percentile_approx(c, 0.5, accuracy))
    )
    x = F.col(value_col).cast("long")
    med = df.groupBy(*key_cols).agg(
        F.round(pct(x) * 4).cast("long").alias("med4")
    )
    devs = df.join(med, on=key_cols).withColumn(
        "dev4", F.abs(x * 4 - F.col("med4"))
    )
    mad = devs.groupBy(*key_cols).agg(
        F.round(pct(F.col("dev4")) * 2).cast("long").alias("mad8")
    )
    return devs.join(mad, on=key_cols).withColumn(
        "anomaly", (F.col("dev4") * 2 > F.lit(int(k)) * F.col("mad8")).cast("int")
    )


def correlation_profile(df: DataFrame, int_cols: list[str]) -> DataFrame:
    """Pairwise correlation screen over integer columns in ONE aggregation
    pass — the profiling lens that finds redundant / linearly-coupled
    columns (the numeric sibling of `fd_candidates`' functional
    dependencies).

    Emits, per ordered pair (a, b) with a < b, the exact integer moments
      n, sum_a, sum_b, sum_ab, sum_a2, sum_b2   (rows where BOTH are
    non-null), from which cov_x = n·Σab − Σa·Σb and the variance
    numerators var_a_x = n·Σa² − (Σa)², var_b_x analogously, are derived
    as DECIMAL(38,0) products.  Pearson r = cov_x / sqrt(var_a_x·var_b_x)
    is left to the caller: every EMITTED value is exact integer
    arithmetic (order-free sums, cross-multiplied products), so two
    engines can never disagree — the same no-float discipline as
    metrics_anomaly and the EMD drift lens.

    Scale shape: |pairs| · 4 sums inside ONE partial+final hash
    aggregate over a single scan (no per-pair passes, no Expand); the
    stack to (pair, moments) rows happens on the one aggregated row.
    Callers pass integer columns (quantize money to cents first).
    """
    pairs = [
        (a, b) for i, a in enumerate(int_cols) for b in int_cols[i + 1 :]
    ]
    dec = "decimal(38,0)"
    aggs = []
    for a, b in pairs:
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        va = F.when(both, F.col(a).cast(dec))
        vb = F.when(both, F.col(b).cast(dec))
        p = f"{a}__{b}"
        aggs += [
            F.count(F.when(both, F.lit(1))).alias(f"n_{p}"),
            F.sum(va).alias(f"sa_{p}"),
            F.sum(vb).alias(f"sb_{p}"),
            F.sum(va * vb).alias(f"sab_{p}"),
            F.sum(va * va).alias(f"sa2_{p}"),
            F.sum(vb * vb).alias(f"sb2_{p}"),
        ]
    wide = df.agg(*aggs)
    z = F.lit(0).cast(dec)
    rows = [
        F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.col(f"n_{a}__{b}").cast("long").alias("n"),
            F.coalesce(F.col(f"sa_{a}__{b}"), z).alias("sum_a"),
            F.coalesce(F.col(f"sb_{a}__{b}"), z).alias("sum_b"),
            F.coalesce(F.col(f"sab_{a}__{b}"), z).alias("sum_ab"),
            F.coalesce(F.col(f"sa2_{a}__{b}"), z).alias("sum_a2"),
            F.coalesce(F.col(f"sb2_{a}__{b}"), z).alias("sum_b2"),
        )
        for a, b in pairs
    ]
    out = wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")
    n = F.col("n").cast(dec)
    return out.select(
        "col_a",
        "col_b",
        "n",
        (n * F.col("sum_ab") - F.col("sum_a") * F.col("sum_b")).alias("cov_x"),
        (n * F.col("sum_a2") - F.col("sum_a") * F.col("sum_a")).alias("var_a_x"),
        (n * F.col("sum_b2") - F.col("sum_b") * F.col("sum_b")).alias("var_b_x"),
    )

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

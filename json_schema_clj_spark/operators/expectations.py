"""Declarative table-expectation suite — aggregate-level assertions
(row counts, means, null rates, cardinalities, set membership) compiled
into ONE aggregation pass, the Deequ/Great-Expectations-shaped
complement to the row-level keyword validation: the schema says what
each ROW must look like; expectations say what the TABLE must look like.

The whole suite folds into a single partial+final hash aggregate over
one scan (each expectation contributes 1-2 agg expressions), then the
pass/fail verdicts are derived on the one aggregated row — at 10^12 rows
a 50-expectation suite costs exactly one pass, same as a single count().

Integer discipline (the engine's no-float contract): threshold
comparisons on means use cross-multiplication (Σx ≥ lo·n, not Σx/n ≥
lo), null rates compare n_null·denom vs rate_num·n, and callers quantize
money columns before the suite — every observed value and every verdict
is exact integer arithmetic, bit-identical in any engine.

Expectation types (dicts; `column` required unless noted):
  {"type": "row_count_between", "lo": int, "hi": int}           (no column)
  {"type": "null_count_max", "column": c, "max": int}
  {"type": "sum_between", "column": c, "lo": int, "hi": int}      (int col)
  {"type": "mean_between", "column": c, "lo": int, "hi": int}     (int col;
      cross-multiplied: lo·n ≤ Σx ≤ hi·n over non-null rows)
  {"type": "distinct_between", "column": c, "lo": int, "hi": int} (exact)
  {"type": "unique", "column": c}        (no duplicate non-null values)
  {"type": "values_in_set", "column": c, "set": [...]}  (nulls violate —
      reference enum semantics: NULL is not a member; an empty set means
      every row violates)
  {"type": "min_at_least", "column": c, "lo": int}
  {"type": "max_at_most", "column": c, "hi": int}
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TYPES = {
    "row_count_between", "null_count_max", "sum_between", "mean_between",
    "distinct_between", "unique", "values_in_set", "min_at_least",
    "max_at_most",
}


def run_expectations(df: DataFrame, suite: list[dict]) -> DataFrame:
    """One row per expectation: (idx, expectation, column, observed,
    passed).  `observed` is the headline integer for the expectation
    (count / sum / distinct count / violation count) cast to string so
    heterogeneous expectations share a column without float formatting.
    Unknown expectation types raise at compile time, like the
    reference's broken-schema error (core.clj:344-348)."""
    for i, e in enumerate(suite):
        if e.get("type") not in _TYPES:
            raise ValueError(f"unknown expectation type at index {i}: {e.get('type')!r}")
        if e["type"] != "row_count_between" and "column" not in e:
            raise ValueError(f"expectation at index {i} needs a column: {e}")
        if e["type"] == "values_in_set" and not isinstance(
            e.get("set"), (list, tuple, set, frozenset)
        ):
            raise ValueError(f"expectation at index {i} needs a 'set' collection: {e}")

    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, e in enumerate(suite):
        t = e["type"]
        if t == "row_count_between":
            continue  # reads _n
        c = F.col(e["column"])
        if t == "null_count_max":
            aggs.append(F.sum(c.isNull().cast("long")).alias(f"_e{i}"))
        elif t in ("sum_between", "mean_between"):
            aggs.append(F.sum(c.cast("long")).alias(f"_e{i}"))
            if t == "mean_between":
                aggs.append(F.count(c).alias(f"_e{i}_n"))
        elif t == "distinct_between":
            aggs.append(F.count_distinct(c).alias(f"_e{i}"))
        elif t == "unique":
            aggs.append(F.count_distinct(c).alias(f"_e{i}"))
            aggs.append(F.count(c).alias(f"_e{i}_n"))
        elif t == "values_in_set":
            # an empty set is a meaningful suite — no value is a member,
            # so every row (null included) violates; Column.isin() with
            # zero args would raise an obscure runtime error instead
            bad = (
                F.lit(True)
                if not e["set"]
                else ~F.coalesce(c.isin(*e["set"]), F.lit(False))
            )
            aggs.append(F.sum(bad.cast("long")).alias(f"_e{i}"))
        elif t == "min_at_least":
            aggs.append(F.min(c.cast("long")).alias(f"_e{i}"))
        elif t == "max_at_most":
            aggs.append(F.max(c.cast("long")).alias(f"_e{i}"))
    wide = df.agg(*aggs)

    rows = []
    for i, e in enumerate(suite):
        t = e["type"]
        n = F.col("_n")
        if t == "row_count_between":
            obs, ok = n, (n >= e["lo"]) & (n <= e["hi"])
        else:
            v = F.col(f"_e{i}")
            if t == "null_count_max":
                obs, ok = v, v <= e["max"]
            elif t == "sum_between":
                obs = F.coalesce(v, F.lit(0))
                ok = (obs >= e["lo"]) & (obs <= e["hi"])
            elif t == "mean_between":
                nn = F.col(f"_e{i}_n")
                s = F.coalesce(v, F.lit(0))
                # vacuous pass on an all-null column (n=0), like the
                # reference's non-applicable-value rule
                ok = (nn == 0) | ((s >= F.lit(int(e["lo"])) * nn) & (s <= F.lit(int(e["hi"])) * nn))
                obs = s
            elif t == "distinct_between":
                obs, ok = v, (v >= e["lo"]) & (v <= e["hi"])
            elif t == "unique":
                obs = F.col(f"_e{i}_n") - v  # duplicate excess
                ok = obs == 0
            elif t == "values_in_set":
                obs, ok = v, v == 0
            elif t == "min_at_least":
                obs = F.coalesce(v, F.lit(int(e["lo"])))
                ok = obs >= e["lo"]
            elif t == "max_at_most":
                obs = F.coalesce(v, F.lit(int(e["hi"])))
                ok = obs <= e["hi"]
        rows.append(
            F.struct(
                F.lit(i).cast("long").alias("idx"),
                F.lit(t).alias("expectation"),
                F.lit(e.get("column", "*")).alias("column"),
                obs.cast("long").cast("string").alias("observed"),
                ok.alias("passed"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("r")).select("r.*")

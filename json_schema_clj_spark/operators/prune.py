"""Zone-map validation pushdown — decide per FILE/SHARD whether a scalar
constraint can possibly be violated, before scanning a single row.

The reference validates one value at a time (core.clj:1500-1502 validate);
at 10^12 rows the dominant cost is the scan itself, and the classic
warehouse answer is zone maps: every parquet footer / Iceberg manifest
already stores per-file min/max/null-count per column.  Interval logic
over those statistics decides, per (file, check):

* ``all_pass`` — no row in the file can violate the check (skip the file
  in the validation scan; Catalyst's partition pruning analog, lifted
  from filter predicates to VALIDATION predicates),
* ``all_fail`` — every row violates (quarantine the whole file without
  scanning it),
* ``scan``     — the statistics can't decide; the file goes to the
  row-level pass.

A shard whose every check is ``all_pass`` is provably clean: on a real
deployment the row-level job prunes it from its input list, so a mostly
clean 10^12-row table validates at metadata speed plus the dirty tail.

Null semantics follow the reference: scalar keywords skip missing values
(nil = missing, core.clj required-property handling), so ``minimum`` on
an all-NULL shard is ``all_pass`` and only ``required`` reads the
null count as violations.

Spark-first shape: ``zone_maps`` is ONE partial-agg'd groupBy over the
table (min/max/null-count are algebraic aggregates — map-side combine,
one shuffle row per shard).  Here the zones are computed from the rows
because the sandbox reads plain parquet through the DataFrame API; with
an Iceberg catalog the same frame comes for free from the
``<table>.files`` metadata table (readable-metrics) — ``prune_decisions``
takes ANY frame with the zone-map column shape, so the metadata-speed
path is a drop-in.  ``prune_decisions`` itself is a single select over
the zone frame (one struct per check, exploded) — driver cost is
|checks|, executor cost is |shards|, both independent of table size.
"""

from __future__ import annotations

from typing import Any, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ALL_PASS = "all_pass"
ALL_FAIL = "all_fail"
SCAN = "scan"

# keywords whose violation set is decidable from (min, max, null-count)
PRUNABLE_KEYWORDS = (
    "minimum",
    "maximum",
    "exclusiveMinimum",
    "exclusiveMaximum",
    "const",
    "enum",
    "required",
)


def zone_maps(df: DataFrame, shard: Column | str, cols: Sequence[str]) -> DataFrame:
    """Per-shard zone maps: (shard, n_rows, {c}__min, {c}__max, {c}__nulls
    for every c in cols).  One partial-aggregated shuffle; the output is
    |shards| rows regardless of table size.  Matches the statistics shape
    parquet footers / Iceberg ``files.readable_metrics`` publish."""
    shard_col = F.col(shard) if isinstance(shard, str) else shard
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}__min"))
        aggs.append(F.max(c).alias(f"{c}__max"))
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
    return df.groupBy(shard_col.alias("shard")).agg(*aggs)


def _decision(zones_cols: dict[str, Column], col: str, keyword: str, value: Any) -> Column:
    """Tri-state decision column for one check over the zone-map columns.

    CASE order matters: the all-NULL branch (mn/mx NULL) is taken first so
    later comparisons never evaluate NULL > v into a silent non-match."""
    n = zones_cols["n_rows"]
    mn = zones_cols[f"{col}__min"]
    mx = zones_cols[f"{col}__max"]
    nulls = zones_cols[f"{col}__nulls"]
    nonnull = n - nulls
    no_nulls = nulls == 0

    if keyword == "required":
        return (
            F.when(nulls == 0, F.lit(ALL_PASS))
            .when(nulls == n, F.lit(ALL_FAIL))
            .otherwise(F.lit(SCAN))
        )
    if keyword == "minimum":
        return (
            F.when(nonnull == 0, F.lit(ALL_PASS))
            .when(mn >= F.lit(value), F.lit(ALL_PASS))
            .when(no_nulls & (mx < F.lit(value)), F.lit(ALL_FAIL))
            .otherwise(F.lit(SCAN))
        )
    if keyword == "maximum":
        return (
            F.when(nonnull == 0, F.lit(ALL_PASS))
            .when(mx <= F.lit(value), F.lit(ALL_PASS))
            .when(no_nulls & (mn > F.lit(value)), F.lit(ALL_FAIL))
            .otherwise(F.lit(SCAN))
        )
    if keyword == "exclusiveMinimum":
        return (
            F.when(nonnull == 0, F.lit(ALL_PASS))
            .when(mn > F.lit(value), F.lit(ALL_PASS))
            .when(no_nulls & (mx <= F.lit(value)), F.lit(ALL_FAIL))
            .otherwise(F.lit(SCAN))
        )
    if keyword == "exclusiveMaximum":
        return (
            F.when(nonnull == 0, F.lit(ALL_PASS))
            .when(mx < F.lit(value), F.lit(ALL_PASS))
            .when(no_nulls & (mn >= F.lit(value)), F.lit(ALL_FAIL))
            .otherwise(F.lit(SCAN))
        )
    if keyword == "const":
        return (
            F.when(nonnull == 0, F.lit(ALL_PASS))
            .when((mn == F.lit(value)) & (mx == F.lit(value)), F.lit(ALL_PASS))
            .when(no_nulls & ((mx < F.lit(value)) | (mn > F.lit(value))), F.lit(ALL_FAIL))
            .otherwise(F.lit(SCAN))
        )
    if keyword == "enum":
        vs = sorted(value)
        lo, hi = vs[0], vs[-1]
        in_enum = mn.isin(vs)
        return (
            F.when(nonnull == 0, F.lit(ALL_PASS))
            .when((mn == mx) & in_enum, F.lit(ALL_PASS))
            .when(no_nulls & ((mx < F.lit(lo)) | (mn > F.lit(hi))), F.lit(ALL_FAIL))
            .otherwise(F.lit(SCAN))
        )
    raise ValueError(f"keyword {keyword!r} is not zone-map prunable (supported: {PRUNABLE_KEYWORDS})")


def prune_decisions(
    zones: DataFrame,
    checks: Sequence[tuple[str, str, Any]],
    with_shard_verdict: bool = True,
) -> DataFrame:
    """(shard, column, keyword, decision) per check, from a zone-map frame.

    ``checks`` is a list of (column, keyword, value); value is ignored for
    ``required`` and must be a list for ``enum``.  When
    ``with_shard_verdict`` is set, one extra row per shard
    (column='*', keyword='skippable') carries the rollup: ``all_pass``
    only when EVERY check decided ``all_pass`` — the shard the row-level
    validation job may drop from its input.

    One narrow select + explode over the zone frame — no join, no extra
    shuffle; the verdict is a pure conjunction over the per-check
    decision expressions, so it rides the same pass."""
    zcols = {c: F.col(c) for c in zones.columns}
    entries = []
    decisions = []
    for col, keyword, value in checks:
        d = _decision(zcols, col, keyword, value)
        decisions.append(d)
        entries.append(
            F.struct(
                F.lit(col).alias("column"),
                F.lit(keyword).alias("keyword"),
                d.alias("decision"),
            )
        )
    if with_shard_verdict:
        skippable = F.lit(True)
        for d in decisions:
            skippable = skippable & (d == ALL_PASS)
        entries.append(
            F.struct(
                F.lit("*").alias("column"),
                F.lit("skippable").alias("keyword"),
                F.when(skippable, F.lit(ALL_PASS)).otherwise(F.lit(SCAN)).alias("decision"),
            )
        )
    return zones.select(
        "shard", F.explode(F.array(*entries)).alias("_d")
    ).select("shard", "_d.column", "_d.keyword", "_d.decision")


def prune_validation(
    df: DataFrame,
    shard: Column | str,
    checks: Sequence[tuple[str, str, Any]],
) -> DataFrame:
    """zone_maps + prune_decisions in one call over a row-level table."""
    cols = sorted({c for c, _, _ in checks})
    return prune_decisions(zone_maps(df, shard, cols), checks)

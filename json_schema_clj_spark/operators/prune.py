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

# keywords whose violation set is decidable from (min, max, null-count);
# the last three are internal forms emitted by prunable_checks_from_schema:
# `string_nonblank` is the reference's blank-string type quirk
# (core.clj:189-190, compiler.py _type_ok), `static_true`/`static_false`
# are type checks decided at compile time from the column's Spark dtype
# (every non-null value passes / fails).
PRUNABLE_KEYWORDS = (
    "minimum",
    "maximum",
    "exclusiveMinimum",
    "exclusiveMaximum",
    "const",
    "enum",
    "required",
    "string_nonblank",
    "static_true",
    "static_false",
)


def zone_maps(
    df: DataFrame,
    shard: Column | str,
    cols: Sequence[str],
    null_only_cols: Sequence[str] = (),
) -> DataFrame:
    """Per-shard zone maps: (shard, n_rows, {c}__min, {c}__max, {c}__nulls
    for every c in cols).  One partial-aggregated shuffle; the output is
    |shards| rows regardless of table size.  Matches the statistics shape
    parquet footers / Iceberg ``files.readable_metrics`` publish.

    ``null_only_cols`` get just the null count — a column whose only checks
    are required/static type needs no min/max, and on a wide binary column
    (image bytes) skipping the per-row value comparisons matters."""
    shard_col = F.col(shard) if isinstance(shard, str) else shard
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}__min"))
        aggs.append(F.max(c).alias(f"{c}__max"))
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
    for c in null_only_cols:
        if c not in cols:
            aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
    return df.groupBy(shard_col.alias("shard")).agg(*aggs)


def _decision(zones_cols: dict[str, Column], col: str, keyword: str, value: Any) -> Column:
    """Tri-state decision column for one check over the zone-map columns.

    CASE order matters: the all-NULL branch (mn/mx NULL) is taken first so
    later comparisons never evaluate NULL > v into a silent non-match."""
    n = zones_cols["n_rows"]
    nulls = zones_cols[f"{col}__nulls"]
    nonnull = n - nulls
    no_nulls = nulls == 0
    # min/max are looked up lazily — null-only columns (required / static
    # type checks) don't carry them in the zone frame
    mn = zones_cols.get(f"{col}__min")
    mx = zones_cols.get(f"{col}__max")

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
    if keyword == "static_true":
        # type check the column dtype satisfies statically: every non-null
        # value passes, and properties skip missing values (nil = missing)
        return F.lit(ALL_PASS)
    if keyword == "static_false":
        # type check the column dtype can never satisfy: every non-null
        # value fails, so only the null count decides
        return (
            F.when(nonnull == 0, F.lit(ALL_PASS))
            .when(nulls == 0, F.lit(ALL_FAIL))
            .otherwise(F.lit(SCAN))
        )
    if keyword == "string_nonblank":
        # blank-string quirk: trim(v) == '' fails type "string".  Every
        # blank string sorts below '!' (0x21, the smallest printable
        # non-space), so min >= '!' proves no blanks; all-blank is only
        # provable when min = max = '' (a space-prefixed value like ' a'
        # also sorts below '!' yet is NOT blank).
        return (
            F.when(nonnull == 0, F.lit(ALL_PASS))
            .when(mn >= F.lit("!"), F.lit(ALL_PASS))
            .when(no_nulls & (mn == F.lit("")) & (mx == F.lit("")), F.lit(ALL_FAIL))
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


# ---------------------------------------------------------------------------
# Schema-driven pruning: extract the zone-decidable subset of a JSON Schema


_NON_VALIDATING = {
    "$schema", "$id", "id", "title", "description", "default", "definitions",
    "examples", "readOnly", "writeOnly", "$comment",
}


def _type_check(col: str, tname: Any, dtype) -> tuple[str, str, Any] | None:
    """Zone check for a `type` keyword against a known Spark dtype, or None
    when row-level logic is required.  Mirrors plans/compiler.py _type_ok:
    a matching dtype means every non-null value passes (static_true), a
    mismatched dtype means every non-null value fails (static_false) —
    both decidable from the null count alone; only type "string" on a
    string column needs the zone rule for the blank-string quirk."""
    from pyspark.sql import types as T

    if not isinstance(tname, str):
        return None  # union / inline-schema forms -> row level
    integral = isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)) or (
        isinstance(dtype, T.DecimalType) and dtype.scale == 0
    )
    numeric = integral or isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType))
    if tname == "any":
        return (col, "static_true", None)
    if tname == "string":
        if isinstance(dtype, T.StringType):
            return (col, "string_nonblank", None)
        return (col, "static_false", None)
    if tname == "integer":
        return (col, "static_true" if integral else "static_false", None)
    if tname == "number":
        return (col, "static_true" if numeric else "static_false", None)
    if tname == "boolean":
        return (col, "static_true" if isinstance(dtype, T.BooleanType) else "static_false", None)
    if tname == "object":
        ok = isinstance(dtype, (T.StructType, T.MapType))
        return (col, "static_true" if ok else "static_false", None)
    if tname == "array":
        ok = isinstance(dtype, T.ArrayType)
        return (col, "static_true" if ok else "static_false", None)
    return None  # null/date/uri/... -> row level


def prunable_checks_from_schema(schema: dict, df_schema) -> tuple[list, list]:
    """Split a table-level object schema into (zone_checks, residual).

    ``zone_checks`` is the (column, keyword, value) list `prune_decisions`
    accepts; ``residual`` lists "column.keyword" strings whose semantics
    zone statistics cannot decide (pattern, format, length bounds, nested
    schemas, $data, combinators, ...).  A shard-skip is SOUND only when
    residual is empty — callers must treat any residual as "scan
    everything" for the skip decision (per-check decisions for the
    prunable subset remain valid either way)."""
    dtypes = {f.name: f.dataType for f in df_schema.fields}
    checks: list = []
    residual: list = []
    for col in schema.get("required", []) or []:
        if col in dtypes:
            checks.append((col, "required", None))
        else:
            # a required column the table doesn't even have: every row
            # fails, but the violation must come from the row-level pass
            # (zone stats can't reference a missing column)
            residual.append(f"{col}.required")
    for col, sub in (schema.get("properties") or {}).items():
        if col not in dtypes:
            # column absent from the table: required above already covers
            # presence; nothing zone-decidable about its values
            continue
        if not isinstance(sub, dict):
            residual.append(f"{col}.<schema>")
            continue
        excl_min = sub.get("exclusiveMinimum")
        excl_max = sub.get("exclusiveMaximum")
        for kw, value in sub.items():
            if kw in _NON_VALIDATING:
                continue
            if isinstance(value, dict) and "$data" in value:
                residual.append(f"{col}.{kw}")
                continue
            if kw == "type":
                tc = _type_check(col, value, dtypes[col])
                checks.append(tc) if tc else residual.append(f"{col}.{kw}")
            elif kw == "minimum":
                if excl_min is True:  # draft-4 boolean modifier
                    checks.append((col, "exclusiveMinimum", value))
                else:
                    checks.append((col, "minimum", value))
            elif kw == "maximum":
                if excl_max is True:
                    checks.append((col, "exclusiveMaximum", value))
                else:
                    checks.append((col, "maximum", value))
            elif kw == "exclusiveMinimum":
                if not isinstance(value, bool):  # draft-6 numeric form
                    checks.append((col, "exclusiveMinimum", value))
            elif kw == "exclusiveMaximum":
                if not isinstance(value, bool):
                    checks.append((col, "exclusiveMaximum", value))
            elif kw in ("const", "constant"):
                if isinstance(value, (dict, list)):
                    residual.append(f"{col}.{kw}")
                else:
                    checks.append((col, "const", value))
            elif kw == "enum":
                if isinstance(value, list) and value and all(
                    not isinstance(v, (dict, list, bool)) and v is not None for v in value
                ):
                    checks.append((col, "enum", value))
                else:
                    residual.append(f"{col}.{kw}")
            else:
                residual.append(f"{col}.{kw}")
    return checks, residual


def zone_prune_plan(df: DataFrame, shard: Column | str, schema: dict) -> dict:
    """End-to-end shard-skip plan for a validation run: extract the
    zone-decidable checks, compute decisions, and — ONLY when the schema
    has no residual row-level keywords — collect the provably-clean shard
    list.  Returns {"clean_parts": set, "part_rows": {shard: n_rows},
    "residual": [...], "n_checks": int}.  The collect is |shards|-sized
    (driver-safe at any table size); with residual keywords present
    clean_parts is empty and the caller scans everything, but part_rows
    still serves as the row-count source."""
    checks, residual = prunable_checks_from_schema(schema, df.schema)
    _value_kw = {"minimum", "maximum", "exclusiveMinimum", "exclusiveMaximum",
                 "const", "enum", "string_nonblank"}
    cols = sorted({c for c, k, _ in checks if k in _value_kw})
    null_only = sorted({c for c, k, _ in checks if k not in _value_kw} - set(cols))
    zones = zone_maps(df, shard, cols, null_only_cols=null_only).persist()
    try:
        part_rows = {r["shard"]: r["n_rows"] for r in zones.select("shard", "n_rows").collect()}
        clean: set = set()
        if checks and not residual:
            verdicts = prune_decisions(zones, checks, with_shard_verdict=True)
            clean = {
                r["shard"]
                for r in verdicts.where(
                    (F.col("column") == "*") & (F.col("decision") == ALL_PASS)
                ).collect()
            }
    finally:
        zones.unpersist()
    return {
        "clean_parts": clean,
        "part_rows": part_rows,
        "residual": residual,
        "n_checks": len(checks),
    }

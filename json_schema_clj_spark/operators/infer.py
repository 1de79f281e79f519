"""Schema inference & constraint suggestion — the inverse operator.

The reference validates documents against a GIVEN schema (core.clj
validate/compile); at 10^12 rows the schema is often unknown or stale, so
a validation engine also needs the profile→schema direction (what Deequ's
ConstraintSuggestion / Great Expectations' profiler do): derive a draft-7
JSON-Schema plus suggested constraints FROM the data, then feed the result
straight back into this engine's compilers (`engine.validate_table` /
`validate_json_column`) — inference and validation close the loop inside
one system.

Scale design
------------
* `constraint_profile` is TWO aggregation passes, both map-side partial +
  one tiny shuffle: pass 1 reuses `stats.column_profile` (null counts,
  min/max, distinct — HLL on the 10^12-row path); pass 2 collects enum
  candidates ONLY for columns whose pass-1 distinct estimate is below the
  enum threshold, so `collect_set` state is bounded by `enum_max+1` values
  per column regardless of table size (a safety cap guards HLL
  underestimates).  The driver only ever sees |columns| rows.
* `suggest_constraints` / `schema_from_profile` run on the |columns|-row
  profile — pure column expressions / driver-side dict building, no scan.
* `infer_json_paths` discovers the shape of a dynamic JSON column in one
  pass: parse_json → variant_explode (pure Catalyst, no Python) → group by
  (path, runtime type).  Output feeds `schema_from_json_paths`, whose
  result validates green through the variant backend by construction.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .stats import column_profile

# Spark dtype → JSON-Schema type keyword (the engine's own type table,
# compiler.py `_type_ok`, accepts these on typed columns)
_NUMERIC = (T.FloatType, T.DoubleType, T.DecimalType)
_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def json_type_of(dt: T.DataType) -> str:
    if isinstance(dt, _INTEGRAL):
        return "integer"
    if isinstance(dt, _NUMERIC):
        return "number"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return "datetime"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.ArrayType):
        return "array"
    if isinstance(dt, (T.StructType, T.MapType)):
        return "object"
    return "string"


def constraint_profile(
    df: DataFrame,
    cols: Optional[list[str]] = None,
    enum_max: int = 8,
    exact: bool = False,
) -> DataFrame:
    """One row per column: (column, json_type, n_rows, n_null, required,
    unique, min_value, max_value, n_distinct, enum_values).

    `required`   — no NULLs observed (suggest `required` + non-null check).
    `unique`     — every non-null value distinct (suggest a uniqueness
                   check; with `exact=False` this is an HLL estimate and
                   marked only when the estimate covers ≥ the non-null
                   count — advisory, like Deequ's suggestion mode).
    `enum_values`— ','-joined sorted distinct values when the column's
                   cardinality ≤ `enum_max`, else NULL.  Values are
                   stringified, so the output row shape is hash-stable
                   across engines.
    """
    cols = cols or [
        f.name for f in df.schema.fields if not isinstance(f.dataType, T.BinaryType)
    ]
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    prof = column_profile(df, cols, exact=exact)

    # pass-1 result is |cols| rows — driver-sized by construction
    by_col = {r["column"]: r for r in prof.collect()}

    # pass 2: enum candidates only where pass 1 says the cardinality is
    # small.  The cap at 2*enum_max+1 values inside collect_set guards the
    # approximate path: if HLL underestimated and the real cardinality is
    # huge, slice() bounds what reaches the driver and the > enum_max check
    # drops the column's enum anyway.
    # enum candidates: atomic scalar types only — arrays/structs/maps
    # stringify ambiguously and their IN-list would not even type-check
    # back through the compiler (code-review round 3)
    _atomic = (*_INTEGRAL, *_NUMERIC, T.StringType, T.BooleanType)
    low_card = [
        c
        for c in cols
        if by_col[c]["n_distinct"] <= enum_max and isinstance(dtypes[c], _atomic)
    ]
    enums: dict[str, Optional[str]] = {c: None for c in cols}
    # blank detection rides the same pass: the engine's blank-string quirk
    # (trim(x) != '' inside type:string) means a schema claiming
    # type:string on a column containing ''/whitespace-only values would
    # reject its own data — schema_from_profile needs to know
    str_cols = [c for c in cols if isinstance(dtypes[c], T.StringType)]
    blanks: dict[str, int] = {c: 0 for c in cols}
    if low_card or str_cols:
        aggs = [
            F.slice(
                F.sort_array(F.collect_set(F.col(c).cast("string"))), 1, 2 * enum_max + 1
            ).alias(c)
            for c in low_card
        ] + [
            F.sum((F.trim(F.col(c)) == F.lit("")).cast("long")).alias(f"__blank_{c}")
            for c in str_cols
        ]
        row = df.agg(*aggs).collect()[0]
        for c in str_cols:
            blanks[c] = row[f"__blank_{c}"] or 0
        for c in low_card:
            vals = row[c]
            # values containing the join separator would split back into
            # phantom members downstream (schema_from_profile,
            # profile_drift) — drop the enum rather than corrupt it
            if (
                vals is not None
                and 0 < len(vals) <= enum_max
                and not any("," in v for v in vals)
            ):
                enums[c] = ",".join(vals)

    spark = df.sparkSession
    out_rows = []
    for c in cols:
        r = by_col[c]
        non_null = r["n_rows"] - r["n_null"]
        out_rows.append(
            (
                c,
                json_type_of(dtypes[c]),
                r["n_rows"],
                r["n_null"],
                bool(r["n_null"] == 0),
                bool(non_null > 0 and r["n_distinct"] >= non_null),
                r["min_value"],
                r["max_value"],
                r["n_distinct"],
                enums[c],
                blanks[c],
            )
        )
    schema = (
        "column string, json_type string, n_rows long, n_null long, "
        "required boolean, unique boolean, min_value string, max_value string, "
        "n_distinct long, enum_values string, n_blank long"
    )
    return spark.createDataFrame(out_rows, schema)


def suggest_constraints(profile: DataFrame) -> DataFrame:
    """Deequ-style suggestion rows (column, keyword, value) from a
    `constraint_profile` result: `type` always; `required` when no NULLs;
    `enum` when cardinality is small; `minimum`/`maximum` for numeric
    columns; `unique` when all non-null values are distinct.  Runs on the
    |columns|-row profile — stack + filter, no data scan."""
    num = F.col("json_type").isin("integer", "number")
    stacked = profile.select(
        "column",
        F.explode(
            F.filter(
                F.array(
                    F.struct(F.lit("type").alias("keyword"), F.col("json_type").alias("value")),
                    F.struct(
                        F.lit("required").alias("keyword"),
                        F.when(F.col("required"), F.lit("true")).alias("value"),
                    ),
                    F.struct(
                        F.lit("unique").alias("keyword"),
                        F.when(F.col("unique"), F.lit("true")).alias("value"),
                    ),
                    F.struct(
                        F.lit("enum").alias("keyword"),
                        F.col("enum_values").alias("value"),
                    ),
                    F.struct(
                        F.lit("minimum").alias("keyword"),
                        F.when(num, F.col("min_value")).alias("value"),
                    ),
                    F.struct(
                        F.lit("maximum").alias("keyword"),
                        F.when(num, F.col("max_value")).alias("value"),
                    ),
                ),
                lambda s: s["value"].isNotNull(),
            )
        ).alias("s"),
    )
    return stacked.select("column", F.col("s.keyword").alias("keyword"), F.col("s.value").alias("value"))


def schema_from_profile(profile: DataFrame, enum_as_strings: bool = False) -> dict:
    """Build a draft-7 object schema from a `constraint_profile` result
    (driver-side over |columns| rows).  The output compiles on the Column
    backend, so `engine.validate_table(df, schema_from_profile(...))` is
    green on the profiled data by construction — the closure test.

    Numeric bounds parse back from the stringified min/max; enum members
    keep their column's type unless `enum_as_strings`."""
    props: dict = {}
    required: list[str] = []
    for r in profile.collect():
        c = r["column"]
        jt = r["json_type"]
        sub: dict = {}
        # the engine's blank-string quirk: type:string rejects ''/
        # whitespace-only values, so a column observed to contain blanks
        # cannot carry the type without rejecting its own data — omit it
        # (the rest of the constraints still apply)
        n_blank = r["n_blank"] if "n_blank" in profile.columns else 0
        if jt == "string" and n_blank:
            pass
        elif jt in ("integer", "number", "string", "boolean", "datetime"):
            sub["type"] = jt
        if jt in ("integer", "number") and r["min_value"] is not None:
            cast = int if jt == "integer" else float
            sub["minimum"] = cast(r["min_value"])
            sub["maximum"] = cast(r["max_value"])
        if r["enum_values"] is not None:
            vals = r["enum_values"].split(",")
            if jt == "integer" and not enum_as_strings:
                sub["enum"] = [int(v) for v in vals]
            elif jt == "number" and not enum_as_strings:
                sub["enum"] = [float(v) for v in vals]
            elif jt == "boolean" and not enum_as_strings:
                # typed members: Clojure `=` never equates false with
                # "false", so stringified members would reject the very
                # data they were profiled from
                sub["enum"] = [v == "true" for v in vals]
            else:
                sub["enum"] = vals
        if r["required"]:
            required.append(c)
        props[c] = sub
    out: dict = {"type": "object", "properties": props}
    if required:
        out["required"] = sorted(required)
    return out


# ---------------------------------------------------------------------------
# dynamic JSON column → per-path type histogram → object schema

# schema_of_variant renders the runtime type of each variant value; map its
# spellings onto JSON-Schema type keywords.  DECIMAL covers variant's exact
# decimal renderings of JSON floats.
_VARIANT_TYPE_CASE = """
CASE
  WHEN vt IN ('BIGINT', 'INT', 'SMALLINT', 'TINYINT') THEN 'integer'
  WHEN vt = 'DOUBLE' OR vt = 'FLOAT' OR vt LIKE 'DECIMAL%' THEN 'number'
  WHEN vt = 'STRING' THEN 'string'
  WHEN vt = 'BOOLEAN' THEN 'boolean'
  WHEN vt = 'VOID' THEN 'null'
  WHEN vt LIKE 'ARRAY%' THEN 'array'
  ELSE 'object'
END
"""


def infer_json_paths(df: DataFrame, json_col: str, max_depth: int = 1) -> DataFrame:
    """(path, json_type, n_present, min_num, max_num): one row per
    key path × runtime JSON type over a raw-JSON string column, down to
    `max_depth` levels (nested paths dotted: ``a.b``).

    Pure Catalyst: parse_json once, then one lateral variant_explode per
    level (no Python, no schema_of_json sampling on the driver — this is
    exact over ALL rows, not an inferred sample), then one partial+final
    hash agg keyed by (path, type).  Each recursion level explodes only
    the previous level's OBJECT-typed values, so the frontier shrinks at
    every depth; the shuffle key space — paths × types actually present —
    bounds the agg state, not the row count.  min/max_num carry numeric
    ranges (NULL for non-numeric types) as fixed-scale strings so
    downstream comparison is format-proof."""
    spark = df.sparkSession
    parsed = df.where(F.col(json_col).isNotNull()).select(
        F.lit("").alias("prefix"), F.parse_json(F.col(json_col)).alias("v")
    )
    # variant_explode is a table-valued generator in Spark 4 — invoke it
    # through the lateral-join form (spark.tvf + outer column reference);
    # it is not resolvable as a scalar expression inside select()
    levels = []
    frontier = parsed
    for _ in range(max_depth):
        ex = frontier.lateralJoin(
            spark.tvf.variant_explode(F.col("v").outer())
        ).select(
            F.when(F.col("prefix") == "", F.col("key"))
            .otherwise(F.concat(F.col("prefix"), F.lit("."), F.col("key")))
            .alias("path"),
            F.expr("schema_of_variant(value)").alias("vt"),
            F.expr("try_cast(cast(value AS string) AS double)").alias("num"),
            F.col("value"),
        )
        levels.append(ex.select("path", "vt", "num"))
        frontier = ex.where(
            ~F.col("vt").rlike("^(BIGINT|INT|SMALLINT|TINYINT|DOUBLE|FLOAT|STRING|BOOLEAN|VOID)$")
            & ~F.col("vt").startswith("DECIMAL")
            & ~F.col("vt").startswith("ARRAY")
        ).select(F.col("path").alias("prefix"), F.col("value").alias("v"))
    exploded = levels[0]
    for lv in levels[1:]:
        exploded = exploded.unionByName(lv)
    return (
        exploded.select(
            "path",
            F.expr(_VARIANT_TYPE_CASE).alias("json_type"),
            "num",
        )
        .groupBy("path", "json_type")
        .agg(
            F.count(F.lit(1)).alias("n_present"),
            # DECIMAL(38,6) + try_cast: epoch-millisecond-sized values
            # (~10^12) overflowed DECIMAL(18,6) and ABORTED the query
            # under ANSI mode (code-review round 3); values beyond
            # 10^32 render NULL instead of crashing, mirrored by the
            # oracles' TRY_CAST
            F.expr("CAST(try_cast(round(min(num), 6) AS decimal(38,6)) AS string)").alias("min_num"),
            F.expr("CAST(try_cast(round(max(num), 6) AS decimal(38,6)) AS string)").alias("max_num"),
        )
        .orderBy("path", "json_type")
    )


def schema_from_json_paths(paths: DataFrame, n_docs: int) -> dict:
    """Object schema from an `infer_json_paths` result (driver-side over
    |paths × types| rows), NESTED: dotted paths from `max_depth > 1`
    become sub-schemas under their parent's `properties`, not flat
    top-level names (a flat 'a.x' property would make every document
    invalid — code-review round 3).  A path present in every observation
    of its PARENT object (the root counts all `n_docs` documents) is
    required there; a path observed with several runtime types gets a
    union `type` list (the reference's draft-3 union-type form, which all
    three backends compile); numeric paths get observed
    [minimum, maximum]."""
    by_path: dict[str, list] = {}
    for r in paths.collect():
        by_path.setdefault(r["path"], []).append(r)

    children: dict[str, list[str]] = {}
    for path in by_path:
        parent = path.rsplit(".", 1)[0] if "." in path else ""
        children.setdefault(parent, []).append(path)

    def obj_count(path: str) -> int:
        # how many times this path was observed AS an object — the
        # denominator for its children's required decision
        return sum(
            r["n_present"] for r in by_path.get(path, []) if r["json_type"] == "object"
        )

    def build(prefix: str, denom: int) -> dict:
        props: dict = {}
        required = []
        for path in sorted(children.get(prefix, [])):
            rows = by_path[path]
            types = sorted({r["json_type"] for r in rows} - {"null"})
            sub: dict = {}
            if len(types) == 1:
                sub["type"] = types[0]
            elif types:
                sub["type"] = types
            nums = [r for r in rows if r["json_type"] in ("integer", "number")]
            if nums and len(types) == 1:
                mins = [float(r["min_num"]) for r in nums if r["min_num"] is not None]
                maxs = [float(r["max_num"]) for r in nums if r["max_num"] is not None]
                if mins and maxs:
                    cast = int if types == ["integer"] else float
                    sub["minimum"] = cast(min(mins))
                    sub["maximum"] = cast(max(maxs))
            if "object" in types and path in children:
                nested = build(path, obj_count(path))
                sub["properties"] = nested["properties"]
                if "required" in nested:
                    sub["required"] = nested["required"]
            if denom > 0 and sum(r["n_present"] for r in rows) >= denom:
                required.append(path.rsplit(".", 1)[-1])
            props[path.rsplit(".", 1)[-1]] = sub
        out: dict = {"type": "object", "properties": props}
        if required:
            out["required"] = sorted(required)
        return out

    return build("", n_docs)


# ---------------------------------------------------------------------------
# functional-dependency discovery (the key/uniqueness generalization)

def fd_candidates(
    df: DataFrame,
    cols: Optional[list[str]] = None,
    exact: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Discover column-level functional dependencies a→b: a determines b
    iff every (non-null) a value maps to exactly one b value, i.e.
    n_distinct(a) == n_distinct((a, b)).  Output: one row per ordered
    column pair `(determinant, dependent, n_lhs, n_pair, holds)` — the
    multi-column generalization of the `unique` suggestion (a key column
    determines every other column).

    Scale design: the approximate path (default) computes ALL |cols|²
    cardinalities in ONE aggregation pass using HLL sketches
    (`approx_count_distinct` is a true partial aggregate — no expand), so
    the scan cost is independent of the pair count and the driver sees a
    single row; `holds` is then advisory (Deequ suggestion mode) within
    HLL error `rsd`.  The exact path runs one 2-column count-distinct per
    pair — each a column-pruned scan — because Spark rewrites multi
    count_distinct through an Expand node that multiplies rows by the
    aggregate count (|pairs|× shuffle amplification at 10^12 rows); use it
    only to confirm advisories on a sample or at oracle scale.

    NULL contract: rows with a NULL determinant are excluded from both
    sides (count(DISTINCT a) ignores NULLs, and the pair struct is nulled
    when a is), so a NULL lhs neither proves nor breaks a dependency.
    """
    cols = cols or [
        f.name for f in df.schema.fields if not isinstance(f.dataType, T.BinaryType)
    ]
    pairs = [(a, b) for a in cols for b in cols if a != b]
    spark = df.sparkSession

    def pair_col(a: str, b: str):
        return F.when(F.col(a).isNotNull(), F.struct(F.col(a), F.col(b)))

    counts: dict = {}
    if exact:
        for a in cols:
            counts[a] = df.agg(F.count_distinct(F.col(a)).alias("n")).collect()[0]["n"]
        for a, b in pairs:
            counts[(a, b)] = df.agg(
                F.count_distinct(pair_col(a, b)).alias("n")
            ).collect()[0]["n"]
    else:
        aggs = [F.approx_count_distinct(F.col(a), rsd).alias(f"l_{i}") for i, a in enumerate(cols)]
        aggs += [
            F.approx_count_distinct(pair_col(a, b), rsd).alias(f"p_{i}")
            for i, (a, b) in enumerate(pairs)
        ]
        row = df.agg(*aggs).collect()[0]
        for i, a in enumerate(cols):
            counts[a] = row[f"l_{i}"]
        for i, (a, b) in enumerate(pairs):
            counts[(a, b)] = row[f"p_{i}"]

    # approx mode: the lhs and pair cardinalities of a true FD are EQUAL,
    # but they come from two independent HLL sketches, so allow the pair
    # estimate to land up to ~3 standard errors above the lhs estimate
    slack = 1.0 if exact else 1 + 3 * rsd
    out = [
        (a, b, counts[a], counts[(a, b)], bool(counts[(a, b)] <= counts[a] * slack))
        for a, b in pairs
    ]
    return spark.createDataFrame(
        out,
        "determinant string, dependent string, n_lhs long, n_pair long, holds boolean",
    )


# ---------------------------------------------------------------------------
# profile drift — where the data stopped matching its (inferred) schema

def profile_drift(
    prof_a: DataFrame, prof_b: DataFrame, part_col: Optional[str] = None
) -> DataFrame:
    """Compare two `constraint_profile` results (baseline vs current) and
    emit one row per constraint-level change: `(column, change, before,
    after)`.  This is the schema-space analog of the value-space drift
    operators (KS/PSI/chi2): it answers "which inferred constraints would
    break if the baseline schema were enforced on the current slice".

    Detected changes: `column_added`/`column_removed` (outer-join misses),
    `type_changed`, `required_lost` (nulls appeared), `unique_lost`,
    `min_extended`/`max_extended` (numeric range grew past the baseline —
    exactly the rows the roundtrip query flags as minimum/maximum
    violations), `enum_new_values` (values outside the baseline enum).

    Scale: both inputs are |columns|-row profiles, so this is a tiny
    sort-merge join + column expressions — the expensive scans already
    happened inside `constraint_profile`, one bounded pass per side.
    """
    a = prof_a.alias("a")
    b = prof_b.alias("b")
    # per-partition mode: `prof_b` carries `part_col` (one profile row per
    # (part, column), e.g. constraint_profile_by output) and every change
    # row is tagged with its partition — the bad-shard detector.  The join
    # turns inner: the column set is fixed by the table schema, so the
    # structural added/removed changes cannot fire per-partition.
    how = "inner" if part_col else "full_outer"
    j = a.join(b, F.col("a.column") == F.col("b.column"), how)
    num = F.col("a.json_type").isin("integer", "number") & F.col(
        "b.json_type"
    ).isin("integer", "number")
    a_min = F.col("a.min_value").cast("double")
    a_max = F.col("a.max_value").cast("double")
    b_min = F.col("b.min_value").cast("double")
    b_max = F.col("b.max_value").cast("double")
    enum_new = F.array_join(
        F.array_sort(
            F.array_except(
                F.split(F.col("b.enum_values"), ","),
                F.split(F.coalesce(F.col("a.enum_values"), F.lit("")), ","),
            )
        ),
        ",",
    )
    changes = F.array(
        F.struct(
            F.lit("column_added").alias("change"),
            F.when(F.col("a.column").isNull(), F.lit("absent")).alias("before"),
            F.col("b.column").alias("after"),
        ),
        F.struct(
            F.lit("column_removed").alias("change"),
            F.when(F.col("b.column").isNull(), F.col("a.column")).alias("before"),
            F.lit("absent").alias("after"),
        ),
        F.struct(
            F.lit("type_changed").alias("change"),
            F.when(
                F.col("a.json_type") != F.col("b.json_type"), F.col("a.json_type")
            ).alias("before"),
            F.col("b.json_type").alias("after"),
        ),
        F.struct(
            F.lit("required_lost").alias("change"),
            F.when(F.col("a.required") & ~F.col("b.required"), F.lit("required")).alias(
                "before"
            ),
            F.lit("nullable").alias("after"),
        ),
        F.struct(
            F.lit("unique_lost").alias("change"),
            F.when(F.col("a.unique") & ~F.col("b.unique"), F.lit("unique")).alias(
                "before"
            ),
            F.lit("duplicated").alias("after"),
        ),
        F.struct(
            F.lit("min_extended").alias("change"),
            F.when(num & (b_min < a_min), F.col("a.min_value")).alias("before"),
            F.col("b.min_value").alias("after"),
        ),
        F.struct(
            F.lit("max_extended").alias("change"),
            F.when(num & (b_max > a_max), F.col("a.max_value")).alias("before"),
            F.col("b.max_value").alias("after"),
        ),
        F.struct(
            F.lit("enum_new_values").alias("change"),
            # only when the BASELINE carried an enum: an added column is
            # reported structurally (column_added), and a baseline column
            # whose cardinality exceeded enum_max has no enum to drift
            # from — flagging every current value as "new" there
            # mis-reports a cardinality DROP as schema drift
            # (code-review round 3)
            F.when(
                F.col("a.enum_values").isNotNull()
                & F.col("b.enum_values").isNotNull()
                & (enum_new != F.lit("")),
                F.col("a.enum_values"),
            ).alias("before"),
            enum_new.alias("after"),
        ),
    )
    part = [F.col(f"b.{part_col}").alias(part_col)] if part_col else []
    part_names = [part_col] if part_col else []
    return (
        j.select(
            *part,
            F.coalesce(F.col("a.column"), F.col("b.column")).alias("column"),
            F.explode(F.filter(changes, lambda s: s["before"].isNotNull())).alias("s"),
        )
        .select(
            *part_names,
            "column",
            F.col("s.change").alias("change"),
            F.col("s.before").alias("before"),
            F.col("s.after").alias("after"),
        )
    )


def constraint_profile_by(
    df: DataFrame,
    part_col: str,
    cols: Optional[list[str]] = None,
    exact: bool = False,
) -> DataFrame:
    """Per-partition `constraint_profile` (no enum — bounded enum sets are
    a second pass the partitioned form skips): one row per (part, column)
    in the exact shape `profile_drift(part_col=...)` consumes.  Fully
    distributed — the keyed single-pass agg of `column_profile_by` plus
    column expressions; nothing is collected.  Feed it with a global
    baseline profile to find the partitions (shards, files, dates) whose
    data stopped matching the schema everyone else still satisfies."""
    from .stats import column_profile_by

    cols = cols or [
        f.name
        for f in df.schema.fields
        if f.name != part_col and not isinstance(f.dataType, T.BinaryType)
    ]
    dtypes = {f.name: f.dataType for f in df.schema.fields}
    type_map = F.create_map(
        *[x for c in cols for x in (F.lit(c), F.lit(json_type_of(dtypes[c])))]
    )
    prof = column_profile_by(df, part_col, cols, exact=exact)
    non_null = F.col("n_rows") - F.col("n_null")
    return prof.select(
        F.col("part").alias(part_col),
        "column",
        type_map[F.col("column")].alias("json_type"),
        "n_rows",
        "n_null",
        (F.col("n_null") == 0).alias("required"),
        ((non_null > 0) & (F.col("n_distinct") >= non_null)).alias("unique"),
        "min_value",
        "max_value",
        "n_distinct",
        F.lit(None).cast("string").alias("enum_values"),
    )


def candidate_keys(
    df: DataFrame,
    cols: Optional[list[str]] = None,
    max_width: int = 2,
    exact: bool = False,
    rsd: float = 0.05,
) -> DataFrame:
    """Discover candidate keys: column combinations (width ≤ `max_width`)
    whose distinct combination count covers the row count.  Output: one
    row per combination `(key_cols, width, n_distinct, is_key, minimal)`
    — `minimal` marks keys no proper subset of which is already a key
    (a superset of a key is trivially a key and never minimal).

    Scale design mirrors `fd_candidates`: the default path computes every
    combination's cardinality in ONE HLL aggregation pass (true partial
    aggregate, no multi-count-distinct Expand), so adding combinations
    widens the aggregate state, not the scan count; `is_key` is then
    advisory within HLL error: the estimate only has to cover
    `(1 − 3·rsd)` of the row count, since a true key's HLL estimate can
    legitimately land up to ~3 standard errors below the exact
    cardinality.  The exact path (oracle/test scale) runs one
    count-distinct per combination and compares exactly.

    `rsd` trades accuracy against aggregation-state width: an HLL++
    sketch's mutable buffer is ~(1.106/rsd)^2 registers, and EVERY
    combination carries its own buffer through the partial aggregate —
    rsd 0.01 puts ~6,500 long fields in the update row (measured 25x
    slower per input row than rsd 0.05 at sf0.1) for 5x tighter
    estimates.  The 0.05 default matches Spark's and keeps the
    single-pass plan cheaper than ONE exact pass.
    """
    from itertools import combinations

    cols = cols or [
        f.name for f in df.schema.fields if not isinstance(f.dataType, T.BinaryType)
    ]
    combos: list[tuple[str, ...]] = []
    for w in range(1, max_width + 1):
        combos.extend(combinations(cols, w))
    spark = df.sparkSession

    def combo_col(combo: tuple[str, ...]):
        return F.struct(*[F.col(c) for c in combo])

    if exact:
        n_rows = df.count()
        counts = {
            combo: df.agg(F.count_distinct(combo_col(combo)).alias("n")).collect()[0]["n"]
            for combo in combos
        }
    else:
        aggs = [F.count(F.lit(1)).alias("n_rows")] + [
            F.approx_count_distinct(combo_col(combo), rsd).alias(f"c_{i}")
            for i, combo in enumerate(combos)
        ]
        row = df.agg(*aggs).collect()[0]
        n_rows = row["n_rows"]
        counts = {combo: row[f"c_{i}"] for i, combo in enumerate(combos)}

    threshold = n_rows if exact else n_rows * (1 - 3 * rsd)
    is_key = {combo: bool(counts[combo] >= threshold) for combo in combos}
    out = []
    for combo in combos:
        minimal = is_key[combo] and not any(
            is_key.get(sub, False)
            for w in range(1, len(combo))
            for sub in combinations(combo, w)
        )
        out.append(
            (",".join(combo), len(combo), counts[combo], is_key[combo], minimal)
        )
    return spark.createDataFrame(
        out, "key_cols string, width int, n_distinct long, is_key boolean, minimal boolean"
    )


def evolve_schema(schema: dict, drift_rows) -> dict:
    """Apply `profile_drift` change rows to a schema, producing the
    revised schema a maintainer would write: widen numeric bounds to the
    observed range, extend enums with the new members, drop `required`
    where nulls appeared, widen `type` to the union form on type changes,
    and admit added columns unconstrained.  `column_removed` is left
    alone (absence is only a violation if the column was required, and
    dropping constraints for a column that may return is lossy).

    Driver-side over |changes| rows (collect the drift result first) —
    closes the loop: infer → validate → drift → evolve → validate again.
    """
    import copy

    out = copy.deepcopy(schema)
    props = out.setdefault("properties", {})
    for r in drift_rows:
        col, change, after = r["column"], r["change"], r["after"]
        sub = props.setdefault(col, {})
        if change == "min_extended" or change == "max_extended":
            cast = int if sub.get("type") == "integer" else float
            key = "minimum" if change == "min_extended" else "maximum"
            sub[key] = cast(after)
        elif change == "enum_new_values" and "enum" in sub:
            new = after.split(",")
            if all(isinstance(v, str) for v in sub["enum"]):
                sub["enum"] = sorted(set(sub["enum"]) | set(new))
            else:
                cast = int if sub.get("type") == "integer" else float
                sub["enum"] = sorted(set(sub["enum"]) | {cast(v) for v in new})
        elif change == "required_lost":
            out["required"] = [c for c in out.get("required", []) if c != col]
            if not out.get("required"):
                out.pop("required", None)
        elif change == "type_changed":
            before = r["before"]
            types = sub.get("type")
            current = types if isinstance(types, list) else [types] if types else []
            sub["type"] = sorted({*current, before, after} - {None})
        elif change == "column_added":
            props.setdefault(col, {})
    return out

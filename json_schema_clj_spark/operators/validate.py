"""Table validation runner: compiled checks → violations, verdicts, sinks.

The distributed analog of the reference's `validate` entry point
(/root/reference/src/json_schema/core.clj:1500-1502): where one call
returns `{:errors [...] :warnings [...]}` for one document, this runner
annotates every row of a DataFrame with its violation array and derives

* **violation rows** — one row per (document, violation), the exploded
  error sink `{:path :message}` analog, plus severity routing
  (add-error, core.clj:42-45), and
* **per-partition verdicts** — `(part, n_rows, n_fail, pass)` pass/fail
  rollups (a north-star extension; the reference is single-document).

Everything is a single Catalyst plan: scan → predicate eval (whole-stage
codegen) → map-side partial agg → tiny shuffle on the partition key.  At
10^12 rows the verdict agg shuffles only |partitions| rows and the
violation sink is filter-pushdown-friendly (violations are rare).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.compiler import compile_for_table
from ..plans.ir import Compiled


def with_validation(
    df: DataFrame,
    schema: dict,
    config: Optional[dict] = None,
    out_col: str = "violations",
) -> DataFrame:
    """Annotate every row with `violations array<struct>` + `valid boolean`.

    `valid` counts only error-severity violations, matching the reference's
    `valid == (empty? errors)` contract (warnings and deferreds don't fail
    a document — utils.clj:50-71, custom_extensions_test.clj:91-128).
    """
    compiled: Compiled = compile_for_table(schema, df.schema, config=config)
    annotated = df.withColumn(out_col, compiled.violations)
    if not config:
        # no warnings rerouting → every violation is error-severity, so the
        # compiled ok-conjunction IS validity.  Consumers that only read
        # `valid` (verdict rollups) then never touch the violation structs
        # and Catalyst prunes their construction entirely — ~2× on the
        # flagship table scan.
        # coalesce: a residual NULL ok (custom register_keyword checks
        # under 3VL) must read as invalid, or valid=NULL rows escape every
        # ~valid prefilter while carrying violations
        return annotated.withColumn("valid", F.coalesce(compiled.ok, F.lit(False)))
    return annotated.withColumn(
        "valid",
        F.size(F.filter(F.col(out_col), lambda v: v["severity"] == F.lit("error"))) == F.lit(0),
    )


def violation_rows(
    validated: DataFrame,
    id_cols: list[str],
    out_col: str = "violations",
    prefilter=None,
    with_ordinal: bool = False,
) -> DataFrame:
    """Explode to one row per violation: the distributed error sink.

    Filter-first so the explode only touches failing rows — at scale the
    generated plan is scan → codegen predicate → explode of a tiny subset.
    `prefilter` (when provided) is a cheap boolean Column equivalent to
    "has violations" — e.g. ~valid when validity and non-emptiness coincide
    — letting the filter run WITHOUT constructing the violation structs for
    passing rows (~3× on the sink).

    `with_ordinal=True` adds `v_ord`, the violation's position within its
    source row's (ordered — core.clj keeps errors in check order) array.
    Two uses: the sink preserves the reference's error ordering, and
    failing-ROW counts become `count(v_ord = 0)` — a plain filtered count
    with map-side partials, instead of a count_distinct over a row-id
    (which at 10^9 violation rows is a full dedup aggregation of the sink).
    """
    cond = prefilter if prefilter is not None else (F.size(F.col(out_col)) > 0)
    filtered = validated.where(cond)
    if with_ordinal:
        exploded = filtered.select(
            *id_cols, F.posexplode(F.col(out_col)).alias("v_ord", "v")
        )
        extra = [F.col("v_ord")]
    else:
        exploded = filtered.select(*id_cols, F.explode(F.col(out_col)).alias("v"))
        extra = []
    return exploded.select(
        *id_cols,
        *extra,
        F.col("v.keyword_path").alias("keyword_path"),
        F.col("v.instance_path").alias("instance_path"),
        F.col("v.keyword").alias("keyword"),
        F.col("v.message").alias("message"),
        F.col("v.severity").alias("severity"),
    )


def violation_examples(
    validated: DataFrame,
    id_cols: list[str],
    k: int = 3,
    out_col: str = "violations",
    prefilter=None,
) -> DataFrame:
    """k deterministic EXAMPLE rows per violated keyword path — the "show
    me three failing rows per check" triage view, without ever collecting
    or globally sorting the violation set.

    Determinism: examples are the k smallest VIOLATIONS by the `id_cols`
    tuple (ties broken by instance_path, message — a row that violates
    the same path at several instance paths, e.g. three failing `items`
    elements, can supply several examples, each pointing at a distinct
    element), so reruns and different partitionings return bit-identical
    output — same contract as the min-id keeper in exact dedup.

    Scale shape (the reason this isn't a window function): a global
    `row_number() OVER (PARTITION BY keyword_path)` shuffles EVERY
    violation row onto |keyword_paths| reducers — low-cardinality keys,
    maximal skew.  Instead:

    1. explode failing rows only (violation_rows' filter-first plan),
    2. per-Arrow-batch prune to k smallest per path (mapInPandas — the
       stream never holds more than |paths|·k rows per batch),
    3. bucketed fold: top-k per (partition-id mod 64, path), then top-k
       per path over the ≤ 64·k survivors.

    The final aggregate sees a CONSTANT ≤ 64·k candidates per path at any
    table size, and the intermediate reduce spreads over 64 reducers per
    path (no hot single-reducer key).  Output: (keyword_path, keyword,
    severity, rank 1..k, *id_cols, instance_path, message), rank ordered
    by the id tuple.
    """
    rows = violation_rows(validated, id_cols, out_col=out_col, prefilter=prefilter)
    return violation_examples_from_rows(rows, id_cols, k=k)


def violation_examples_from_rows(
    rows: DataFrame,
    id_cols: list[str],
    k: int = 3,
) -> DataFrame:
    """`violation_examples` over an ALREADY-EXPLODED violation set — e.g.
    the persisted violations sink a resumable run just wrote — so exemplars
    cost one bounded pass over the (tiny, filter-pushdown-friendly) sink
    parquet instead of a second validation pass over the table.  `rows`
    needs the violation_rows shape: *id_cols, keyword_path (array or
    pre-joined string), keyword, severity, instance_path, message."""
    group_cols = ["keyword_path", "keyword", "severity"]
    kp = rows.schema["keyword_path"].dataType.typeName()
    ip = rows.schema["instance_path"].dataType.typeName()
    keyed = rows.select(
        (
            F.array_join("keyword_path", "/") if kp == "array" else F.col("keyword_path")
        ).alias("keyword_path"),
        "keyword",
        "severity",
        *id_cols,
        (
            F.array_join("instance_path", "/") if ip == "array" else F.col("instance_path")
        ).alias("instance_path"),
        "message",
    )
    sort_cols = list(id_cols) + ["instance_path", "message"]

    def prune(batches):
        import pandas as pd
        import pyarrow as pa

        for batch in batches:
            if batch.num_rows == 0:
                continue
            # ArrowDtype-backed pandas: a nullable int64 id column stays
            # int64 (Spark's default Arrow→pandas conversion would float64
            # it, silently rounding ids above 2^53 before the sort).
            # na_position="first" matches Spark's struct ordering in the
            # merge phase (null field < any value) — otherwise a NULL id
            # could be pruned locally yet win the global array_sort,
            # making output partitioning-dependent.
            pdf = batch.to_pandas(types_mapper=pd.ArrowDtype)
            out = (
                pdf.sort_values(sort_cols, na_position="first")
                .groupby(group_cols, dropna=False, sort=False)
                .head(k)
            )
            yield pa.RecordBatch.from_pandas(
                out.reset_index(drop=True), schema=batch.schema
            )

    pruned = keyed.mapInArrow(prune, keyed.schema)
    ex = F.struct(
        *[F.col(c) for c in id_cols], F.col("instance_path"), F.col("message")
    )
    # bucketed intermediate top-k: the batch prune emits ≤ |paths|·k rows
    # PER ARROW BATCH, so a direct collect_list per path would still grow
    # with |batches|.  Folding through 64 (bucket, path) groups first —
    # each sliced back to k — caps the final aggregate at 64·k candidates
    # per path, constant in table size, and spreads the intermediate
    # reduce over 64 reducers per path instead of one.
    n_buckets = 64
    lvl1 = (
        pruned.select(
            F.pmod(F.spark_partition_id(), F.lit(n_buckets)).alias("_b"),
            *group_cols,
            ex.alias("ex"),
        )
        .groupBy("_b", *group_cols)
        .agg(F.slice(F.array_sort(F.collect_list("ex")), 1, k).alias("exs"))
    )
    merged = (
        lvl1.select(*group_cols, F.explode("exs").alias("ex"))
        .groupBy(*group_cols)
        .agg(F.slice(F.array_sort(F.collect_list("ex")), 1, k).alias("exs"))
    )
    return merged.select(
        *group_cols, F.posexplode("exs").alias("_r", "ex")
    ).select(
        *group_cols,
        (F.col("_r") + 1).cast("long").alias("rank"),
        *[F.col(f"ex.{c}").alias(c) for c in id_cols],
        F.col("ex.instance_path").alias("instance_path"),
        F.col("ex.message").alias("message"),
    )


def verdicts(
    validated: DataFrame,
    part_col: str,
    out_col: str = "violations",
) -> DataFrame:
    """Per-partition pass/fail rollup `(part, n_rows, n_fail, pass)`.

    Spark's hash aggregate does map-side partial aggregation automatically,
    so the shuffle carries one row per (task, partition key) — negligible at
    any scale.
    """
    return (
        validated.groupBy(F.col(part_col))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((~F.col("valid")).cast("long")).alias("n_fail"),
        )
        .withColumn("pass", F.col("n_fail") == F.lit(0))
    )


def keyword_breakdown(
    validated: DataFrame,
    out_col: str = "violations",
    prefilter=None,
) -> DataFrame:
    """Violation counts per violated keyword path — the aggregate view a
    100 TB run actually reads first.  Explodes only failing rows, then a
    partial-aggregated groupBy on a low-cardinality key."""
    cond = prefilter if prefilter is not None else (F.size(F.col(out_col)) > 0)
    return (
        validated.where(cond)
        .select(F.explode(F.col(out_col)).alias("v"))
        .groupBy(
            F.array_join(F.col("v.keyword_path"), "/").alias("keyword_path"),
            F.col("v.keyword").alias("keyword"),
            F.col("v.severity").alias("severity"),
        )
        .agg(F.count(F.lit(1)).alias("n_violations"))
    )


def sampled_validation_profile(
    df: DataFrame,
    schema: dict,
    key_col: str,
    rate: float,
    seed: str = "s1",
    config: Optional[dict] = None,
) -> DataFrame:
    """Cheap pre-pass before a full-table validation run: validate a
    deterministic hash-bucket sample (md5 bucket predicate — no RNG, no
    shuffle, identical row set at any parallelism and in any SQL engine)
    and report per-keyword-path violation RATES with Wilson 95% bounds.

    At 10^12 rows this answers "which checks are broken and roughly how
    badly?" from a scan of rate·N rows, deciding whether the full run /
    quarantine pass is worth scheduling — the same triage role
    `referential.coverage` plays for the anti-join.

    Output per violated keyword path: (keyword_path, keyword, severity,
    n_sampled, n_rows_violating, rate_est, rate_lo, rate_hi).  The
    integer columns are exactly reproducible in any engine (the md5
    predicate is the oracle-portable sampler from operators/text.py);
    the Wilson bounds are driver-side arithmetic over those integers.

    Rates count violating ROWS, not violation rows: a row whose array
    column fails `items` three times is ONE Bernoulli failure for that
    keyword path (each row's paths are array_distinct'ed before the
    explode), so rate_est ≤ 1 always holds and the Wilson math stays
    well-defined — `keyword_breakdown` counts raw violation rows and
    would push p above 1 on multi-violation rows.
    """
    from .text import sample_hash_bucket

    sample = df.where(
        sample_hash_bucket(F.col(key_col), seed) < F.lit(int(rate * 65536))
    )
    validated = with_validation(sample, schema, config=config)
    totals = validated.agg(F.count(F.lit(1)).alias("n_sampled"))
    per_row = validated.where(F.size(F.col("violations")) > 0).select(
        F.explode(
            F.array_distinct(
                F.transform(
                    F.col("violations"),
                    lambda v: F.struct(
                        F.array_join(v["keyword_path"], "/").alias("keyword_path"),
                        v["keyword"].alias("keyword"),
                        v["severity"].alias("severity"),
                    ),
                )
            )
        ).alias("v")
    )
    bd = per_row.groupBy(
        F.col("v.keyword_path").alias("keyword_path"),
        F.col("v.keyword").alias("keyword"),
        F.col("v.severity").alias("severity"),
    ).agg(F.count(F.lit(1)).alias("n_rows_violating"))
    joined = bd.crossJoin(F.broadcast(totals))

    z = 1.959963984540054  # 97.5th standard-normal quantile
    n = F.col("n_sampled").cast("double")
    p = F.col("n_rows_violating").cast("double") / n
    center = p + z * z / (2 * n)
    margin = z * F.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    denom = 1 + z * z / n
    return joined.select(
        "keyword_path",
        "keyword",
        "severity",
        "n_sampled",
        "n_rows_violating",
        p.alias("rate_est"),
        F.greatest(F.lit(0.0), (center - margin) / denom).alias("rate_lo"),
        F.least(F.lit(1.0), (center + margin) / denom).alias("rate_hi"),
    )


def _schema_has_deferred(schema) -> bool:
    if isinstance(schema, dict):
        return "deferred" in schema or any(_schema_has_deferred(v) for v in schema.values())
    if isinstance(schema, list):
        return any(_schema_has_deferred(v) for v in schema)
    return False


def validate(
    df: DataFrame,
    schema: dict,
    id_cols: list[str],
    part_col: Optional[str] = None,
    config: Optional[dict] = None,
) -> dict:
    """One-call API: returns dict of lazy DataFrames
    {annotated, violations, verdicts?, keywords, examples}."""
    annotated = with_validation(df, schema, config=config)
    # when validity and violation-emptiness coincide (no warning rerouting,
    # no deferred annotations), ~valid is a cheap prefilter that skips
    # struct construction for passing rows
    prefilter = None
    if not config and not _schema_has_deferred(schema):
        prefilter = ~F.col("valid")
    out = {
        "annotated": annotated,
        "violations": violation_rows(annotated, id_cols, prefilter=prefilter),
        "keywords": keyword_breakdown(annotated, prefilter=prefilter),
        "examples": violation_examples(annotated, id_cols, prefilter=prefilter),
    }
    if part_col is not None:
        out["verdicts"] = verdicts(annotated, part_col)
    return out


def write_quarantined(
    validated: DataFrame,
    path: str,
    fmt: str = "parquet",
) -> None:
    """Route valid and invalid rows to one sink in ONE pass: a partitioned
    write on a derived string verdict puts clean rows under ``verdict=ok/``
    and quarantined rows (with their violation arrays) under
    ``verdict=quarantine/``.  The typed `valid` column stays in the data
    (partition columns round-trip as strings, so partitioning on a derived
    key keeps the boolean intact for readers).

    The alternative — two filtered writes — scans and evaluates the whole
    check tree twice; at 10^12 rows that doubles the job.  Downstream
    consumers read ``{path}/verdict=ok`` with partition pruning (the scan
    never touches quarantined files), and the quarantine subdir retains
    the violations column for triage."""
    (
        validated.withColumn(
            "verdict", F.when(F.col("valid"), F.lit("ok")).otherwise(F.lit("quarantine"))
        )
        .write.mode("overwrite")
        .partitionBy("verdict")
        .format(fmt)
        .save(path)
    )

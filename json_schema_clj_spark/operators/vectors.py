"""Vector / embedding column validation (north-star table extension).

The embeddings table gets retrieval treatment elsewhere (ANN + near-dup,
operators/similarity.py); this module gives it the VALIDATION-tier
treatment the reference gives scalar payloads (core.clj's `type` /
`minItems` / `maxItems` / `uniqueItems` keyword family, SURVEY.md §2.4)
re-expressed for an ``array<float>`` column at 10^12-row scale:

- ``vector_conformance`` — per-corpus verdict counts with fixed check
  precedence (null → wrong dim → non-finite element → zero vector → ok),
  the array analog of the keyword-path violation rollup.
- ``vector_norm_profile`` — per-group quantized-norm stats (the stats
  profile's min/max/null-rate analog for vectors; detects collapsed or
  exploding embeddings before a training run does).
- ``vector_dim_profile`` — per-dimension stats (dead dimensions, stuck
  dimensions, per-dim mean shift — the drift surface for model-quality
  regressions that corpus-level norms cannot see).

Everything is pure Catalyst higher-order functions (exists / forall /
transform / aggregate / posexplode) — no Python in the row path, one
partial-agg'd aggregation pass per operator, and the only shuffles are
the final |groups|- or |dims|-sized rollups.

Why quantization: float aggregates are not reproducible across engines
(summation order), so every compared output is integer.  Elements are
quantized q = CAST(round(x · 2^k) AS BIGINT) first — multiplying a
float32-exact double by a power of two is EXACT in IEEE 754 and
round-half-away-from-zero agrees between Spark and ANSI engines, so q is
bit-identical everywhere and the quantized norm Σq² is order-free
integer arithmetic (64 dims · (2^10·4)^2 ≪ 2^63: no overflow for any
|x| ≤ 2^21 at the default scale).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default element quantization scale (power of two => exact product)
DEFAULT_QSCALE = 1024


def _quantized(col: Column, qscale: int) -> Column:
    """array<bigint>: round(x * qscale) per element (exact product — see
    module docstring), null elements pass through as null."""
    return F.transform(
        col, lambda x: F.round(x.cast("double") * F.lit(float(qscale))).cast("long")
    )


def _qnorm2(col: Column, qscale: int) -> Column:
    """Σ q² over the quantized elements — order-free integer norm."""
    return F.aggregate(
        _quantized(col, qscale),
        F.lit(0).cast("long"),
        lambda acc, q: acc + q * q,
    )


def vector_conformance(
    df: DataFrame, col: str, expected_dim: int
) -> DataFrame:
    """One row of disjoint verdict counts for an ``array<float>`` column:

    ``(n_rows, n_null, n_wrong_dim, n_nonfinite, n_zero_vec, n_ok)``

    Check precedence is fixed (a row is counted once, under its FIRST
    failing check): null column → wrong dimension → any null/NaN/±Inf
    element → all-zero vector → ok.  Mirrors the engine's keyword
    precedence contract (first failure wins) so the counts are exactly
    reproducible in ANSI SQL.  One aggregation pass, integer outputs.
    """
    e = F.col(col)
    is_null = e.isNull()
    wrong_dim = ~is_null & (F.size(e) != F.lit(expected_dim))
    bad_elem = F.exists(
        e,
        lambda x: x.isNull()
        | F.isnan(x)
        | (x == F.lit(float("inf")))
        | (x == F.lit(float("-inf"))),
    )
    nonfinite = ~is_null & ~wrong_dim & bad_elem
    zero_vec = (
        ~is_null & ~wrong_dim & ~nonfinite & F.forall(e, lambda x: x == F.lit(0.0))
    )
    ok = ~is_null & ~wrong_dim & ~nonfinite & ~zero_vec
    cnt = lambda c, name: F.sum(c.cast("long")).alias(name)  # noqa: E731
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        cnt(is_null, "n_null"),
        cnt(wrong_dim, "n_wrong_dim"),
        cnt(nonfinite, "n_nonfinite"),
        cnt(zero_vec, "n_zero_vec"),
        cnt(ok, "n_ok"),
    )


def vector_norm_profile(
    df: DataFrame,
    col: str,
    group_col: str | None = None,
    qscale: int = DEFAULT_QSCALE,
) -> DataFrame:
    """Per-group quantized-norm stats for an ``array<float>`` column:

    ``(group?, n_vecs, n_null, n_dead, min_qnorm2, max_qnorm2, sum_qnorm2)``

    ``qnorm2 = Σ round(x·qscale)²`` (bit-exact in any engine — module
    docstring); ``n_dead`` counts vectors whose every element quantizes
    to 0 (norm below 1/qscale resolution — embeddings a trainer would
    call collapsed).  Null embeddings are counted (``n_null``) and
    excluded from the norm stats.  One partial-agg'd pass; the shuffle
    is |groups| rows.
    """
    qn = _qnorm2(F.col(col), qscale)
    base = df.select(
        *([F.col(group_col).alias("grp")] if group_col else []),
        F.col(col).isNull().alias("is_null"),
        F.when(F.col(col).isNotNull(), qn).alias("qnorm2"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.col("is_null").cast("long")).alias("n_null"),
        F.sum((F.col("qnorm2") == 0).cast("long")).alias("n_dead"),
        F.min("qnorm2").alias("min_qnorm2"),
        F.max("qnorm2").alias("max_qnorm2"),
        F.sum("qnorm2").alias("sum_qnorm2"),
    ]
    if group_col:
        return base.groupBy("grp").agg(*aggs)
    return base.agg(*aggs)


def vector_dim_profile(
    df: DataFrame, col: str, qscale: int = DEFAULT_QSCALE
) -> DataFrame:
    """Per-dimension stats over an ``array<float>`` column:

    ``(dim, n, n_null_elem, n_zero, min_q, max_q, sum_q, sum_q2)``

    ``dim`` is the 0-based element position; q is the quantized element.
    ``n_zero`` (elements quantizing to 0) finds DEAD dimensions;
    ``sum_q``/``n`` is the quantized per-dim mean (mean-shift drift
    between corpus slices is integer arithmetic on two of these
    profiles); ``sum_q2`` gives per-dim second moments for variance
    screens.  posexplode is a generator (no shuffle); the single shuffle
    is the |dims|-row final aggregate.  Null embeddings contribute no
    rows (posexplode drops them) — count them with
    :func:`vector_norm_profile`.
    """
    q = F.round(F.col("x").cast("double") * F.lit(float(qscale))).cast("long")
    return (
        df.select(F.posexplode(F.col(col)).alias("dim", "x"))
        .select("dim", q.alias("q"), F.col("x").isNull().alias("null_elem"))
        .groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("null_elem").cast("long")).alias("n_null_elem"),
            F.sum((F.col("q") == 0).cast("long")).alias("n_zero"),
            F.min("q").alias("min_q"),
            F.max("q").alias("max_q"),
            F.sum("q").alias("sum_q"),
            F.sum(F.col("q") * F.col("q")).alias("sum_q2"),
        )
    )


def vector_dim_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    tau_q: int,
    qscale: int = DEFAULT_QSCALE,
) -> DataFrame:
    """Per-dimension mean-shift drift between two corpus slices:

    ``(dim, n_a, n_b, sum_q_a, sum_q_b, drift)``

    flags dimensions where |mean_a − mean_b| > tau_q/qscale — the
    embedding analog of the scalar KS/PSI lenses, catching per-dim
    distribution shift (a re-trained encoder, a preprocessing change)
    that corpus-level norms cannot see.  The comparison is EXACT integer
    cross-multiplication — ``|sum_q_a·n_b − sum_q_b·n_a| > tau_q·n_a·n_b``
    — so no division or float threshold can disagree between engines.
    Two dim-profile passes + a |dims|-row join; overflow-safe for
    n ≤ 2^31 rows per slice at the default scale (|sum_q| ≤ n·2^22).
    """
    a = vector_dim_profile(df_a, col, qscale).select(
        "dim", F.col("n").alias("n_a"), F.col("sum_q").alias("sum_q_a")
    )
    b = vector_dim_profile(df_b, col, qscale).select(
        "dim", F.col("n").alias("n_b"), F.col("sum_q").alias("sum_q_b")
    )
    joined = a.join(b, on="dim", how="outer").fillna(
        0, subset=["n_a", "n_b", "sum_q_a", "sum_q_b"]
    )
    lhs = F.abs(
        F.col("sum_q_a") * F.col("n_b") - F.col("sum_q_b") * F.col("n_a")
    )
    rhs = F.lit(int(tau_q)) * F.col("n_a") * F.col("n_b")
    return joined.select(
        "dim",
        "n_a",
        "n_b",
        "sum_q_a",
        "sum_q_b",
        # a dim present in only one slice is definitionally drifted
        F.when((F.col("n_a") == 0) | (F.col("n_b") == 0), F.lit(1))
        .otherwise((lhs > rhs).cast("int"))
        .alias("drift"),
    )

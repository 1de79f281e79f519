"""Distribution-drift detection: two-sample KS and PSI over per-group
histogram sketches (north-star extension; no analog in the single-document
reference — golden fixtures come from the seeded generator, FIXTURES.md §5).

Scale shape: the full table collapses to |groups| × |buckets| sketch rows
in ONE partial-aggregated pass (`width_bucket`-style bucketing + count).
The KS/PSI arithmetic then runs on that tiny sketch table — still as Spark
expressions (joins on bucket + window cumsum), so nothing is collected to
the driver and the same code works when |groups| is large.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lo: float,
    hi: float,
    buckets: int = 64,
) -> DataFrame:
    """(group, bucket, n) counts with fixed [lo, hi) equi-width buckets.
    Out-of-range values clamp into the edge buckets so mass is conserved."""
    v = F.col(value_col).cast("double")
    b = F.floor((v - F.lit(lo)) / F.lit((hi - lo) / buckets)).cast("long")
    b = F.least(F.greatest(b, F.lit(0)), F.lit(buckets - 1))
    return (
        df.where(v.isNotNull())
        .groupBy(F.col(group_col).alias("group"), b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def drift_scores(
    baseline_sketch: DataFrame,
    current_sketch: DataFrame,
    eps: float = 1e-6,
) -> DataFrame:
    """Per-group two-sample KS statistic + PSI between a baseline sketch and
    a current sketch (same bucketing).  Sketches are joined full-outer on
    (group, bucket); missing buckets count 0.

    KS  = max_b |CDF_base(b) - CDF_cur(b)|
    PSI = Σ_b (p_b - q_b) · ln(p_b / q_b)   with ε-smoothed proportions.
    """
    b = baseline_sketch.select("group", "bucket", F.col("n").alias("n_base"))
    c = current_sketch.select("group", "bucket", F.col("n").alias("n_cur"))
    j = b.join(c, on=["group", "bucket"], how="full_outer").fillna(
        {"n_base": 0, "n_cur": 0}
    )
    tot = j.groupBy("group").agg(
        F.sum("n_base").alias("tot_base"), F.sum("n_cur").alias("tot_cur")
    )
    j = j.join(tot, on="group")
    w = Window.partitionBy("group").orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    p = F.col("n_base") / F.greatest(F.col("tot_base"), F.lit(1))
    q = F.col("n_cur") / F.greatest(F.col("tot_cur"), F.lit(1))
    pe = p + F.lit(eps)
    qe = q + F.lit(eps)
    scored = j.select(
        "group",
        "bucket",
        F.sum(p).over(w).alias("cdf_base"),
        F.sum(q).over(w).alias("cdf_cur"),
        ((p - q) * F.log(pe / qe)).alias("psi_term"),
    )
    return scored.groupBy("group").agg(
        F.max(F.abs(F.col("cdf_base") - F.col("cdf_cur"))).alias("ks"),
        F.sum("psi_term").alias("psi"),
    )


def chi2_scores(
    baseline_sketch: DataFrame,
    current_sketch: DataFrame,
) -> DataFrame:
    """Per-group Pearson chi-square statistic of the current sample against
    the baseline distribution (the third drift lens next to KS and PSI —
    chi2 is the classic goodness-of-fit test on binned data and is the most
    sensitive of the three to localized bucket shifts).

    chi2 = Σ_b (observed_b − expected_b)² / expected_b  over buckets with
    baseline mass, where expected_b = tot_cur · (n_base_b / tot_base);
    `dof` = (#buckets with baseline mass) − 1.  Same scale shape as
    drift_scores: runs entirely on the |groups|×|buckets| sketch table.
    """
    b = baseline_sketch.select("group", "bucket", F.col("n").alias("n_base"))
    c = current_sketch.select("group", "bucket", F.col("n").alias("n_cur"))
    j = b.join(c, on=["group", "bucket"], how="full_outer").fillna(
        {"n_base": 0, "n_cur": 0}
    )
    tot = j.groupBy("group").agg(
        F.sum("n_base").alias("tot_base"), F.sum("n_cur").alias("tot_cur")
    )
    j = j.join(tot, on="group").where(F.col("n_base") > 0)
    e = F.col("tot_cur") * F.col("n_base") / F.col("tot_base")
    term = (F.col("n_cur") - e) * (F.col("n_cur") - e) / e
    return j.groupBy("group").agg(
        F.sum(term).alias("chi2"),
        (F.count(F.lit(1)) - F.lit(1)).alias("dof"),
    )


def emd_scores(
    baseline_sketch: DataFrame,
    current_sketch: DataFrame,
) -> DataFrame:
    """Per-group 1-D Wasserstein-1 (earth-mover's) distance between the
    baseline and current histograms — the fourth drift lens next to
    KS/PSI/chi2.  KS sees only the single worst CDF gap and PSI/chi2 are
    re-binning-sensitive ratio tests; W1 integrates the WHOLE CDF gap, so
    it is the lens that responds proportionally to a small mean shift
    (the classic embedding/feature-drift signal).

    On equal-width buckets, W1 between the normalized histograms is
      (bucket_width / (tot_base · tot_cur)) · Σ_b |cum_base(b)·tot_cur −
                                                   cum_cur(b)·tot_base|
    This emits the integer numerator `emd_x = Σ_b |·|` plus the two totals
    and leaves the division to the caller: every compared value is exact
    integer arithmetic (order-free sums of products), so two engines can
    never disagree by a ULP.  Products are carried as DECIMAL(38,0) —
    cum·tot reaches 10^24 at 10^12-row scale, past BIGINT.

    Same scale shape as drift_scores: a window cumsum + one agg over the
    |groups|×|buckets| sketch table; nothing is collected.
    """
    b = baseline_sketch.select("group", "bucket", F.col("n").alias("n_base"))
    c = current_sketch.select("group", "bucket", F.col("n").alias("n_cur"))
    j = b.join(c, on=["group", "bucket"], how="full_outer").fillna(
        {"n_base": 0, "n_cur": 0}
    )
    tot = j.groupBy("group").agg(
        F.sum("n_base").alias("tot_base"), F.sum("n_cur").alias("tot_cur")
    )
    j = j.join(tot, on="group")
    w = Window.partitionBy("group").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    dec = "decimal(38,0)"
    cum_base = F.sum("n_base").over(w).cast(dec)
    cum_cur = F.sum("n_cur").over(w).cast(dec)
    diff = cum_base * F.col("tot_cur").cast(dec) - cum_cur * F.col("tot_base").cast(dec)
    # The sketch is sparse (only buckets with mass appear), but the CDF gap
    # persists across absent bucket indices — each row's |diff| covers the
    # index range [bucket, next_present_bucket), so weight by that gap.
    # The trailing row's diff is identically 0 (both CDFs have reached
    # their totals), so the open-ended tail contributes nothing either way.
    wl = Window.partitionBy("group").orderBy("bucket")
    gap = (
        F.coalesce(F.lead("bucket").over(wl), F.col("bucket") + 1) - F.col("bucket")
    ).cast(dec)
    scored = j.select("group", "tot_base", "tot_cur", (F.abs(diff) * gap).alias("d"))
    return scored.groupBy("group").agg(
        F.sum("d").cast(dec).alias("emd_x"),
        F.first("tot_base").alias("tot_base"),
        F.first("tot_cur").alias("tot_cur"),
    )


def detect_drift(
    df: DataFrame,
    value_col: str,
    group_col: str,
    baseline_filter,
    lo: float,
    hi: float,
    buckets: int = 64,
    ks_threshold: float = 0.1,
    psi_threshold: float = 0.2,
) -> DataFrame:
    """Compare EVERY group's distribution against the pooled baseline rows
    (the FIXTURES.md §5 shape: baseline partitions pooled, each partition
    scored against it).  The pooled sketch is tiny → broadcast join on
    bucket; flags groups exceeding either threshold."""
    pooled = (
        histogram_sketch(df.where(baseline_filter), value_col, group_col, lo, hi, buckets)
        .groupBy("bucket")
        .agg(F.sum("n").alias("n"))
        .withColumn("group", F.lit("_baseline"))
    )
    per_group = histogram_sketch(df, value_col, group_col, lo, hi, buckets)
    # replicate the pooled baseline for every group via join on bucket
    groups = per_group.select("group").distinct()
    base = groups.crossJoin(F.broadcast(pooled.drop("group")))
    scores = drift_scores(base, per_group)
    return scores.withColumn(
        "drifted", (F.col("ks") > ks_threshold) | (F.col("psi") > psi_threshold)
    )

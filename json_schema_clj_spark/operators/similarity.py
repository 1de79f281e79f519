"""Similarity search over embedding columns (array<float>).

* brute-force cosine top-k — the exact baseline: broadcast the (small)
  query set against the corpus, rank per query.  Dot products are pure
  HOFs (`zip_with` + `aggregate`) in double precision → whole-stage
  codegen, no Python.
* LSH-bucketed ANN — the scale path: deterministic random-hyperplane
  signatures (sign of hash-derived ±1 projections), multi-probe via
  banding, rerank candidates exactly.  Corpus shuffles once on bucket key;
  at 10^12 rows the cross product never materializes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from json_schema_clj_spark.operators.dedup import _with_deps


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, score, rank) — exact cosine top-k.

    Queries are broadcast (query sets are small by construction); ranking
    uses a per-query window with a deterministic tiebreak.  Self-matches
    are excluded.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qv"), F.col("cv")).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def mean_vector(df: DataFrame, vec_col: str, dim: int) -> list[float]:
    """Global mean vector, collected (dim doubles).

    posexplode → groupBy(pos) instead of dim-wide `avg(element_at)` columns:
    the wide-agg variant Janino-compiles a dim-wide generated class (~2-4 s
    of fixed driver latency per distinct width) while this shape reuses the
    generic two-column hash agg.  At extreme corpus sizes pass a `.sample()`
    of the frame — the center only steers LSH bucket spread, any consistent
    estimate works (both sides must use the SAME center)."""
    rows = (
        df.select(F.posexplode(F.col(vec_col)).alias("pos", "x"))
        .groupBy("pos")
        .agg(F.avg("x").alias("m"))
        .collect()
    )
    out = [0.0] * dim
    for r in rows:
        out[r["pos"]] = r["m"] or 0.0
    return out


def hyperplane_signature(
    vec: Column,
    dim: int,
    n_planes: int = 16,
    seed: int = 11,
    center: list[float] | None = None,
) -> Column:
    """Deterministic random-hyperplane LSH signature as a bigint bucket.

    Plane p's weights are hash-derived ±1 per dimension (a seeded Rademacher
    projection — no stored plane matrix, any executor recomputes it).  One
    zip_with per plane computes that plane's projection; per-row array-fold
    accumulators are codegen-hostile (measured 100×+ slower) — n_planes
    independent folds over the vector stay flat and vectorize.

    `center`: subtract this vector before projecting.  Clustered corpora
    (the normal case) otherwise collapse into a handful of buckets because
    every origin-through hyperplane assigns whole clusters the same side —
    centering spreads buckets by within-cluster variation.
    """
    dims = F.sequence(F.lit(0), F.lit(dim - 1))
    if center is not None:
        cvec = F.array(*[F.lit(float(c)) for c in center])
        vec = F.zip_with(vec, cvec, lambda x, c: x.cast("double") - c)
    out = F.lit(0).cast("long")

    # capture p via factory, NOT a lambda default arg: PySpark infers HOF
    # lambda arity from the parameter count, so `lambda d, _p=p:` becomes
    # the (x, i) form and _p silently receives the element-index column —
    # every plane then hashes identically and all signatures collapse to
    # {0, mask}
    def make_signs(_p):
        return lambda d: (
            F.pmod(F.xxhash64(F.lit(seed), F.lit(_p), d), F.lit(2)) * 2 - 1
        ).cast("double")

    for p in range(n_planes):
        signs = F.transform(dims, make_signs(p))
        proj = F.aggregate(
            F.zip_with(vec, signs, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out + F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
            F.lit(0).cast("long")
        )
    return out


_SIGN_CACHE: dict = {}


def _sign_matrix(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """The (dim, n_planes) ±1 Rademacher plane matrix, bit-identical to the
    Column path's per-element `xxhash64(seed, p, d) mod 2` definition: the
    matrix is tiny, so we evaluate that exact expression ONCE driver-side
    (one 1-row job) and cache it — executors then get it as a closure
    constant instead of re-hashing per row."""
    key = (dim, n_planes, seed)
    if key not in _SIGN_CACHE:
        spark = SparkSession.getActiveSession()
        dims = F.sequence(F.lit(0), F.lit(dim - 1))

        def make_signs(_p):
            return lambda d: (
                F.pmod(F.xxhash64(F.lit(seed), F.lit(_p), d), F.lit(2)) * 2 - 1
            ).cast("double")

        row = spark.range(1).select(
            *[F.transform(dims, make_signs(p)).alias(f"p{p}") for p in range(n_planes)]
        ).first()
        _SIGN_CACHE[key] = np.array([row[f"p{p}"] for p in range(n_planes)], dtype=np.float64).T
    return _SIGN_CACHE[key]


def signature_udf(dim: int, n_planes: int, seed: int, center: list[float] | None):
    """Arrow-batched signature: one BLAS matmul per batch — the 10^12-row
    shape (the HOF-fold Column variant evaluates ~dim·n_planes interpreted
    lambda calls per row AND costs 15-25 s of one-off Janino compilation
    for its expression tree; the UDF plan is one node)."""
    S_mat = _sign_matrix(dim, n_planes, seed)
    c = np.asarray(center, dtype=np.float64) if center is not None else np.zeros(dim)
    weights = (1 << np.arange(n_planes, dtype=np.int64)).astype(np.int64)

    @pandas_udf("long")
    def sig(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)
        proj = (M - c) @ S_mat
        return pd.Series((proj > 0).astype(np.int64) @ weights)

    return sig


def with_signature(
    df: DataFrame,
    vec_col: str,
    out_col: str,
    dim: int,
    n_planes: int,
    seed: int,
    center: list[float] | None,
) -> DataFrame:
    return df.withColumn(out_col, signature_udf(dim, n_planes, seed, center)(F.col(vec_col)))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    bands: int = 3,
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k: candidates share at least one signature band
    (multi-probe banding over the hyperplane signature), then exact cosine
    rerank within candidates only."""
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1
    center = mean_vector(corpus, vec_col, dim)

    def with_bands(df: DataFrame, idc: str, vc: str, out_id: str, out_vec: str) -> DataFrame:
        # signature materialized as a column FIRST; the band structs then
        # reference it instead of inlining the projection tree `bands` times
        sigged = with_signature(
            df.select(F.col(idc).alias(out_id), F.col(vc).alias(out_vec)),
            out_vec, "sig", dim, n_planes, seed, center,
        )
        bandarr = F.array(
            *[
                F.struct(
                    F.lit(bidx).alias("band"),
                    F.shiftright(F.col("sig"), bidx * bits_per_band).bitwiseAND(F.lit(mask)).alias("bh"),
                )
                for bidx in range(bands)
            ]
        )
        return sigged.select(out_id, out_vec, F.explode(bandarr).alias("b")).select(
            out_id, out_vec, F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
        )

    qb = with_bands(queries, id_col, vec_col, "query_id", "qv")
    cb = with_bands(corpus, id_col, vec_col, "neighbor_id", "cv")
    cand = (
        cb.join(F.broadcast(qb), on=["band", "bh"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", "rank")
    )


def _centroid_matrix(corpus: DataFrame, id_col: str, vec_col: str, n_centroids: int) -> np.ndarray:
    """Deterministic seed centroids: the vectors with the `n_centroids`
    smallest ids (SQL-replicable, unlike a hash sample).  Collected —
    centroid tables are tiny and broadcast as closure constants."""
    rows = (
        corpus.where(F.col(id_col) < n_centroids)
        .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .collect()
    )
    mat = np.zeros((n_centroids, len(rows[0]["cv"])), dtype=np.float64)
    for r in rows:
        mat[r["cid"]] = np.asarray(r["cv"], dtype=np.float64)
    return mat


def cell_udf(cents: np.ndarray, n_probe: int = 1):
    """Arrow-batched IVF cell assignment: one BLAS matmul per batch against
    the centroid matrix, rank by round(cosine, 6) desc with lowest-centroid
    tiebreak (numpy argsort is stable → first max wins, matching an external
    oracle's `ORDER BY round(cos, 6) DESC, cid ASC`).  Rounding the ranking
    key makes the argmax robust to summation-order float drift between
    engines.  Returns the `n_probe` nearest cells as array<int>."""
    cn = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-300)

    @pandas_udf("array<int>")
    def cells(v: pd.Series) -> pd.Series:
        M = np.stack(v.to_numpy()).astype(np.float64)
        nrm = np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-300)
        cos = np.round((M / nrm) @ cn.T, 6)
        order = np.argsort(-cos, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(order.astype(np.int32)))

    return cells


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus rows are bucketed by
    nearest centroid ONCE (the index build — at 10^12 rows, write the table
    partitioned by `cell` and reranks become partition-pruned scans); each
    query probes its `n_probe` nearest cells and reranks exactly (sequential
    HOF dot product) within them.

    Centroids here are the deterministic id-sampled seed set so an external
    SQL oracle can replicate the whole plan; `kmeans_refine` tightens them
    for real recall (same plan shape, centroids just move).
    """
    cents = _centroid_matrix(corpus, id_col, vec_col, n_centroids)
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    c = c.withColumn("cell", cell_udf(cents, 1)(F.col("cv"))[0])
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    q = q.select("query_id", "qv", F.explode(cell_udf(cents, n_probe)(F.col("qv"))).alias("cell"))
    cand = (
        c.join(F.broadcast(q), on="cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "score")
    )


def kmeans_refine(
    corpus: DataFrame,
    cents: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 2,
) -> np.ndarray:
    """Lloyd iterations over the corpus: assign (Arrow matmul, no shuffle)
    → per-cell mean via posexplode + groupBy(cell, pos) (map-side partial
    agg; shuffle is |cells|·dim rows regardless of corpus size).  Empty
    cells keep their previous centroid."""
    for _ in range(iters):
        a = corpus.select(
            cell_udf(cents, 1)(F.col(vec_col))[0].alias("cell"),
            F.posexplode(F.col(vec_col)).alias("pos", "x"),
        )
        rows = a.groupBy("cell", "pos").agg(F.avg("x").alias("m")).collect()
        nxt = cents.copy()
        for r in rows:
            nxt[r["cell"], r["pos"]] = r["m"]
        cents = nxt
    return cents


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 2,
    seed: int = 11,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine ≥ threshold),
    candidate generation via shared signature bands.

    Cost discipline: vectors are L2-normalized ONCE before the join (cosine
    of candidates = plain dot), the signature frame is persisted so the
    self-join doesn't recompute it, and duplicate candidate pairs are
    collapsed BEFORE the dot product — the expensive work runs once per
    surviving pair.  8-bit bands keep random collisions ~1/256 per band so
    candidate volume tracks true near-dup clusters, not corpus size².
    """
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1
    # persist materializes norms + signatures once — the CSE barrier for the
    # self-join (lambda-bound expressions re-evaluate otherwise)
    base = with_signature(
        df.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            norm(F.col(vec_col)).alias("nrm"),
        ),
        "v", "sig", dim, n_planes, seed, mean_vector(df, vec_col, dim),
    ).persist()
    bandarr = F.array(
        *[
            F.struct(
                F.lit(bidx).alias("band"),
                F.shiftright(F.col("sig"), bidx * bits_per_band).bitwiseAND(F.lit(mask)).alias("bh"),
            )
            for bidx in range(bands)
        ]
    )
    b = base.select("id", "v", "nrm", F.explode(bandarr).alias("b")).select(
        "id", "v", "nrm", F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )
    # hot-bucket guard: a degenerate bucket makes the self-join quadratic
    hot = b.groupBy("band", "bh").count().where(F.col("count") > 1000).select("band", "bh")
    b = b.join(F.broadcast(hot), on=["band", "bh"], how="left_anti")
    l, r = b.alias("l"), b.alias("r")
    cand = (
        l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.bh") == F.col("r.bh")) & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.col("l.v").alias("va"),
            F.col("r.v").alias("vb"),
            (F.col("l.nrm") * F.col("r.nrm")).alias("nn"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    out = cand.select(
        "id_a", "id_b", (dot(F.col("va"), F.col("vb")) / F.col("nn")).alias("cos")
    ).where(F.col("cos") >= threshold)
    return _with_deps(out, base)

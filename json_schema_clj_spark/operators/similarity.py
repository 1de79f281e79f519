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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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


def hyperplane_signature(vec: Column, dim: int, n_planes: int = 16, seed: int = 11) -> Column:
    """Deterministic random-hyperplane LSH signature as a bigint bucket.

    Plane p's weights are hash-derived ±1 per dimension (a seeded Rademacher
    projection — no stored plane matrix, any executor recomputes it).  One
    fold over the vector accumulates all plane sums simultaneously; the
    plane loop is compile-time unrolled (shift amounts must be literals).
    """
    # pair each element with its dimension index
    pairs = F.zip_with(
        vec,
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda x, d: F.struct(x.cast("double").alias("x"), d.alias("d")),
    )
    init = F.array(*[F.lit(0.0) for _ in range(n_planes)])

    def step(acc, pr):
        return F.array(
            *[
                F.element_at(acc, p + 1)
                + pr["x"]
                * (F.pmod(F.xxhash64(F.lit(seed), F.lit(p), pr["d"]), F.lit(2)) * 2 - 1).cast("double")
                for p in range(n_planes)
            ]
        )

    sums = F.aggregate(pairs, init, step)
    out = F.lit(0).cast("long")
    for p in range(n_planes):
        out = out + F.when(
            F.element_at(sums, p + 1) > 0, F.shiftleft(F.lit(1).cast("long"), p)
        ).otherwise(F.lit(0).cast("long"))
    return out


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

    def with_bands(df: DataFrame, idc: str, vc: str, out_id: str, out_vec: str) -> DataFrame:
        sig = hyperplane_signature(F.col(vc), dim, n_planes, seed)
        bandarr = F.array(
            *[
                F.struct(
                    F.lit(bidx).alias("band"),
                    F.shiftright(sig, bidx * bits_per_band).bitwiseAND(F.lit(mask)).alias("bh"),
                )
                for bidx in range(bands)
            ]
        )
        return df.select(
            F.col(idc).alias(out_id), F.col(vc).alias(out_vec), F.explode(bandarr).alias("b")
        ).select(out_id, out_vec, F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))

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


def embedding_near_duplicates(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 12,
    bands: int = 4,
    seed: int = 11,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine ≥ threshold),
    candidate generation via shared signature bands."""
    bits_per_band = n_planes // bands
    mask = (1 << bits_per_band) - 1
    sig = hyperplane_signature(F.col(vec_col), dim, n_planes, seed)
    bandarr = F.array(
        *[
            F.struct(
                F.lit(bidx).alias("band"),
                F.shiftright(sig, bidx * bits_per_band).bitwiseAND(F.lit(mask)).alias("bh"),
            )
            for bidx in range(bands)
        ]
    )
    b = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"), F.explode(bandarr).alias("b")).select(
        "id", "v", F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )
    l, r = b.alias("l"), b.alias("r")
    return (
        l.join(r, (F.col("l.band") == F.col("r.band")) & (F.col("l.bh") == F.col("r.bh")) & (F.col("l.id") < F.col("r.id")))
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                cosine(F.col("l.v"), F.col("r.v")).alias("cos"))
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("cos") >= threshold)
    )

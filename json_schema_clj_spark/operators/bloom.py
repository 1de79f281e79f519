"""Bloom-prefiltered referential checks — the big-dimension scale path.

`referential.dangling` broadcasts the dimension's key set, which stops
working once the dimension itself is billions of keys (a hash set costs
~100+ bytes/key on the executors).  A Bloom filter costs ~10 bits/key at
1% false positives, so a 10^9-key dimension compresses to ~1.2 GB — well
inside Spark's broadcast ceiling while the key set itself is not.

Spark's own runtime bloom filtering (`BloomFilterAggregate` /
`BloomFilterMightContain`) is an internal Catalyst rewrite that is not
exposed as a SQL-callable function in this build, so the filter is built
from first principles with DataFrame ops only:

* **build**: each dim key contributes k bit positions
  (`xxhash64(key, i) mod m`); positions fold into `m/64` bitmap *words*
  via a map-side-combined `bit_or` aggregation.  The shuffled data is the
  bitmap itself — size `m` bits, independent of |dim|.
* **probe**: the fact side takes k broadcast hash joins against the word
  table (one per hash function) and tests the bit with JVM-side
  `shiftleft`/`&` expressions.  No shuffle of the fact table, no Python.

Exactness is preserved (the operator is a *prefilter*, not an
approximation): keys failing any bit are *definitely* dangling and skip
the join entirely; keys passing all k bits (matches + fpp of the
danglers) are verified with an exact sort-merge anti-join whose input is
the reduced candidate set.  The reference's external-`$ref` analog
(/root/reference/src/json_schema/core.clj:941-954) resolves one document
at a time; this is the 10^12-row equivalent for dimensions too large to
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bloom_words(dim: DataFrame, dim_key: str, m_bits: int, k: int) -> DataFrame:
    """Distributed bitmap build: DataFrame of (w: long word index,
    bits: long) — only words with at least one set bit are present."""
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    key = F.col(dim_key)
    pos = F.explode(
        F.array(*[F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)])
    ).alias("pos")
    positions = dim.where(key.isNotNull()).select(pos)
    one_shl = F.call_function(
        "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
    )
    return positions.groupBy((F.col("pos") / 64).cast("long").alias("w")).agg(
        F.bit_or(one_shl).alias("bits")
    )


def with_might_contain(
    fact: DataFrame, fact_key: str, words: DataFrame, m_bits: int, k: int, flag: str = "__maybe"
) -> DataFrame:
    """fact + a boolean `flag` column: False ⇒ key definitely absent from
    the dimension the words were built over.  k broadcast joins, zero
    fact-side shuffle, all bit tests in whole-stage codegen."""
    out = fact
    hits = []
    for i in range(k):
        w_i, b_i, h_i = f"__w{i}", f"__bits{i}", f"__hit{i}"
        pos = F.pmod(F.xxhash64(F.col(fact_key), F.lit(i)), F.lit(m_bits))
        out = out.withColumn(w_i, (pos / 64).cast("long")).join(
            F.broadcast(words.select(F.col("w").alias(w_i), F.col("bits").alias(b_i))),
            on=w_i,
            how="left",
        )
        mask = F.call_function("shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int"))
        out = out.withColumn(
            h_i, F.coalesce(F.col(b_i).bitwiseAND(mask) != 0, F.lit(False))
        ).drop(w_i, b_i)
        hits.append(h_i)
    expr = F.col(hits[0])
    for h in hits[1:]:
        expr = expr & F.col(h)
    return out.withColumn(flag, expr).drop(*hits)


def dangling_bloom(
    fact: DataFrame,
    fact_key: str,
    dim: DataFrame,
    dim_key: str,
    m_bits: int = 1 << 18,
    k: int = 4,
) -> DataFrame:
    """Exact dangling-key rows of `fact` (null keys pass, mirroring
    `referential.dangling`), computed as bloom-definite rejects UNION the
    exact anti-join over the bloom-surviving candidates.

    The anti-join deliberately does NOT broadcast the dimension — this
    operator exists for dims too big for that; at test scale Spark may
    still pick SMJ/shuffled-hash, which is the intended plan."""
    flag = "__maybe_in_dim"
    probed = with_might_contain(
        fact.where(F.col(fact_key).isNotNull()), fact_key, bloom_words(dim, dim_key, m_bits, k),
        m_bits, k, flag=flag,
    )
    definite = probed.where(~F.col(flag)).drop(flag)
    candidates = probed.where(F.col(flag)).drop(flag)
    dim_keys = dim.select(F.col(dim_key).alias(fact_key)).distinct()
    false_pos = candidates.join(dim_keys.hint("merge"), on=fact_key, how="left_anti")
    return definite.unionByName(false_pos)

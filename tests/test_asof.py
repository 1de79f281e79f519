"""As-of join: brute-force equality, inclusive boundary, null/no-version
facts, time-bucket invariance."""

import pytest
from pyspark.sql import functions as F

from json_schema_clj_spark.operators.asof import asof_join


def _brute(facts, dims):
    out = []
    for k, t, fid in facts:
        best = None
        if t is not None:
            for dk, dt, val in dims:
                if dk == k and dt <= t and (best is None or dt > best[0]):
                    best = (dt, val)
        out.append((fid, best[1] if best else None))
    return sorted(out)


FACTS = [
    # (key, ts, fact_id)
    (1, 5, 100),
    (1, 10, 101),   # exactly at version open -> matches it (inclusive)
    (1, 25, 102),
    (1, None, 103),  # null ts -> no match
    (2, 14, 200),
    (2, 16, 201),
    (3, 50, 300),   # key with no versions at all
]
DIMS = [
    # (key, vfrom, val)
    (1, 10, 11),
    (1, 20, 12),
    (2, 15, 21),
]


@pytest.mark.parametrize("n_parts", [1, 3, 8])
def test_asof_bruteforce_and_bucket_invariance(spark, n_parts):
    facts = spark.createDataFrame(FACTS, "k long, ts long, fact_id long")
    dims = spark.createDataFrame(DIMS, "k long, vfrom long, val long")
    out = asof_join(facts, dims, ["k"], "ts", "vfrom", ["val"], n_parts=n_parts)
    got = sorted((r["fact_id"], r["val"]) for r in out.collect())
    assert got == _brute(
        [(k, t, f) for k, t, f in FACTS], [(k, v, x) for k, v, x in DIMS]
    )
    # every fact row survives exactly once
    assert [r for r, _ in got] == sorted(f for _, _, f in FACTS)


def test_asof_carry_across_buckets(spark):
    # many facts long after the only version: with several time buckets the
    # version must carry into every later bucket
    facts = spark.createDataFrame(
        [(1, 100 + i, i) for i in range(40)], "k long, ts long, fact_id long"
    )
    dims = spark.createDataFrame([(1, 1, 7)], "k long, vfrom long, val long")
    out = asof_join(facts, dims, ["k"], "ts", "vfrom", ["val"], n_parts=8)
    vals = {r["val"] for r in out.collect()}
    assert vals == {7} and out.count() == 40


def test_asof_rejects_column_clash(spark):
    facts = spark.createDataFrame([(1, 1, 2)], "k long, ts long, val long")
    dims = spark.createDataFrame([(1, 1, 3)], "k long, vfrom long, val long")
    with pytest.raises(ValueError):
        asof_join(facts, dims, ["k"], "ts", "vfrom", ["val"])


def test_asof_null_version_time_matches_nothing(spark):
    # DuckDB ASOF parity: the range predicate is never true for a NULL
    # version time — a NULL-vfrom dim row must NOT act as open-since-forever
    facts = spark.createDataFrame(
        [(1, 5, 100), (1, 50, 101)], "k long, ts long, fact_id long"
    )
    dims = spark.createDataFrame(
        [(1, None, 9), (1, 40, 11)], "k long, vfrom long, val long"
    )
    out = asof_join(facts, dims, ["k"], "ts", "vfrom", ["val"], n_parts=2)
    got = {r["fact_id"]: r["val"] for r in out.collect()}
    assert got == {100: None, 101: 11}


def test_asof_rejects_reserved_internal_names(spark):
    facts = spark.createDataFrame([(1, 1, 2)], "k long, ts long, _t long")
    dims = spark.createDataFrame([(1, 1, 3)], "k long, vfrom long, val long")
    with pytest.raises(ValueError):
        asof_join(facts, dims, ["k"], "ts", "vfrom", ["val"])


def test_correlation_oracle_sql_null_consistent():
    # the oracle's moment sums must restrict to both-non-null rows exactly
    # like the operator; pin it on a null-bearing table in DuckDB directly
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES (1, NULL), (2, 4), (3, 6)) v(a, b)"
    )
    n, sa, sab = con.execute(
        "SELECT count(*), sum(a), sum(a*b) FROM t WHERE a IS NOT NULL AND b IS NOT NULL"
    ).fetchone()
    assert (n, sa, sab) == (2, 5, 26)
    cov = n * sab - sa * con.execute(
        "SELECT sum(b) FROM t WHERE a IS NOT NULL AND b IS NOT NULL"
    ).fetchone()[0]
    # operator definition on the same rows: n=2 Σa=5 Σb=10 Σab=26 → cov=2
    assert cov == 2


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    facts=st.lists(
        st.tuples(st.integers(1, 3), st.one_of(st.none(), st.integers(0, 50))),
        min_size=1, max_size=12,
    ),
    dims=st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 50), st.integers(0, 9)),
        max_size=6, unique_by=lambda d: (d[0], d[1]),
    ),
    n_parts=st.sampled_from([1, 2, 5]),
)
def test_asof_property_matches_bruteforce(spark, facts, dims, n_parts):
    rows = [(k, t, i) for i, (k, t) in enumerate(facts)]
    fdf = spark.createDataFrame(rows, "k long, ts long, fact_id long")
    ddf = spark.createDataFrame(
        dims or [(99, 0, 0)], "k long, vfrom long, val long"
    )
    out = asof_join(fdf, ddf, ["k"], "ts", "vfrom", ["val"], n_parts=n_parts)
    got = sorted((r["fact_id"], r["val"]) for r in out.collect())
    assert got == _brute(rows and [(k, t, f) for k, t, f in rows],
                         dims if dims else [(99, 0, 0)])


def test_asof_null_dim_attribute_stays_atomic(spark):
    """The matched version row is carried as ONE struct: when the newest
    matching version holds a NULL attribute, that NULL must arrive on the
    fact row — per-column lasts would back-fill it from an older version,
    fabricating a record no dim row ever held."""
    facts = spark.createDataFrame([(1, 30, 900)], ["k", "t", "fact_id"])
    dims = spark.createDataFrame(
        [(1, 10, "gold", "eu"), (1, 20, "silver", None)],
        ["k", "vt", "tier", "region"],
    )
    out = asof_join(facts, dims, ["k"], "t", "vt", ["tier", "region"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["tier"] == "silver"
    assert r["region"] is None  # NOT back-filled to "eu"

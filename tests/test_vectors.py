"""Vector/embedding column validation (operators/vectors.py): check
precedence, quantization exactness (incl. half-away ties), norm/dim
profiles on hand-computed vectors, and plan audits (pure Catalyst — no
Python eval nodes in any vector operator)."""

import pyspark.sql.functions as F
import pyspark.sql.types as T

from json_schema_clj_spark.operators.vectors import (
    vector_conformance,
    vector_dim_drift,
    vector_dim_profile,
    vector_norm_profile,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("e", T.ArrayType(T.FloatType())),
        T.StructField("grp", T.StringType()),
    ]
)

NAN = float("nan")
INF = float("inf")


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_conformance_precedence(spark):
    rows = [
        (0, [1.0, 2.0], "a"),          # ok
        (1, None, "a"),                # null
        (2, [1.0], "a"),               # wrong dim
        (3, [1.0, NAN, 4.0], "a"),     # wrong dim wins over NaN (precedence)
        (4, [NAN, 2.0], "a"),          # nonfinite
        (5, [1.0, INF], "a"),          # nonfinite (+inf)
        (6, [1.0, -INF], "a"),         # nonfinite (-inf)
        (7, [1.0, None], "a"),         # nonfinite (null element)
        (8, [0.0, 0.0], "a"),          # zero vector
        (9, [0.0, 1.0], "a"),          # ok (not all-zero)
    ]
    out = vector_conformance(_df(spark, rows), "e", expected_dim=2).collect()[0]
    assert out["n_rows"] == 10
    assert out["n_null"] == 1
    assert out["n_wrong_dim"] == 2  # rows 2 and 3 (NaN row counted as dim)
    assert out["n_nonfinite"] == 4
    assert out["n_zero_vec"] == 1
    assert out["n_ok"] == 2
    # disjoint partition: counts sum to n_rows
    assert (
        out["n_null"]
        + out["n_wrong_dim"]
        + out["n_nonfinite"]
        + out["n_zero_vec"]
        + out["n_ok"]
        == out["n_rows"]
    )


def test_norm_profile_exact_and_ties(spark):
    # q = round(x·1024): 1.0→1024, -0.5→-512, so Σq² = 1024² + 512²
    # tie cases: 0.5/1024 → q·1024 = 0.5 exactly → rounds AWAY from zero
    half = 0.5 / 1024
    rows = [
        (0, [1.0, -0.5], "a"),     # qnorm2 = 1048576 + 262144 = 1310720
        (1, [half, -half], "a"),   # q = +1, -1 → qnorm2 = 2
        (2, None, "a"),            # null
        (3, [half / 2, 0.0], "b"),  # 0.25/1024 → q=0 → dead
        (4, [2.0, 0.0], "b"),      # qnorm2 = 2048² = 4194304
    ]
    out = {
        r["grp"]: r
        for r in vector_norm_profile(_df(spark, rows), "e", group_col="grp").collect()
    }
    a, b = out["a"], out["b"]
    assert a["n_vecs"] == 3 and a["n_null"] == 1 and a["n_dead"] == 0
    assert a["min_qnorm2"] == 2 and a["max_qnorm2"] == 1310720
    assert a["sum_qnorm2"] == 1310722
    assert b["n_vecs"] == 2 and b["n_null"] == 0 and b["n_dead"] == 1
    assert b["min_qnorm2"] == 0 and b["max_qnorm2"] == 4194304


def test_norm_profile_ungrouped(spark):
    rows = [(0, [1.0, 0.0], "a"), (1, [0.0, 0.0], "b")]
    out = vector_norm_profile(_df(spark, rows), "e").collect()
    assert len(out) == 1
    assert out[0]["n_vecs"] == 2 and out[0]["n_dead"] == 1
    assert out[0]["sum_qnorm2"] == 1024 * 1024


def test_dim_profile(spark):
    rows = [
        (0, [1.0, 0.0, -1.0], "a"),
        (1, [0.5, 0.0, None], "a"),
        (2, None, "a"),  # null arrays contribute no rows
    ]
    out = {r["dim"]: r for r in vector_dim_profile(_df(spark, rows), "e").collect()}
    assert sorted(out) == [0, 1, 2]
    d0, d1, d2 = out[0], out[1], out[2]
    assert d0["n"] == 2 and d0["sum_q"] == 1024 + 512 and d0["n_zero"] == 0
    assert d0["sum_q2"] == 1024 * 1024 + 512 * 512
    assert d1["n"] == 2 and d1["n_zero"] == 2 and d1["min_q"] == 0
    assert d2["n"] == 2 and d2["n_null_elem"] == 1
    assert d2["min_q"] == -1024 and d2["max_q"] == -1024  # null skipped by min/max
    assert d2["sum_q"] == -1024


def test_dim_drift_integer_threshold(spark):
    # slice a: dim0 mean = 1.0 (q=1024); slice b: dim0 mean = 1.125
    # (q=1152) → |shift| = 128 q-units.  tau_q=127 flags it, tau_q=128
    # does not (strict >) — the boundary is exact integer arithmetic.
    a = _df(spark, [(0, [1.0, 0.0], "a"), (1, [1.0, 0.0], "a")])
    b = _df(spark, [(2, [1.125, 0.0], "b"), (3, [1.125, 0.0], "b")])
    tight = {r["dim"]: r for r in vector_dim_drift(a, b, "e", tau_q=127).collect()}
    loose = {r["dim"]: r for r in vector_dim_drift(a, b, "e", tau_q=128).collect()}
    assert tight[0]["drift"] == 1 and loose[0]["drift"] == 0
    assert tight[1]["drift"] == 0  # dim 1 identical
    assert tight[0]["sum_q_a"] == 2048 and tight[0]["sum_q_b"] == 2304


def test_dim_drift_one_sided_dim(spark):
    # a dim present in only one slice is definitionally drifted
    a = _df(spark, [(0, [1.0, 2.0, 3.0], "a")])
    b = _df(spark, [(1, [1.0, 2.0], "b")])
    out = {r["dim"]: r for r in vector_dim_drift(a, b, "e", tau_q=10**6).collect()}
    assert out[2]["drift"] == 1 and out[2]["n_b"] == 0
    assert out[0]["drift"] == 0


def test_vector_plans_pure_catalyst(spark):
    rows = [(0, [1.0, 2.0], "a")]
    df = _df(spark, rows)
    for out in (
        vector_conformance(df, "e", 2),
        vector_norm_profile(df, "e", group_col="grp"),
        vector_dim_profile(df, "e"),
    ):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
        # partial+final aggregation (map-side combine before the shuffle)
        assert plan.count("HashAggregate") >= 2 or "SortAggregate" in plan, plan

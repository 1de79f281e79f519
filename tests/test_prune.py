"""Zone-map validation pushdown (operators/prune.py): every tri-state
branch of the interval logic, NULL shards, the skippable rollup, and the
plan shape (one shuffle, no Python nodes)."""

import pytest
from pyspark.sql import functions as F

from json_schema_clj_spark.operators.prune import (
    ALL_FAIL,
    ALL_PASS,
    SCAN,
    prune_decisions,
    prune_validation,
    zone_maps,
)


def _frame(spark):
    # shard 0: x in [10, 20], no nulls          shard 1: x in [100, 200], no nulls
    # shard 2: all NULL                         shard 3: mixed nulls, x in [15, 15]
    rows = [
        (0, 10, "a"), (0, 20, "a"),
        (1, 100, "b"), (1, 200, "c"),
        (2, None, None), (2, None, None),
        (3, 15, "a"), (3, None, "a"),
    ]
    return spark.createDataFrame(rows, "shard int, x int, s string")


def _decisions(spark, checks):
    df = prune_validation(_frame(spark), "shard", checks)
    return {(r["shard"], r["column"], r["keyword"]): r["decision"] for r in df.collect()}


def test_minimum_branches(spark):
    d = _decisions(spark, [("x", "minimum", 50)])
    assert d[(0, "x", "minimum")] == ALL_FAIL      # max 20 < 50, no nulls
    assert d[(1, "x", "minimum")] == ALL_PASS      # min 100 >= 50
    assert d[(2, "x", "minimum")] == ALL_PASS      # all NULL: scalar checks skip missing
    assert d[(3, "x", "minimum")] == SCAN          # max 15 < 50 but a NULL row passes


def test_maximum_branches(spark):
    d = _decisions(spark, [("x", "maximum", 50)])
    assert d[(0, "x", "maximum")] == ALL_PASS
    assert d[(1, "x", "maximum")] == ALL_FAIL
    assert d[(2, "x", "maximum")] == ALL_PASS
    # shard 3: max 15 <= 50 decides all_pass even with nulls present
    assert d[(3, "x", "maximum")] == ALL_PASS


def test_exclusive_bounds(spark):
    d = _decisions(spark, [("x", "exclusiveMinimum", 20), ("x", "exclusiveMaximum", 100)])
    assert d[(0, "x", "exclusiveMinimum")] == ALL_FAIL   # max 20 <= 20, no nulls
    assert d[(1, "x", "exclusiveMinimum")] == ALL_PASS   # min 100 > 20
    assert d[(0, "x", "exclusiveMaximum")] == ALL_PASS   # max 20 < 100
    assert d[(1, "x", "exclusiveMaximum")] == ALL_FAIL   # min 100 >= 100, no nulls
    assert d[(3, "x", "exclusiveMinimum")] == SCAN       # 15 <= 20 fails, NULL passes


def test_const_branches(spark):
    d = _decisions(spark, [("x", "const", 15)])
    assert d[(0, "x", "const")] == SCAN       # hull [10,20] straddles 15
    assert d[(1, "x", "const")] == ALL_FAIL   # min 100 > 15
    assert d[(2, "x", "const")] == ALL_PASS   # all NULL
    assert d[(3, "x", "const")] == ALL_PASS   # min=max=15 == const; NULL passes too


def test_enum_branches(spark):
    d = _decisions(spark, [("s", "enum", ["a", "b"])])
    assert d[(0, "s", "enum")] == ALL_PASS    # min=max='a' in enum
    assert d[(1, "s", "enum")] == SCAN        # hull [b,c] overlaps enum hull
    assert d[(2, "s", "enum")] == ALL_PASS
    assert d[(3, "s", "enum")] == ALL_PASS
    d2 = _decisions(spark, [("s", "enum", ["x", "y"])])
    assert d2[(1, "s", "enum")] == ALL_FAIL   # hull [b,c] entirely below 'x'


def test_required_branches(spark):
    d = _decisions(spark, [("x", "required", None)])
    assert d[(0, "x", "required")] == ALL_PASS
    assert d[(2, "x", "required")] == ALL_FAIL
    assert d[(3, "x", "required")] == SCAN


def test_skippable_rollup(spark):
    d = _decisions(spark, [("x", "maximum", 1000), ("x", "required", None)])
    # shard 0: both all_pass -> skippable; shard 2: required all_fail -> scan
    assert d[(0, "*", "skippable")] == ALL_PASS
    assert d[(1, "*", "skippable")] == ALL_PASS
    assert d[(2, "*", "skippable")] == SCAN
    assert d[(3, "*", "skippable")] == SCAN


def test_unknown_keyword_raises(spark):
    zones = zone_maps(_frame(spark), "shard", ["x"])
    with pytest.raises(ValueError, match="not zone-map prunable"):
        prune_decisions(zones, [("x", "pattern", ".*")])


def test_decisions_match_row_level_truth(spark):
    """Pushdown soundness: wherever the zone decision is all_pass/all_fail,
    the row-level evaluation of the same check agrees on EVERY row."""
    df = _frame(spark)
    checks = [
        ("x", "minimum", 50), ("x", "maximum", 50),
        ("x", "exclusiveMinimum", 20), ("x", "exclusiveMaximum", 100),
        ("x", "const", 15), ("x", "required", None),
        ("s", "enum", ["a", "b"]),
    ]
    row_fail = {
        ("x", "minimum"): F.col("x").isNotNull() & (F.col("x") < 50),
        ("x", "maximum"): F.col("x").isNotNull() & (F.col("x") > 50),
        ("x", "exclusiveMinimum"): F.col("x").isNotNull() & (F.col("x") <= 20),
        ("x", "exclusiveMaximum"): F.col("x").isNotNull() & (F.col("x") >= 100),
        ("x", "const"): F.col("x").isNotNull() & (F.col("x") != 15),
        ("x", "required"): F.col("x").isNull(),
        ("s", "enum"): F.col("s").isNotNull() & ~F.col("s").isin(["a", "b"]),
    }
    d = _decisions(spark, checks)
    truth = df.groupBy("shard").agg(
        *[F.sum(row_fail[(c, k)].cast("long")).alias(f"{c}|{k}") for (c, k, _) in checks],
        F.count(F.lit(1)).alias("n"),
    ).collect()
    for r in truth:
        for c, k, _ in checks:
            dec = d[(r["shard"], c, k)]
            nfail = r[f"{c}|{k}"]
            if dec == ALL_PASS:
                assert nfail == 0, (r["shard"], c, k)
            elif dec == ALL_FAIL:
                assert nfail == r["n"], (r["shard"], c, k)


def test_prunable_checks_from_flagship_schema(spark):
    from json_schema_clj_spark.operators.prune import prunable_checks_from_schema
    from json_schema_clj_spark.sources.images import FLAGSHIP_SCHEMA, images_df

    df = images_df(spark, 100, n_parts=2)
    checks, residual = prunable_checks_from_schema(FLAGSHIP_SCHEMA, df.schema)
    got = {(c, k) for c, k, _ in checks}
    # required list + typed bounds + enum all extract
    assert ("image_id", "required") in got
    assert ("bytes", "required") in got
    assert ("w", "minimum") in got and ("w", "maximum") in got
    assert ("fmt", "enum") in got
    assert ("w", "static_true") in got          # type integer on int column
    assert ("image_id", "string_nonblank") in got
    # pattern / length bounds stay row-level
    assert "image_id.pattern" in residual
    assert "caption.minLength" in residual and "caption.maxLength" in residual


def test_type_check_static_mapping(spark):
    from json_schema_clj_spark.operators.prune import prunable_checks_from_schema

    df = spark.createDataFrame([(1, "a", 1.5)], "i long, s string, d double")
    schema = {
        "properties": {
            "i": {"type": "integer"},
            "s": {"type": "integer"},   # mismatched dtype -> every non-null fails
            "d": {"type": "integer"},   # double is NOT integer (1.0 quirk)
        }
    }
    checks, residual = prunable_checks_from_schema(schema, df.schema)
    by_col = {c: k for c, k, _ in checks}
    assert by_col["i"] == "static_true"
    assert by_col["s"] == "static_false"
    assert by_col["d"] == "static_false"
    assert residual == []


def test_string_nonblank_decisions(spark):
    rows = [(0, "hello"), (0, "world"), (1, ""), (1, ""), (2, " lead"), (3, None)]
    df = spark.createDataFrame(rows, "shard int, s string")
    d = {
        (r["shard"], r["keyword"]): r["decision"]
        for r in prune_validation(df, "shard", [("s", "string_nonblank", None)]).collect()
    }
    assert d[(0, "string_nonblank")] == ALL_PASS   # min 'hello' >= '!'
    assert d[(1, "string_nonblank")] == ALL_FAIL   # all empty
    assert d[(2, "string_nonblank")] == SCAN       # ' lead' sorts below '!' but isn't blank
    assert d[(3, "string_nonblank")] == ALL_PASS   # all NULL: type skips missing


def test_zone_prune_plan_end_to_end(spark):
    from json_schema_clj_spark.operators.prune import zone_prune_plan

    # parts 0,1 clean; part 2 has one out-of-range w; part 3 has a NULL fmt
    rows = []
    for p in range(4):
        for i in range(10):
            w = 0 if (p == 2 and i == 5) else 10 + i
            fmt = None if (p == 3 and i == 7) else "png"
            rows.append((p, w, fmt))
    df = spark.createDataFrame(rows, "part int, w int, fmt string")
    schema = {
        "required": ["w", "fmt"],
        "properties": {
            "w": {"type": "integer", "minimum": 1},
            "fmt": {"type": "string", "enum": ["png", "jpeg"]},
        },
    }
    plan = zone_prune_plan(df, F.col("part").cast("long"), schema)
    assert plan["residual"] == []
    assert plan["clean_parts"] == {0, 1}
    assert plan["part_rows"] == {0: 10, 1: 10, 2: 10, 3: 10}

    # any residual keyword disables skipping entirely
    schema2 = dict(schema, properties={**schema["properties"], "fmt": {"pattern": "^p"}})
    plan2 = zone_prune_plan(df, F.col("part").cast("long"), schema2)
    assert plan2["clean_parts"] == set()
    assert "fmt.pattern" in plan2["residual"]


def test_plan_one_shuffle_no_python(spark):
    df = _frame(spark)
    out = prune_validation(df, "shard", [("x", "minimum", 50), ("x", "required", None)])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # one aggregation exchange, nothing else
    assert plan.count("Exchange hashpartitioning") == 1

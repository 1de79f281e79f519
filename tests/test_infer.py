"""Schema inference & constraint suggestion (operators/infer.py).

The closure property is the headline contract: a schema inferred FROM a
table must validate green back ON that table through the engine's own
compilers — inference and validation agree on semantics by construction.
"""

import pytest
from pyspark.sql import functions as F

from json_schema_clj_spark.engine import validate_json_column
from json_schema_clj_spark.operators.infer import (
    constraint_profile,
    infer_json_paths,
    json_type_of,
    schema_from_json_paths,
    schema_from_profile,
    suggest_constraints,
)
from json_schema_clj_spark.operators.validate import with_validation


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame(
        [
            (1, "alice", 10.5, "a", True),
            (2, "bob", -3.25, "b", False),
            (3, None, 99.0, "a", True),
            (4, "dave", 0.0, "c", None),
        ],
        "id long, name string, score double, grade string, flag boolean",
    )


def test_constraint_profile_exact(spark, tbl):
    prof = {r["column"]: r for r in constraint_profile(tbl, exact=True).collect()}
    assert prof["id"]["json_type"] == "integer"
    assert prof["id"]["required"] and prof["id"]["unique"]
    assert prof["id"]["min_value"] == "1" and prof["id"]["max_value"] == "4"
    assert prof["name"]["n_null"] == 1 and not prof["name"]["required"]
    # name has 3 distinct non-null values out of 3 non-null rows → unique
    assert prof["name"]["unique"]
    assert prof["grade"]["enum_values"] == "a,b,c"
    assert not prof["grade"]["unique"]
    assert prof["score"]["json_type"] == "number"
    assert prof["flag"]["enum_values"] == "false,true"


def test_constraint_profile_enum_cap(spark, tbl):
    # enum_max below the cardinality → no enum suggested
    prof = {r["column"]: r for r in constraint_profile(tbl, enum_max=2, exact=True).collect()}
    assert prof["grade"]["enum_values"] is None
    assert prof["flag"]["enum_values"] == "false,true"


def test_constraint_profile_approx_path(spark, tbl):
    # HLL path: same row shape; unique stays advisory but must hold here
    prof = {r["column"]: r for r in constraint_profile(tbl, exact=False).collect()}
    assert prof["id"]["unique"]
    assert prof["grade"]["enum_values"] == "a,b,c"


def test_suggest_constraints_stack(spark, tbl):
    sugg = suggest_constraints(constraint_profile(tbl, exact=True))
    rows = {(r["column"], r["keyword"]): r["value"] for r in sugg.collect()}
    assert rows[("id", "type")] == "integer"
    assert rows[("id", "required")] == "true"
    assert rows[("id", "unique")] == "true"
    assert rows[("id", "minimum")] == "1"
    assert rows[("grade", "enum")] == "a,b,c"
    assert ("name", "required") not in rows
    assert ("grade", "minimum") not in rows  # non-numeric


def test_schema_from_profile_closure(spark, tbl):
    schema = schema_from_profile(constraint_profile(tbl, exact=True))
    assert schema["properties"]["id"]["minimum"] == 1
    assert isinstance(schema["properties"]["id"]["minimum"], int)
    assert schema["properties"]["score"]["maximum"] == 99.0
    assert schema["properties"]["grade"]["enum"] == ["a", "b", "c"]
    assert "name" not in schema.get("required", [])
    # the closure: inferred schema validates green on the data it came from
    out = with_validation(tbl, schema)
    assert out.where(~F.col("valid")).count() == 0
    # and it actually rejects out-of-profile rows
    bad = spark.createDataFrame(
        [(99, "zed", 1000.0, "z", True)],
        "id long, name string, score double, grade string, flag boolean",
    )
    assert with_validation(bad, schema).where(~F.col("valid")).count() == 1


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            ('{"a": 1, "b": "x", "c": 1.5}',),
            ('{"a": 2, "b": "y"}',),
            ('{"a": "three", "b": "z", "d": [1, 2]}',),
            ('{"a": 4, "b": "w", "e": {"f": 1}}',),
        ],
        "j string",
    )


def test_infer_json_paths(spark, docs):
    rows = infer_json_paths(docs, "j").collect()
    got = {(r["path"], r["json_type"]): r for r in rows}
    assert got[("a", "integer")]["n_present"] == 3
    assert got[("a", "string")]["n_present"] == 1
    assert got[("b", "string")]["n_present"] == 4
    assert ("c", "number") in got
    assert ("d", "array") in got
    assert ("e", "object") in got
    assert float(got[("a", "integer")]["min_num"]) == 1.0
    assert float(got[("a", "integer")]["max_num"]) == 4.0
    assert got[("d", "array")]["min_num"] is None


def test_schema_from_json_paths_closure(spark, docs):
    paths = infer_json_paths(docs, "j")
    schema = schema_from_json_paths(paths, n_docs=docs.count())
    # union type for the mixed path, required only for all-docs paths
    assert sorted(schema["properties"]["a"]["type"]) == ["integer", "string"]
    assert schema["properties"]["b"]["type"] == "string"
    assert schema["required"] == ["a", "b"]
    # single-typed numeric path carries observed bounds
    assert schema["properties"]["c"]["minimum"] == 1.5
    # closure through the JSON/variant validation path
    out = validate_json_column(docs, schema, json_col="j")
    assert out.where(~F.col("valid")).count() == 0
    bad = spark.createDataFrame([('{"a": 1}',)], "j string")  # missing b
    assert validate_json_column(bad, schema, json_col="j").where(~F.col("valid")).count() == 1


def test_json_type_of_table():
    from pyspark.sql import types as T

    assert json_type_of(T.LongType()) == "integer"
    assert json_type_of(T.DecimalType(10, 2)) == "number"
    assert json_type_of(T.ArrayType(T.LongType())) == "array"
    assert json_type_of(T.MapType(T.StringType(), T.LongType())) == "object"
    assert json_type_of(T.TimestampType()) == "datetime"


def test_fd_candidates_exact(spark):
    from json_schema_clj_spark.operators.infer import fd_candidates

    df = spark.createDataFrame(
        [
            (1, "us", "north america"),
            (2, "us", "north america"),
            (3, "fr", "europe"),
            (4, "de", "europe"),
            (5, None, "unknown"),
        ],
        "id long, country string, region string",
    )
    fds = {
        (r["determinant"], r["dependent"]): r
        for r in fd_candidates(df, exact=True).collect()
    }
    # id is a key → determines everything
    assert fds[("id", "country")]["holds"] and fds[("id", "region")]["holds"]
    # country → region holds (each country maps to one region; NULL lhs excluded)
    assert fds[("country", "region")]["holds"]
    assert fds[("country", "region")]["n_lhs"] == 3
    assert fds[("country", "region")]["n_pair"] == 3
    # region → country fails (europe maps to fr and de)
    assert not fds[("region", "country")]["holds"]
    # low-cardinality columns never determine the key
    assert not fds[("country", "id")]["holds"]


def test_fd_candidates_approx_agrees(spark):
    from json_schema_clj_spark.operators.infer import fd_candidates

    df = spark.range(2000).selectExpr(
        "id", "id % 100 AS a", "(id % 100) * 2 AS b", "id % 7 AS c"
    )
    approx = {
        (r["determinant"], r["dependent"]): r["holds"]
        for r in fd_candidates(df, ["a", "b", "c"]).collect()
    }
    # a ↔ b bijection holds both ways; a→c and c→a fail (100 vs 700 pairs)
    assert approx[("a", "b")] and approx[("b", "a")]
    assert not approx[("a", "c")] and not approx[("c", "a")]


def test_fd_and_keys_hll_path_matches_exact(spark):
    """The 10^12-row scale path (single-pass HLL aggregation) must agree
    with exact mode on EVERY boolean verdict over a corpus whose
    cardinality separations exceed the advisory tolerance band (3·rsd):
    true FDs/keys have n_pair == n_lhs exactly, violated ones differ by
    ≥2×, and non-keys cover <50% of rows — so a deterministic HLL++
    estimate at the default rsd=0.05 cannot land on the wrong side.  This
    is the driver-green exact mode oracling the HLL path the oracle rows
    themselves never exercise."""
    from json_schema_clj_spark.operators.infer import candidate_keys, fd_candidates

    # 20k rows, 8 partitions (partial-aggregate merge path included):
    # id unique; b = id%100 (bijective with c); e = coarse bucket of b;
    # d two-valued — every separation is ≥2× or exact equality
    df = spark.range(0, 20_000, 1, 8).selectExpr(
        "id",
        "id % 100 AS b",
        "(id % 100) * 2 AS c",
        "id % 2 AS d",
        "(id % 100) DIV 10 AS e",
    )

    fd_exact = {
        (r["determinant"], r["dependent"]): r
        for r in fd_candidates(df, exact=True).collect()
    }
    fd_hll = {
        (r["determinant"], r["dependent"]): r
        for r in fd_candidates(df, exact=False).collect()
    }
    assert set(fd_exact) == set(fd_hll)
    for pair, er in fd_exact.items():
        hr = fd_hll[pair]
        assert er["holds"] == hr["holds"], (pair, er, hr)
        # the estimates themselves stay within the documented rsd band
        assert abs(hr["n_lhs"] - er["n_lhs"]) <= 3 * 0.05 * er["n_lhs"] + 1
        assert abs(hr["n_pair"] - er["n_pair"]) <= 3 * 0.05 * er["n_pair"] + 1
    # ground truth spot checks so the corpus itself can't silently rot
    assert fd_exact[("b", "c")]["holds"] and fd_exact[("c", "b")]["holds"]
    assert fd_exact[("b", "e")]["holds"] and not fd_exact[("e", "b")]["holds"]
    assert fd_exact[("id", "d")]["holds"] and not fd_exact[("d", "id")]["holds"]

    ck_exact = {
        r["key_cols"]: r
        for r in candidate_keys(df, ["id", "b", "d"], max_width=2, exact=True).collect()
    }
    ck_hll = {
        r["key_cols"]: r
        for r in candidate_keys(df, ["id", "b", "d"], max_width=2, exact=False).collect()
    }
    assert set(ck_exact) == set(ck_hll)
    for combo, er in ck_exact.items():
        hr = ck_hll[combo]
        assert er["is_key"] == hr["is_key"], (combo, er, hr)
        assert er["minimal"] == hr["minimal"], (combo, er, hr)
        assert abs(hr["n_distinct"] - er["n_distinct"]) <= 3 * 0.05 * er["n_distinct"] + 1
    assert ck_exact["id"]["is_key"] and ck_exact["id"]["minimal"]
    assert ck_exact["id,b"]["is_key"] and not ck_exact["id,b"]["minimal"]
    assert not ck_exact["b,d"]["is_key"]  # 200 combos over 20k rows


def test_profile_drift(spark):
    from json_schema_clj_spark.operators.infer import constraint_profile, profile_drift

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 15.0)],
        "id long, grade string, score double",
    )
    cur = spark.createDataFrame(
        [(4, "a", 5.0), (4, "c", 30.0), (None, "b", 25.0)],
        "id long, grade string, score double",
    )
    pa = constraint_profile(base, exact=True)
    pb = constraint_profile(cur, exact=True)
    got = {(r["column"], r["change"]): (r["before"], r["after"]) for r in profile_drift(pa, pb).collect()}
    # id: nulls appeared, duplicates appeared, max grew
    assert got[("id", "required_lost")] == ("required", "nullable")
    assert got[("id", "unique_lost")] == ("unique", "duplicated")
    assert got[("id", "max_extended")] == ("3", "4")
    assert ("id", "min_extended") not in got  # 4 > 1
    # grade: 'c' is outside the baseline enum
    assert got[("grade", "enum_new_values")] == ("a,b", "c")
    # score: range extended both directions
    assert got[("score", "min_extended")] == ("10.0", "5.0")
    assert got[("score", "max_extended")] == ("20.0", "30.0")
    assert ("score", "type_changed") not in got


def test_profile_drift_structural(spark):
    from json_schema_clj_spark.operators.infer import constraint_profile, profile_drift

    pa = constraint_profile(spark.createDataFrame([(1, "x")], "id long, old string"), exact=True)
    pb = constraint_profile(spark.createDataFrame([(1, 2.0)], "id long, new double"), exact=True)
    got = {(r["column"], r["change"]): (r["before"], r["after"]) for r in profile_drift(pa, pb).collect()}
    assert got[("old", "column_removed")] == ("old", "absent")
    assert got[("new", "column_added")] == ("absent", "new")
    # added/removed columns report structurally only — no enum/range noise
    assert not any(c == "enum_new_values" and col in ("old", "new") for col, c in got)


# ---------------------------------------------------------------------------
# property: the closure holds on arbitrary small tables

from hypothesis import given, settings
from hypothesis import strategies as st

_row = st.tuples(
    st.one_of(st.none(), st.integers(min_value=-10**9, max_value=10**9)),
    st.one_of(st.none(), st.sampled_from(["a", "b", "c", "d", "e"])),
    st.one_of(
        st.none(),
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
    ),
)


@given(st.lists(_row, min_size=1, max_size=25))
@settings(max_examples=12, deadline=None)
def test_closure_property_random_tables(spark, rows):
    from json_schema_clj_spark.operators.infer import (
        constraint_profile,
        schema_from_profile,
    )

    df = spark.createDataFrame(rows, "i long, s string, f double")
    schema = schema_from_profile(constraint_profile(df, exact=True))
    out = with_validation(df, schema)
    bad = out.where(~F.col("valid")).count()
    assert bad == 0, f"inferred schema rejects its own data: {schema} on {rows}"


def test_candidate_keys_exact(spark):
    from json_schema_clj_spark.operators.infer import candidate_keys

    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "y"), (3, "b", "x"), (4, "b", "y")],
        "id long, g string, h string",
    )
    keys = {r["key_cols"]: r for r in candidate_keys(df, exact=True).collect()}
    assert keys["id"]["is_key"] and keys["id"]["minimal"]
    # (g,h) is a composite key and minimal (neither g nor h alone is)
    assert keys["g,h"]["is_key"] and keys["g,h"]["minimal"]
    assert not keys["g"]["is_key"] and not keys["h"]["is_key"]
    # supersets of id are keys but never minimal
    assert keys["id,g"]["is_key"] and not keys["id,g"]["minimal"]
    assert keys["g,h"]["n_distinct"] == 4 and keys["g,h"]["width"] == 2


def test_candidate_keys_approx(spark):
    from json_schema_clj_spark.operators.infer import candidate_keys

    df = spark.range(3000).selectExpr("id", "id % 60 AS a", "id % 50 AS b")
    keys = {r["key_cols"]: r for r in candidate_keys(df, ["id", "a", "b"]).collect()}
    assert keys["id"]["is_key"] and keys["id"]["minimal"]
    # lcm(60,50)=300 < 3000 → (a,b) has only 300 combos, not a key
    assert not keys["a,b"]["is_key"]


def test_evolve_schema_closure(spark):
    """infer → validate → drift → evolve → validate closes green."""
    from json_schema_clj_spark.operators.infer import (
        constraint_profile,
        evolve_schema,
        profile_drift,
        schema_from_profile,
    )

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 15.0)],
        "id long, grade string, score double",
    )
    cur = spark.createDataFrame(
        [(4, "a", 5.0), (5, "c", 30.0), (None, "b", 25.0)],
        "id long, grade string, score double",
    )
    pa = constraint_profile(base, exact=True)
    schema = schema_from_profile(pa)
    # the baseline schema rejects the drifted slice…
    n_bad = with_validation(cur, schema).where(~F.col("valid")).count()
    assert n_bad == 3
    # …drift rows describe exactly what moved…
    drift = profile_drift(pa, constraint_profile(cur, exact=True)).collect()
    evolved = evolve_schema(schema, drift)
    # …and the evolved schema admits BOTH slices
    assert with_validation(cur, evolved).where(~F.col("valid")).count() == 0
    assert with_validation(base, evolved).where(~F.col("valid")).count() == 0
    assert evolved["properties"]["grade"]["enum"] == ["a", "b", "c"]
    assert evolved["properties"]["id"]["maximum"] == 5
    assert evolved["properties"]["score"]["minimum"] == 5.0
    assert "id" not in evolved.get("required", [])
    # original untouched
    assert schema["properties"]["grade"]["enum"] == ["a", "b"]


def test_evolve_schema_type_union_and_added(spark):
    from json_schema_clj_spark.operators.infer import evolve_schema

    schema = {"type": "object", "properties": {"x": {"type": "integer"}}}
    drift = [
        {"column": "x", "change": "type_changed", "before": "integer", "after": "string"},
        {"column": "y", "change": "column_added", "before": "absent", "after": "y"},
    ]
    evolved = evolve_schema(schema, drift)
    assert sorted(evolved["properties"]["x"]["type"]) == ["integer", "string"]
    assert evolved["properties"]["y"] == {}


def test_partition_profile_drift(spark):
    """Bad-shard detection: one partition's data breaks the baseline
    constraints; every other partition stays clean."""
    from json_schema_clj_spark.operators.infer import (
        constraint_profile,
        constraint_profile_by,
        profile_drift,
    )

    base = spark.range(300).selectExpr(
        "id % 3 AS part", "id AS k", "CAST(id % 7 AS STRING) AS s"
    )
    # shard 2 drifts: huge keys and a NULL
    cur = spark.range(300).selectExpr(
        "id % 3 AS part",
        "CASE WHEN id % 3 = 2 AND id > 200 THEN id + 100000 "
        "     WHEN id = 200 THEN NULL ELSE id END AS k",
        "CAST(id % 7 AS STRING) AS s",
    )
    baseline = constraint_profile(base, ["k", "s"], exact=True)
    parts = constraint_profile_by(cur, "part", ["k", "s"], exact=True)
    drift = profile_drift(baseline, parts, part_col="part")
    got = {
        (r["part"], r["column"], r["change"]): (r["before"], r["after"])
        for r in drift.collect()
    }
    assert got[(2, "k", "max_extended")] == ("299", "100299")
    assert got[(2, "k", "required_lost")] == ("required", "nullable")
    # shards 0 and 1 are clean
    assert not any(p in (0, 1) for (p, _, _) in got)


def test_infer_json_paths_nested(spark):
    from json_schema_clj_spark.operators.infer import infer_json_paths

    docs = spark.createDataFrame(
        [
            ('{"a": 1, "o": {"x": 2, "y": "s", "i": {"z": 3.5}}}',),
            ('{"a": 2, "o": {"x": 4}}',),
        ],
        "j string",
    )
    # depth 1: only top-level keys (back-compat)
    got1 = {(r["path"], r["json_type"]) for r in infer_json_paths(docs, "j").collect()}
    assert got1 == {("a", "integer"), ("o", "object")}
    # depth 3: dotted nested paths, frontier shrinks per level
    rows = {
        (r["path"], r["json_type"]): r
        for r in infer_json_paths(docs, "j", max_depth=3).collect()
    }
    assert rows[("o.x", "integer")]["n_present"] == 2
    assert float(rows[("o.x", "integer")]["max_num"]) == 4.0
    assert ("o.y", "string") in rows
    assert ("o.i", "object") in rows
    assert rows[("o.i.z", "number")]["n_present"] == 1


# ---------------------------------------------------------------------------
# code-review round-3 regressions: closure holds on the awkward inputs

def test_closure_datetime_blank_comma_columns(spark):
    """Timestamp columns, blank strings, and comma-containing values all
    previously broke the infer→validate closure (datetime compiled to
    constant-false; type:string rejects blanks; enums split on ',')."""
    import datetime as dt

    from json_schema_clj_spark.operators.infer import (
        constraint_profile,
        schema_from_profile,
    )

    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 1), "", "a,b"),
            (dt.datetime(2024, 6, 1), "x", "c"),
        ],
        "ts timestamp, s string, e string",
    )
    prof = constraint_profile(df, exact=True)
    rows = {r["column"]: r for r in prof.collect()}
    assert rows["s"]["n_blank"] == 1 and rows["e"]["n_blank"] == 0
    # comma value → enum dropped rather than corrupted
    assert rows["e"]["enum_values"] is None
    schema = schema_from_profile(prof)
    assert schema["properties"]["ts"]["type"] == "datetime"
    assert "type" not in schema["properties"]["s"]  # blanks observed
    out = with_validation(df, schema)
    assert out.where(~F.col("valid")).count() == 0


def test_closure_nonscalar_enum_skipped(spark):
    from json_schema_clj_spark.operators.infer import (
        constraint_profile,
        schema_from_profile,
    )

    df = spark.createDataFrame([([1, 2],), ([3],)], "arr array<bigint>")
    prof = constraint_profile(df, exact=True)
    assert prof.collect()[0]["enum_values"] is None  # array → no enum
    schema = schema_from_profile(prof)
    assert with_validation(df, schema).where(~F.col("valid")).count() == 0


def test_infer_json_paths_large_numbers_no_crash(spark):
    from json_schema_clj_spark.operators.infer import infer_json_paths

    docs = spark.createDataFrame(
        [('{"ts": 1700000000000, "huge": 1e40}',)], "j string"
    )
    rows = {r["path"]: r for r in infer_json_paths(docs, "j").collect()}
    # epoch milliseconds fit DECIMAL(38,6); absurd magnitudes go NULL
    assert rows["ts"]["min_num"] == "1700000000000.000000"
    assert rows["huge"]["min_num"] is None


def test_schema_from_json_paths_nested_closure(spark):
    from json_schema_clj_spark.operators.infer import (
        infer_json_paths,
        schema_from_json_paths,
    )

    docs = spark.createDataFrame(
        [('{"a": {"x": 1, "y": "s"}}',), ('{"a": {"x": 2}}',)], "j string"
    )
    schema = schema_from_json_paths(infer_json_paths(docs, "j", max_depth=2), 2)
    # nested properties, not flat dotted names
    assert "a.x" not in schema["properties"]
    a = schema["properties"]["a"]
    assert a["properties"]["x"]["type"] == "integer"
    assert a["required"] == ["x"]  # y appears in 1 of 2 a-objects
    assert schema["required"] == ["a"]
    out = validate_json_column(docs, schema, json_col="j")
    assert out.where(~F.col("valid")).count() == 0
    bad = spark.createDataFrame([('{"a": {"y": "s"}}',)], "j string")
    assert validate_json_column(bad, schema, json_col="j").where(~F.col("valid")).count() == 1


def test_profile_drift_no_spurious_enum_on_cardinality_drop(spark):
    from json_schema_clj_spark.operators.infer import constraint_profile, profile_drift

    base = spark.range(100).selectExpr("CAST(id AS STRING) AS s")  # 100 distinct → no enum
    cur = spark.range(3).selectExpr("CAST(id AS STRING) AS s")  # subset, low card
    drift = profile_drift(
        constraint_profile(base, exact=True), constraint_profile(cur, exact=True)
    ).collect()
    assert not any(r["change"] == "enum_new_values" for r in drift)


def test_dangling_arity_mismatch_raises(spark):
    import pytest as _pytest

    from json_schema_clj_spark.operators.referential import dangling

    df = spark.createDataFrame([(1, "a")], "k long, s string")
    with _pytest.raises(ValueError):
        dangling(df, ["k"], df, ["k", "s"])

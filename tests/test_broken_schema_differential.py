"""Broken-schema differential: keyword values that don't conform to the
keyword's expected shape (numeric exclusive flags riding a bound, zero
divisors, wrong-typed bounds, unknown formats/types) must produce the SAME
per-row verdicts on all three backends — and must never crash a
distributed job at runtime (a single bad schema row cannot be allowed to
abort a 10^12-row validation pass).

The ground truth is the driver Python backend, which mirrors the
reference's cond order (compile-comparator core.clj:93-124, is-divider?
core.clj:419-421). Where the reference itself would THROW (integer
(/ v 0) in multipleOf 0) the engine's graceful contract applies and is
pinned here; those spots are commented.
"""

import json

import pytest
from pyspark.sql import types as T

from json_schema_clj_spark import engine
from json_schema_clj_spark.plans.compiler import ColumnBackendUnsupported

COLS = {
    "name": T.StringType(),
    "age": T.LongType(),
    "score": T.DoubleType(),
    "flag": T.BooleanType(),
    "tags": T.ArrayType(T.StringType()),
}
TABLE_SCHEMA = T.StructType([T.StructField(k, v) for k, v in COLS.items()])

ROWS = [
    ("abc", 4, 1.5, True, ["x", "y"]),
    ("", -2, 0.0, False, []),
    (None, None, None, None, None),
    ("zz", 0, 2.5, True, ["a", "a"]),
]
DOCS = [{k: v for k, v in zip(COLS, r) if v is not None} for r in ROWS]

BROKEN_SCHEMAS = [
    # wrong-typed bounds -> per-value "could not compare" errors
    {"properties": {"name": {"minLength": "x"}}},
    {"properties": {"name": {"maxLength": True}}},
    {"properties": {"age": {"minimum": "x"}}},
    {"properties": {"age": {"minimum": True}}},
    {"properties": {"tags": {"minItems": "x"}}},
    {"properties": {"tags": {"maxItems": False}}},
    # non-boolean exclusive flag riding its bound -> every value errors
    {"properties": {"age": {"maximum": 5, "exclusiveMaximum": 2}}},
    {"properties": {"age": {"minimum": 0, "exclusiveMinimum": 3}}},
    # bare boolean exclusive flag -> boolean bound fails applicability
    {"properties": {"age": {"exclusiveMaximum": True}}},
    {"properties": {"age": {"exclusiveMinimum": False}}},
    # zero divisor: graceful contract (only 0 is a multiple of 0) — the
    # reference's integer path throws on (/ v 0) so this is engine-defined
    {"properties": {"age": {"multipleOf": 0}}},
    {"properties": {"score": {"multipleOf": 0.0}}},
    {"properties": {"age": {"divisibleBy": 0}}},
    # non-number multipleOf -> keyword dropped
    {"properties": {"age": {"multipleOf": True}}},
    {"properties": {"age": {"multipleOf": "x"}}},
    # misc non-conforming keyword values with defined reference behavior
    {"properties": {"tags": {"uniqueItems": "yes"}}},
    {"properties": {"name": {"enum": "abc"}}},
    {"properties": {"name": {"format": "nosuchformat"}}},
    {"properties": {"age": {"type": "nosuchtype"}}},
    {"required": "name"},
    {"properties": {"name": {"minLength": -1}}},
    {"properties": {"age": {"maximum": None}}},
]


DATA_EDGE_SCHEMAS = [
    # wrong-typed runtime bounds -> per-row "could not compare" (nil passes)
    {"properties": {"age": {"minimum": {"$data": "1/name"}}}},
    {"properties": {"age": {"maximum": {"$data": "1/flag"}}}},
    {"properties": {"name": {"minLength": {"$data": "1/name"}}}},
    # statically absent sibling -> nil bound, not plan-time FIELD_NOT_FOUND
    {"properties": {"age": {"maximum": {"$data": "1/missing"}}}},
    # pointer walking a key into a scalar -> nil bound
    {"properties": {"age": {"minimum": {"$data": "1/name/deeper"}}}},
    # array-index pointer: out-of-range index on short/empty arrays is a nil
    # bound, not an ANSI INVALID_ARRAY_INDEX abort
    {"properties": {"age": {"maximum": {"$data": "1/tags/0"}}}},
    {"properties": {"name": {"const": {"$data": "1/tags/1"}}}},
    # enum from a $data array whose element type can't equal the target:
    # statically not-a-member, not plan-time DATATYPE_MISMATCH
    {"properties": {"age": {"enum": {"$data": "1/tags"}}}},
    {"properties": {"name": {"enum": {"$data": "1/tags"}}}},
]


@pytest.mark.parametrize("schema", DATA_EDGE_SCHEMAS, ids=lambda s: json.dumps(s)[:70])
def test_data_pointer_edges_backends_agree(spark, schema):
    v = engine.compile(schema)
    py_valid = [not v(d)["errors"] for d in DOCS]
    df = spark.createDataFrame(ROWS, TABLE_SCHEMA)
    col_valid = [r["valid"] for r in engine.with_validation(df, schema).collect()]
    assert col_valid == py_valid, f"Column backend disagrees on {schema}"


def test_data_zero_divisor_runtime(spark):
    """multipleOf with a $data divisor that is ZERO at runtime for some rows:
    the CaseWhen guard keeps ANSI mode from evaluating the remainder on those
    rows, and the verdicts match the Python backend (only v == 0 passes)."""
    table = T.StructType(
        [T.StructField("age", T.LongType()), T.StructField("score", T.DoubleType())]
    )
    rows = [(4, 2.0), (4, 0.0), (0, 0.0), (None, 0.0), (6, None), (9, 3.0)]
    docs = [{k: v for k, v in zip(("age", "score"), r) if v is not None} for r in rows]
    schema = {"properties": {"age": {"multipleOf": {"$data": "1/score"}}}}
    v = engine.compile(schema)
    py_valid = [not v(d)["errors"] for d in docs]
    col_valid = [
        r["valid"]
        for r in engine.with_validation(spark.createDataFrame(rows, table), schema).collect()
    ]
    assert col_valid == py_valid == [True, False, True, True, True, True]


@pytest.mark.parametrize("schema", BROKEN_SCHEMAS, ids=lambda s: json.dumps(s)[:70])
def test_broken_schema_backends_agree(spark, schema):
    v = engine.compile(schema)
    py_valid = [not v(d)["errors"] for d in DOCS]

    df = spark.createDataFrame(ROWS, TABLE_SCHEMA)
    col_valid = [r["valid"] for r in engine.with_validation(df, schema).collect()]
    assert col_valid == py_valid, f"Column backend disagrees on {schema}"

    jdf = spark.createDataFrame([(json.dumps(d),) for d in DOCS], "data_json string")
    try:
        out = engine.validate_json_column(jdf, schema, force_backend="variant")
    except ColumnBackendUnsupported:
        return
    var_valid = [r["valid"] for r in out.collect()]
    assert var_valid == py_valid, f"Variant backend disagrees on {schema}"

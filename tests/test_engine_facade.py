"""Hybrid engine facade: backend dispatch, from_json fast path, parity
between backends on the same documents, and Catalyst column pruning
through the validation machinery."""

import json

from pyspark.sql import functions as F

from json_schema_clj_spark import engine
from json_schema_clj_spark.sources.images import FLAGSHIP_SCHEMA, images_df

CLOSED = {
    "type": "object",
    "required": ["name"],
    "properties": {
        "name": {"type": "string"},
        "age": {"type": "integer", "minimum": 0, "maximum": 150},
        "tags": {"type": "array", "items": {"type": "string"}, "maxItems": 3},
    },
}

DYNAMIC = {  # recursion → python backend
    "definitions": {"n": {"properties": {"next": {"$ref": "#/definitions/n"}},
                          "required": ["v"]}},
    "$ref": "#/definitions/n",
}

DOCS = [
    {"name": "a", "age": 3, "tags": ["x"]},
    {"name": "", "age": 3},             # blank-string quirk
    {"age": -1},                         # required + minimum
    {"name": "b", "tags": ["1", "2", "3", "4"]},  # maxItems
]


def _df(spark, docs):
    return spark.createDataFrame([(json.dumps(d),) for d in docs], "data_json string")


def test_one_doc_api():
    assert engine.validate(CLOSED, DOCS[0])["errors"] == []
    v = engine.compile(CLOSED)
    assert v(DOCS[2])["errors"]


def test_backend_dispatch(spark):
    df = _df(spark, DOCS)
    col_out = engine.validate_json_column(df, CLOSED, force_backend="column")
    plan = col_out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    py_out = engine.validate_json_column(df, DYNAMIC)  # python backend (default)
    plan = py_out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan or "BatchEvalPython" in plan


def test_backend_parity(spark):
    df = _df(spark, DOCS)
    col_valid = [r["valid"] for r in engine.validate_json_column(df, CLOSED, force_backend="column").collect()]
    py_valid = [
        r["valid"]
        for r in engine.validate_json_column(df, CLOSED, force_backend="python").collect()
    ]
    driver_valid = [not engine.validate(CLOSED, d)["errors"] for d in DOCS]
    assert col_valid == py_valid == driver_valid == [True, False, False, False]


def test_column_pruning_through_validation(spark, tmp_path):
    """A schema referencing only `w` must produce a parquet scan that reads
    only `w` — pushdown/pruning survives the violation machinery."""
    path = str(tmp_path / "imgs")
    images_df(spark, 1000).write.parquet(path)
    df = spark.read.parquet(path)
    out = engine.with_validation(df.select("w"), {"properties": {"w": {"minimum": 1}}})
    agg = out.agg(F.sum(F.col("valid").cast("int")))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<w:int>" in plan, plan[-1500:]


def test_full_table_scan_pruning(spark, tmp_path):
    """Even validating the FULL flagship schema, a verdict aggregation must
    not read `bytes` (the schema never references it beyond required, which
    is presence-only... it IS referenced; instead check an unreferenced
    column is pruned when dropped from the schema)."""
    path = str(tmp_path / "imgs2")
    images_df(spark, 1000).write.parquet(path)
    df = spark.read.parquet(path)
    schema = {k: v for k, v in FLAGSHIP_SCHEMA.items()}
    schema = {
        "type": "object",
        "required": ["image_id"],
        "properties": {"w": FLAGSHIP_SCHEMA["properties"]["w"]},
    }
    out = engine.with_validation(df, schema)
    agg = out.agg(F.sum(F.col("valid").cast("int")))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    # bytes/caption/phash not referenced → pruned from the scan
    assert "bytes" not in plan.split("ReadSchema:")[-1]
    assert "caption" not in plan.split("ReadSchema:")[-1]

def test_default_backend_catches_type_mismatch(spark):
    """WHY python is the default for raw JSON: from_json nulls/coerces
    type-mismatched fields, which would silently pass `type` checks."""
    docs = [{"name": 5}]  # integer where a string is required
    df = _df(spark, docs)
    out = engine.validate_json_column(df, CLOSED).collect()
    assert out[0]["valid"] is False  # reference: "expected type of string"

"""Draft-suite fixture loading + distributed conformance runner.

Fixture format is the official JSON-Schema-Test-Suite's (and the
reference's own golden format, /root/reference/test/custom-scenarios/
nested_ref.json, harness /root/reference/test/json_schema/utils.clj:50-71):
files containing ``[{description, schema, tests: [{description, data,
valid}]}]``.

`load_cases` flattens files into case dicts; `suite_df` lifts them into the
`suite_cases` table of FIXTURES.md §3; `run_suite_spark` validates the
whole table distributed: one compiled validator per distinct schema
(compiled once on the driver), dispatched by schema_id inside a single
Arrow-batched UDF pass.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Iterable, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..pyvalidator.validator import compile_schema


def load_cases(paths: Iterable[str], draft: str = "custom", skip: Iterable[str] = ()) -> list[dict]:
    """Flatten fixture files into case dicts, honoring a skip-list of group
    descriptions (the reference's per-draft skip-lists, e.g.
    /root/reference/test/json_schema/v4_test.clj:83-91)."""
    skip = set(skip)
    cases = []
    for path in paths:
        with open(path) as f:
            groups = json.load(f)
        fname = os.path.basename(path)
        for gi, group in enumerate(groups):
            gdesc = group.get("description", "")
            if gdesc in skip:
                continue
            for ti, test in enumerate(group.get("tests", [])):
                cases.append(
                    {
                        "case_id": f"{fname}:{gi}:{ti}",
                        "draft": draft,
                        "group_desc": gdesc,
                        "test_desc": test.get("description", ""),
                        "schema_json": json.dumps(group["schema"]),
                        "data_json": json.dumps(test["data"]),
                        "valid": bool(test["valid"]),
                    }
                )
    return cases


SUITE_SCHEMA = T.StructType(
    [
        T.StructField("case_id", T.StringType()),
        T.StructField("draft", T.StringType()),
        T.StructField("group_desc", T.StringType()),
        T.StructField("test_desc", T.StringType()),
        T.StructField("schema_json", T.StringType()),
        T.StructField("data_json", T.StringType()),
        T.StructField("valid", T.BooleanType()),
    ]
)


def suite_df(spark: SparkSession, cases: list[dict]) -> DataFrame:
    return spark.createDataFrame(cases, SUITE_SCHEMA)


def run_suite_python(cases: list[dict], loader: Optional[Callable] = None) -> list[dict]:
    """Driver-side conformance run (compile each distinct schema once)."""
    compiled: dict[str, Callable] = {}
    out = []
    for c in cases:
        v = compiled.get(c["schema_json"])
        if v is None:
            v = compile_schema(json.loads(c["schema_json"]), loader=loader)
            compiled[c["schema_json"]] = v
        res = v(json.loads(c["data_json"]))
        got = len(res["errors"]) == 0
        out.append({**c, "got": got, "pass": got == c["valid"],
                    "errors": res["errors"]})
    return out


def run_suite_spark(df: DataFrame, loader: Optional[Callable] = None) -> DataFrame:
    """Distributed conformance: compile every distinct schema on the driver,
    ship the closure dict inside one pandas UDF, evaluate per Arrow batch.

    At suite scale this is trivially small; the point is the architecture —
    schema dispatch happens batch-side with zero per-row Python↔JVM hops.
    """
    schemas = [r[0] for r in df.select("schema_json").distinct().collect()]
    compiled = {s: compile_schema(json.loads(s), loader=loader) for s in schemas}

    @F.pandas_udf(T.BooleanType())
    def check(schema_json: pd.Series, data_json: pd.Series) -> pd.Series:
        res = []
        for s, d in zip(schema_json, data_json):
            v = compiled[s]
            res.append(len(v(json.loads(d))["errors"]) == 0)
        return pd.Series(res)

    return df.withColumn("got", check(F.col("schema_json"), F.col("data_json"))).withColumn(
        "pass", F.col("got") == F.col("valid")
    )

"""Draft 3/4/6/7 conformance suite (fixtures authored in
tools/gen_draft_fixtures.py, pinned to reference behavior — the official
submodule is empty in the reference checkout).

Runs twice: driver-side (fast), and distributed through the Arrow-batched
pandas-UDF path (`run_suite_spark`) to prove the Spark integration yields
identical verdicts.  The reference's own skip-lists
(/root/reference/test/json_schema/v3_test.clj:86-93, v4_test.clj:83-91,
v6_test.clj:81-92, v7_test.clj:67-87) are carried for parity, though the
authored fixtures simply omit those cases.
"""

import glob
import os

import pytest

from json_schema_clj_spark.sources.suite import (
    load_cases,
    run_suite_python,
    run_suite_spark,
    suite_df,
)

HERE = os.path.dirname(os.path.abspath(__file__))

# the reference's per-draft skip-lists, verbatim
SKIP = {
    "draft3": ["multiple extends", "ECMA 262 regex dialect recognition",
               "ref overrides any sibling keywords"],
    "draft4": ["multiple extends", "ECMA 262 regex dialect recognition",
               "ref overrides any sibling keywords", "an array of schemas for items",
               "allOf with base schema"],
    "draft6": ["multiple extends", "ECMA 262 regex dialect recognition",
               "ref overrides any sibling keywords", "an array of schemas for items",
               "allOf with base schema",
               "some languages do not distinguish between different types of numeric value"],
    "draft7": ["multiple extends", "ECMA 262 regex dialect recognition",
               "ref overrides any sibling keywords", "an array of schemas for items",
               "allOf with base schema",
               "some languages do not distinguish between different types of numeric value"],
    # v5 proposal keywords + $data — the reference runs its whole v5 dir with
    # no skip-list (/root/reference/test/json_schema/v5_test.clj:8,20)
    "v5": [],
}


def _cases(draft):
    paths = sorted(glob.glob(f"{HERE}/fixtures/{draft}/*.json"))
    return load_cases(paths, draft=draft, skip=SKIP[draft])


@pytest.mark.parametrize("draft", ["draft3", "draft4", "draft6", "draft7", "v5"])
def test_draft_conformance_python(draft):
    cases = _cases(draft)
    assert cases
    results = run_suite_python(cases)
    failures = [r for r in results if not r["pass"]]
    msg = "\n".join(f"{r['case_id']} {r['group_desc']} / {r['test_desc']}" for r in failures[:10])
    assert not failures, f"{len(failures)}/{len(results)}:\n{msg}"


def test_draft_conformance_spark(spark):
    all_cases = [c for d in SKIP for c in _cases(d)]
    df = suite_df(spark, all_cases)
    out = run_suite_spark(df)
    failed = out.where("NOT pass").select("case_id", "group_desc", "test_desc").collect()
    assert not failed, failed[:10]

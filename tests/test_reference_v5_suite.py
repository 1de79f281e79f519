"""The reference's OWN vendored v5 test corpus, run verbatim in place.

Unlike drafts 3/4/6/7 (official-suite submodule empty in the checkout —
our corpus there is authored), the reference ships its complete v5
fixture set at /root/reference/test/v5/ (24 files, 413 tests: constant,
contains, switch, patternGroups, patternRequired, formatMinimum/Maximum
and the whole $data directory) and runs it with NO skip-list
(test/json_schema/v5_test.clj:8,20).  Running those files untouched is
the directest possible parity evidence for the v5 extension surface —
"matches the reference's results on its own test queries" literally.

Both paths must agree: driver-side Python backend, and the distributed
Arrow-batched path through a Spark DataFrame.
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

REF_V5 = "/root/reference/test/v5"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_V5), reason="reference checkout not present"
)


def _cases():
    paths = sorted(glob.glob(f"{REF_V5}/**/*.json", recursive=True))
    return load_cases(paths, draft="v5", skip=[])


def test_reference_v5_corpus_python():
    cases = _cases()
    assert len(cases) >= 400, len(cases)  # 413 at the pinned reference commit
    results = run_suite_python(cases)
    failures = [r for r in results if not r["pass"]]
    msg = "\n".join(
        f"{r['case_id']} {r['group_desc']} / {r['test_desc']}" for r in failures[:10]
    )
    assert not failures, f"{len(failures)}/{len(results)}:\n{msg}"


def test_reference_v5_corpus_spark(spark):
    cases = _cases()
    out = run_suite_spark(suite_df(spark, cases))
    failed = out.where("NOT pass").select("case_id", "group_desc", "test_desc").collect()
    assert not failed, failed[:10]


def test_reference_custom_scenarios():
    """The reference's custom-scenarios dir (core_test.clj:10-11), run
    with the default dialect like the reference does."""
    paths = sorted(
        glob.glob("/root/reference/test/custom-scenarios/**/*.json", recursive=True)
    )
    cases = load_cases(paths, draft="draft4", skip=[])
    assert cases
    results = run_suite_python(cases)
    failures = [r for r in results if not r["pass"]]
    assert not failures, failures[:5]

"""End-to-end `spark-submit --py-files` evidence for the curation pipeline.

The curation sibling of tests/test_spark_submit.py: runs the real
/opt/spark/bin/spark-submit binary from a scratch cwd with ONLY the built
zip on --py-files, proving jobs/curate_submit.py is a self-contained
submission unit with stage-level resume:

1. crash-injected run (test hook kills the job after 2 committed stages),
2. resume run — must skip the committed stages and finish,
3. idempotent re-run — must skip all five stages and reproduce the summary.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

SPARK_SUBMIT = "/opt/spark/bin/spark-submit"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit binary not available"
)

STAGES = ["profile", "drops", "verdicts", "redacted", "pack"]


def submit(zip_path, out_dir, cwd, *extra):
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # the zip must be the only source of the package
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--driver-memory", "6g",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "curate_submit.py"),
            "--input", "synth:8000",
            "--output", out_dir,
            "--run-id", "curate-test",
            "--n-parts", "8",
            "--capacity", "256",
            *extra,
        ],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    return proc


def test_curate_submit_stage_resume(tmp_path):
    from tools.build_pyfiles import build

    zip_path = build(str(tmp_path / "pkg.zip"))
    out_dir = str(tmp_path / "run")
    cwd = str(tmp_path / "scratch")
    os.makedirs(cwd)

    # 1. crash after the first two committed stages (profile + drops)
    p1 = submit(zip_path, out_dir, cwd, "--fail-after-stage", "2")
    assert p1.returncode != 0
    assert "TEST HOOK: injected crash" in (p1.stderr + p1.stdout)
    assert os.path.exists(os.path.join(out_dir, "drops", "_SUCCESS"))
    assert not os.path.exists(os.path.join(out_dir, "verdicts", "_SUCCESS"))

    # 2. resume: skips profile+drops, runs verdicts/redacted/pack
    p2 = submit(zip_path, out_dir, cwd)
    assert p2.returncode == 0, p2.stderr[-4000:]
    summary = json.loads(p2.stdout.strip().splitlines()[-1])
    assert summary["stages_skipped"] == ["profile", "drops"]
    assert summary["stages_run"] == ["verdicts", "redacted", "pack"]
    # the synthetic corpus plants exact-dup pairs (doc_id % 17 == 5) and
    # PII emails (doc_id % 13 == 3 on kept docs), so every branch has work
    assert summary["verdicts"].get("exact_dup", 0) > 0
    assert summary["verdicts"].get("kept", 0) > 0
    assert summary["docs_redacted"] == summary["verdicts"]["kept"]
    assert summary["pii_redactions"] > 0
    assert summary["bins"] > 1

    # every doc got exactly one verdict
    import duckdb

    v_glob = os.path.join(out_dir, "verdicts", "*.parquet")
    n_v, n_docs = duckdb.sql(
        f"SELECT count(*), count(DISTINCT doc_id) FROM read_parquet('{v_glob}')"
    ).fetchone()
    assert n_v == n_docs == 8000

    # pack manifest: every non-trailing bin's spans sum to exactly --capacity
    pk_glob = os.path.join(out_dir, "pack", "*.parquet")
    bad = duckdb.sql(
        "SELECT count(*) FROM ("
        f"  SELECT bin_id, sum(span_len) AS t FROM read_parquet('{pk_glob}')"
        "   GROUP BY bin_id) WHERE t <> 256 AND bin_id <> (SELECT max(bin_id) "
        f"  FROM read_parquet('{pk_glob}'))"
    ).fetchone()[0]
    assert bad == 0

    # 3. idempotent re-run: everything already committed, same numbers
    p3 = submit(zip_path, out_dir, cwd)
    assert p3.returncode == 0, p3.stderr[-4000:]
    summary3 = json.loads(p3.stdout.strip().splitlines()[-1])
    assert summary3["stages_run"] == []
    assert summary3["stages_skipped"] == STAGES
    assert summary3["verdicts"] == summary["verdicts"]
    assert summary3["bins"] == summary["bins"]

    assert os.path.exists(os.path.join(out_dir, "summary.json"))
    shutil.rmtree(cwd, ignore_errors=True)

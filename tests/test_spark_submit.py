"""End-to-end `spark-submit --py-files` evidence (north rule,
/root/repo/BASELINE.json:14: "submitted via spark-submit --py-files ...
resumable from checkpoint").

Runs the real /opt/spark/bin/spark-submit binary from a scratch cwd with
ONLY the built zip on --py-files, so the test proves the packaged artifact
is self-contained.  Three submissions over one output dir:

1. crash-injected run (test hook kills the job after 1 committed chunk),
2. resume run — must skip the committed partitions and finish,
3. idempotent re-run — must skip everything.
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


def submit(zip_path, out_dir, cwd, *extra):
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env.pop("PYTHONPATH", None)  # the zip must be the only source of the package
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "validate_submit.py"),
            "--input", "synth:20000",
            "--output", out_dir,
            "--run-id", "submit-test",
            "--n-parts", "8",
            "--chunk-size", "2",
            *extra,
        ],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    return proc


def test_spark_submit_pyfiles_resumable(tmp_path):
    from tools.build_pyfiles import build

    zip_path = build(str(tmp_path / "pkg.zip"))
    out_dir = str(tmp_path / "run")
    cwd = str(tmp_path / "scratch")
    os.makedirs(cwd)

    # 1. crash after the first committed chunk (2 of 8 partitions)
    p1 = submit(zip_path, out_dir, cwd, "--fail-after-chunks", "1",
                "--skip-table-checks")
    assert p1.returncode != 0
    assert "TEST HOOK: injected crash" in (p1.stderr + p1.stdout)

    # 2. resume: skips the 2 committed partitions, finishes the rest +
    #    table-level checks
    p2 = submit(zip_path, out_dir, cwd)
    assert p2.returncode == 0, p2.stderr[-4000:]
    summary = json.loads(p2.stdout.strip().splitlines()[-1])
    assert summary["parts_skipped"] == 2
    assert summary["parts_processed"] == 6
    assert summary["rows_validated"] == 20000
    # seeded violation injection → failures exist and dup ids exist
    assert summary["rows_failed"] > 0
    assert summary["dup_image_ids"] > 0
    assert summary["bad_magic_rows"] > 0
    # triage exemplars sink: ≤3 ranked examples per violated keyword path,
    # derived from the violations sink (several plant classes → paths > 1)
    assert summary["violated_paths"] > 1

    # the injected crash fired AFTER the 2nd chunk's violations write but
    # BEFORE its manifest commit; the resume re-ran that chunk, so a
    # non-idempotent (append) sink would have duplicated its rows — assert
    # the per-chunk overwrite sink kept violations exactly-once
    import duckdb

    glob = os.path.join(out_dir, "violations", "*", "*", "*", "*.parquet")
    n_all = duckdb.sql(f"SELECT count(*) FROM read_parquet('{glob}')").fetchone()[0]
    n_dist = duckdb.sql(
        "SELECT count(*) FROM (SELECT DISTINCT image_id, keyword, instance_path "
        f"FROM read_parquet('{glob}'))"
    ).fetchone()[0]
    assert n_all > 0 and n_all == n_dist

    ex_glob = os.path.join(out_dir, "violation_examples", "*.parquet")
    mx = duckdb.sql(
        f"SELECT max(rank), min(rank) FROM read_parquet('{ex_glob}')"
    ).fetchone()
    assert 1 <= mx[1] and mx[0] <= 3

    # 3. idempotent re-run: everything already committed
    p3 = submit(zip_path, out_dir, cwd)
    assert p3.returncode == 0, p3.stderr[-4000:]
    summary3 = json.loads(p3.stdout.strip().splitlines()[-1])
    assert summary3["parts_processed"] == 0
    assert summary3["parts_skipped"] == 8
    # verdict totals identical across resumed + rerun manifests
    assert summary3["rows_validated"] == summary["rows_validated"]
    assert summary3["rows_failed"] == summary["rows_failed"]

    assert os.path.exists(os.path.join(out_dir, "summary.json"))
    shutil.rmtree(cwd, ignore_errors=True)


def test_spark_submit_zone_prune(tmp_path):
    """--zone-prune skips provably-clean partitions from the row-level pass
    while producing the SAME verdict totals as the unpruned run."""
    from pyspark.sql import SparkSession

    from tools.build_pyfiles import build

    zip_path = build(str(tmp_path / "pkg.zip"))
    cwd = str(tmp_path / "scratch")
    os.makedirs(cwd)

    # input: parts 0-5 clean, parts 6,7 carry out-of-range w violations
    spark = SparkSession.builder.master("local[2]").getOrCreate()
    rows = []
    for p in range(8):
        for i in range(100):
            w = 0 if (p >= 6 and i % 10 == 3) else 16 + i % 9
            rows.append((f"img-{p:02d}{i:04d}", p, w, 12, "png"))
    df = spark.createDataFrame(rows, "image_id string, part_id long, w int, h int, fmt string")
    input_path = str(tmp_path / "input")
    df.repartition("part_id").write.mode("overwrite").parquet(input_path)

    # fully zone-decidable schema (no pattern/format/length keywords)
    schema = {
        "type": "object",
        "required": ["image_id", "w", "h", "fmt"],
        "properties": {
            "w": {"type": "integer", "minimum": 1, "maximum": 65535},
            "h": {"type": "integer", "minimum": 1},
            "fmt": {"enum": ["png", "jpeg", "webp"]},
        },
    }
    schema_path = str(tmp_path / "schema.json")
    with open(schema_path, "w") as f:
        json.dump(schema, f)

    def run(out_dir, run_id, *extra):
        env = dict(os.environ)
        env["PYSPARK_PYTHON"] = sys.executable
        env["PYSPARK_DRIVER_PYTHON"] = sys.executable
        env.pop("PYTHONPATH", None)
        return subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", "local[4]",
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.ui.enabled=false",
                "--py-files", zip_path,
                os.path.join(REPO, "jobs", "validate_submit.py"),
                "--input", input_path,
                "--output", out_dir,
                "--run-id", run_id,
                "--schema", schema_path,
                "--chunk-size", "3",
                "--skip-table-checks",
                *extra,
            ],
            cwd=cwd, env=env, capture_output=True, text=True, timeout=420,
        )

    p_pruned = run(str(tmp_path / "pruned"), "zp-on", "--zone-prune")
    assert p_pruned.returncode == 0, p_pruned.stderr[-4000:]
    s_pruned = json.loads(p_pruned.stdout.strip().splitlines()[-1])

    p_full = run(str(tmp_path / "full"), "zp-off")
    assert p_full.returncode == 0, p_full.stderr[-4000:]
    s_full = json.loads(p_full.stdout.strip().splitlines()[-1])

    assert s_pruned["parts_zone_pruned"] == 6
    assert s_full["parts_zone_pruned"] == 0

    # identical verdict totals from both manifests
    import duckdb

    def totals(out_dir):
        g = os.path.join(out_dir, "manifest", "*.parquet")
        return duckdb.sql(
            f"SELECT sum(n_rows), sum(n_fail) FROM read_parquet('{g}')"
        ).fetchone()

    assert totals(str(tmp_path / "pruned")) == totals(str(tmp_path / "full")) == (800, 20)

    # pruned run wrote violation subdirs only for the dirty chunk(s)
    vio_dir = os.path.join(str(tmp_path / "pruned"), "violations")
    glob = os.path.join(vio_dir, "*", "*", "*", "*.parquet")
    n = duckdb.sql(f"SELECT count(DISTINCT image_id) FROM read_parquet('{glob}')").fetchone()[0]
    assert n == 20

"""Two-cluster-size scaling evidence (BASELINE.json north rule: ≥0.8
throughput scaling efficiency from N to 4N executors; sandbox proxy =
local[8] vs local[32] on the same input).

Protocol:
1. Materialize the deterministic synthetic image+caption table ONCE to
   parquet (the workload under test is validation, not data generation).
2. In separate fresh JVMs per parallelism level, run the full validation
   workload (schema checks → per-partition verdicts + violation sink,
   image_id uniqueness, per-partition KS/PSI drift) over that parquet.
3. Warm one small run per JVM (codegen/JIT), then take the best of
   `reps` timed iterations (kills GC/JIT noise).
4. efficiency = (T_N / T_4N) / 4 → BENCH/BASELINE.md.

Usage: python tools/bench_scaling.py [n_rows] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, ".bench_tmp", "images")

GEN = r"""
import sys
sys.path.insert(0, sys.argv[3])
from pyspark.sql import SparkSession
from json_schema_clj_spark.sources.images import images_df
n = int(sys.argv[1])
spark = (SparkSession.builder.master("local[32]")
    .config("spark.ui.enabled", "false").config("spark.driver.memory", "32g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
images_df(spark, n).write.mode("overwrite").parquet(sys.argv[2])
spark.stop()
"""

WORKLOAD = r"""
import json, sys, time
sys.path.insert(0, sys.argv[5])
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
cpus, path, n, reps = int(sys.argv[1]), sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
spark = (SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from json_schema_clj_spark.sources.images import FLAGSHIP_SCHEMA
from json_schema_clj_spark.operators.validate import validate
from json_schema_clj_spark.operators.uniqueness import duplicates
from json_schema_clj_spark.operators.drift import detect_drift

def workload(df):
    res = validate(df, FLAGSHIP_SCHEMA, id_cols=["image_id"], part_col="part_id")
    res["verdicts"].write.format("noop").mode("overwrite").save()
    res["violations"].write.format("noop").mode("overwrite").save()
    duplicates(df, ["image_id"]).write.format("noop").mode("overwrite").save()
    detect_drift(df, "w", "part_id", baseline_filter=F.col("part_id") < 32,
                 lo=0.0, hi=5200.0, buckets=64).write.format("noop").mode("overwrite").save()

df = spark.read.parquet(path)
workload(df.limit(50_000))   # warm codegen/JIT
best = None
for _ in range(reps):
    t0 = time.monotonic()
    workload(df)
    dt = time.monotonic() - t0
    best = dt if best is None or dt < best else best
print(json.dumps({"cpus": cpus, "rows": n, "sec": round(best, 2),
                  "rows_per_sec": round(n / best)}))
spark.stop()
"""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    subprocess.run([sys.executable, "-c", GEN, str(n), DATA, REPO], check=True,
                   capture_output=True, timeout=900)

    results = {}
    for cpus in (8, 32):
        out = subprocess.run(
            [sys.executable, "-c", WORKLOAD, str(cpus), DATA, str(n), str(reps), REPO],
            capture_output=True, text=True, timeout=1800,
        )
        lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
        if not lines:
            sys.stderr.write(out.stderr[-3000:])
            raise RuntimeError(f"workload at local[{cpus}] produced no result")
        results[cpus] = json.loads(lines[-1])

    r8, r32 = results[8], results[32]
    eff = (r8["sec"] / r32["sec"]) / 4.0
    md = f"""# BENCH/BASELINE — measured results

## Two-cluster-size scaling evidence (north rule: efficiency ≥ 0.8, N→4N)

Sandbox proxy per BASELINE.md:15 — identical full validation workload
(schema validation → per-partition verdicts + violation sink, image_id
salted uniqueness, per-partition KS/PSI drift) over the same materialized
{n:,}-row deterministic synthetic image+caption parquet table, run in
separate fresh JVMs at local[8] (N) and local[32] (4N); per-JVM codegen
warm-up, best of {reps} iterations.  Generation is seeded and
bit-reproducible across parallelism levels
(tests/test_flagship_images.py::test_determinism_across_parallelism).

| parallelism | wall sec | validated rows/sec |
|---|---|---|
| local[8]  (N)  | {r8['sec']} | {r8['rows_per_sec']:,} |
| local[32] (4N) | {r32['sec']} | {r32['rows_per_sec']:,} |

**Scaling efficiency (T_N / T_4N) / 4 = {eff:.3f}** {"— meets the ≥ 0.8 target." if eff >= 0.8 else "— below the 0.8 target in this sandbox; note local-mode threads share ONE JVM heap, GC, and memory bus, which is an adverse proxy for true multi-executor scaling (separate heaps)."}

## Headline bench (bench.py, sf0.1, local[32])

`python bench.py` prints one JSON line (total sec + per-query sec +
flagship validated rows/sec); the driver records it per round as
BENCH_r{{N}}.json.

Reference baseline: the reference publishes no performance numbers
(/root/reference/README.md:36 roadmap; correctness-only CI) — targets come
from BASELINE.json, evidenced here.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    shutil.rmtree(os.path.join(REPO, ".bench_tmp"), ignore_errors=True)
    print(json.dumps({"local8": r8, "local32": r32, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()

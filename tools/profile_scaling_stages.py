"""Per-stage 2→8 scaling profile of the validation workload: times each
component of the bench_scaling workload separately at two parallelism
levels to locate which stage anti-scales (the round-1 residual: workload
efficiency 0.715 vs a 0.935 pure-CPU host ceiling on the 2→8 pair).

Levels are interleaved (2,8, 2,8, …) with min-per-(stage,level), same
noise discipline as tools/bench_scaling.py.

Usage: python tools/profile_scaling_stages.py [n_rows] [rounds]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = "/dev/shm/spark-graft-bench/images"

STAGES = r"""
import json, sys, time
sys.path.insert(0, sys.argv[3])
from pyspark.sql import SparkSession
import pyspark.sql.functions as F
cpus, path = int(sys.argv[1]), sys.argv[2]
spark = (SparkSession.builder.master(f"local[{cpus}]")
    .config("spark.sql.shuffle.partitions", str(cpus))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "48g")
    .config("spark.local.dir", "/dev/shm/spark-local")
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from json_schema_clj_spark.sources.images import FLAGSHIP_SCHEMA
from json_schema_clj_spark.operators.validate import validate, with_validation, verdicts, violation_rows
from json_schema_clj_spark.operators.uniqueness import duplicates
from json_schema_clj_spark.operators.drift import detect_drift

df = spark.read.parquet(path)

def noop(d):
    d.write.format("noop").mode("overwrite").save()

def s_scan():        noop(df.select(F.sum(F.length("image_id")).alias("x")))
def s_verdicts():    noop(verdicts(with_validation(df, FLAGSHIP_SCHEMA), "part_id"))
def s_violations():
    v = with_validation(df, FLAGSHIP_SCHEMA)
    noop(violation_rows(v, ["image_id"], prefilter=~F.col("valid")))
def s_uniq_phash():  noop(duplicates(df, ["phash"], salted=True))
def s_uniq_id():
    dup_h = duplicates(df.select(F.xxhash64("image_id").alias("idh")), ["idh"], salted=False)
    noop(df.join(dup_h.select("idh").hint("broadcast"),
                 F.xxhash64("image_id") == F.col("idh"), "left_semi")
           .groupBy("image_id").count().where(F.col("count") > 1))
def s_drift():       noop(detect_drift(df, "w", "part_id", baseline_filter=F.col("part_id") < 32,
                                       lo=0.0, hi=5200.0, buckets=64))

# the two components the whole-job bench has that the noop stages above
# don't: the violations parquet sink (row_id generation + wider rows +
# parquet encode) and its read-back rollup — if the whole job anti-scales
# beyond the stage sum, it lives here
SINK = f"/dev/shm/spark-local/stage-sink-{cpus}"
def s_sink():
    v = with_validation(df.withColumn("row_id", F.monotonically_increasing_id()), FLAGSHIP_SCHEMA)
    violation_rows(v, ["image_id", "part_id", "row_id"], prefilter=~F.col("valid"),
                   with_ordinal=True) \
        .write.mode("overwrite").parquet(SINK)
def s_sink_read():
    n_rows = df.groupBy("part_id").agg(F.count(F.lit(1)).alias("n_rows"))
    n_fail = (spark.read.parquet(SINK).where(F.col("v_ord") == 0)
              .groupBy("part_id").agg(F.count(F.lit(1)).alias("n_fail")))
    noop(n_rows.join(n_fail, "part_id", "left")
         .select("part_id", "n_rows", F.coalesce("n_fail", F.lit(0)).alias("n_fail")))

stages = {"scan": s_scan, "verdicts": s_verdicts, "violations": s_violations,
          "uniq_phash": s_uniq_phash, "uniq_id": s_uniq_id, "drift": s_drift,
          "sink": s_sink, "sink_read": s_sink_read}
# warm EVERY stage's codegen on a small slice, so the first timed stage
# doesn't absorb JVM/codegen warmup relative to later ones
small = df.limit(50_000)
df, df_full = small, df
for name, fn in stages.items():
    fn()
df = df_full
out = {}
for name, fn in stages.items():
    t0 = time.monotonic(); fn(); out[name] = round(time.monotonic() - t0, 2)
print(json.dumps({"cpus": cpus, "stages": out}))
spark.stop()
"""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    if not os.path.exists(os.path.join(DATA, "_SUCCESS")):
        gen = (
            "import sys\n"
            f"sys.path.insert(0, {REPO!r})\n"
            "from pyspark.sql import SparkSession\n"
            "from json_schema_clj_spark.sources.images import images_df\n"
            "spark = (SparkSession.builder.master('local[32]')"
            ".config('spark.ui.enabled','false').config('spark.driver.memory','32g').getOrCreate())\n"
            "spark.sparkContext.setLogLevel('ERROR')\n"
            f"images_df(spark, {n}).write.mode('overwrite').parquet({DATA!r})\n"
            "spark.stop()\n"
        )
        subprocess.run([sys.executable, "-c", gen], check=True, capture_output=True, timeout=900)

    best: dict = {}
    for _ in range(rounds):
        for cpus in (2, 8):
            out = subprocess.run(
                [sys.executable, "-c", STAGES, str(cpus), DATA, REPO],
                capture_output=True, text=True, timeout=3600,
            )
            lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
            if not lines:
                sys.stderr.write(out.stderr[-3000:])
                raise RuntimeError("no result")
            res = json.loads(lines[-1])
            for k, v in res["stages"].items():
                cur = best.setdefault(k, {})
                cur[cpus] = min(cur.get(cpus, 1e9), v)
    report = {
        k: {"t2": v[2], "t8": v[8], "eff_2_8": round(v[2] / v[8] / 4.0, 3)}
        for k, v in best.items()
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()

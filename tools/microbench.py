"""Time individual registry queries at bench conditions (local[32], sf0.1).

Usage: python tools/microbench.py <query> [query ...] [--iters N] [--sf DIR]

Same session shape and warm-up as bench.py so numbers are comparable to
the clean floors in BENCH/bench_clean_r*.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    iters = 3
    sf_dir = "/root/testdata/sf0.1"
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a == "--iters":
            iters = int(argv[i + 1])
            args.remove(argv[i + 1])
        elif a == "--sf":
            sf_dir = argv[i + 1]
            args.remove(argv[i + 1])

    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("microbench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from json_schema_clj_spark.operators.validate import validate
    from json_schema_clj_spark.queries import QUERIES
    from json_schema_clj_spark.sources.images import FLAGSHIP_SCHEMA, images_df

    def materialize(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    warm = validate(
        images_df(spark, 50_000, n_parts=8), FLAGSHIP_SCHEMA,
        id_cols=["image_id"], part_col="part_id",
    )
    materialize(warm["verdicts"])

    out = {}
    for name in args:
        fn = QUERIES[name]
        best = float("inf")
        for _ in range(iters):
            t0 = time.monotonic()
            materialize(fn(spark, sf_dir))
            best = min(best, time.monotonic() - t0)
        out[name] = round(best, 3)
        print(f"{name}: {out[name]} s", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

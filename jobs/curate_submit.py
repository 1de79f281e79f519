"""Production entrypoint: the corpus-curation pipeline via spark-submit.

The curation-side sibling of jobs/validate_submit.py — the composition a
training-data run executes over a documents table, shipped as the same
kind of submission unit (package code arrives through ``--py-files``):

    python tools/build_pyfiles.py          # → dist/json_schema_clj_spark.zip
    spark-submit --master <cluster> \\
        --py-files dist/json_schema_clj_spark.zip \\
        jobs/curate_submit.py \\
        --input synth:200000 --output /data/curate1 --run-id c1

Stages (each an idempotent parquet artifact under --output; a re-run
skips every stage whose _SUCCESS marker exists — stage-level resume, the
right granularity for a pipeline of global stages, complementing the
validate job's per-partition chunk resume):

1. ``profile``    — text quality battery + Gopher repetition signals
2. ``drops``      — exact dedup (md5-normalized, min-id keeper) and
                    MinHash-LSH near-dup candidates verified by Jaccard
3. ``verdicts``   — per-doc reason, fixed precedence
                    empty > exact_dup > near_dup > low_quality > kept
4. ``redacted``   — PII-redacted text for every kept doc (+ hit counts)
5. ``pack``       — token-budget shard-span manifest over kept docs
                    (distributed prefix sum; every non-trailing bin is
                    exactly --capacity tokens)

A single JSON summary line goes to stdout and --output/summary.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help="parquet dir of (doc_id long, text string[, source]), or synth:<n_rows>")
    p.add_argument("--output", required=True)
    p.add_argument("--run-id", required=True)
    p.add_argument("--capacity", type=int, default=2048, help="tokens per training bin")
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--max-dup5", type=float, default=0.6,
                   help="drop docs whose dup-5-gram char fraction exceeds this")
    p.add_argument("--n-parts", type=int, default=32, help="synth input partitions")
    p.add_argument("--force", action="store_true", help="recompute every stage")
    p.add_argument("--fail-after-stage", type=int, default=0,
                   help="TEST HOOK: crash after N completed stages to exercise resume")
    return p.parse_args(argv)


_VOCAB = [
    "spark", "table", "row", "scan", "join", "merge", "batch", "value", "key",
    "filter", "window", "group", "order", "hash", "agg", "data", "query",
    "fast", "slow", "small", "big", "line", "part", "column", "vector",
]


def synth_documents(spark, n: int, n_parts: int):
    """Deterministic synthetic documents (no RNG): word w_j of doc d is
    vocab[xxhash64(ck, j) mod |vocab|] where ck is the content key —
    remapped to d-1 for every doc_id % 17 == 5, planting exact duplicate
    pairs (xxhash64 avalanches, so distinct ck share no content pattern and
    only the planted pairs collide); docs with doc_id % 13 == 3 get a
    planted email so the PII stage has real work."""
    from pyspark.sql import functions as F

    df = spark.range(0, n, 1, n_parts).select(F.col("id").alias("doc_id"))
    ck = F.when(F.col("doc_id") % 17 == 5, F.col("doc_id") - 1).otherwise(F.col("doc_id"))
    n_words = (ck % 40 + 8).cast("int")
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda j: F.element_at(
            vocab, (F.pmod(F.xxhash64(ck, j), len(_VOCAB)) + 1).cast("int")
        ),
    )
    text = F.concat_ws(" ", words)
    text = F.when(
        F.col("doc_id") % 13 == 3,
        F.concat(text, F.lit(" contact user"), F.col("doc_id").cast("string"),
                 F.lit("@example.com")),
    ).otherwise(text)
    return df.select("doc_id", text.alias("text"))


def main(argv=None):
    args = parse_args(argv if argv is not None else sys.argv[1:])

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName(f"curate:{args.run_id}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )

    # these imports must resolve from --py-files
    from json_schema_clj_spark.operators import dedup as D
    from json_schema_clj_spark.operators import packing as PK
    from json_schema_clj_spark.operators.curation import CurationConfig
    from json_schema_clj_spark.operators import pii as PII
    from json_schema_clj_spark.operators import text as TX

    out = args.output.rstrip("/")
    os.makedirs(out, exist_ok=True)
    t0 = time.monotonic()
    stages_run, stages_skipped = [], []
    n_done = 0

    def stage(name):
        """True if the stage must run (no _SUCCESS yet, or --force)."""
        done = os.path.exists(os.path.join(out, name, "_SUCCESS"))
        if done and not args.force:
            stages_skipped.append(name)
            return False
        stages_run.append(name)
        return True

    def commit(name):
        nonlocal n_done
        n_done += 1
        if args.fail_after_stage and n_done >= args.fail_after_stage:
            raise RuntimeError(f"TEST HOOK: injected crash after stage {name}")

    if args.input.startswith("synth:"):
        n = int(args.input.split(":", 1)[1])
        input_path = f"{out}/input"
        if not os.path.exists(os.path.join(input_path, "_SUCCESS")):
            synth_documents(spark, n, args.n_parts).write.mode("overwrite").parquet(input_path)
    else:
        input_path = args.input

    docs = spark.read.parquet(input_path).select("doc_id", "text")
    tcol = F.col("text")

    # 1. profile: quality battery + repetition signals, one artifact
    if stage("profile"):
        prof = TX.text_profile(docs).select(
            "doc_id", "n_tokens", "punct_ratio", "mean_word_len", "quality"
        )
        rep = TX.repetition_profile(docs).select("doc_id", "dup5gram_char_frac")
        prof.join(rep, "doc_id").write.mode("overwrite").parquet(f"{out}/profile")
        commit("profile")

    # 2. drops: exact dedup keeper + LSH near-dup candidates
    if stage("drops"):
        non_empty = docs.where(tcol.isNotNull() & (F.trim(tcol) != ""))
        hashed = non_empty.select("doc_id", D.text_hash(tcol).alias("th"))
        keepers = hashed.groupBy("th").agg(F.min("doc_id").alias("keep_id"))
        exact_dropped = (
            hashed.join(keepers, "th")
            .where(F.col("doc_id") != F.col("keep_id"))
            .select("doc_id", F.lit("exact_dup").alias("drop_reason"))
        )
        # near stage over the exact-dedup KEEPERS only (mirrors curate()):
        # verdict-equivalent — a dropped clone's keeper has identical text,
        # so keeper pairs subsume clone pairs — and exact-clone clusters
        # never inflate the LSH band buckets
        keeper_docs = non_empty.join(
            exact_dropped.select("doc_id"), "doc_id", "left_anti"
        )
        pairs = D.lsh_near_duplicates(
            keeper_docs, threshold=0.7,
            max_bucket_size=CurationConfig().lsh_max_bucket_size,
        )
        near_dropped = (
            pairs.select(F.greatest("id_a", "id_b").alias("doc_id"))
            .distinct()
            .withColumn("drop_reason", F.lit("near_dup"))
        )
        exact_dropped.unionByName(near_dropped).write.mode("overwrite").parquet(f"{out}/drops")
        D.release(pairs)
        commit("drops")

    # 3. verdicts: fixed reason precedence
    if stage("verdicts"):
        prof = spark.read.parquet(f"{out}/profile")
        drops = spark.read.parquet(f"{out}/drops")
        exact = drops.where(F.col("drop_reason") == "exact_dup").select(
            "doc_id", F.lit(True).alias("is_exact"))
        near = drops.where(F.col("drop_reason") == "near_dup").select(
            "doc_id", F.lit(True).alias("is_near"))
        j = (
            docs.join(prof, "doc_id", "left")
            .join(exact, "doc_id", "left")
            .join(near, "doc_id", "left")
        )
        reason = (
            F.when(tcol.isNull() | (F.trim(tcol) == ""), F.lit("empty"))
            .when(F.col("is_exact"), F.lit("exact_dup"))
            .when(F.col("is_near"), F.lit("near_dup"))
            .when(
                (F.col("n_tokens") < args.min_tokens)
                | (F.col("dup5gram_char_frac") > args.max_dup5),
                F.lit("low_quality"),
            )
            .otherwise(F.lit("kept"))
        )
        j.select("doc_id", reason.alias("reason")).write.mode("overwrite").parquet(
            f"{out}/verdicts"
        )
        commit("verdicts")

    # 4. redacted corpus for kept docs
    if stage("redacted"):
        kept = spark.read.parquet(f"{out}/verdicts").where(F.col("reason") == "kept")
        PII.pii_redact(docs.join(kept.select("doc_id"), "doc_id")).write.mode(
            "overwrite"
        ).parquet(f"{out}/redacted")
        commit("redacted")

    # 5. shard-span pack manifest over the redacted corpus
    if stage("pack"):
        red = spark.read.parquet(f"{out}/redacted").select(
            "doc_id", TX.token_count(F.col("redacted")).alias("n_tokens")
        )
        PK.pack_chunks(red, "n_tokens", "doc_id", args.capacity).write.mode(
            "overwrite"
        ).parquet(f"{out}/pack")
        commit("pack")

    verdict_counts = {
        r["reason"]: r["n"]
        for r in spark.read.parquet(f"{out}/verdicts")
        .groupBy("reason").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    red = spark.read.parquet(f"{out}/redacted")
    pack = spark.read.parquet(f"{out}/pack")
    summary = {
        "run_id": args.run_id,
        "stages_run": stages_run,
        "stages_skipped": stages_skipped,
        "verdicts": verdict_counts,
        "docs_redacted": red.count(),
        "pii_redactions": int(red.agg(F.sum("n_redactions")).first()[0] or 0),
        "bins": int(pack.agg(F.countDistinct("bin_id")).first()[0] or 0),
        "wall_sec": round(time.monotonic() - t0, 3),
    }
    line = json.dumps(summary)
    with open(f"{out}/summary.json", "w") as f:
        f.write(line + "\n")
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()

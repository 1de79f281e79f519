"""Resumable per-partition run manifest (north rule: "resumable from a
checkpointed per-partition manifest (snapshot id + partition lineage +
metrics rows), idempotent re-run skips committed partitions").

Design (works on plain parquet here; the snapshot id generalizes to an
Iceberg snapshot when an Iceberg catalog is present):

* A run is identified by (run_id, snapshot_id) where snapshot_id pins the
  input version (Iceberg snapshot / parquet content fingerprint).
* Work is chunked by the table's partition key.  After a chunk's outputs
  are durably written, ONE manifest row `(run_id, snapshot_id, part,
  n_rows, n_fail, wall_sec, committed_at)` is appended — the commit point.
* Resume = read the manifest, broadcast-anti-join the committed partition
  list against the partition key: only uncommitted partitions are
  reprocessed.  Re-running a committed partition is impossible, so the
  whole pipeline is idempotent under kill/retry.

At 10^12 rows the manifest has |partitions| rows — trivially small — and
the skip-filter is a partition-pruning predicate, so a resume doesn't even
scan committed input partitions when the table is partition-laid-out.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("snapshot_id", T.StringType()),
        T.StructField("part", T.LongType()),
        T.StructField("n_rows", T.LongType()),
        T.StructField("n_fail", T.LongType()),
        T.StructField("wall_sec", T.DoubleType()),
        T.StructField("committed_at", T.DoubleType()),
    ]
)


# Snapshot-provider interface: a provider maps an input DataFrame to a
# snapshot id string, or None to decline.  Providers are tried in
# registration order (latest first); the parquet-listing fingerprint is the
# always-available fallback.  With Iceberg jars on the classpath, register
#   register_snapshot_provider(lambda df: str(
#       df.sparkSession.sql(f"SELECT snapshot_id FROM {tbl}.snapshots "
#                           "ORDER BY committed_at DESC LIMIT 1").first()[0]))
# (or read df's Iceberg scan's snapshot directly) and every manifest row
# pins the true Iceberg snapshot with no other code change.
SnapshotProvider = Callable[[DataFrame], Optional[str]]
_SNAPSHOT_PROVIDERS: list[SnapshotProvider] = []


def register_snapshot_provider(provider: SnapshotProvider) -> None:
    """Install an input-version provider (e.g. Iceberg `snapshot_id()`)
    consulted before the parquet-listing fallback."""
    _SNAPSHOT_PROVIDERS.insert(0, provider)


def clear_snapshot_providers() -> None:
    _SNAPSHOT_PROVIDERS.clear()


def parquet_listing_fingerprint(df: DataFrame) -> str:
    """Fallback content fingerprint for plain-parquet inputs: hash of the
    sorted file listing."""
    files = sorted(df.inputFiles())
    import hashlib

    return hashlib.sha256("\n".join(files).encode()).hexdigest()[:16]


def snapshot_id_of(df: DataFrame) -> str:
    """Input-version id for manifest rows: first willing registered
    provider (Iceberg snapshot when available), else the parquet-listing
    fingerprint."""
    for provider in _SNAPSHOT_PROVIDERS:
        sid = provider(df)
        if sid is not None:
            return sid
    return parquet_listing_fingerprint(df)


class Manifest:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def read(self) -> DataFrame:
        try:
            return self.spark.read.schema(MANIFEST_SCHEMA).parquet(self.path)
        except Exception:
            return self.spark.createDataFrame([], MANIFEST_SCHEMA)

    def committed_parts(self, run_id: str, snapshot_id: str) -> list[int]:
        m = self.read()
        return [
            r["part"]
            for r in m.where(
                (F.col("run_id") == run_id) & (F.col("snapshot_id") == snapshot_id)
            )
            .select("part")
            .distinct()
            .collect()
        ]

    def commit(self, rows: list[dict]):
        df = self.spark.createDataFrame(
            [
                (
                    r["run_id"], r["snapshot_id"], int(r["part"]), int(r["n_rows"]),
                    int(r["n_fail"]), float(r["wall_sec"]), float(r["committed_at"]),
                )
                for r in rows
            ],
            MANIFEST_SCHEMA,
        )
        df.write.mode("append").parquet(self.path)


def run_resumable(
    spark: SparkSession,
    df: DataFrame,
    part_col: str,
    process_chunk: Callable[[DataFrame, list[int]], DataFrame],
    manifest_path: str,
    run_id: str,
    snapshot_id: Optional[str] = None,
    chunk_size: int = 8,
) -> dict:
    """Process a partitioned table in resumable chunks.

    `process_chunk(chunk_df, parts)` must durably write the chunk's outputs
    and return a DataFrame of per-partition metrics `(part, n_rows,
    n_fail)`.  Partitions already committed for (run_id, snapshot_id) are
    skipped — the skip predicate `part_col IN (...)` prunes at scan time.

    Returns {"processed": [...], "skipped": [...]}.
    """
    snapshot_id = snapshot_id or snapshot_id_of(df)
    manifest = Manifest(spark, manifest_path)
    done = set(manifest.committed_parts(run_id, snapshot_id))

    all_parts = sorted(
        r[0] for r in df.select(F.col(part_col).cast("long")).distinct().collect()
    )
    todo = [p for p in all_parts if p not in done]

    processed = []
    for i in range(0, len(todo), chunk_size):
        parts = todo[i : i + chunk_size]
        t0 = time.monotonic()
        chunk = df.where(F.col(part_col).cast("long").isin(parts))
        metrics = process_chunk(chunk, parts)
        rows = [
            {
                "run_id": run_id,
                "snapshot_id": snapshot_id,
                "part": m["part"],
                "n_rows": m["n_rows"],
                "n_fail": m["n_fail"],
                "wall_sec": time.monotonic() - t0,
                "committed_at": time.time(),
            }
            for m in metrics.collect()
        ]
        manifest.commit(rows)  # the commit point — crash before = chunk reruns
        processed.extend(parts)
    return {"processed": processed, "skipped": sorted(done), "snapshot_id": snapshot_id}

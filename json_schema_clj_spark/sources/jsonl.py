"""Newline-delimited JSON file source — the table-ingest path for the
reference's native input shape (one JSON document per file read via
slurp+cheshire, test/json_schema/utils.clj:46; at 10^12 documents the
line-delimited directory layout is the distributed analog).

Reads with ``spark.read.text``, NOT ``spark.read.json``: the json reader
infers ONE global struct and silently NULLs/coerces every field that does
not fit it, which would turn reference type-errors into passes.  Here the
raw line rides along untouched and parsing happens INSIDE the validator
(``try_parse_json``), so a malformed line becomes a per-row ``$parse``
violation instead of a job failure — at 10^12 rows one bad record must
not abort the run.  A literal ``null`` document parses to a variant null
(not SQL NULL), so it validates like the reference's nil document rather
than being flagged malformed (pinned by test).

Blank/whitespace-only lines are formatting, not documents — dropped.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_jsonl(
    spark: SparkSession, path: str, json_col: str = "doc_json"
) -> DataFrame:
    """(ingest_id, <json_col>) per non-blank line.  ``ingest_id`` is a
    within-run identifier (monotonically_increasing_id — unique this run,
    NOT stable across repartitionings; carry a real key inside the
    documents for cross-run identity)."""
    raw = spark.read.text(path)
    return raw.where(F.length(F.trim(F.col("value"))) > 0).select(
        F.monotonically_increasing_id().alias("ingest_id"),
        F.col("value").alias(json_col),
    )


def validate_jsonl(
    spark: SparkSession,
    path: str,
    schema: dict,
    config: Optional[dict] = None,
    json_col: str = "doc_json",
) -> DataFrame:
    """Read a jsonl directory/file and validate every document against
    `schema`: ingest rows + ``valid`` + ``violations`` (malformed lines
    get the single ``$parse`` violation).  Same backend dispatch as
    ``engine.validate_json_column`` (variant → python fallback)."""
    from ..engine import validate_json_column

    return validate_json_column(
        read_jsonl(spark, path, json_col=json_col),
        schema,
        json_col=json_col,
        config=config,
    )


def read_jsonl_stream(
    spark: SparkSession, path: str, json_col: str = "doc_json"
) -> DataFrame:
    """Streaming twin of read_jsonl: readStream.text over a landing
    directory — new files become micro-batches.  No ingest_id (a
    monotonic id is only meaningful within one batch run); documents
    should carry their own key."""
    raw = spark.readStream.text(path)
    return raw.where(F.length(F.trim(F.col("value"))) > 0).select(
        F.col("value").alias(json_col)
    )


def validate_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: dict,
    config: Optional[dict] = None,
    json_col: str = "doc_json",
) -> DataFrame:
    """Streaming validation of a jsonl landing directory.  The compiled
    check tree is stateless, so the batch facade applies unchanged to the
    streaming DataFrame (same plan per micro-batch); route the result to
    a sink / foreachBatch like any validated stream."""
    from ..engine import validate_json_column

    return validate_json_column(
        read_jsonl_stream(spark, path, json_col=json_col),
        schema,
        json_col=json_col,
        config=config,
    )

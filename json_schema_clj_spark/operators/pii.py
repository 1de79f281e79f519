"""PII detection and redaction over text columns — the compliance pass a
training-data pipeline runs before anything ships: count pattern hits per
document (scan) and rewrite the text with typed placeholders (redact).

Pure Column expressions; every pattern is written in the Java-regex /
RE2 common subset (same discipline as the `format` keyword table and the
format-conformance profile, operators/stats.py) so a DuckDB oracle
replicates hit counts and redacted text byte-for-byte.  Both engines use
leftmost non-overlapping matching and global replacement, so multi-pattern
redaction applied in the same fixed order is deterministic and identical.

Scale shape: per-row predicates over the scan — no shuffle, no Python,
fully pipeline-able with whatever else reads the text column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ordered dict: redaction applies in insertion order (email first — a
# redacted [EMAIL] token contains no digits, so later numeric patterns
# can't re-match inside it; the order is part of the operator contract
# and mirrored verbatim in the SQL oracle)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def pii_counts(text: Column, patterns: dict[str, str] | None = None) -> dict[str, Column]:
    """Per-type hit count: size(regexp_extract_all(...)) — identical
    non-overlapping leftmost semantics in Spark and DuckDB."""
    pats = patterns or PII_PATTERNS
    return {name: F.size(F.regexp_extract_all(text, F.lit(pat), 0)) for name, pat in pats.items()}


def pii_redact_text(text: Column, patterns: dict[str, str] | None = None) -> Column:
    """Replace every match with its typed placeholder, applying patterns in
    dict order (order matters when pattern languages overlap — pinned here
    and mirrored in the oracle)."""
    pats = patterns or PII_PATTERNS
    out = text
    for name, pat in pats.items():
        out = F.regexp_replace(out, pat, f"[{name.upper()}]")
    return out


def pii_scan(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Per-document hit counts per PII type plus the total."""
    pats = patterns or PII_PATTERNS
    counts = pii_counts(F.col(text_col), pats)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        *[c.alias(f"n_{name}") for name, c in counts.items()],
        total.alias("n_pii"),
    )


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """(id, redacted text, n_redactions) — the write-side of the pass."""
    pats = patterns or PII_PATTERNS
    counts = pii_counts(F.col(text_col), pats)
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    return df.select(
        F.col(id_col),
        pii_redact_text(F.col(text_col), pats).alias("redacted"),
        total.alias("n_redactions"),
    )

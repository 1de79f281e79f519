"""The one-call curate() API (operators/curation.py) — the library twin of
jobs/curate_submit.py: verdict precedence, gate configurability, PII
redaction of the kept corpus, packing, and the release() handle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from json_schema_clj_spark.operators.curation import (
    CurationConfig,
    curate,
    curation_verdicts,
)

LONG = " ".join(f"w{i}" for i in range(40))  # 40 distinct tokens, no PII


def corpus(spark):
    rows = [
        (0, LONG),                                # kept
        (1, LONG),                                # exact dup of 0 -> dropped
        (2, LONG + " tail"),                      # near dup of 0 -> dropped (larger id)
        (3, "tiny doc"),                          # too_short
        (4, None),                                # empty
        (5, "   "),                               # empty (blank)
        (6, " ".join(f"u{i}" for i in range(30)) + " mail me at a@b.com"),  # kept + PII
        (7, "one two three four five six seven"), # kept when min_tokens<=7
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def reasons(df):
    return {r["doc_id"]: r["reason"] for r in df.collect()}


def test_precedence_and_verdicts(spark):
    res = curate(corpus(spark), CurationConfig(min_tokens=5, near_method="jaccard",
                                               near_threshold=0.6))
    r = reasons(res.verdicts)
    assert r[0] == "kept"
    assert r[1] == "exact_dup"      # exact wins over near (both pairs fire)
    assert r[2] == "near_dup"
    assert r[3] == "too_short"
    assert r[4] == "empty" and r[5] == "empty"
    assert r[6] == "kept" and r[7] == "kept"
    v = {row["doc_id"]: row["verdict"] for row in res.verdicts.collect()}
    assert v[0] == "keep" and v[1] == "drop"
    res.release()


def test_kept_is_redacted_with_counts(spark):
    res = curate(corpus(spark), CurationConfig(min_tokens=5, near_method="jaccard",
                                               near_threshold=0.6))
    kept = {r["doc_id"]: r for r in res.kept.collect()}
    assert set(kept) == {0, 6, 7}
    assert "a@b.com" not in kept[6]["text"] and kept[6]["n_redactions"] == 1
    assert kept[0]["n_redactions"] == 0
    # n_tokens counted on the redacted text
    assert kept[7]["n_tokens"] == 7
    res.release()


def test_redaction_off_passthrough(spark):
    res = curate(corpus(spark), CurationConfig(min_tokens=5, redact_pii=False,
                                               near_method="jaccard", near_threshold=0.6))
    row = res.kept.where(F.col("doc_id") == 6).first()
    assert "a@b.com" in row["text"] and row["n_redactions"] == 0
    res.release()


def test_packing_capacity_invariant(spark):
    res = curate(corpus(spark), CurationConfig(min_tokens=5, capacity=16,
                                               near_method="jaccard", near_threshold=0.6))
    spans = res.pack.collect()
    per_bin = {}
    for s in spans:
        per_bin[s["bin_id"]] = per_bin.get(s["bin_id"], 0) + s["span_len"]
    last = max(per_bin)
    assert all(t == 16 for b, t in per_bin.items() if b != last)
    assert sum(per_bin.values()) == sum(
        r["n_tokens"] for r in res.kept.collect()
    )
    res.release()


def test_gates_disabled_and_extra_gates(spark):
    # every gate off: only empty/dup reasons remain
    cfg = CurationConfig(min_tokens=None, near_threshold=None)
    r = reasons(curation_verdicts(corpus(spark), cfg))
    assert r[3] == "kept" and r[1] == "exact_dup" and r[4] == "empty"
    # max_tokens + punct gates fire
    cfg2 = CurationConfig(min_tokens=None, near_threshold=None,
                          max_tokens=10, max_punct_ratio=0.15)
    docs = corpus(spark).unionByName(
        spark.createDataFrame([(8, "!!! ??? !!! bang bang bang")],
                              "doc_id long, text string")
    )
    r2 = reasons(curation_verdicts(docs, cfg2))
    assert r2[0] == "too_long" and r2[8] == "too_much_punct"


def test_repetition_gate(spark):
    docs = spark.createDataFrame(
        [(0, LONG), (1, "spam ham " * 30)], "doc_id long, text string"
    )
    cfg = CurationConfig(min_tokens=None, near_threshold=None, max_dup5=0.5)
    r = reasons(curation_verdicts(docs, cfg))
    assert r[1] == "too_repetitive" and r[0] == "kept"


def test_lsh_path_finds_planted_clone(spark):
    # LSH needs enough shingles to band; use two 40-token docs, one a clone
    docs = spark.createDataFrame(
        [(0, LONG), (1, LONG), (2, " ".join(f"z{i}" for i in range(40)))],
        "doc_id long, text string",
    )
    res = curate(docs, CurationConfig(min_tokens=None, near_method="lsh",
                                      near_threshold=0.5))
    r = reasons(res.verdicts)
    # the clone is caught by the EXACT stage first; precedence holds on LSH path
    assert r[1] == "exact_dup" and r[0] == "kept" and r[2] == "kept"
    assert res._deps is not None  # LSH persisted its signature frame
    res.release()


def test_config_validation():
    with pytest.raises(ValueError):
        CurationConfig(near_method="cosine")
    with pytest.raises(ValueError):
        CurationConfig(capacity=0)


def test_string_ids_supported(spark):
    docs = spark.createDataFrame(
        [("a", LONG), ("b", LONG), ("c", "too tiny")], "doc_id string, text string"
    )
    cfg = CurationConfig(min_tokens=5, near_threshold=None)
    r = reasons(curation_verdicts(docs, cfg))
    assert r["a"] == "kept" and r["b"] == "exact_dup" and r["c"] == "too_short"


def test_near_stage_runs_on_exact_keepers_only(spark):
    """The near-dup stage must see the exact-dedup KEEPERS, not the raw
    corpus: 60 exact clones would push every base-text shingle over
    max_shingle_freq=50 (stop-shingle guard), hiding the planted near
    pair — over keepers each shingle's frequency is ~1 and the pair is
    found.  Also pins verdict equivalence: clones stay exact_dup."""
    base_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base_text) for i in range(60)] + [(900, base_text + " lam")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    cfg = CurationConfig(
        min_tokens=None, near_threshold=0.6, near_method="jaccard",
        max_shingle_freq=50, redact_pii=False,
    )
    res = curate(docs, cfg)
    got = {r["doc_id"]: r["reason"] for r in res.verdicts.collect()}
    res.release()
    assert got[0] == "kept"
    assert all(got[i] == "exact_dup" for i in range(1, 60))
    assert got[900] == "near_dup"


def test_lsh_hot_bucket_knob_boundary(spark):
    """The exposed lsh_max_bucket_size knob's documented recall boundary:
    with a cap SMALLER than a near-dup cluster, every band bucket of the
    cluster is hot, pairs are dropped, and all members are KEPT; the
    default cap (larger than the cluster) dedups them down to one."""
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(i, base + f" variant {i % 2}") for i in range(6)]
    # 6 docs in 2 exact-identical groups of 3 -> exact dedup keeps 2
    # keepers whose texts are near-dups of each other
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    dedup_cfg = CurationConfig(min_tokens=2, near_threshold=0.5, redact_pii=False)
    res = curate(docs, dedup_cfg)
    r = {row["doc_id"]: row["reason"] for row in res.verdicts.collect()}
    assert r[0] == "kept" and r[1] == "near_dup"  # keepers 0,1: near pair fires
    res.release()

    capped_cfg = CurationConfig(
        min_tokens=2, near_threshold=0.5, redact_pii=False, lsh_max_bucket_size=1
    )
    res2 = curate(docs, capped_cfg)
    r2 = {row["doc_id"]: row["reason"] for row in res2.verdicts.collect()}
    # cap 1 < cluster size 2: both keepers' buckets are hot, the pair is
    # dropped, both survive — the boundary the docstring promises
    assert r2[0] == "kept" and r2[1] == "kept"
    res2.release()

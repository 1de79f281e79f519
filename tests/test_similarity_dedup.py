"""Dedup + similarity operator semantics: exact dedup, minhash≈jaccard,
LSH candidate soundness, simhash, ANN recall vs brute force."""

import pytest
from pyspark.sql import functions as F

from json_schema_clj_spark.operators import dedup as D
from json_schema_clj_spark.operators import similarity as S

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet")
    # add exact duplicates with known ids
    dups = base.where(F.col("doc_id") < 5).withColumn("doc_id", F.col("doc_id") + 100000)
    return base.unionByName(dups)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_exact_duplicate_groups(docs):
    groups = D.exact_duplicate_groups(docs).collect()
    assert len(groups) == 5
    assert all(g["n"] == 2 for g in groups)


def test_exact_dedup_keeps_min_id(docs):
    out = D.exact_dedup(docs)
    assert out.count() == docs.count() - 5
    # originals (min ids) survive
    assert out.where(F.col("doc_id") >= 100000).count() == 0


def test_minhash_estimates_jaccard(spark, docs):
    # exact duplicates must have identical signatures (sim 1.0)
    pairs = D.lsh_near_duplicates(docs, threshold=0.9)
    found = {(r["id_a"], r["id_b"]): r["sim"] for r in pairs.collect()}
    for i in range(5):
        assert found.get((i, i + 100000)) == 1.0, (i, found)


def test_lsh_subset_of_true_jaccard(docs):
    # every LSH pair at sim>=0.8 must be a true high-Jaccard pair
    lsh = {(r["id_a"], r["id_b"]) for r in D.lsh_near_duplicates(docs, threshold=0.8).collect()}
    true = {
        (r["id_a"], r["id_b"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert lsh <= true or len(lsh - true) <= max(1, len(lsh) // 10)  # MinHash is an estimator


def test_simhash_exact_dups_zero_hamming(docs):
    cands = D.simhash_candidates(docs, max_hamming=0)
    found = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    for i in range(5):
        assert (i, i + 100000) in found


def test_ann_lsh_recall(emb):
    queries = emb.where(F.col("vec_id") < 20)
    exact = S.brute_force_topk(emb, queries, k=10)
    approx = S.lsh_topk(emb, queries, k=10)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.3, recall  # candidate-band ANN: partial recall by design


def test_brute_force_topk_correct(emb):
    out = S.brute_force_topk(emb, emb.where(F.col("vec_id") == 0), k=5).collect()
    assert len(out) == 5
    scores = [r["score"] for r in sorted(out, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)
    assert all(r["neighbor_id"] != 0 for r in out)


def test_signature_udf_matches_column_path(emb):
    """The Arrow-batched signature (BLAS matmul over the driver-evaluated
    sign matrix) must reproduce the Column HOF definition bit-for-bit."""
    from pyspark.sql import functions as F

    center = S.mean_vector(emb, "embedding", 64)
    col_sig = emb.select(
        "vec_id",
        S.hyperplane_signature(F.col("embedding"), 64, 12, 11, center=center).alias("s_col"),
    )
    udf_sig = S.with_signature(
        emb.select("vec_id", "embedding"), "embedding", "s_udf", 64, 12, 11, center
    ).select("vec_id", "s_udf")
    j = col_sig.join(udf_sig, "vec_id")
    assert j.where(F.col("s_col") != F.col("s_udf")).count() == 0


def test_minhash_single_doc_batch_no_phantom_shingles(spark):
    # regression: the vectorized shingler used np.roll, which wraps the
    # batch array — a 1-row Arrow batch (or the LAST doc of any batch)
    # fabricated shingles joining the doc's tail words to its head, making
    # signatures batch-layout dependent.  Signatures must be identical
    # whether the doc is alone in its batch or not, and wherever it sits.
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "other words entirely here now"),
        (3, "more filler text tokens present"),
    ]
    schema = "doc_id long, text string"
    many = spark.createDataFrame(rows, schema).coalesce(1)
    sig_many = {r["id"]: r["sig"] for r in D.minhash_signatures(many).collect()}
    for doc_id, text in rows:
        alone = spark.createDataFrame([(doc_id, text)], schema).coalesce(1)
        sig_alone = D.minhash_signatures(alone).collect()[0]["sig"]
        assert sig_alone == sig_many[doc_id], doc_id


def test_minhash_all_short_partition_empty_sig_batch(spark):
    # regression: a partition where EVERY doc has < k words yields an empty
    # frame whose bare-[] sig column defaulted to float64 — Arrow cannot
    # convert that to list<int64> and the whole stage crashed.  Mixed and
    # all-short layouts must both produce signatures only for shingleable
    # docs.
    schema = "doc_id long, text string"
    all_short = spark.createDataFrame([(1, "just two"), (2, "one")], schema).coalesce(1)
    assert D.minhash_signatures(all_short, k=3).collect() == []
    mixed = spark.createDataFrame(
        [(1, "just two"), (2, "alpha beta gamma delta")], schema
    ).repartition(4)
    got = D.minhash_signatures(mixed, k=3).collect()
    assert [r["id"] for r in got] == [2] and len(got[0]["sig"]) == 64


def test_minhash_md5_finds_exact_dups(docs):
    # planted exact duplicates (jaccard 1.0) must surface with sim 1.0;
    # every reported pair's sim is a multiple of 1/bands in [0.25, 1]
    pairs = D.minhash_md5_near_duplicates(docs, k=3, bands=8, threshold=0.25).collect()
    planted = {(r["id_a"], r["id_b"]): r["sim"] for r in pairs}
    originals = [r["doc_id"] for r in docs.where(F.col("doc_id") < 5).collect()]
    for i in originals:
        assert planted.get((i, i + 100000)) == 1.0
    assert all(0.25 <= r["sim"] <= 1.0 and round(r["sim"] * 8) == r["sim"] * 8 for r in pairs)


def test_ivf_topk_subset_and_kmeans(emb):
    queries = emb.where(F.col("vec_id") < 3)
    exact = {
        (r["query_id"], r["neighbor_id"]): r["rank"]
        for r in S.brute_force_topk(emb, queries, k=50).collect()
    }
    approx = S.ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=4).collect()
    # every IVF hit is a true neighbor pair (scores come from the same exact
    # rerank), and ranks within a query are 1..n without gaps
    by_q = {}
    for r in approx:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for q, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    # probing 4/16 cells must still recover a decent share of the true top-50
    hits = sum(1 for key in ((r["query_id"], r["neighbor_id"]) for r in approx) if key in exact)
    assert hits >= len(approx) * 0.3

    cents = S._centroid_matrix(emb, "vec_id", "embedding", 8)
    refined = S.kmeans_refine(emb, cents, iters=1)
    assert refined.shape == cents.shape
    assert not (refined == cents).all()


def test_connected_components_chain_and_islands(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 3)], "id_a long, id_b long"
    )
    got = {r["id"]: r["cluster_id"] for r in D.connected_components(pairs).collect()}
    # chain 1-2-3-9 collapses to min label 1 (needs >1 propagation round);
    # island 5-6 keeps min 5
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}


def test_cluster_components_cover_exact_dups(docs):
    cc = D.connected_components(
        D.minhash_md5_near_duplicates(docs, k=3, bands=8, threshold=0.25)
    ).collect()
    labels = {r["id"]: r["cluster_id"] for r in cc}
    # each planted duplicate (doc_id + 100000) lands in its original's cluster
    for i in [r["doc_id"] for r in docs.where(F.col("doc_id") < 5).collect()]:
        assert labels.get(i + 100000) == labels.get(i) == i


def test_simhash_md5_exact_dups_zero_hamming(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in D.simhash_md5_candidates(docs, max_hamming=3).collect()}
    for i in [r["doc_id"] for r in docs.where(F.col("doc_id") < 5).collect()]:
        assert pairs.get((i, i + 100000)) == 0


def test_connected_components_star_chain_and_islands(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 3)], "id_a long, id_b long"
    )
    got = {r["id"]: r["cluster_id"] for r in D.connected_components_star(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}


def test_connected_components_star_matches_min_label(spark, docs):
    pairs = D.minhash_md5_near_duplicates(docs, k=3, bands=8, threshold=0.25)
    a = {(r["id"], r["cluster_id"]) for r in D.connected_components(pairs).collect()}
    b = {(r["id"], r["cluster_id"]) for r in D.connected_components_star(pairs).collect()}
    assert a == b


def test_connected_components_star_long_chain(spark):
    # 40-hop chain with adversarial id order: min-label would need 40
    # rounds; star converges in ~log rounds (verified via _cc_rounds)
    import random

    ids = list(range(41))
    random.Random(7).shuffle(ids)
    pairs = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(40)], "id_a long, id_b long"
    )
    cc = D.connected_components_star(pairs, max_iter=12)
    got = {r["cluster_id"] for r in cc.collect()}
    assert got == {0}
    assert cc._cc_rounds <= 10


def test_release_unpersists_operator_intermediates(spark, docs):
    # banded operators persist their signature frames; release() must free
    # those blocks once the caller has materialized the result
    out = D.minhash_md5_near_duplicates(docs, k=3, bands=8, threshold=0.25)
    out.count()
    deps = getattr(out, "_persisted_deps", [])
    assert deps and all(d.storageLevel.useMemory for d in deps)
    D.release(out)
    assert all(not d.storageLevel.useMemory for d in deps)


def test_lsh_incremental_cross_batch(spark, tmp_path):
    store = str(tmp_path / "lsh-store")
    base = spark.read.parquet(f"{SF}/documents.parquet")
    b1 = base.where(F.col("doc_id") < 30)
    # batch 1: pairs only within the batch (store has one subdir)
    p1 = D.lsh_incremental_near_duplicates(b1, store, "b1", threshold=0.9).collect()
    # batch 2: a clone of doc 3 (new id) + fresh docs
    clone = base.where(F.col("doc_id") == 3).withColumn("doc_id", F.lit(900000))
    b2 = base.where((F.col("doc_id") >= 30) & (F.col("doc_id") < 40)).unionByName(clone)
    p2 = {(r["id_a"], r["id_b"]): r["sim"] for r in
          D.lsh_incremental_near_duplicates(b2, store, "b2", threshold=0.9).collect()}
    # the cross-batch planted pair surfaces at sim 1.0 without re-sig'ing b1
    assert p2.get((3, 900000)) == 1.0, p2
    # every returned pair touches the new batch
    new_ids = {r["doc_id"] for r in b2.collect()}
    assert all(a in new_ids or b in new_ids for a, b in p2)
    # crash-idempotency: re-running batch 2 overwrites its own subdir and
    # returns the identical result
    p2b = {(r["id_a"], r["id_b"]): r["sim"] for r in
           D.lsh_incremental_near_duplicates(b2, store, "b2", threshold=0.9).collect()}
    assert p2 == p2b
    batches = {r["batch"] for r in
               spark.read.parquet(f"{store}/buckets").select("batch").distinct().collect()}
    assert batches == {"b1", "b2"}
    # de-amplified layout: band rows are narrow (no sig column) — the
    # signature is stored once per doc in sigs/, not `bands`× in buckets/
    assert "sig" not in spark.read.parquet(f"{store}/buckets").columns
    import os

    def du(path):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(path) for f in fs
        )

    n_docs = spark.read.parquet(f"{store}/sigs").count()
    bucket_bytes, sig_bytes = du(f"{store}/buckets"), du(f"{store}/sigs")
    # the whole narrow bucket store must be far smaller than the sig store
    # (old layout: bucket rows carried the full sig, 16x the sig bytes)
    assert bucket_bytes < sig_bytes, (bucket_bytes, sig_bytes, n_docs)


def test_connected_components_string_ids(spark):
    # regression: the old convergence checksum cast labels to decimal —
    # NULL for string ids, and NULL == NULL declared convergence after
    # round 1 with wrong clusters.  The xxhash64 checksum is type-agnostic.
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("m", "c")],
        "id_a string, id_b string",
    )
    got = {r["id"]: r["cluster_id"] for r in D.connected_components(pairs).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "m": "a", "x": "x", "y": "x"}


def test_cc_checkpoint_blocks_released(spark):
    # each round's localCheckpoint blocks must be freed as the loop
    # advances (bounded residency), and release() must free the rest
    sc = spark.sparkContext
    base = int(sc._jsc.getPersistentRDDs().size())
    ids = list(range(25))
    pairs = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(24)], "id_a long, id_b long"
    )
    out = D.connected_components(pairs, max_iter=30)
    out.count()
    # resident mid/after loop: only the final labels set (edges + all
    # intermediate label rounds released inside the loop)
    assert int(sc._jsc.getPersistentRDDs().size()) <= base + 1
    D.release(out)
    assert int(sc._jsc.getPersistentRDDs().size()) <= base

    out2 = D.connected_components_star(pairs, max_iter=30)
    out2.count()
    # resident: nodes + final edge set only
    assert int(sc._jsc.getPersistentRDDs().size()) <= base + 2
    D.release(out2)
    assert int(sc._jsc.getPersistentRDDs().size()) <= base


def test_query_wrappers_carry_release_handle(spark):
    # the shipped queries reshape operator results; the persisted-deps
    # handle must survive the reshaping or release() is a silent no-op
    from json_schema_clj_spark import queries as Q

    out = Q.QUERIES["dedup_minhash_md5"](spark, SF)
    out.count()
    deps = getattr(out, "_persisted_deps", [])
    assert deps and all(d.storageLevel.useMemory for d in deps)
    D.release(out)
    assert all(not d.storageLevel.useMemory for d in deps)


def test_hamming_near_duplicates_exact_and_guard(spark):
    from json_schema_clj_spark.operators.dedup import hamming_near_duplicates

    rows = [
        (1, 0x1111_1111_1111_1111),
        (2, 0x1111_1111_1111_1110),  # hamming 1 from row 1
        (3, 0x1111_1111_1111_0000),  # hamming 4 from row 1 (excluded), 3 from row 2
        (4, -0x0123_4567_89AB_CDF0),  # negative fingerprints are fine
        (5, -0x0123_4567_89AB_CDF0 ^ 0b101),  # hamming 2 from row 4
    ]
    df = spark.createDataFrame(rows, ["row_id", "fp"])
    out = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_near_duplicates(df, "fp", "row_id", max_hamming=3).collect()
    )
    assert out == [(1, 2, 1), (2, 3, 3), (4, 5, 2)]

    # hot-bucket guard: 10 rows sharing every chunk are dropped before the
    # self-join when the bucket cap is below the bucket size
    flat = spark.createDataFrame([(i, 7) for i in range(10)], ["row_id", "fp"])
    assert hamming_near_duplicates(flat, "fp", "row_id", max_bucket_size=5).count() == 0
    assert hamming_near_duplicates(flat, "fp", "row_id", max_bucket_size=500).count() == 45


def test_hamming_near_duplicates_plan_no_cartesian(spark):
    from json_schema_clj_spark.operators.dedup import hamming_near_duplicates

    df = spark.range(100).selectExpr("id AS row_id", "xxhash64(id) AS fp")
    plan = (
        hamming_near_duplicates(df, "fp", "row_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan


def test_exact_substring_pairs_planted_runs(spark):
    # doc 1 and 2 share one verbatim 5-token run ("lorem ipsum dolor sit
    # amet") inside otherwise-disjoint text; doc 3 shares nothing 5 tokens
    # long; doc 4 repeats doc 1 verbatim (shares ALL its windows).
    rows = [
        (1, "alpha beta lorem ipsum dolor sit amet gamma delta"),
        (2, "one two three lorem ipsum dolor sit amet four"),
        (3, "lorem ipsum dolor completely different tail here now"),
        (4, "alpha beta lorem ipsum dolor sit amet gamma delta"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for use_xxhash in (True, False):
        out = {
            (r["id_a"], r["id_b"]): r["n_shared"]
            for r in D.exact_substring_pairs(df, n=5, use_xxhash=use_xxhash).collect()
        }
        # doc1 has 5 distinct 5-windows; the shared run gives 1 window
        assert out[(1, 4)] == 5
        assert out[(1, 2)] == 1
        assert out[(2, 4)] == 1
        assert (1, 3) not in out and (2, 3) not in out and (3, 4) not in out


def test_exact_substring_hot_window_guard_and_plan(spark):
    # 60 docs all containing the same 5-token boilerplate: with the guard
    # at 50 the window is dropped (no quadratic blowup, no pairs)
    boiler = [(i, f"uniq{i}a uniq{i}b shared one two three four uniq{i}c") for i in range(60)]
    df = spark.createDataFrame(boiler, ["doc_id", "text"])
    assert D.exact_substring_pairs(df, n=5, max_window_freq=50).count() == 0
    guarded = D.exact_substring_pairs(df, n=5, max_window_freq=None)
    assert guarded.count() == 60 * 59 // 2

    plan = (
        D.exact_substring_pairs(df, n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Cartesian" not in plan, plan
    assert "BroadcastNestedLoop" not in plan, plan


def test_shared_run_pairs_span_semantics(spark):
    # docs share a verbatim 7-token run; one also shares a separate
    # 5-token run on a different diagonal
    run7 = "one two three four five six seven"
    run5 = "red green blue cyan magenta"
    rows = [
        (1, f"aa bb {run7} cc dd {run5}"),
        (2, f"xx {run7} yy zz"),          # shares the 7-run only
        (3, f"{run5} pp qq rr ss tt"),    # shares the 5-run only
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for use_xxhash in (True, False):
        out = {
            (r["id_a"], r["id_b"]): (r["max_run_tokens"], r["n_diagonals"])
            for r in D.shared_run_pairs(df, n=5, use_xxhash=use_xxhash).collect()
        }
        # 7-token run = 3 consecutive 5-windows -> span 3 + 4 = 7
        assert out[(1, 2)] == (7, 1)
        # 5-token run = single 5-window -> span 5
        assert out[(1, 3)] == (5, 1)
        assert (2, 3) not in out


def test_shared_run_pairs_identical_docs_full_span(spark):
    text = " ".join(f"tok{i}" for i in range(12))
    df = spark.createDataFrame([(1, text), (2, text)], ["doc_id", "text"])
    out = D.shared_run_pairs(df, n=5).collect()
    assert len(out) == 1 and out[0]["max_run_tokens"] == 12

    plan = D.shared_run_pairs(df, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_cross_contamination_semantics_and_plan(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely unrelated training text about spark engines"),
            (3, "quick brown fox jumps over nothing else shared here"),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame(
        [(100, "we ask whether the quick brown fox jumps over things")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: (r["n_shared_windows"], r["n_bench_docs"])
        for r in D.cross_contamination(train, bench, n=5).collect()
    }
    # doc1 shares "the quick brown fox jumps" + "quick brown fox jumps over"
    assert out[1] == (2, 1)
    # doc3 shares only "quick brown fox jumps over"
    assert out[3] == (1, 1)
    assert 2 not in out

    plan = (
        D.cross_contamination(train, bench, n=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the benchmark window set must probe via broadcast, never shuffle the
    # train side on the window key
    assert "BroadcastHashJoin" in plan, plan
    assert "Cartesian" not in plan, plan


def test_lsh_hot_bucket_guard_bounds_candidates(spark):
    """A degenerate (band,bh) bucket — 40 identical boilerplate docs share
    every band — must be dropped by the guard (pre-guard it contributes
    C(40,2)=780 quadratic pairs), while a planted clone pair in its own
    cold buckets is still found."""
    boiler = [
        (i, "the same boilerplate template text repeated on every page of the site")
        for i in range(40)
    ]
    plant_text = "a genuinely unique document about distributed validation engines at scale"
    rows = boiler + [(1000, plant_text), (2000, plant_text)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    guarded = D.lsh_near_duplicates(df, max_bucket_size=10)
    got = {(r["id_a"], r["id_b"]) for r in guarded.collect()}
    assert got == {(1000, 2000)}
    unguarded = D.lsh_near_duplicates(df, max_bucket_size=None)
    assert unguarded.count() == 780 + 1


def test_lsh_incremental_hot_bucket_guard(spark, tmp_path):
    """The incremental store's guard counts store-wide: a bucket grown hot
    across history+new batch is dropped from BOTH join sides; the planted
    cross-batch clone pair in cold buckets survives."""
    store = str(tmp_path / "lsh-guard-store")
    plant_text = "a genuinely unique document about distributed validation engines at scale"
    boiler_text = "the same boilerplate template text repeated on every page of the site"
    b0 = spark.createDataFrame(
        [(i, boiler_text) for i in range(40)] + [(1000, plant_text)],
        ["doc_id", "text"],
    )
    D.lsh_incremental_near_duplicates(b0, store, "b0", max_bucket_size=10).collect()
    b1 = spark.createDataFrame(
        [(5000, boiler_text), (2000, plant_text)], ["doc_id", "text"]
    )
    pairs = D.lsh_incremental_near_duplicates(b1, store, "b1", max_bucket_size=10)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(1000, 2000)}
    # unguarded control: the new boilerplate doc matches all 40 stored ones
    unguarded = D.lsh_incremental_near_duplicates(
        spark.createDataFrame([(5001, boiler_text)], ["doc_id", "text"]),
        store, "b2", max_bucket_size=None,
    )
    assert unguarded.count() == 41  # 40 from b0 + the b1 boilerplate doc

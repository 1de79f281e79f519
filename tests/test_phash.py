"""Perceptual-hash (pHash) unit + distributed tests.

Closed forms: a solid nonzero image has all-zero AC DCT coefficients and a
positive DC, so exactly the DC bit is set (popcount 1); solid black hashes
to 0.  Robustness: the hash is invariant under lossless round-trips and
mild quantization, and far apart for independent images — the properties
the integrity check and Hamming near-dup banding rely on.
"""

import numpy as np
import pytest

from json_schema_clj_spark.operators.multimodal import (
    decode_png,
    encode_png,
    encode_qpng,
    fake_pixels,
    phash64,
    phash_integrity,
    _resample_matrix,
)
from json_schema_clj_spark.sources.images import phash_png_images_df


def _pop(h: int) -> int:
    return bin(h & ((1 << 64) - 1)).count("1")


def _ham(a: int, b: int) -> int:
    return _pop(a ^ b)


class TestPhash64:
    def test_solid_image_has_only_dc_bit(self):
        for c in (1, 128, 255):
            h = phash64(np.full((17, 23, 3), c, np.uint8))
            assert _pop(h) == 1, f"solid {c}"
            assert h < 0  # bit 63 (DC) set → negative as signed int64

    def test_solid_black_is_zero(self):
        assert phash64(np.zeros((8, 8, 3), np.uint8)) == 0

    def test_signed_int64_range(self):
        for s in range(20):
            h = phash64(fake_pixels(str(s).encode(), 30 + s, 20 + s))
            assert -(1 << 63) <= h < (1 << 63)

    def test_lossless_roundtrip_invariant(self):
        px = fake_pixels(b"rt", 31, 19)
        assert phash64(decode_png(encode_png(px))) == phash64(px)

    def test_stable_under_mild_quantization(self):
        for s in range(10):
            px = fake_pixels(str(s).encode(), 40, 30)
            q = decode_png(encode_qpng(px, step=4))
            assert _ham(phash64(px), phash64(q)) <= 4

    def test_independent_images_are_distant(self):
        hs = [phash64(fake_pixels(str(s).encode(), 28, 22)) for s in range(12)]
        for i in range(len(hs)):
            for j in range(i + 1, len(hs)):
                assert _ham(hs[i], hs[j]) >= 10

    def test_resample_matrix_partition_of_unity(self):
        for n_in in (7, 24, 32, 100):
            R = _resample_matrix(n_in, 32)
            assert R.shape == (32, n_in)
            assert np.allclose(R.sum(axis=1), 1.0)
            assert (R >= 0).all()

    def test_resample_identity_when_sizes_match(self):
        assert np.allclose(_resample_matrix(32, 32), np.eye(32))

    def test_brightness_offset_flips_no_ac_bits(self):
        # DC excluded from the median: a global +40 brightness shift moves
        # only the DC coefficient, so AC bits are unchanged
        px = fake_pixels(b"br", 26, 18).astype(np.int32)
        lo = np.clip(px, 0, 175).astype(np.uint8)
        hi = np.clip(px + 40, 40, 215).astype(np.uint8) - 40
        assert (lo == hi).all()  # same signal, different offset below
        h_lo = phash64(lo)
        h_hi = phash64((lo.astype(np.int32) + 40).astype(np.uint8))
        assert _ham(h_lo, h_hi) <= 1  # at most the DC bit differs


class TestPhashIntegrity:
    def test_statuses_and_hamming(self, spark):
        df = phash_png_images_df(spark, 80, seed=5, tamper_every=20, corrupt_every=40)
        rows = {r["image_id"]: r for r in phash_integrity(df).collect()}
        assert len(rows) == 80
        for i in range(80):
            r = rows[f"img-{i:08d}"]
            if i % 40 == 7:
                assert r["status"] == "decode_fail" and r["computed_phash"] is None
            elif i % 20 == 3:
                assert r["status"] == "mismatch" and r["hamming"] == 2
            else:
                assert r["status"] == "match" and r["hamming"] == 0
                assert r["computed_phash"] == r["stored_phash"]

    def test_max_hamming_tolerance(self, spark):
        # with tolerance ≥ 2 the 2-bit tamper plant reads as a match
        df = phash_png_images_df(spark, 40, seed=5, tamper_every=20)
        out = phash_integrity(df, max_hamming=2).groupBy("status").count().collect()
        assert {r["status"]: r["count"] for r in out} == {"match": 40}

    def test_missing_phash_status(self, spark):
        from pyspark.sql import functions as F

        df = phash_png_images_df(spark, 10, seed=5).withColumn(
            "phash", F.when(F.col("image_id") == "img-00000003", None).otherwise(F.col("phash"))
        )
        out = {r["image_id"]: r["status"] for r in phash_integrity(df).collect()}
        assert out["img-00000003"] == "missing_phash"
        assert sum(1 for s in out.values() if s == "match") == 9

    def test_compute_phashes_matches_local(self, spark):
        from json_schema_clj_spark.operators.multimodal import compute_phashes

        df = phash_png_images_df(spark, 30, seed=5, corrupt_every=40)
        out = {r["image_id"]: r for r in compute_phashes(df).collect()}
        assert len(out) == 30
        for i in range(30):
            r = out[f"img-{i:08d}"]
            if i % 40 == 7:
                assert r["decoded"] is False and r["phash"] is None
            else:
                px = fake_pixels(f"5:{i}".encode(), 24 + i % 9, 16 + i % 7)
                assert r["decoded"] is True and r["phash"] == phash64(px)

    def test_pipeline_neardup_planted_pairs(self, spark):
        from json_schema_clj_spark.operators.dedup import hamming_near_duplicates
        from json_schema_clj_spark.operators.multimodal import compute_phashes
        from json_schema_clj_spark.sources.images import phash_pair_images_df
        from pyspark.sql import functions as F

        corpus = phash_pair_images_df(spark, 60, clone_every=10, seed=7)
        hashed = compute_phashes(corpus).where(F.col("decoded"))
        pairs = hamming_near_duplicates(hashed, "phash", "image_id", max_hamming=3)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        want = {(f"img-{i:08d}", f"img-{i + 1_000_000:08d}") for i in range(60) if i % 10 == 4}
        assert got == want

    def test_single_arrow_stage_plan(self, spark):
        # one mapInPandas over the scan: exactly one ArrowEval/MapInPandas
        # node and no Exchange before it
        df = phash_png_images_df(spark, 10, seed=5)
        plan = phash_integrity(df)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("MapInPandas") == 2  # corpus gen + integrity check
        assert "Exchange" not in plan

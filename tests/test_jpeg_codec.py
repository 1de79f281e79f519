"""Baseline JPEG codec (functions/jpeg.py): roundtrip PSNR bands, restart
intervals, decoder robustness/generality, and the distributed real-JPEG
PSNR-invariant query with its plant-derived margins."""

import struct

import numpy as np
import pytest

from json_schema_clj_spark.functions.jpeg import decode_jpeg, encode_jpeg
from json_schema_clj_spark.operators.multimodal import psnr, smooth_pixels


def _img(w=51, h=37, seed=b"jpeg-test"):
    return smooth_pixels(seed, w, h)


def test_roundtrip_quality_bands():
    px = _img()
    for sub in ("444", "420"):
        hi = psnr(px, decode_jpeg(encode_jpeg(px, quality=95, subsampling=sub)))
        lo = psnr(px, decode_jpeg(encode_jpeg(px, quality=6, subsampling=sub)))
        assert hi >= 44.0, (sub, hi)
        assert lo < 36.0, (sub, lo)
        assert hi > lo  # more quantization, more error


def test_dimensions_not_multiple_of_mcu():
    # exercise edge padding: sizes straddling 8- and 16-multiples
    for w, h in [(8, 8), (9, 7), (17, 16), (24, 22), (33, 31)]:
        px = _img(w, h)
        for sub in ("444", "420"):
            out = decode_jpeg(encode_jpeg(px, quality=95, subsampling=sub))
            assert out.shape == (h, w, 3)


def test_restart_interval_bit_equivalent():
    px = _img(41, 29)
    base = decode_jpeg(encode_jpeg(px, quality=92))
    for ri in (1, 2, 5):
        out = decode_jpeg(encode_jpeg(px, quality=92, restart_interval=ri))
        # restart markers change framing, not coefficients: pixel-identical
        assert np.array_equal(base, out), ri


def test_determinism():
    px = _img(30, 20)
    assert encode_jpeg(px, quality=90) == encode_jpeg(px, quality=90)


def test_truncated_raises():
    data = encode_jpeg(_img(24, 16), quality=90)
    with pytest.raises(ValueError):
        decode_jpeg(data[: len(data) // 3])
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG")  # not a JPEG at all


def test_relabelled_progressive_sof_is_malformed():
    # SOF2 decodes for real now (functions/jpeg_progressive.py), so a
    # BASELINE scan relabelled progressive is malformed input (its one
    # interleaved scan claims Ss=0..Se=63, illegal for a progressive DC
    # scan) — ValueError, not NotImplementedError
    data = bytearray(encode_jpeg(_img(24, 16), quality=90))
    i = bytes(data).find(b"\xff\xc0")
    assert i > 0
    data[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_arithmetic_sof_raises():
    data = bytearray(encode_jpeg(_img(24, 16), quality=90))
    i = bytes(data).find(b"\xff\xc0")
    assert i > 0
    data[i + 1] = 0xC9  # SOF9: arithmetic sequential — out of scope
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(data))


def _widen_dqt_to_16bit(data: bytes) -> bytes:
    """Rewrite every 8-bit DQT table as the equivalent 16-bit (Pq=1) one —
    a spec-legal encoding our encoder never emits, to cover the decoder's
    16-bit quant path."""
    out = bytearray()
    pos = 0
    while pos < len(data) - 1:
        if data[pos] == 0xFF and data[pos + 1] == 0xDB:
            (ln,) = struct.unpack(">H", data[pos + 2 : pos + 4])
            payload = data[pos + 4 : pos + 2 + ln]
            new_payload = bytearray()
            p = 0
            while p < len(payload):
                tq = payload[p] & 0xF
                vals = payload[p + 1 : p + 65]
                new_payload.append(0x10 | tq)
                for v in vals:
                    new_payload += struct.pack(">H", v)
                p += 65
            out += b"\xff\xdb" + struct.pack(">H", len(new_payload) + 2) + new_payload
            pos += 2 + ln
        else:
            out.append(data[pos])
            pos += 1
    out.append(data[-1])
    return bytes(out)


def test_16bit_dqt_decodes_identically():
    data = encode_jpeg(_img(25, 17), quality=85)
    wide = _widen_dqt_to_16bit(data)
    assert wide != data
    assert np.array_equal(decode_jpeg(data), decode_jpeg(wide))


def test_corpus_psnr_margins():
    """The plant margins the images_jpeg_psnr_invariant oracle relies on,
    pinned over the full corpus id range: every quality-95 row (mixed
    4:4:4 / 4:2:0 / restart-interval) clears 40 dB with >= 4 dB to spare,
    every quality-6 row misses it by >= 6 dB."""
    seed = 5
    pass_min, fail_max = float("inf"), 0.0
    for i in range(200):
        w, h = 24 + i % 9, 16 + i % 7
        px = smooth_pixels(f"{seed}:{i}".encode(), w, h)
        if i % 20 == 3:
            p = psnr(px, decode_jpeg(encode_jpeg(px, quality=6)))
            fail_max = max(fail_max, p)
        else:
            p = psnr(
                px,
                decode_jpeg(
                    encode_jpeg(
                        px, quality=95,
                        subsampling="420" if i % 5 == 0 else "444",
                        restart_interval=2 if i % 3 == 0 else 0,
                    )
                ),
            )
            pass_min = min(pass_min, p)
    assert pass_min >= 44.0, pass_min
    assert fail_max < 34.0, fail_max


def test_grayscale_roundtrip():
    from json_schema_clj_spark.functions.jpeg import encode_jpeg_gray

    px = _img(33, 25)[..., 0]  # single channel
    out = decode_jpeg(encode_jpeg_gray(px, quality=95))
    assert out.shape == (25, 33, 3)
    # gray replicates across channels
    assert np.array_equal(out[..., 0], out[..., 1])
    rep = np.repeat(px[..., None], 3, axis=-1)
    assert psnr(rep, out) >= 44.0


def test_fuzz_corrupted_never_hangs():
    """Robustness: bit flips / truncation / random bytes either raise a
    clean error (ValueError / NotImplementedError) or decode to SOME array
    — never hang or crash the interpreter."""
    try:
        from hypothesis import given, settings, strategies as st
    except ImportError:
        pytest.skip("hypothesis not installed")

    base = encode_jpeg(_img(24, 16), quality=80)

    @settings(max_examples=40, deadline=None)
    @given(
        pos=st.integers(0, len(base) - 1),
        val=st.integers(0, 255),
        cut=st.integers(0, len(base)),
    )
    def run(pos, val, cut):
        data = bytearray(base)
        data[pos] = val
        data = bytes(data)[:cut]
        try:
            out = decode_jpeg(data)
            assert isinstance(out, np.ndarray)
        except (ValueError, NotImplementedError):
            pass  # the documented error surface — nothing else may leak

    run()


def test_jpeg_psnr_query_spark(spark):
    from json_schema_clj_spark.queries import q_images_jpeg_psnr

    rows = {r["status"]: r["n"] for r in q_images_jpeg_psnr(spark, "").collect()}
    assert rows == {"fail_decode_or_psnr": 10, "pass_psnr_ge_40db": 190}


def test_image_features_decodes_real_jpeg(spark):
    from json_schema_clj_spark.operators import multimodal as M
    from json_schema_clj_spark.sources.images import jpeg_images_df

    df = jpeg_images_df(spark, 20, seed=5)
    out = M.image_features(df, allow_fake=False).collect()
    assert len(out) == 20
    for r in out:
        assert r["decoded"] and r["error"] is None
        i = int(r["image_id"].split("-")[1])
        assert (r["dec_w"], r["dec_h"]) == (24 + i % 9, 16 + i % 7)
    # decoded means track the source fabric (not fake-fabric white noise,
    # whose channel means would all sit near 127.5 +- ~2)
    i0 = {r["image_id"]: r for r in out}["img-00000000"]
    px = smooth_pixels(b"5:0", 24, 16)
    assert abs(i0["mean_r"] - float(px[..., 0].mean())) < 2.0

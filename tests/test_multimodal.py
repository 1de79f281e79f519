"""Multimodal plumbing: PNG codec round-trip, Arrow-batched decode/
feature/resize UDFs, PSNR invariant, magic-number conformance."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from json_schema_clj_spark.operators import multimodal as M
from json_schema_clj_spark.sources.images import images_df


def _pixels(w, h, seed=3):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_png_roundtrip_exact():
    px = _pixels(17, 9)
    data = M.encode_png(px)
    assert data[:8] == M.PNG_MAGIC
    back = M.decode_png(data)
    assert np.array_equal(px, back)  # lossless ⇒ allclose trivially
    assert M.psnr(px, back) == float("inf")


def test_psnr_threshold():
    px = _pixels(32, 32)
    noisy = px.astype(np.int16) + np.random.default_rng(1).integers(-2, 3, px.shape)
    noisy = noisy.clip(0, 255).astype(np.uint8)
    assert M.psnr(px, noisy) >= 40.0  # small noise stays above the bar


def test_decode_stub_and_fake():
    # jpeg now has a REAL decoder: magic-prefixed filler is a parse error
    # (not a stub), and falls back to the deterministic fabric when allowed
    with pytest.raises(ValueError):
        M.decode_image(b"\xff\xd8\xffrest", "jpeg", 4, 4, allow_fake=False)
    # webp now has a REAL (VP8L) decoder: RIFF-prefixed filler with no
    # VP8L chunk is a parse error, not a stub
    with pytest.raises(ValueError):
        M.decode_image(b"RIFFxxxxWEBP", "webp", 4, 4, allow_fake=False)
    fake = M.decode_image(b"\xff\xd8\xffrest", "jpeg", 4, 6, allow_fake=True)
    assert fake.shape == (6, 4, 3)
    # deterministic: same bytes → same pixels
    assert np.array_equal(fake, M.decode_image(b"\xff\xd8\xffrest", "jpeg", 4, 6, allow_fake=True))


def test_image_features_spark(spark):
    # real PNGs through the distributed path
    rows = [("a", M.encode_png(_pixels(8, 8, 1)), "png", 8, 8),
            ("b", M.encode_png(_pixels(4, 4, 2)), "png", 4, 4),
            ("c", b"\xde\xad\xbe\xef", "png", 4, 4)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string, w int, h int")
    out = {r["image_id"]: r for r in M.image_features(df, allow_fake=False).collect()}
    assert out["a"]["decoded"] and out["a"]["dec_w"] == 8
    assert abs(out["a"]["brightness"] - float(_pixels(8, 8, 1).mean())) < 1e-9
    assert not out["c"]["decoded"] and out["c"]["error"]


def test_resize_spark(spark):
    rows = [("a", M.encode_png(_pixels(16, 12, 5)), "png", 16, 12)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string, w int, h int")
    out = M.resize_images(df, 8, 6, allow_fake=False).collect()[0]
    assert (out["w"], out["h"]) == (8, 6)
    px = M.decode_png(bytes(out["bytes"]))
    assert px.shape == (6, 8, 3)


def test_psnr_vs_reference_spark(spark):
    px1, px2 = _pixels(8, 8, 7), _pixels(8, 8, 7)
    rows = [("a", M.encode_png(px1), "png", 8, 8)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string, w int, h int")
    ref = spark.createDataFrame([("a", M.encode_png(px2), "png", 8, 8)],
                                "image_id string, bytes binary, fmt string, w int, h int")
    out = M.psnr_vs_reference(df, ref, allow_fake=False).collect()[0]
    assert out["psnr_db"] is None  # identical → lossless inf, reported as null


def test_magic_number_violations(spark):
    df = images_df(spark, 10_000)
    v = M.magic_number_violations(df, ["image_id"])
    # injected: i%200==39 truncated bytes; i%200==141 'bmp' (unknown fmt);
    # i%200==173 '' fmt
    assert v.count() == 3 * (10_000 // 200)
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_qpng_lossy_psnr_bands():
    # the toy lossy codec must land in the 40 <= PSNR < inf band at step 4
    # and below 40 dB at step 32 — real finite reconstruction error, not
    # the inf-PSNR lossless path (closed form: PSNR ~ 10*log10(255^2*12/s^2))
    import numpy as np

    from json_schema_clj_spark.operators.multimodal import (
        decode_image, encode_qpng, fake_pixels, psnr,
    )

    px = fake_pixels(b"qpng-test", 40, 30)
    fine = decode_image(encode_qpng(px, 4), "qpng", 40, 30)
    p_fine = psnr(px, fine)
    assert 40.0 <= p_fine < float("inf"), p_fine
    coarse = decode_image(encode_qpng(px, 32), "qpng", 40, 30)
    p_coarse = psnr(px, coarse)
    assert p_coarse < 40.0, p_coarse
    # deterministic: same input, same bytes
    assert encode_qpng(px, 4) == encode_qpng(px, 4)


def test_qpng_spark_lossy_invariant(spark):
    from pyspark.sql import functions as F

    from json_schema_clj_spark.operators import multimodal as M
    from json_schema_clj_spark.sources.images import png_images_df, qpng_images_df

    cur = qpng_images_df(spark, 40, seed=5, step=4, coarse_every=20, coarse_step=32)
    ref = png_images_df(spark, 40, seed=5)
    scored = M.psnr_vs_reference(cur, ref).collect()
    by_id = {r["image_id"]: r["psnr_db"] for r in scored}
    assert len(by_id) == 40
    for img, db in by_id.items():
        i = int(img.split("-")[1])
        assert db is not None  # every row has FINITE reconstruction error
        if i % 20 == 3:
            assert db < 40.0, (img, db)
        else:
            assert 40.0 <= db, (img, db)


def test_png_header_dims_catalyst_parse(spark):
    """Header-only dimension parse agrees with real encodes — including
    multi-byte big-endian dims — and stays pure Catalyst (no Python)."""
    import numpy as np
    import pyspark.sql.functions as F

    from json_schema_clj_spark.operators.multimodal import (
        encode_png,
        png_header_dims,
    )

    rows = []
    for i, (w, h) in enumerate([(8, 6), (300, 70), (1, 1), (257, 511)]):
        px = np.zeros((h, w, 3), np.uint8)
        rows.append((f"p{i}", encode_png(px), w, h))
    rows.append(("bad", b"\xde\xad\xbe\xef", 5, 5))
    rows.append(("short", b"\x89PNG\r\n\x1a\x0a", 5, 5))  # sig only, no IHDR
    df = spark.createDataFrame(rows, "image_id string, bytes binary, w int, h int")
    out = {r["image_id"]: r for r in png_header_dims(df).collect()}
    for i, (w, h) in enumerate([(8, 6), (300, 70), (1, 1), (257, 511)]):
        r = out[f"p{i}"]
        assert r["hdr_ok"] and r["w_hdr"] == w and r["h_hdr"] == h
    assert not out["bad"]["hdr_ok"] and out["bad"]["w_hdr"] is None
    assert not out["short"]["hdr_ok"]

    plan = png_header_dims(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_jpeg_header_dims_marker_walk(spark):
    """The bounded Catalyst marker walk finds SOF through variable-length
    segment chains (APP0/DQT/DRI orderings, baseline AND progressive),
    validates dimension claims, rejects non-JPEG/truncated/SOS-first
    streams, and gives up past the header cap — all without Python."""
    import numpy as np
    import struct as _struct

    from json_schema_clj_spark.functions.jpeg import encode_jpeg, encode_jpeg_gray
    from json_schema_clj_spark.functions.jpeg_progressive import (
        encode_jpeg_progressive,
    )
    from json_schema_clj_spark.operators.multimodal import (
        encode_png,
        jpeg_header_dims,
    )

    def px(w, h):
        return np.zeros((h, w, 3), np.uint8)

    base = encode_jpeg(px(24, 16), quality=90)
    rows = [
        ("base", base, 24, 16),
        ("base_dri", encode_jpeg(px(40, 26), quality=80, restart_interval=2), 40, 26),
        ("prog", encode_jpeg_progressive(px(31, 19), quality=90), 31, 19),
        ("gray", encode_jpeg_gray(px(12, 10)[..., 0], quality=90), 12, 10),
        # a fat COM segment before SOF: the walk must hop it
        ("com", base[:2] + b"\xff\xfe" + _struct.pack(">H", 502) + b"z" * 500 + base[2:], 24, 16),
        # claimed dims disagree with the SOF payload
        ("lying", base, 99, 77),
        ("png", encode_png(px(9, 9)), 9, 9),
        ("trunc", base[:6], 24, 16),
        # SOF pushed past the header cap -> walk gives up cleanly
        ("far", base[:2] + b"\xff\xfe" + _struct.pack(">H", 5002) + b"z" * 5000 + base[2:], 24, 16),
        ("garbage", b"\xff\xd8\x00\x00\x00\x00", 1, 1),
        # spec-legal noise the decoder also accepts: FF fill bytes and a
        # standalone TEM marker before the first real segment
        ("fill", base[:2] + b"\xff\xff\xff" + base[2:], 24, 16),
        ("tem", base[:2] + b"\xff\x01" + base[2:], 24, 16),
        # a segment length that straddles the 4 KiB cap must invalidate,
        # never hop backwards into scanned payload
        ("straddle", base[:2] + b"\xff\xfe" + _struct.pack(">H", 4091) + b"\xff\xc0" * 2045 + base[2:], 24, 16),
        # a degenerate declared length < 2 must invalidate, not loop
        ("shortlen", base[:2] + b"\xff\xfe\x00\x01" + base[2:], 24, 16),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, w int, h int")
    out = {r["image_id"]: r for r in jpeg_header_dims(df).collect()}

    for name in ("base", "base_dri", "gray", "com"):
        assert out[name]["sof_marker"] == 0xC0, name
        assert out[name]["w_hdr"] == out[name]["w"], name
        assert out[name]["h_hdr"] == out[name]["h"], name
    assert out["prog"]["sof_marker"] == 0xC2
    assert out["prog"]["w_hdr"] == 31 and out["prog"]["h_hdr"] == 19
    assert out["lying"]["sof_marker"] == 0xC0
    assert out["lying"]["w_hdr"] == 24 and out["lying"]["h_hdr"] == 16  # the bytes win
    for name in ("fill", "tem"):
        assert out[name]["sof_marker"] == 0xC0, name
        assert out[name]["w_hdr"] == 24 and out[name]["h_hdr"] == 16, name
    for name in ("png", "trunc", "far", "garbage", "straddle", "shortlen"):
        assert out[name]["sof_marker"] == 0, name
        assert out[name]["w_hdr"] is None, name

    plan = jpeg_header_dims(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_webp_header_dims_riff_walk(spark):
    """The RIFF chunk walk finds the bitstream chunk past metadata chunks,
    decodes VP8L's 14-bit packed dims, VP8X's 24-bit canvas, lossy VP8's
    frame-tag dims, and rejects non-RIFF bytes — all pure Catalyst."""
    import struct as _struct

    from json_schema_clj_spark.functions.vp8l import encode_webp
    from json_schema_clj_spark.operators.multimodal import webp_header_dims

    def riff(chunks):
        body = b"WEBP" + b"".join(
            cc + _struct.pack("<I", len(p)) + p + (b"\x00" if len(p) % 2 else b"")
            for cc, p in chunks
        )
        return b"RIFF" + _struct.pack("<I", len(body)) + body

    import numpy as np
    real = encode_webp(np.zeros((11, 17, 3), np.uint8))
    # VP8L payload re-wrapped behind two metadata chunks: the walk must hop
    vp8l_payload = real[20 : 20 + _struct.unpack("<I", real[16:20])[0]]
    hopped = riff([(b"ICCP", b"\x01\x02\x03"), (b"EXIF", b"\x05" * 6),
                   (b"VP8L", vp8l_payload)])
    vp8x = riff([(b"VP8X", bytes(4) + (639).to_bytes(3, "little") + (479).to_bytes(3, "little"))])
    vp8 = riff([(b"VP8 ", b"\x00\x00\x00\x9d\x01\x2a"
                 + _struct.pack("<H", 320) + _struct.pack("<H", 240) + b"\x00" * 8)])
    rows = [
        ("real", real, 17, 11),
        ("hopped", hopped, 17, 11),
        ("vp8x", vp8x, 640, 480),
        ("vp8", vp8, 320, 240),
        ("junk", b"NOTRIFFnope", 1, 1),
        ("trunc", real[:10], 17, 11),
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, w int, h int")
    out = {r["image_id"]: r for r in webp_header_dims(df).collect()}
    for name in ("real", "hopped"):
        assert out[name]["webp_kind"] == "lossless", name
        assert out[name]["w_hdr"] == 17 and out[name]["h_hdr"] == 11, name
    assert out["vp8x"]["webp_kind"] == "extended"
    assert out["vp8x"]["w_hdr"] == 640 and out["vp8x"]["h_hdr"] == 480
    assert out["vp8"]["webp_kind"] == "lossy"
    assert out["vp8"]["w_hdr"] == 320 and out["vp8"]["h_hdr"] == 240
    for name in ("junk", "trunc"):
        assert out[name]["webp_kind"] == "none" and out[name]["w_hdr"] is None, name

    plan = webp_header_dims(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan

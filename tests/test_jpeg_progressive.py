"""Progressive JPEG (SOF2) codec tests.

The load-bearing invariant: a COMPLETE progressive transmission delivers
exactly the quantized coefficients of the baseline encoding of the same
planes and tables, so decode(progressive) must be PIXEL-IDENTICAL to
decode(baseline) for every input/quality/subsampling — any drift in the
Annex G scan grammar (EOBRUN, refinement correction bits, point
transforms) breaks exact equality immediately.
"""

from __future__ import annotations

import re

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from json_schema_clj_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_gray,
)
from json_schema_clj_spark.functions.jpeg_progressive import (
    encode_jpeg_progressive,
    optimal_huffman,
)
from json_schema_clj_spark.operators.multimodal import psnr, smooth_pixels


def _noise(seed: int, w: int, h: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("dims,quality,sub", [
    ((24, 16), 95, "444"),
    ((29, 21), 75, "420"),
    ((8, 8), 90, "444"),
    ((33, 17), 6, "420"),
    ((1, 1), 50, "444"),
    ((41, 23), 95, "420"),
])
def test_progressive_equals_baseline(dims, quality, sub):
    w, h = dims
    px = smooth_pixels(f"prog:{w}x{h}:{quality}".encode(), w, h)
    base = decode_jpeg(encode_jpeg(px, quality=quality, subsampling=sub))
    prog = decode_jpeg(encode_jpeg_progressive(px, quality=quality, subsampling=sub))
    assert np.array_equal(base, prog)


def test_noise_image_dense_coefficients():
    # noise maximizes nonzero AC coefficients: the refinement scan's
    # correction-bit path dominates
    px = _noise(3, 47, 31)
    base = decode_jpeg(encode_jpeg(px, quality=95, subsampling="444"))
    prog = decode_jpeg(encode_jpeg_progressive(px, quality=95, subsampling="444"))
    assert np.array_equal(base, prog)


def test_flat_image_long_eob_runs():
    # a flat image makes every AC band zero: EOBn run-length codes span
    # the whole component in one symbol
    px = np.full((40, 64, 3), 137, dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(px, quality=90, subsampling="420"))
    prog = decode_jpeg(encode_jpeg_progressive(px, quality=90, subsampling="420"))
    assert np.array_equal(base, prog)


def test_grayscale_progressive():
    g = smooth_pixels(b"gray-prog", 20, 14)[..., 0].copy()
    base = decode_jpeg(encode_jpeg_gray(g, quality=85))
    prog = decode_jpeg(encode_jpeg_progressive(g, quality=85))
    assert np.array_equal(base, prog)


def test_marker_structure():
    data = encode_jpeg_progressive(smooth_pixels(b"m", 24, 16), quality=90)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    # ten scans in the default 3-component script (FF DA cannot occur
    # inside entropy data: the writer stuffs FF -> FF 00)
    assert len(re.findall(b"\xff\xda", data)) == 10


def test_truncated_transmission_decodes_coarse_preview():
    # progressive's point: a prefix of scans is a valid coarse image.
    # Cut after the 3rd scan, re-terminate, and the decoder must produce
    # a same-shape image that differs from the full reconstruction.
    px = _noise(11, 56, 40)
    full = encode_jpeg_progressive(px, quality=90)
    sos = [m.start() for m in re.finditer(b"\xff\xda", full)]
    trunc = full[: sos[3]] + b"\xff\xd9"
    ref = decode_jpeg(full)
    coarse = decode_jpeg(trunc)
    assert coarse.shape == ref.shape
    assert not np.array_equal(coarse, ref)
    # the DC scan plus first luma AC band already lands in the right
    # neighborhood — a gross desync would send PSNR toward 0
    assert psnr(ref, coarse) > 10.0


def test_psnr_vs_original_tracks_quality():
    px = smooth_pixels(b"q-ladder", 32, 24)
    hi = decode_jpeg(encode_jpeg_progressive(px, quality=95))
    lo = decode_jpeg(encode_jpeg_progressive(px, quality=6))
    assert psnr(px, hi) >= 40.0
    assert psnr(px, lo) < 40.0
    assert psnr(px, hi) > psnr(px, lo)


def test_malformed_progressive_raises_valueerror():
    data = bytearray(encode_jpeg_progressive(smooth_pixels(b"x", 24, 16), quality=90))
    # corrupt the first scan's entropy data
    sos = bytes(data).find(b"\xff\xda")
    ln = int.from_bytes(data[sos + 2 : sos + 4], "big")
    start = sos + 2 + ln
    data[start : start + 8] = b"\xff\xfe" * 4
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg(bytes(data))


def test_optimal_huffman_kraft_and_roundtrip():
    # table built from a skewed frequency profile must satisfy Kraft and
    # include exactly the used symbols
    freq = np.zeros(256, dtype=np.int64)
    freq[0] = 1000
    freq[1] = 500
    freq[0x21] = 100
    freq[0xF0] = 3
    freq[0xE0] = 1
    bits, vals = optimal_huffman(freq)
    assert sorted(vals) == [0, 1, 0x21, 0xE0, 0xF0]
    assert sum(bits) == 5
    kraft = sum(n * 2.0 ** -(i + 1) for i, n in enumerate(bits))
    assert kraft < 1.0  # strict: the reserved all-ones code was removed


def test_optimal_huffman_single_symbol():
    freq = np.zeros(256, dtype=np.int64)
    freq[4] = 17
    bits, vals = optimal_huffman(freq)
    assert vals == [4] and sum(bits) == 1


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    w=st.integers(1, 48),
    h=st.integers(1, 48),
    quality=st.integers(1, 100),
    sub=st.sampled_from(["444", "420"]),
    kind=st.sampled_from(["noise", "flat", "smooth"]),
)
def test_progressive_equals_baseline_property(seed, w, h, quality, sub, kind):
    if kind == "noise":
        px = np.random.default_rng(seed).integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    elif kind == "flat":
        px = np.full((h, w, 3), seed % 256, dtype=np.uint8)
    else:
        px = smooth_pixels(f"hp:{seed}".encode(), w, h)
    base = decode_jpeg(encode_jpeg(px, quality=quality, subsampling=sub))
    prog = decode_jpeg(encode_jpeg_progressive(px, quality=quality, subsampling=sub))
    assert np.array_equal(base, prog)

"""Property tests for the WAV and y4m codecs: arbitrary-payload round
trips and a fuzzed truncation/mutation error surface (same stance as the
VP8L property tests — decoders must either round-trip or raise
ValueError, never crash differently or return garbage silently)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from json_schema_clj_spark.operators.audio import decode_wav, extract_features
from json_schema_clj_spark.operators.video import parse_y4m
from json_schema_clj_spark.sources.audio import encode_wav
from json_schema_clj_spark.sources.video import encode_y4m


@given(
    st.lists(st.integers(-32768, 32767), min_size=0, max_size=400),
    st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=60, deadline=None)
def test_wav_round_trip_arbitrary_pcm(samples, sr):
    x = np.array(samples, dtype=np.int16)
    sr2, back = decode_wav(encode_wav(x, sr))
    assert sr2 == sr
    assert np.array_equal(back, x)
    f = extract_features(encode_wav(x, sr))
    assert f["n_samples"] == len(x)
    assert f["peak"] == (int(np.abs(x.astype(np.int64)).max()) if len(x) else 0)
    assert f["sum_sq"] == int((x.astype(np.int64) ** 2).sum())


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=120, deadline=None)
def test_wav_decoder_never_crashes_on_garbage(data):
    try:
        decode_wav(data)
    except ValueError:
        pass  # the documented error surface


@given(
    st.lists(st.integers(-32768, 32767), min_size=4, max_size=64),
    st.integers(0, 90),
)
@settings(max_examples=80, deadline=None)
def test_wav_truncation_surface(samples, cut):
    data = encode_wav(np.array(samples, dtype=np.int16))
    cut = min(cut, len(data) - 1)
    try:
        sr, back = decode_wav(data[:cut])
        # a prefix that still parses must be a valid shorter stream
        assert sr == 8000 and len(back) <= len(samples)
    except ValueError:
        pass


@st.composite
def frame_stacks(draw):
    w = draw(st.integers(1, 12))
    h = draw(st.integers(1, 10))
    n = draw(st.integers(1, 6))
    payload = draw(
        st.lists(st.integers(0, 255), min_size=w * h * n, max_size=w * h * n)
    )
    arr = np.array(payload, dtype=np.uint8).reshape(n, h, w)
    return [arr[i] for i in range(n)], draw(st.integers(1, 60))


@given(frame_stacks())
@settings(max_examples=60, deadline=None)
def test_y4m_round_trip_arbitrary_frames(fs):
    frames, fps = fs
    w, h, num, den, back = parse_y4m(encode_y4m(frames, fps))
    assert (w, h, num, den) == (frames[0].shape[1], frames[0].shape[0], fps, 1)
    assert len(back) == len(frames)
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=120, deadline=None)
def test_y4m_parser_never_crashes_on_garbage(data):
    try:
        parse_y4m(data)
    except ValueError:
        pass


@given(frame_stacks(), st.integers(0, 200))
@settings(max_examples=80, deadline=None)
def test_y4m_truncation_surface(fs, cut):
    frames, fps = fs
    data = encode_y4m(frames, fps)
    cut = min(cut, len(data) - 1)
    try:
        _, _, _, _, back = parse_y4m(data[:cut])
        assert len(back) <= len(frames)
    except ValueError:
        pass

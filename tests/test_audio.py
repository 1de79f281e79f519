"""Audio leg of the multimodal column model: WAV codec round-trip, decode
error surface, feature extraction semantics, distributed path."""

import struct

import numpy as np
import pytest

from json_schema_clj_spark.operators.audio import (
    audio_features,
    decode_wav,
    extract_features,
)
from json_schema_clj_spark.sources.audio import (
    SAMPLE_RATE,
    audio_df,
    encode_wav,
    plant_params,
    square_wave,
)


def test_wav_round_trip():
    x = np.array([0, 100, -32768, 32767, 5], dtype=np.int16)
    sr, back = decode_wav(encode_wav(x, 44100))
    assert sr == 44100
    assert np.array_equal(back, x)


def test_decode_rejects_malformed():
    good = encode_wav(np.zeros(8, np.int16))
    for bad in [
        b"",
        b"RIFF",
        b"OggS" + good[4:],  # wrong magic
        good[:20],  # truncated mid-header (the planted corruption)
        good[:-1],  # truncated payload
    ]:
        with pytest.raises(ValueError):
            decode_wav(bad)
    # stereo / 8-bit / non-PCM rejected
    hdr = bytearray(good)
    struct.pack_into("<H", hdr, 22, 2)  # channels=2
    with pytest.raises(ValueError):
        decode_wav(bytes(hdr))


def test_features_square_wave_closed_forms():
    # amp 3000, half-period 4, 5 cycles: every feature has a closed form
    f = extract_features(encode_wav(square_wave(3000, 4, 5)))
    n = 5 * 2 * 4
    assert f["n_samples"] == n
    assert f["peak"] == 3000
    assert f["sum_sq"] == 3000 * 3000 * n
    assert f["zero_crossings"] == 2 * 5 - 1
    assert f["clipped"] == 0
    assert f["duration_us"] == n * 1_000_000 // SAMPLE_RATE
    assert f["dominant_bin"] == 5
    assert f["status"] == "ok"


def test_features_silent_and_clipped():
    silent = extract_features(encode_wav(square_wave(0, 3, 4)))
    assert silent["status"] == "silent"
    assert silent["peak"] == 0 and silent["dominant_bin"] == 0
    clipped = extract_features(encode_wav(square_wave(32767, 3, 4)))
    assert clipped["status"] == "clipped"
    assert clipped["clipped"] == clipped["n_samples"]


def test_distributed_features_match_local(spark):
    n = 60
    out = {r["audio_id"]: r for r in audio_features(audio_df(spark, n)).collect()}
    assert len(out) == n
    for i in range(n):
        r = out[i]
        if i % 40 == 21:
            assert r["status"] == "fail_parse" and r["peak"] is None
            continue
        amp, p2, m = plant_params(i)
        local = extract_features(encode_wav(square_wave(amp, p2, m)))
        for k, v in local.items():
            assert r[k] == v, (i, k, r[k], v)


def test_plan_single_arrow_stage(spark):
    plan = (
        audio_features(audio_df(spark, 10))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # decode+extract is one mapInPandas over the synth mapInPandas — no
    # extra shuffles or Python round-trips in between
    assert plan.count("MapInPandas") == 2, plan
    assert "Exchange" not in plan, plan

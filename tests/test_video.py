"""Video leg of the multimodal column model: y4m round-trip, parse error
surface, frame sampling semantics, distributed path."""

import numpy as np
import pytest

from json_schema_clj_spark.operators.video import parse_y4m, sample_frames, video_stats
from json_schema_clj_spark.sources.video import (
    encode_y4m,
    plant_geometry,
    plant_luma,
    video_bytes,
    videos_df,
)


def test_y4m_round_trip():
    frames = [np.arange(48, dtype=np.uint8).reshape(6, 8) + k for k in range(3)]
    w, h, num, den, back = parse_y4m(encode_y4m(frames, 25))
    assert (w, h, num, den) == (8, 6, 25, 1)
    assert len(back) == 3
    for a, b in zip(frames, back):
        assert np.array_equal(a, b)


def test_parse_rejects_malformed():
    good = video_bytes(0)
    for bad in [
        b"",
        b"RIFF" + good[4:],  # wrong magic
        good[:11],  # the planted truncation (mid stream-header)
        good[:-1],  # truncated last frame
        good.replace(b"FRAME", b"FRAMX", 1),  # bad frame marker
        good.replace(b"Cmono", b"C420 "),  # unsupported colorspace
    ]:
        with pytest.raises(ValueError):
            parse_y4m(bad)
    # missing C tag defaults to C420 per spec → unsupported here
    with pytest.raises(ValueError):
        parse_y4m(b"YUV4MPEG2 W8 H8 F5:1\nFRAME\n" + bytes(64))


def test_stride_sampling_semantics(spark):
    n = 50
    rows = sample_frames(videos_df(spark, n), every_k=3, max_frames=2).collect()
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["video_id"], []).append((r["frame_idx"], r["mean_luma"]))
    for i in range(n):
        if i % 40 == 13:
            assert i not in by_vid  # fail_parse clips contribute no rows
            continue
        _, _, _, n_frames = plant_geometry(i)
        want = [(f, plant_luma(i, f)) for f in range(0, n_frames, 3)][:2]
        assert sorted(by_vid[i]) == want, (i, by_vid[i], want)


def test_stats_match_plant_rules(spark):
    n = 45
    out = {r["video_id"]: r for r in video_stats(videos_df(spark, n)).collect()}
    assert len(out) == n
    for i in range(n):
        r = out[i]
        if i % 40 == 13:
            assert r["status"] == "fail_parse" and r["n_frames"] is None
            continue
        w, h, fps, n_frames = plant_geometry(i)
        assert (r["w"], r["h"], r["fps"], r["n_frames"]) == (w, h, fps, n_frames)
        assert r["duration_us"] == n_frames * 1_000_000 // fps
        assert r["status"] == "ok"


def test_plan_single_arrow_stage(spark):
    plan = (
        sample_frames(videos_df(spark, 10))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("MapInPandas") == 2, plan
    assert "Exchange" not in plan, plan

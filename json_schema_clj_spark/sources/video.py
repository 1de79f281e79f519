"""Deterministic synthetic video table: YUV4MPEG2 (y4m) bytes as an opaque
binary column — the video leg of the multimodal column model.

y4m is the standard uncompressed-video interchange format (the input
format of every mainline encoder): a text stream header
``YUV4MPEG2 W<w> H<h> F<num>:<den> Ip A1:1 Cmono\\n`` followed by
``FRAME\\n`` + raw luma plane per frame.  Real format, zero codec — the
container plumbing (header parse, frame walk, stride sampling) is what a
100 TB video pipeline exercises before any decoder runs.

Plant rules (pure function of row id i):
  w = 8 + (i%3)*4, h = 8, fps = 5 + (i%4), n_frames = 4 + (i%7)
  frame f's luma plane is CONSTANT value L(i,f) = (i*31 + f*7) % 251,
  so per-frame mean luma is an integer-exact closed form.
  corruption: i % 40 == 13 → bytes truncated (parse failure).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

CORRUPT_EVERY = 40  # residue 13


def plant_geometry(i: int) -> tuple[int, int, int, int]:
    """(w, h, fps, n_frames) for row i."""
    return 8 + (i % 3) * 4, 8, 5 + (i % 4), 4 + (i % 7)


def plant_luma(i: int, f: int) -> int:
    return (i * 31 + f * 7) % 251


def encode_y4m(frames: list[np.ndarray], fps: int, fps_den: int = 1) -> bytes:
    """Mono (luma-only) frames → y4m bytes."""
    h, w = frames[0].shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:{fps_den} Ip A1:1 Cmono\n".encode()]
    for fr in frames:
        assert fr.shape == (h, w) and fr.dtype == np.uint8
        out.append(b"FRAME\n")
        out.append(fr.tobytes())
    return b"".join(out)


def video_bytes(i: int) -> bytes:
    w, h, fps, n_frames = plant_geometry(i)
    frames = [np.full((h, w), plant_luma(i, f), np.uint8) for f in range(n_frames)]
    return encode_y4m(frames, fps)


def videos_df(spark: SparkSession, n_rows: int, corrupt: bool = True) -> DataFrame:
    """Distributed synth over spark.range — bit-reproducible at any
    parallelism level, no driver-side loop."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                data = video_bytes(i)
                if corrupt and i % CORRUPT_EVERY == 13:
                    data = data[:11]  # mid-stream-header truncation
                rows.append((i, data))
            yield pd.DataFrame(rows, columns=["video_id", "bytes"])

    return spark.range(n_rows).mapInPandas(gen, "video_id long, bytes binary")

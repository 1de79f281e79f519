"""Video container operators over opaque y4m binary columns: header
parse, frame walk, stride frame-sampling — Arrow-batched mapInPandas,
bytes cross the JVM↔Python boundary once per batch.

Frame sampling is the training-pipeline primitive (take every k-th frame
/ first n frames of each clip before the expensive per-frame model); the
parse/stats pass is the validation primitive (header vs payload
consistency, truncation detection).  All emitted values are
integer-typed so the driver's value hash never sees float formatting.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

STATS_SCHEMA = (
    "video_id long, w long, h long, fps long, n_frames long, "
    "duration_us long, status string"
)
FRAME_SCHEMA = "video_id long, frame_idx long, mean_luma long"


def parse_y4m(data: bytes) -> tuple[int, int, int, int, list[np.ndarray]]:
    """y4m bytes → (w, h, fps_num, fps_den, frames).  Mono (Cmono) only —
    the subset the corpus emits; anything malformed raises ValueError."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = num = den = None
    colorspace = "C420"  # the spec default when no C tag is present
    for tag in data[9:nl].split():
        t = tag.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("F"):
            num, den = (int(x) for x in t[1:].split(":"))
        elif t.startswith("C"):
            colorspace = t
    if not w or not h or not num or not den:
        raise ValueError("missing stream-header parameters")
    if colorspace != "Cmono":
        raise ValueError(f"unsupported colorspace {colorspace}")
    frames: list[np.ndarray] = []
    pos = nl + 1
    fsize = w * h
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or not data[pos : pos + 5] == b"FRAME":
            raise ValueError("bad FRAME marker")
        body = data[fnl + 1 : fnl + 1 + fsize]
        if len(body) < fsize:
            raise ValueError("truncated frame payload")
        frames.append(np.frombuffer(body, np.uint8).reshape(h, w))
        pos = fnl + 1 + fsize
    return w, h, num, den, frames


def video_stats(df: DataFrame, id_col: str = "video_id", bytes_col: str = "bytes") -> DataFrame:
    """Per-clip container stats + parse verdict."""
    src = df.select(id_col, bytes_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    w, h, num, den, frames = parse_y4m(bytes(data))
                    dur = len(frames) * 1_000_000 * den // num
                    rows.append((int(vid), w, h, num, len(frames), dur, "ok"))
                except ValueError:
                    rows.append((int(vid), None, None, None, None, None, "fail_parse"))
            yield pd.DataFrame(
                rows,
                columns=["video_id", "w", "h", "fps", "n_frames", "duration_us", "status"],
            )

    return src.mapInPandas(run, STATS_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_k: int = 2,
    max_frames: int | None = None,
    id_col: str = "video_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Stride sampling: one output row per kept frame (idx 0, k, 2k, …,
    capped at max_frames per clip) with its integer mean luma — the cheap
    per-frame feature standing in for the model stage.  Unparseable clips
    contribute no rows (they are the stats pass's fail_parse set)."""
    src = df.select(id_col, bytes_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for vid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    _, _, _, _, frames = parse_y4m(bytes(data))
                except ValueError:
                    continue
                kept = frames[::every_k]
                if max_frames is not None:
                    kept = kept[:max_frames]
                for j, fr in enumerate(kept):
                    lum = int(fr.astype(np.int64).sum()) // fr.size
                    rows.append((int(vid), j * every_k, lum))
            yield pd.DataFrame(rows, columns=["video_id", "frame_idx", "mean_luma"])

    return src.mapInPandas(run, FRAME_SCHEMA)

"""Audio feature extraction over opaque WAV binary columns.

Same stance as the image operators (operators/multimodal.py): the bytes
column is opaque to Catalyst, so decode + feature-extract run as
Arrow-batched mapInPandas — bytes cross the JVM↔Python boundary once per
batch, never per row.  Every emitted feature is integer-typed so the
driver's value-hash comparison never sees float formatting.

Features per row:
  n_samples, peak (max |x|), sum_sq (Σ x², the energy numerator),
  zero_crossings (sign changes), clipped (samples at full scale),
  duration_us (exact at 8 kHz: 125 µs/sample), dominant_bin (rfft
  |X| argmax over bins 1..N/2 — the FFT path), status
  (fail_parse / clipped / silent / ok).

Undecodable bytes → status 'fail_parse' with NULL features (mirrors the
image decode-failure contract).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "audio_id long, n_samples long, peak long, sum_sq long, "
    "zero_crossings long, clipped long, duration_us long, "
    "dominant_bin long, status string"
)


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 mono bytes → (sample_rate, int16 array).

    Minimal chunk walker (fmt then data), strict on the subset we emit:
    PCM (format 1), 16-bit.  Raises ValueError on anything malformed —
    the decode-failure surface the operator classifies.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, sr, bits, channels = 12, None, None, None
    samples = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated chunk")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("short fmt chunk")
            fmt_code, channels, sr, _, _, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt_code != 1 or channels != 1 or bits != 16:
                raise ValueError("unsupported WAV encoding")
        elif tag == b"data":
            if size % 2:
                raise ValueError("odd PCM16 payload")
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sr is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return sr, samples


def extract_features(data: bytes) -> dict:
    sr, x = decode_wav(data)
    xl = x.astype(np.int64)
    n = len(x)
    peak = int(np.abs(xl).max()) if n else 0
    sum_sq = int((xl * xl).sum())
    # sign changes between consecutive samples (zeros break a crossing)
    zc = int(((xl[:-1] * xl[1:]) < 0).sum()) if n > 1 else 0
    clipped = int((np.abs(xl) >= 32767).sum())
    duration_us = n * 1_000_000 // sr
    if peak == 0 or n < 2:
        dom = 0
    else:
        mag = np.abs(np.fft.rfft(x.astype(np.float64)))
        dom = int(np.argmax(mag[1:]) + 1)  # skip DC
    status = "clipped" if clipped else ("silent" if peak == 0 else "ok")
    return {
        "n_samples": n,
        "peak": peak,
        "sum_sq": sum_sq,
        "zero_crossings": zc,
        "clipped": clipped,
        "duration_us": duration_us,
        "dominant_bin": dom,
        "status": status,
    }


def audio_features(df: DataFrame, id_col: str = "audio_id", bytes_col: str = "bytes") -> DataFrame:
    """Decode + per-row features via mapInPandas (Arrow batches of binary)."""
    src = df.select(id_col, bytes_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.strip().split(" ")[0] for c in FEATURE_SCHEMA.split(",")]
        for pdf in batches:
            rows = []
            for aid, data in zip(pdf[id_col], pdf[bytes_col]):
                try:
                    f = extract_features(bytes(data))
                    rows.append(
                        (
                            int(aid),
                            f["n_samples"],
                            f["peak"],
                            f["sum_sq"],
                            f["zero_crossings"],
                            f["clipped"],
                            f["duration_us"],
                            f["dominant_bin"],
                            f["status"],
                        )
                    )
                except (ValueError, struct.error):
                    rows.append((int(aid),) + (None,) * 7 + ("fail_parse",))
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(run, FEATURE_SCHEMA)

"""Deterministic synthetic audio table: WAV (RIFF PCM16 mono) bytes as an
opaque binary column + typed metadata — the audio leg of the multimodal
(binary + metadata) column model (SURVEY.md §2.8).

Square waves, not sines: with |x| = A at every sample, energy, peak,
zero-crossing and FFT-fundamental features are integer-exact closed forms
of the plant constants, so the DuckDB oracle derives every expected value
from pure arithmetic (the same construction as the image plant rules).

Plant rules (pure function of row id i, seed fixed by construction):
  amplitude  A = 32767 if i%25==9 (clipped), 0 if i%25==16 (silent),
               else 1000 + (i%20)*1500            (max 29500, headroom ok)
  half-period P2 = 2 + (i%5) samples; cycles m = 3 + (i%4)
  n_samples  N = m * 2 * P2;  sample rate 8000 Hz fixed
  corruption: i % 40 == 21 → bytes truncated mid-header (parse failure)
"""

from __future__ import annotations

import struct

import numpy as np
from pyspark.sql import DataFrame, SparkSession

SAMPLE_RATE = 8000
CORRUPT_EVERY = 40  # residue 21
CLIP_RESIDUE, SILENT_RESIDUE = 9, 16


def encode_wav(samples: np.ndarray, sr: int = SAMPLE_RATE) -> bytes:
    """int16 mono samples → standard 44-byte-header RIFF/WAVE PCM bytes."""
    assert samples.dtype == np.int16
    data = samples.tobytes()
    return b"".join(
        [
            b"RIFF",
            struct.pack("<I", 36 + len(data)),
            b"WAVE",
            b"fmt ",
            struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16),
            b"data",
            struct.pack("<I", len(data)),
            data,
        ]
    )


def square_wave(amp: int, half_period: int, cycles: int) -> np.ndarray:
    """cycles full periods of a ±amp square wave (int16)."""
    one = np.concatenate(
        [np.full(half_period, amp, np.int16), np.full(half_period, -amp, np.int16)]
    )
    return np.tile(one, cycles)


def plant_params(i: int) -> tuple[int, int, int]:
    """(amplitude, half_period, cycles) for row i — the plant rule."""
    if i % 25 == CLIP_RESIDUE:
        amp = 32767
    elif i % 25 == SILENT_RESIDUE:
        amp = 0
    else:
        amp = 1000 + (i % 20) * 1500
    return amp, 2 + (i % 5), 3 + (i % 4)


def audio_df(spark: SparkSession, n_rows: int, corrupt: bool = True) -> DataFrame:
    """Distributed synth: mapInPandas over spark.range — bit-reproducible
    at any parallelism level, no driver-side loop."""

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                amp, p2, m = plant_params(i)
                data = encode_wav(square_wave(amp, p2, m))
                if corrupt and i % CORRUPT_EVERY == 21:
                    data = data[:20]
                rows.append((i, data, SAMPLE_RATE))
            yield pd.DataFrame(rows, columns=["audio_id", "bytes", "sr"])

    return spark.range(n_rows).mapInPandas(gen, "audio_id long, bytes binary, sr int")

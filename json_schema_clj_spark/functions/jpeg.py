"""Baseline-sequential JPEG codec in pure numpy (no image libraries).

Implements the public ITU-T T.81 / ISO 10918-1 baseline process: 8-bit
samples, Huffman entropy coding, YCbCr (JFIF), 4:4:4 or 4:2:0 sampling.
Tables are the T.81 Annex K examples (the de-facto defaults every encoder
ships).  This exists because the sandbox has no image libraries but the
reference's per-row invariant (BASELINE.json input_hint) includes a
"PSNR >= 40 dB for lossy formats" branch — with this codec the branch runs
on REAL JPEG reconstruction error end-to-end (encode -> bytes -> parse ->
Huffman decode -> dequant -> IDCT -> upsample -> PSNR), not a stub.

Scope (documented, raised on): baseline DCT (SOF0/1) and progressive
Huffman (SOF2 — spectral selection + successive approximation per T.81
Annex G, encoder in functions/jpeg_progressive.py); arithmetic coding,
12-bit precision, and hierarchical modes raise NotImplementedError.
Decoder handles multi-table DQT/DHT segments, restart intervals
(DRI/RSTn), 16-bit quant tables, multi-scan progressive streams (DC
first/refine, AC first/refine with EOBRUN), and sampling factors up to
2x2; the baseline encoder emits 4:4:4 or 4:2:0.

Everything here derives from the published spec; no reference-repo code
is involved (the reference is a Clojure JSON-schema validator with no
image path — this module backs the multimodal extension layer,
SURVEY.md §2.8).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# T.81 Annex K tables

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)

# K.1 / K.2 example quantization tables (in natural row-major order)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

# K.3 Huffman tables: (BITS list of 16 counts, HUFFVAL list)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix: forward coef = C @ block @ C.T
_C = np.array(
    [
        [
            (np.sqrt(1.0 / 8.0) if k == 0 else np.sqrt(2.0 / 8.0))
            * np.cos((2 * n + 1) * k * np.pi / 16.0)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 -> scaled table clipped to [1, 255]."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 C.2: symbol -> (code, length), codes assigned in val order by
    increasing length."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for the decoder."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 B.1.1.5)
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # 1-fill padding
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated entropy-coded segment")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


# ---------------------------------------------------------------------------
# encoder


def _fdct_quant(blocks: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(N,8,8) level-shifted float blocks -> (N,64) zigzagged quantized."""
    coef = np.einsum("ij,njk,lk->nil", _C, blocks, _C, optimize=True)
    q = np.round(coef / qt).astype(np.int32)
    return q.reshape(-1, 64)[:, ZIGZAG]


def _plane_blocks(plane: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad plane (float, already level-shifted) to 8-multiples via edge
    replication and cut into raster-order 8x8 blocks."""
    h, w = plane.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    return blocks, ph // 8, pw // 8


def _encode_block(bw: _BitWriter, zz: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = dc_codes[s]
    bw.put(code, ln)
    if s:
        bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            zc, zl = ac_codes[0xF0]  # ZRL
            bw.put(zc, zl)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        bw.put(code, ln)
        bw.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if run:
        ec, el = ac_codes[0x00]  # EOB
        bw.put(ec, el)
    return dc


def _rgb_to_ycbcr(px: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r, g, b = (px[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """RGB8 HxWx3 -> baseline JFIF bytes (Annex K tables, IJG quality).

    `restart_interval` > 0 emits a DRI segment and RSTn markers every that
    many MCUs (predictors reset, bitstream re-aligned) — on a real encoder
    this is what makes the entropy stream independently decodable per
    stripe (the parallel-decode hook at scale)."""
    assert pixels.dtype == np.uint8 and pixels.ndim == 3 and pixels.shape[2] == 3
    h, w = pixels.shape[:2]
    qt_l = _quality_scale(QT_LUMA, quality)
    qt_c = _quality_scale(QT_CHROMA, quality)
    y, cb, cr = _rgb_to_ycbcr(pixels)

    if subsampling == "420":
        hs = vs = 2
        # pad to even then 2x2 box average
        eh, ew = -(-h // 2) * 2, -(-w // 2) * 2
        cb = np.pad(cb, ((0, eh - h), (0, ew - w)), mode="edge")
        cr = np.pad(cr, ((0, eh - h), (0, ew - w)), mode="edge")
        cb = cb.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
    elif subsampling == "444":
        hs = vs = 1
    else:
        raise ValueError(f"unsupported subsampling {subsampling!r}")

    yb, ybh, ybw = _plane_blocks(y - 128.0)
    cbb, cbh, cbw = _plane_blocks(cb - 128.0)
    crb, _, _ = _plane_blocks(cr - 128.0)
    # MCU alignment for 4:2:0: luma block grid must be even
    if hs == 2 and (ybh % 2 or ybw % 2):
        ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
        ypad = np.pad(y - 128.0, ((0, ph - h), (0, pw - w)), mode="edge")
        yb, ybh, ybw = _plane_blocks(ypad)

    zz_y = _fdct_quant(yb, qt_l)
    zz_cb = _fdct_quant(cbb, qt_c)
    zz_cr = _fdct_quant(crb, qt_c)

    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    bw = _BitWriter()
    pred = [0, 0, 0]
    parts: list[bytes] = []
    mcu_count = 0
    rst = 0
    mcus_y = ybh // vs
    mcus_x = ybw // hs
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                parts.append(bw.flush())
                parts.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                bw = _BitWriter()
                pred = [0, 0, 0]
            for by in range(vs):
                for bx in range(hs):
                    idx = (my * vs + by) * ybw + (mx * hs + bx)
                    pred[0] = _encode_block(bw, zz_y[idx], pred[0], dc_l, ac_l)
            idx = my * cbw + mx
            pred[1] = _encode_block(bw, zz_cb[idx], pred[1], dc_c, ac_c)
            pred[2] = _encode_block(bw, zz_cr[idx], pred[2], dc_c, ac_c)
            mcu_count += 1
    parts.append(bw.flush())
    entropy = b"".join(parts)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dqt(tid: int, qt: np.ndarray) -> bytes:
        return seg(0xFFDB, bytes([tid]) + bytes(qt.reshape(64)[ZIGZAG].tolist()))

    def dht(tclass: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xFFC4, bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals))

    app0 = seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = seg(0xFFDD, struct.pack(">H", restart_interval)) if restart_interval else b""
    sof = seg(
        0xFFC0,
        bytes([8])
        + struct.pack(">HH", h, w)
        + bytes([3])
        + bytes([1, (hs << 4) | vs, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    sos = seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]))
    return (
        b"\xff\xd8"
        + app0
        + dqt(0, qt_l)
        + dqt(1, qt_c)
        + dri
        + sof
        + dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        + sos
        + entropy
        + b"\xff\xd9"
    )


def encode_jpeg_gray(pixels: np.ndarray, quality: int = 90) -> bytes:
    """Grayscale Hx W (or HxWx1) uint8 -> single-component baseline JFIF.
    Exercises the decoder's 1-component path with a real producer."""
    if pixels.ndim == 3:
        pixels = pixels[..., 0]
    assert pixels.dtype == np.uint8 and pixels.ndim == 2
    h, w = pixels.shape
    qt_l = _quality_scale(QT_LUMA, quality)
    yb, ybh, ybw = _plane_blocks(pixels.astype(np.float64) - 128.0)
    zz_y = _fdct_quant(yb, qt_l)
    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    bw = _BitWriter()
    pred = 0
    for idx in range(ybh * ybw):
        pred = _encode_block(bw, zz_y[idx], pred, dc_l, ac_l)
    entropy = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    return (
        b"\xff\xd8"
        + seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
        + seg(0xFFDB, bytes([0]) + bytes(qt_l.reshape(64)[ZIGZAG].tolist()))
        + seg(0xFFC0, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))
        + seg(0xFFC4, bytes([0x00]) + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS))
        + seg(0xFFC4, bytes([0x10]) + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS))
        + seg(0xFFDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + entropy
        + b"\xff\xd9"
    )


# ---------------------------------------------------------------------------
# decoder


def _idct(zz_blocks: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """(N,64) zigzag quantized -> (N,8,8) spatial (still level-shifted)."""
    coef = np.zeros((zz_blocks.shape[0], 64), dtype=np.float64)
    coef[:, ZIGZAG] = zz_blocks
    coef = coef.reshape(-1, 8, 8) * qt
    return np.einsum("ji,njk,kl->nil", _C, coef, _C, optimize=True)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> RGB8 HxWx3.  Raises ValueError on malformed
    input, NotImplementedError on non-baseline modes."""
    try:
        return _decode_jpeg(data)
    except (IndexError, KeyError, struct.error) as e:
        # malformed input hits a bounds/lookup error somewhere in the
        # parse — normalize to the documented error type
        raise ValueError(f"malformed JPEG: {type(e).__name__}: {e}") from e


def _read_symbol(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _split_entropy(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded bytes starting at `pos`: un-stuff FF00, split on RSTn,
    stop before the next real marker.  Returns (segments, index of the
    terminating 0xFF or end-of-data)."""
    segments: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(data)
    while i < n:
        b = data[i]
        if b == 0xFF and i + 1 < n:
            nxt = data[i + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # next marker terminates the scan
        cur.append(b)
        i += 1
    segments.append(bytes(cur))
    return segments, i


def _wrap32(v: int) -> int:
    # wrap to int32 so corrupt streams can't overflow the coefficient
    # array (real DC values are <= 12 bits before the point transform)
    return (v + 2**31) % 2**32 - 2**31


def _comp_block_grid(frame: dict, c: dict) -> tuple[int, int]:
    """Non-interleaved block grid (bw, bh) for one component: T.81 A.2.2 —
    ceil(comp dimension / 8) of the component's own sample dimensions."""
    hmax = max(cc["h"] for cc in frame["comps"])
    vmax = max(cc["v"] for cc in frame["comps"])
    comp_w = -(-frame["w"] * c["h"] // hmax)
    comp_h = -(-frame["h"] * c["v"] // vmax)
    return -(-comp_w // 8), -(-comp_h // 8)


def _decode_baseline_scan(
    frame: dict,
    comp_zz: dict[int, np.ndarray],
    huff: dict,
    scan_comps: list[dict],
    segments: list[bytes],
    restart_interval: int,
    mcus_x: int,
    mcus_y: int,
) -> None:
    by_id = {c["id"]: c for c in frame["comps"]}
    pred = {c["id"]: 0 for c in frame["comps"]}
    seg_idx = 0
    reader = _BitReader(segments[0])
    mcu_in_seg = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and mcu_in_seg == restart_interval and seg_idx + 1 < len(segments):
            seg_idx += 1
            reader = _BitReader(segments[seg_idx])
            mcu_in_seg = 0
            pred = {c["id"]: 0 for c in frame["comps"]}
        my, mx = divmod(m, mcus_x)
        for sc in scan_comps:
            c = by_id[sc["id"]]
            dct = huff.get((0, sc["dc"]))
            act = huff.get((1, sc["ac"]))
            if dct is None or act is None:
                raise ValueError("missing Huffman table for scan")
            bw_ = mcus_x * c["h"]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = comp_zz[c["id"]][(my * c["v"] + by) * bw_ + (mx * c["h"] + bx)]
                    s = _read_symbol(reader, dct)
                    if s > 15:
                        raise ValueError(f"invalid DC category {s}")
                    diff = _extend(reader.receive(s), s) if s else 0
                    pred[c["id"]] = _wrap32(pred[c["id"]] + diff)
                    zz[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = _read_symbol(reader, act)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC run overflow")
                        zz[k] = _extend(reader.receive(s), s)
                        k += 1
        mcu_in_seg += 1


def _refine_nonzero(reader: _BitReader, zz: np.ndarray, k: int, p1: int) -> None:
    """AC refinement correction bit (T.81 G.2, Annex G figure G.12 path):
    a 1-bit means the already-nonzero coefficient's magnitude grows by
    1 << Al (unless this scan already set that bit)."""
    if reader.bit():
        coef = int(zz[k])
        if (coef & p1) == 0:
            zz[k] = coef + (p1 if coef >= 0 else -p1)


def _ac_first_unit(
    reader: _BitReader, act: dict, zz: np.ndarray, ss: int, se: int, al: int, eobrun: int
) -> int:
    """One block of a first AC scan (Ah=0): T.81 G.1.2.2 semantics — the
    decoded magnitude is scaled by 1 << Al (sign-magnitude point
    transform), EOBn codes start a run of all-zero bands."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _read_symbol(reader, act)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL: sixteen zero coefficients
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.receive(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("AC run overflow")
        zz[k] = _wrap32(_extend(reader.receive(s), s) << al)
        k += 1
    return 0


def _ac_refine_unit(
    reader: _BitReader, act: dict, zz: np.ndarray, ss: int, se: int, al: int, eobrun: int
) -> int:
    """One block of a refinement AC scan (Ah = Al + 1): T.81 G.2 — newly
    significant coefficients arrive as ±1 << Al; every already-nonzero
    coefficient crossed (by a run, a ZRL, or an EOB run) carries one
    correction bit."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _read_symbol(reader, act)
            r, s = rs >> 4, rs & 0xF
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break  # rest of band handled by the EOB logic below
                # r == 15: ZRL — skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("refinement scan coefficient size must be 1")
                val = p1 if reader.bit() else -p1
            while k <= se:
                if zz[k] != 0:
                    _refine_nonzero(reader, zz, k, p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise ValueError("refinement position overflow")
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                _refine_nonzero(reader, zz, k, p1)
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(
    frame: dict,
    comp_zz: dict[int, np.ndarray],
    huff: dict,
    scan_comps: list[dict],
    ss: int,
    se: int,
    ah: int,
    al: int,
    segments: list[bytes],
    restart_interval: int,
    mcus_x: int,
    mcus_y: int,
) -> None:
    """One progressive scan (T.81 Annex G decode): DC scans may be
    interleaved; AC scans are single-component over the component's own
    (non-MCU-padded) block grid.  Restart markers reset DC predictors and
    the EOB run."""
    by_id = {c["id"]: c for c in frame["comps"]}
    state = {"seg": 0, "reader": _BitReader(segments[0]), "count": 0}

    def maybe_restart() -> bool:
        if (
            restart_interval
            and state["count"]
            and state["count"] % restart_interval == 0
            and state["seg"] + 1 < len(segments)
        ):
            state["seg"] += 1
            state["reader"] = _BitReader(segments[state["seg"]])
            return True
        return False

    if ss == 0:  # DC scan
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        comps = [by_id[sc["id"]] for sc in scan_comps]
        dctabs = {}
        if ah == 0:
            for sc in scan_comps:
                tab = huff.get((0, sc["dc"]))
                if tab is None:
                    raise ValueError("missing DC table for scan")
                dctabs[sc["id"]] = tab
        pred = {c["id"]: 0 for c in comps}

        def dc_unit(zz: np.ndarray, cid: int) -> None:
            r = state["reader"]
            if ah == 0:
                s = _read_symbol(r, dctabs[cid])
                if s > 15:
                    raise ValueError(f"invalid DC category {s}")
                diff = _extend(r.receive(s), s) if s else 0
                pred[cid] = _wrap32(pred[cid] + diff)
                zz[0] = _wrap32(pred[cid] << al)
            else:  # refinement: one raw bit appends bit Al (G.2, two's
                # complement — OR works for negatives too)
                if r.bit():
                    zz[0] = _wrap32(int(zz[0]) | (1 << al))

        if len(scan_comps) > 1:  # interleaved over MCUs
            for m in range(mcus_x * mcus_y):
                if maybe_restart():
                    pred = {c["id"]: 0 for c in comps}
                my, mx = divmod(m, mcus_x)
                for c in comps:
                    stride = mcus_x * c["h"]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            idx = (my * c["v"] + by) * stride + (mx * c["h"] + bx)
                            dc_unit(comp_zz[c["id"]][idx], c["id"])
                state["count"] += 1
        else:  # non-interleaved: the component's own block grid
            c = comps[0]
            bw_c, bh_c = _comp_block_grid(frame, c)
            stride = mcus_x * c["h"]
            for b in range(bw_c * bh_c):
                if maybe_restart():
                    pred = {c["id"]: 0 for c in comps}
                by, bx = divmod(b, bw_c)
                dc_unit(comp_zz[c["id"]][by * stride + bx], c["id"])
                state["count"] += 1
        return

    # AC scan: exactly one component (T.81 G.1.1.1)
    if len(scan_comps) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if se < ss or se > 63:
        raise ValueError(f"invalid spectral band {ss}..{se}")
    sc = scan_comps[0]
    c = by_id[sc["id"]]
    act = huff.get((1, sc["ac"]))
    if act is None:
        raise ValueError("missing AC table for scan")
    bw_c, bh_c = _comp_block_grid(frame, c)
    stride = mcus_x * c["h"]
    eobrun = 0
    for b in range(bw_c * bh_c):
        if maybe_restart():
            eobrun = 0
        by, bx = divmod(b, bw_c)
        zz = comp_zz[c["id"]][by * stride + bx]
        if ah == 0:
            eobrun = _ac_first_unit(state["reader"], act, zz, ss, se, al, eobrun)
        else:
            eobrun = _ac_refine_unit(state["reader"], act, zz, ss, se, al, eobrun)
        state["count"] += 1


def _decode_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    progressive = False
    restart_interval = 0
    comp_zz: dict[int, np.ndarray] = {}
    mcus_x = mcus_y = 0
    n_scans = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        if pos + 2 > len(data):
            raise ValueError("truncated segment header")
        (ln,) = struct.unpack(">H", data[pos : pos + 2])
        payload = data[pos + 2 : pos + ln]
        if len(payload) != ln - 2:
            raise ValueError("truncated segment payload")
        pos += ln
        if marker == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0xF
                p += 1
                if pq:
                    vals = np.frombuffer(payload[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                else:
                    vals = np.frombuffer(payload[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = vals
                qts[tq] = nat.reshape(8, 8)
        elif marker == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0xF
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                huff[(tc, th)] = _decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec = payload[0]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision supported")
            fh, fw = struct.unpack(">HH", payload[1:5])
            if fh == 0 or fw == 0 or fh * fw > 100_000_000:
                # 0-dim or absurd dims (a flipped SOF byte on adversarial
                # input must not allocate gigabytes of coefficient arrays)
                raise ValueError(f"invalid frame dimensions {fw}x{fh}")
            ncomp = payload[5]
            comps = []
            for c in range(ncomp):
                cid, sf, tq = payload[6 + 3 * c : 9 + 3 * c]
                hv, vv = sf >> 4, sf & 0xF
                if not (1 <= hv <= 4 and 1 <= vv <= 4):
                    raise ValueError(f"invalid sampling factors {hv}x{vv}")
                comps.append({"id": cid, "h": hv, "v": vv, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
            progressive = marker == 0xC2
            hmax = max(c["h"] for c in frame["comps"])
            vmax = max(c["v"] for c in frame["comps"])
            if hmax > 2 or vmax > 2:
                raise NotImplementedError("sampling factors > 2 not supported")
            mcus_x = -(-fw // (8 * hmax))
            mcus_y = -(-fh // (8 * vmax))
            comp_zz = {}
            for c in frame["comps"]:
                nb = mcus_y * c["v"] * mcus_x * c["h"]
                comp_zz[c["id"]] = np.zeros((nb, 64), dtype=np.int32)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(f"unsupported SOF 0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", payload[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = payload[0]
            scan_comps = []
            for c in range(ns):
                cs, tt = payload[1 + 2 * c : 3 + 2 * c]
                scan_comps.append({"id": cs, "dc": tt >> 4, "ac": tt & 0xF})
            ss, se = payload[1 + 2 * ns], payload[2 + 2 * ns]
            ahal = payload[3 + 2 * ns]
            segments, pos = _split_entropy(data, pos)
            n_scans += 1
            if progressive:
                _decode_prog_scan(
                    frame, comp_zz, huff, scan_comps, ss, se, ahal >> 4, ahal & 0xF,
                    segments, restart_interval, mcus_x, mcus_y,
                )
            else:
                if n_scans > 1:
                    raise NotImplementedError("multi-scan sequential JPEG")
                _decode_baseline_scan(
                    frame, comp_zz, huff, scan_comps, segments,
                    restart_interval, mcus_x, mcus_y,
                )
        # APPn / COM / others: skipped
    if frame is None or n_scans == 0:
        raise ValueError("missing SOF/SOS")
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])

    planes: dict[int, np.ndarray] = {}
    for c in frame["comps"]:
        qt = qts.get(c["tq"])
        if qt is None:
            raise ValueError("missing quant table")
        spatial = _idct(comp_zz[c["id"]], qt) + 128.0
        bh, bw_ = mcus_y * c["v"], mcus_x * c["h"]
        plane = spatial.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
        # upsample to full resolution (sample replication)
        plane = plane.repeat(vmax // c["v"], axis=0).repeat(hmax // c["h"], axis=1)
        planes[c["id"]] = plane[: frame["h"], : frame["w"]]

    ids = sorted(planes)
    if len(ids) == 3:
        y, cb, cr = (planes[i] for i in ids)
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=-1)
    elif len(ids) == 1:
        rgb = np.repeat(planes[ids[0]][..., None], 3, axis=-1)
    else:
        raise NotImplementedError(f"{len(ids)}-component JPEG not supported")
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)

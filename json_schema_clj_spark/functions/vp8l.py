"""Pure-numpy/stdlib VP8L (lossless WebP) codec.

Implements the WebP Lossless Bitstream Specification subset needed for a
real encode → decode → pixel round-trip without any image library:

* RIFF/WEBP container with a single VP8L chunk.
* LSB-first bit packing; canonical prefix codes read MSB-of-code-first.
* Prefix-code serialization: both the *simple* form (1-2 symbols) and the
  *full* form (3-bit code-length-code lengths in kCodeLengthCodeOrder,
  repeat symbols 16/17/18), exactly as the spec's normal form.
* Literals (G,R,B,A), backward references (24-symbol length prefix code,
  40-symbol distance prefix code, 120-entry 2-D short-distance map), and
  the color cache ((0x1e35a7bd * argb) >> (32 - bits) insertion on every
  emitted pixel).
* The SUBTRACT_GREEN transform (type 2).  PREDICTOR / COLOR /
  COLOR_INDEXING transforms and meta prefix codes are NOT implemented —
  `decode_webp` raises NotImplementedError on streams that use them (the
  same documented-subset stance as the RGB8-only PNG codec and the
  baseline-only JPEG codec in this repo).

The encoder always produces spec-conformant streams (any conformant VP8L
decoder can read them); the decoder reads the full non-transformed /
subtract-green subset including features the default encoder does not
emit (cache + backrefs are exercised by encoder options in tests).

Reference parity note: the reference repo (json-schema.clj) has no image
layer at all — this module serves the BASELINE.json input_hint's per-row
decoded-pixel invariant (PSNR >= 40 dB lossy / exact lossless) for the
`webp` value of the `fmt` column.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

# kCodeLengthCodeOrder — spec §"Decoding the code lengths"
CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16]

# kDistanceMap — spec §"Distance mapping" (120 short 2-D offsets)
DISTANCE_MAP = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
]

NUM_LENGTH_CODES = 24  # green symbols 256..279
NUM_DISTANCE_CODES = 40
CACHE_MULTIPLIER = 0x1E35A7BD


# ---------------------------------------------------------------------------
# bit I/O — VP8L packs bits LSB-first into bytes


class BitWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        """Append `nbits` of `value`, LSB of value first."""
        self._acc |= (value & ((1 << nbits) - 1)) << self._nbits
        self._nbits += nbits
        while self._nbits >= 8:
            self._out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code bits go MSB-of-code-first (one bit at a time)."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def flush(self) -> bytes:
        if self._nbits:
            self._out.append(self._acc & 0xFF)
            self._acc = 0
            self._nbits = 0
        return bytes(self._out)


class BitReader:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0
        self._bit = 0

    def read(self, nbits: int) -> int:
        v = 0
        for i in range(nbits):
            if self._pos >= len(self._data):
                raise ValueError("VP8L bitstream truncated")
            bit = (self._data[self._pos] >> self._bit) & 1
            v |= bit << i
            self._bit += 1
            if self._bit == 8:
                self._bit = 0
                self._pos += 1
        return v


# ---------------------------------------------------------------------------
# canonical prefix codes


def _huffman_lengths(freqs: list[int], max_len: int) -> list[int]:
    """Code lengths from symbol frequencies, limited to `max_len` via a
    Kraft-sum repair pass (images here are small; the repair is rarely
    exercised but keeps the stream valid on adversarial histograms)."""
    live = [(f, s) for s, f in enumerate(freqs) if f > 0]
    n = len(freqs)
    if not live:
        return [0] * n
    if len(live) == 1:
        out = [0] * n
        out[live[0][1]] = 1
        return out
    heap: list[tuple[int, int, list[int]]] = []
    for uid, (f, s) in enumerate(live):
        heapq.heappush(heap, (f, uid, [s]))
    depth = {s: 0 for _, s in live}
    uid = len(live)
    while len(heap) > 1:
        fa, _, sa = heapq.heappop(heap)
        fb, _, sb = heapq.heappop(heap)
        for s in sa + sb:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, uid, sa + sb))
        uid += 1
    out = [0] * n
    for s, d in depth.items():
        out[s] = d
    if max(depth.values()) > max_len:
        # clamp then repair the Kraft sum by deepening the shallowest codes
        for s in depth:
            out[s] = min(out[s], max_len)
        kraft = sum(1 << (max_len - out[s]) for s in depth)
        limit = 1 << max_len
        syms = sorted(depth, key=lambda s: (out[s], s))
        i = 0
        while kraft > limit:
            s = syms[i % len(syms)]
            if out[s] < max_len:
                kraft -= 1 << (max_len - out[s] - 1)
                out[s] += 1
            i += 1
    return out


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """Symbol -> (code, length); canonical assignment (by length, then by
    symbol), code bits read MSB-first."""
    max_len = max(lengths, default=0)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    next_code = [0] * (max_len + 2)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out: dict[int, tuple[int, int]] = {}
    for sym in range(len(lengths)):
        ln = lengths[sym]
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class CanonicalDecoder:
    """Bit-at-a-time canonical decode (first[], count[], symbol table)."""

    def __init__(self, lengths: list[int]) -> None:
        max_len = max(lengths, default=0)
        if max_len == 0:
            raise ValueError("empty prefix code")
        self.max_len = max_len
        self.count = [0] * (max_len + 1)
        for ln in lengths:
            if ln:
                self.count[ln] += 1
        self.syms: list[int] = sorted(
            (s for s, ln in enumerate(lengths) if ln), key=lambda s: (lengths[s], s)
        )
        self.first = [0] * (max_len + 1)
        self.offset = [0] * (max_len + 1)
        code = 0
        off = 0
        for ln in range(1, max_len + 1):
            self.first[ln] = code
            self.offset[ln] = off
            code = (code + self.count[ln]) << 1
            off += self.count[ln]
        # single-symbol codes cost zero bits in VP8L's simple form only;
        # full codes always read >= 1 bit
        self.single = self.syms[0] if len(self.syms) == 1 and lengths[self.syms[0]] == 0 else None

    def read(self, br: BitReader) -> int:
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read(1)
            idx = code - self.first[ln]
            if 0 <= idx < self.count[ln]:
                return self.syms[self.offset[ln] + idx]
        raise ValueError("invalid prefix code in VP8L stream")


class _ZeroBitCode:
    """A 1-symbol simple code: zero bits per token."""

    def __init__(self, sym: int) -> None:
        self._sym = sym

    def read(self, br: BitReader) -> int:  # noqa: ARG002 - signature parity
        return self._sym


# ---------------------------------------------------------------------------
# prefix-code (de)serialization


def _write_code_lengths(bw: BitWriter, lengths: list[int]) -> None:
    """Full-form serialization: RLE (16/17/18) + code-length-code header."""
    # RLE the lengths exactly like DEFLATE/VP8L
    tokens: list[tuple[int, int]] = []  # (symbol, extra)
    i = 0
    n = len(lengths)
    prev_nz = 8  # spec: initial "previous code length" default
    while i < n:
        ln = lengths[i]
        run = 1
        while i + run < n and lengths[i + run] == ln:
            run += 1
        if ln == 0:
            left = run
            while left >= 3:
                take = min(left, 138)
                if take >= 11:
                    tokens.append((18, take - 11))
                else:
                    tokens.append((17, take - 3))
                left -= take
            for _ in range(left):
                tokens.append((0, 0))
        else:
            start = 0
            if ln != prev_nz:
                tokens.append((ln, 0))
                start = 1
            left = run - start
            while left >= 3:
                take = min(left, 6)
                tokens.append((16, take - 3))
                left -= take
            for _ in range(left):
                tokens.append((ln, 0))
            prev_nz = ln
        i += run
    # code-length-code over the 19 token symbols, depth <= 7
    freqs = [0] * 19
    for sym, _ in tokens:
        freqs[sym] += 1
    cl_lengths = _huffman_lengths(freqs, 7)
    if sum(1 for x in cl_lengths if x) == 1:
        # a full code needs >= 1 bit per token; force a 2-symbol code
        lone = next(s for s, x in enumerate(cl_lengths) if x)
        cl_lengths[lone] = 1
        cl_lengths[(lone + 1) % 19] = 1
    cl_codes = _canonical_codes(cl_lengths)
    ordered = [cl_lengths[s] for s in CODE_LENGTH_ORDER]
    num = len(ordered)
    while num > 4 and ordered[num - 1] == 0:
        num -= 1
    bw.write(num - 4, 4)
    for j in range(num):
        bw.write(ordered[j], 3)
    bw.write(0, 1)  # no explicit max_symbol: tokens cover the full alphabet
    for sym, extra in tokens:
        code, ln = cl_codes[sym]
        bw.write_code(code, ln)
        if sym == 16:
            bw.write(extra, 2)
        elif sym == 17:
            bw.write(extra, 3)
        elif sym == 18:
            bw.write(extra, 7)


def _write_prefix_code(bw: BitWriter, freqs: list[int]) -> dict[int, tuple[int, int]]:
    """Serialize one prefix code (simple or full form); return the encoder
    map symbol -> (code, length).  A 1-symbol code costs zero bits/token."""
    present = [s for s, f in enumerate(freqs) if f > 0]
    if not present:
        present = [0]
    if len(present) <= 2 and max(present) <= 255:
        bw.write(1, 1)  # simple
        bw.write(len(present) - 1, 1)
        first = present[0]
        if first <= 1:
            bw.write(0, 1)
            bw.write(first, 1)
        else:
            bw.write(1, 1)
            bw.write(first, 8)
        if len(present) == 2:
            bw.write(present[1], 8)
            return {present[0]: (0, 1), present[1]: (1, 1)}
        return {present[0]: (0, 0)}
    bw.write(0, 1)  # full
    lengths = _huffman_lengths(freqs, 15)
    _write_code_lengths(bw, lengths)
    return _canonical_codes(lengths)


def _read_prefix_code(br: BitReader, alphabet_size: int):
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        if br.read(1):
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        if num_symbols == 2:
            sym1 = br.read(8)
            if sym0 >= alphabet_size or sym1 >= alphabet_size:
                raise ValueError("VP8L simple-code symbol out of range")
            lengths = [0] * alphabet_size
            lengths[sym0] = 1
            lengths[sym1] = 1
            return CanonicalDecoder(lengths)
        if sym0 >= alphabet_size:
            raise ValueError("VP8L simple-code symbol out of range")
        return _ZeroBitCode(sym0)
    # full form
    num = 4 + br.read(4)
    cl_lengths = [0] * 19
    for j in range(num):
        cl_lengths[CODE_LENGTH_ORDER[j]] = br.read(3)
    cl_dec = CanonicalDecoder(cl_lengths)
    if br.read(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_nz = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        sym = cl_dec.read(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_nz = sym
        elif sym == 16:
            rep = 3 + br.read(2)
            for _ in range(rep):
                if i < alphabet_size:
                    lengths[i] = prev_nz
                    i += 1
        elif sym == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return CanonicalDecoder(lengths)


# ---------------------------------------------------------------------------
# LZ77 prefix values (lengths and distances share this coding)


def _prefix_encode(value: int) -> tuple[int, int, int]:
    """value (>=1) -> (symbol, extra_bits_count, extra_bits_value)."""
    x = value - 1
    if x < 4:
        return x, 0, 0
    n = x.bit_length()  # >= 3
    extra = n - 2
    b = (x >> (n - 2)) & 1  # second-highest bit picks the 2<<e / 3<<e bucket
    offset = (2 + b) << extra
    sym = 2 * extra + 2 + b
    return sym, extra, x - offset


def _prefix_decode(sym: int, br: BitReader) -> int:
    if sym < 4:
        return sym + 1
    extra = (sym - 2) >> 1
    offset = (2 + (sym & 1)) << extra
    return offset + br.read(extra) + 1


def _cache_index(argb: int, bits: int) -> int:
    return ((CACHE_MULTIPLIER * argb) & 0xFFFFFFFF) >> (32 - bits)


# ---------------------------------------------------------------------------
# encoder


def encode_vp8l(
    pixels: np.ndarray,
    *,
    subtract_green: bool = False,
    cache_bits: int = 0,
    use_backrefs: bool = False,
) -> bytes:
    """RGB8 HxWx3 -> VP8L payload bytes (lossless).

    Options exist to exercise decoder paths (transform, color cache,
    backward references); all combinations round-trip bit-exactly."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    assert 1 <= w <= (1 << 14) and 1 <= h <= (1 << 14)
    r = pixels[..., 0].astype(np.int32)
    g = pixels[..., 1].astype(np.int32)
    b = pixels[..., 2].astype(np.int32)
    if subtract_green:
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF
    rr, gg, bb = (x.reshape(-1) for x in (r, g, b))
    n_px = w * h
    argb = ((0xFF << 24) | (rr << 16) | (gg << 8) | bb).astype(np.int64)

    # token stream: ('lit', i) | ('ref', length, dist) | ('cache', idx)
    tokens: list[tuple] = []
    cache = [-1] * (1 << cache_bits) if cache_bits else None
    i = 0
    while i < n_px:
        if use_backrefs and i >= 1:
            # distance-1 run (repeat previous pixel) — the common flat-area case
            run = 0
            while i + run < n_px and argb[i + run] == argb[i - 1] and run < 4096:
                run += 1
            if run >= 3:
                tokens.append(("ref", run, 1))
                if cache is not None:
                    v = int(argb[i - 1])
                    cache[_cache_index(v, cache_bits)] = v
                i += run
                continue
        v = int(argb[i])
        if cache is not None:
            idx = _cache_index(v, cache_bits)
            if cache[idx] == v:
                tokens.append(("cache", idx))
                i += 1
                continue
            cache[idx] = v
        tokens.append(("lit", i))
        i += 1

    cache_size = (1 << cache_bits) if cache_bits else 0
    green_n = 256 + NUM_LENGTH_CODES + cache_size
    fg = [0] * green_n
    fr = [0] * 256
    fb = [0] * 256
    fa = [0] * 256
    fd = [0] * NUM_DISTANCE_CODES
    for tok in tokens:
        if tok[0] == "lit":
            j = tok[1]
            fg[int(gg[j])] += 1
            fr[int(rr[j])] += 1
            fb[int(bb[j])] += 1
            fa[0xFF] += 1
        elif tok[0] == "ref":
            lsym, _, _ = _prefix_encode(tok[1])
            fg[256 + lsym] += 1
            dsym, _, _ = _prefix_encode(tok[2] + 120)  # linear distance code
            fd[dsym] += 1
        else:
            fg[256 + NUM_LENGTH_CODES + tok[1]] += 1

    bw = BitWriter()
    bw.write(0x2F, 8)  # signature
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha_is_used
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    bw.write(0, 1)  # no meta prefix codes
    cg = _write_prefix_code(bw, fg)
    cr = _write_prefix_code(bw, fr)
    cb = _write_prefix_code(bw, fb)
    ca = _write_prefix_code(bw, fa)
    cd = _write_prefix_code(bw, fd)
    for tok in tokens:
        if tok[0] == "lit":
            j = tok[1]
            bw.write_code(*cg[int(gg[j])])
            bw.write_code(*cr[int(rr[j])])
            bw.write_code(*cb[int(bb[j])])
            bw.write_code(*ca[0xFF])
        elif tok[0] == "ref":
            lsym, lx, lv = _prefix_encode(tok[1])
            bw.write_code(*cg[256 + lsym])
            if lx:
                bw.write(lv, lx)
            dsym, dx, dv = _prefix_encode(tok[2] + 120)
            bw.write_code(*cd[dsym])
            if dx:
                bw.write(dv, dx)
        else:
            bw.write_code(*cg[256 + NUM_LENGTH_CODES + tok[1]])
    return bw.flush()


def decode_vp8l(payload: bytes) -> np.ndarray:
    """VP8L payload -> RGB8 HxWx3.  Subset: no PREDICTOR/COLOR/
    COLOR_INDEXING transforms, no meta prefix codes (raises
    NotImplementedError on those)."""
    br = BitReader(payload)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha_is_used
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    transforms: list[int] = []
    while br.read(1):
        ttype = br.read(2)
        if ttype != 2:  # SUBTRACT_GREEN carries no extra data
            raise NotImplementedError(f"VP8L transform {ttype} not supported")
        transforms.append(ttype)
    cache_bits = br.read(4) if br.read(1) else 0
    if br.read(1):
        raise NotImplementedError("VP8L meta prefix codes not supported")
    cache_size = (1 << cache_bits) if cache_bits else 0
    green = _read_prefix_code(br, 256 + NUM_LENGTH_CODES + cache_size)
    red = _read_prefix_code(br, 256)
    blue = _read_prefix_code(br, 256)
    alpha = _read_prefix_code(br, 256)
    dist = _read_prefix_code(br, NUM_DISTANCE_CODES)

    n_px = w * h
    out = np.zeros(n_px, dtype=np.int64)
    cache = [-1] * cache_size if cache_bits else None

    def insert(v: int) -> None:
        if cache is not None:
            cache[_cache_index(v, cache_bits)] = v

    i = 0
    while i < n_px:
        s = green.read(br)
        if s < 256:
            rv = red.read(br)
            bv = blue.read(br)
            av = alpha.read(br)
            v = (av << 24) | (s << 8) | (rv << 16) | bv
            out[i] = v
            insert(v)
            i += 1
        elif s < 256 + NUM_LENGTH_CODES:
            length = _prefix_decode(s - 256, br)
            dcode = _prefix_decode(dist.read(br), br)
            if dcode > 120:
                d = dcode - 120
            else:
                xo, yo = DISTANCE_MAP[dcode - 1]
                d = max(1, xo + yo * w)
            if d > i:
                raise ValueError("VP8L backward reference before image start")
            for _ in range(length):
                if i >= n_px:
                    raise ValueError("VP8L backward reference overruns image")
                v = int(out[i - d])
                out[i] = v
                insert(v)
                i += 1
        else:
            idx = s - 256 - NUM_LENGTH_CODES
            if cache is None or cache[idx] < 0:
                raise ValueError("VP8L color cache miss")
            out[i] = cache[idx]
            i += 1

    r = (out >> 16) & 0xFF
    g = (out >> 8) & 0xFF
    b = out & 0xFF
    for ttype in reversed(transforms):
        if ttype == 2:
            r = (r + g) & 0xFF
            b = (b + g) & 0xFF
    return (
        np.stack([r, g, b], axis=-1).astype(np.uint8).reshape(h, w, 3)
    )


# ---------------------------------------------------------------------------
# RIFF container


def encode_webp(pixels: np.ndarray, **kwargs) -> bytes:
    """RGB8 HxWx3 -> complete lossless .webp bytes (RIFF + VP8L chunk)."""
    payload = encode_vp8l(pixels, **kwargs)
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) % 2:
        chunk += b"\x00"  # RIFF chunks are 2-byte aligned
    body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_webp(data: bytes) -> np.ndarray:
    """Complete .webp bytes -> RGB8 HxWx3 (lossless VP8L only; VP8 lossy
    and VP8X extended files raise NotImplementedError)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP file")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if tag == b"VP8L":
            return decode_vp8l(data[pos + 8 : pos + 8 + size])
        if tag in (b"VP8 ", b"VP8X"):
            raise NotImplementedError(f"WebP chunk {tag!r} (lossy/extended) not supported")
        pos += 8 + size + (size & 1)
    raise ValueError("no VP8L chunk in WebP file")

"""Progressive JPEG (SOF2) encoder in pure numpy/stdlib.

Implements the public ITU-T T.81 / ISO 10918-1 progressive Huffman
process: spectral selection (per-band AC scans) AND successive
approximation (DC arithmetic-shift point transform per G.1.2.1, AC
sign-magnitude point transform per G.1.2.2, refinement scans with
correction bits and EOB-run buffering per G.1.2.3).  Huffman tables are
built per scan from measured symbol frequencies with the Annex K.2
optimization procedure (two lowest-frequency merge with the reserved
all-ones symbol, 16-bit length limiting), so first AC scans emit real
EOBn run codes — the decoder path in functions/jpeg.py exercises the
full Annex G grammar on these streams.

Because a complete progressive transmission delivers exactly the same
quantized coefficients as a baseline scan of the same planes and tables,
`decode_jpeg(encode_jpeg_progressive(px, q, sub))` is pixel-identical to
`decode_jpeg(encode_jpeg(px, q, sub))` — the invariant
tests/test_jpeg_progressive.py pins.

Everything here derives from the published spec (T.81 Annex G flow
charts G.3-G.7 and Annex K.2 figures K.1-K.4); no reference-repo code is
involved (the reference is a Clojure JSON-schema validator with no image
path — this module backs the multimodal extension layer, SURVEY.md §2.8).
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import (
    QT_CHROMA,
    QT_LUMA,
    ZIGZAG,
    _BitWriter,
    _canonical_codes,
    _category,
    _fdct_quant,
    _plane_blocks,
    _quality_scale,
    _rgb_to_ycbcr,
)

# the IJG-style default scan script: DC first (Al=1), coarse AC bands
# (spectral selection, Al=1..2), then DC + AC refinement passes down to
# Al=0 — exercises every progressive decode path
_DEFAULT_SCRIPT_3 = [
    {"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 0, "al": 1},
    {"comps": [0], "ss": 1, "se": 5, "ah": 0, "al": 2},
    {"comps": [1], "ss": 1, "se": 63, "ah": 0, "al": 1},
    {"comps": [2], "ss": 1, "se": 63, "ah": 0, "al": 1},
    {"comps": [0], "ss": 6, "se": 63, "ah": 0, "al": 2},
    {"comps": [0], "ss": 1, "se": 63, "ah": 2, "al": 1},
    {"comps": [0, 1, 2], "ss": 0, "se": 0, "ah": 1, "al": 0},
    {"comps": [1], "ss": 1, "se": 63, "ah": 1, "al": 0},
    {"comps": [2], "ss": 1, "se": 63, "ah": 1, "al": 0},
    {"comps": [0], "ss": 1, "se": 63, "ah": 1, "al": 0},
]

_DEFAULT_SCRIPT_1 = [
    {"comps": [0], "ss": 0, "se": 0, "ah": 0, "al": 1},
    {"comps": [0], "ss": 1, "se": 5, "ah": 0, "al": 2},
    {"comps": [0], "ss": 6, "se": 63, "ah": 0, "al": 2},
    {"comps": [0], "ss": 1, "se": 63, "ah": 2, "al": 1},
    {"comps": [0], "ss": 0, "se": 0, "ah": 1, "al": 0},
    {"comps": [0], "ss": 1, "se": 63, "ah": 1, "al": 0},
]


# ---------------------------------------------------------------------------
# Annex K.2 optimal Huffman table construction


def optimal_huffman(freq: np.ndarray) -> tuple[list[int], list[int]]:
    """Symbol frequencies (len 256) -> (BITS[16], HUFFVAL) per T.81 K.2:
    merge the two lowest-frequency part-trees (ties to the higher symbol),
    track code sizes through the `others` chain, then limit lengths to 16
    bits and drop the reserved symbol 257 that guarantees no code is
    all ones."""
    freq = np.asarray(freq, dtype=np.int64).copy()
    if freq.shape != (256,):
        raise ValueError("need 256 symbol frequencies")
    if not freq.any():
        raise ValueError("cannot build a Huffman table with no symbols")
    f = np.zeros(257, dtype=np.int64)
    f[:256] = freq
    f[256] = 1  # reserved: claims the all-ones code so no real symbol gets it
    codesize = [0] * 257
    others = [-1] * 257
    while True:
        nz = np.nonzero(f)[0]
        if len(nz) < 2:
            break
        # v1 = least frequency, ties to the LARGEST symbol value (K.2)
        m = f[nz].min()
        v1 = int(nz[f[nz] == m].max())
        nz2 = nz[nz != v1]
        m2 = f[nz2].min()
        v2 = int(nz2[f[nz2] == m2].max())
        f[v1] += f[v2]
        f[v2] = 0
        codesize[v1] += 1
        while others[v1] != -1:
            v1 = others[v1]
            codesize[v1] += 1
        others[v1] = v2
        codesize[v2] += 1
        while others[v2] != -1:
            v2 = others[v2]
            codesize[v2] += 1
    bits = [0] * 33
    for s in range(257):
        if codesize[s]:
            bits[codesize[s]] += 1
    # limit code lengths to 16 (K.2 figure K.3 "adjust BITS")
    i = 32
    while i > 16:
        while bits[i] > 0:
            j = i - 2
            while bits[j] == 0:
                j -= 1
            bits[i] -= 2
            bits[i - 1] += 1
            bits[j + 1] += 2
            bits[j] -= 1
        i -= 1
    # remove the reserved symbol's code from the longest used length
    i = 16
    while bits[i] == 0:
        i -= 1
    bits[i] -= 1
    vals = [s for s in sorted(range(256), key=lambda s: (codesize[s], s)) if codesize[s]]
    bits16 = bits[1:17]
    assert sum(bits16) == len(vals), "BITS/HUFFVAL mismatch"
    return bits16, vals


# ---------------------------------------------------------------------------
# two-pass emitters: one counts symbol frequencies, one writes bits


class _FreqPass:
    def __init__(self) -> None:
        self.freq: dict[tuple[int, int], np.ndarray] = {}

    def sym(self, cls: int, slot: int, symbol: int) -> None:
        f = self.freq.setdefault((cls, slot), np.zeros(256, dtype=np.int64))
        f[symbol] += 1

    def bits(self, value: int, n: int) -> None:  # raw bits don't affect tables
        pass


class _WritePass:
    def __init__(self, codes: dict[tuple[int, int], dict[int, tuple[int, int]]]) -> None:
        self.bw = _BitWriter()
        self.codes = codes

    def sym(self, cls: int, slot: int, symbol: int) -> None:
        code, ln = self.codes[(cls, slot)][symbol]
        self.bw.put(code, ln)

    def bits(self, value: int, n: int) -> None:
        if n:
            self.bw.put(value, n)


# ---------------------------------------------------------------------------
# per-scan encoders (T.81 Annex G)


def _enc_dc_scan(em, comps: list[dict], scan: dict, mcus_x: int, mcus_y: int) -> None:
    """DC scan, interleaved when the scan holds >1 component.  First pass
    (Ah=0) codes diffs of the arithmetic-shifted DC per G.1.2.1; refinement
    (Ah>0) is one raw bit per block — bit Al of the two's-complement DC."""
    al, first = scan["al"], scan["ah"] == 0
    members = [comps[i] for i in scan["comps"]]
    pred = [0] * len(members)

    def unit(ci: int, zz: np.ndarray) -> None:
        v = int(zz[0]) >> al  # arithmetic shift: DC point transform
        if first:
            diff = v - pred[ci]
            pred[ci] = v
            s = _category(diff)
            em.sym(0, members[ci]["dc_slot"], s)
            em.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)
        else:
            em.bits(v & 1, 1)

    if len(members) > 1:
        for m in range(mcus_x * mcus_y):
            my, mx = divmod(m, mcus_x)
            for ci, c in enumerate(members):
                stride = mcus_x * c["h"]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        unit(ci, c["zz"][(my * c["v"] + by) * stride + (mx * c["h"] + bx)])
    else:
        c = members[0]
        stride = mcus_x * c["h"]
        for b in range(c["bw"] * c["bh"]):
            by, bx = divmod(b, c["bw"])
            unit(0, c["zz"][by * stride + bx])


def _enc_ac_first(em, c: dict, scan: dict, mcus_x: int) -> None:
    """First AC scan (Ah=0) per G.1.2.2: sign-magnitude point transform,
    ZRL for 16-zero runs, EOBn run-length coding across blocks."""
    ss, se, al = scan["ss"], scan["se"], scan["al"]
    slot = 0
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            em.sym(1, slot, nb << 4)
            em.bits(eobrun & ((1 << nb) - 1), nb)
            eobrun = 0

    stride = mcus_x * c["h"]
    for b in range(c["bw"] * c["bh"]):
        by, bx = divmod(b, c["bw"])
        zz = c["zz"][by * stride + bx]
        r = 0
        for k in range(ss, se + 1):
            v = int(zz[k])
            t = (v if v >= 0 else -v) >> al
            if t == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                em.sym(1, slot, 0xF0)  # ZRL
                r -= 16
            s = t.bit_length()
            sv = t if v >= 0 else -t
            em.sym(1, slot, (r << 4) | s)
            em.bits(sv if sv >= 0 else sv + (1 << s) - 1, s)
            r = 0
        if r:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _enc_ac_refine(em, c: dict, scan: dict, mcus_x: int) -> None:
    """Refinement AC scan (Ah = Al + 1) per G.1.2.3: newly significant
    coefficients emit (run<<4)|1 + sign, already-significant ones buffer a
    correction bit; correction bits ride immediately after the symbol that
    closes their run (ZRL included), and whole-block EOB runs buffer their
    bits until the EOBn flush."""
    ss, se, al = scan["ss"], scan["se"], scan["al"]
    slot = 0
    eobrun = 0
    be: list[int] = []  # correction bits buffered across EOB-run blocks

    def flush_eob() -> None:
        nonlocal eobrun, be
        if eobrun:
            nb = eobrun.bit_length() - 1
            em.sym(1, slot, nb << 4)
            em.bits(eobrun & ((1 << nb) - 1), nb)
            eobrun = 0
        for bit in be:
            em.bits(bit, 1)
        be = []

    stride = mcus_x * c["h"]
    for b in range(c["bw"] * c["bh"]):
        by, bx = divmod(b, c["bw"])
        zz = c["zz"][by * stride + bx]
        vals = [int(zz[k]) for k in range(ss, se + 1)]
        t = [(v if v >= 0 else -v) >> al for v in vals]
        # index of the last NEWLY significant coefficient: runs past it
        # fold into the EOB run instead of emitting ZRLs
        eobpos = -1
        for i, tv in enumerate(t):
            if tv == 1:
                eobpos = i
        r = 0
        br: list[int] = []  # correction bits pending within this block
        for i, tv in enumerate(t):
            if tv == 0:
                r += 1
                continue
            while r > 15 and i <= eobpos:
                flush_eob()
                em.sym(1, slot, 0xF0)
                r -= 16
                for bit in br:
                    em.bits(bit, 1)
                br = []
            if tv > 1:  # already significant: next magnitude bit only
                br.append(tv & 1)
                continue
            flush_eob()
            em.sym(1, slot, (r << 4) | 1)
            em.bits(1 if vals[i] >= 0 else 0, 1)
            for bit in br:
                em.bits(bit, 1)
            br = []
            r = 0
        if r or br:
            eobrun += 1
            be.extend(br)
            if eobrun == 0x7FFF or len(be) > 900:
                flush_eob()
    flush_eob()


def _run_scan(em, comps: list[dict], scan: dict, mcus_x: int, mcus_y: int) -> None:
    if scan["ss"] == 0:
        _enc_dc_scan(em, comps, scan, mcus_x, mcus_y)
    else:
        if len(scan["comps"]) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if scan["ah"] == 0:
            _enc_ac_first(em, comps[scan["comps"][0]], scan, mcus_x)
        else:
            _enc_ac_refine(em, comps[scan["comps"][0]], scan, mcus_x)


# ---------------------------------------------------------------------------
# top-level encoder


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def encode_jpeg_progressive(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    script: list[dict] | None = None,
) -> bytes:
    """RGB8 HxWx3 (or grayscale HxW) -> progressive JFIF bytes (SOF2).

    Plane preparation, quantization and Annex K quant tables are identical
    to :func:`jpeg.encode_jpeg`, so a complete progressive transmission
    decodes pixel-identically to the baseline encoding of the same input.
    Each scan is encoded twice: a frequency pass feeds the Annex K.2 table
    builder, then the write pass emits DHT + SOS + entropy data.
    """
    gray = pixels.ndim == 2
    assert pixels.dtype == np.uint8 and (gray or pixels.shape[2] == 3)
    h, w = pixels.shape[:2]
    qt_l = _quality_scale(QT_LUMA, quality)
    qt_c = _quality_scale(QT_CHROMA, quality)

    if gray:
        y = pixels.astype(np.float64)
        hs = vs = 1
    else:
        y, cb, cr = _rgb_to_ycbcr(pixels)
        if subsampling == "420":
            hs = vs = 2
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
    if hs == 2 and (ybh % 2 or ybw % 2):
        ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
        ypad = np.pad(y - 128.0, ((0, ph - h), (0, pw - w)), mode="edge")
        yb, ybh, ybw = _plane_blocks(ypad)
    zz_y = _fdct_quant(yb, qt_l)

    mcus_x = -(-w // (8 * hs))
    mcus_y = -(-h // (8 * vs))
    # per-component: zz coefficients, MCU-grid stride implied by h/v, and
    # the REAL (non-MCU-padded) block grid for non-interleaved scans
    comps = [{
        "id": 1, "h": hs, "v": vs, "tq": 0, "dc_slot": 0, "zz": zz_y,
        "bw": -(-w // 8), "bh": -(-h // 8),
    }]
    if not gray:
        cbb, cbh, cbw = _plane_blocks(cb - 128.0)
        crb, _, _ = _plane_blocks(cr - 128.0)
        zz_cb = _fdct_quant(cbb, qt_c)
        zz_cr = _fdct_quant(crb, qt_c)
        cw, ch = -(-w // hs), -(-h // vs)
        for cid, zz in ((2, zz_cb), (3, zz_cr)):
            comps.append({
                "id": cid, "h": 1, "v": 1, "tq": 1, "dc_slot": 1, "zz": zz,
                "bw": -(-cw // 8), "bh": -(-ch // 8),
            })

    if script is None:
        script = _DEFAULT_SCRIPT_1 if gray else _DEFAULT_SCRIPT_3
    for scan in script:
        if any(i >= len(comps) for i in scan["comps"]):
            raise ValueError("scan references a missing component")

    out = bytearray()
    out += b"\xff\xd8"
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _seg(0xFFDB, bytes([0]) + bytes(qt_l.reshape(64)[ZIGZAG].tolist()))
    if not gray:
        out += _seg(0xFFDB, bytes([1]) + bytes(qt_c.reshape(64)[ZIGZAG].tolist()))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += _seg(0xFFC2, sof)

    for scan in script:
        freq = _FreqPass()
        _run_scan(freq, comps, scan, mcus_x, mcus_y)
        codes = {}
        for key, f in freq.freq.items():
            bits, vals = optimal_huffman(f)
            codes[key] = _canonical_codes(bits, vals)
            tc = key[0]
            out += _seg(0xFFC4, bytes([(tc << 4) | key[1]]) + bytes(bits) + bytes(vals))
        writer = _WritePass(codes)
        _run_scan(writer, comps, scan, mcus_x, mcus_y)
        sos = bytes([len(scan["comps"])])
        for i in scan["comps"]:
            c = comps[i]
            td = c["dc_slot"] if scan["ss"] == 0 and scan["ah"] == 0 else 0
            ta = 0  # the AC scan encoders always code into table slot 0
            sos += bytes([c["id"], (td << 4) | ta])
        sos += bytes([scan["ss"], scan["se"], (scan["ah"] << 4) | scan["al"]])
        out += _seg(0xFFDA, sos)
        out += writer.bw.flush()
    out += b"\xff\xd9"
    return bytes(out)

"""Deterministic synthetic image+caption table (FIXTURES.md §1).

Shape fixed by the input hint: ``(image_id string, bytes binary, w int,
h int, fmt string, caption string, phash bigint)`` plus ``part_id int``,
the per-partition verdict/manifest unit.

Generation is a pure function of (seed, row index) built entirely from
Catalyst expressions over ``spark.range(n)`` — fully distributed, no
driver-side loop, bit-reproducible at any parallelism level (required for
the two-cluster-size scaling evidence).

Violation injection (~0.5% per column, disjoint residues mod 200) gives
known-golden expected counts for the flagship validation schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# deliberately small word list: captions are seeded word sequences
_WORDS = [
    "amber", "basalt", "cedar", "delta", "ember", "fjord", "garnet", "harbor",
    "indigo", "juniper", "krill", "lumen", "maple", "nectar", "onyx", "prism",
    "quartz", "raven", "sable", "tundra",
]

MAGIC = {
    "png": "89504e470d0a1a0a",
    "jpeg": "ffd8ffe000104a46",
    "webp_riff": "52494646",  # RIFF....WEBP
    "webp_tag": "57454250",
}


def images_df(
    spark: SparkSession,
    n_rows: int,
    n_parts: int = 64,
    seed: int = 42,
    inject_violations: bool = True,
    drift: bool = False,
) -> DataFrame:
    """Build the synthetic images table.

    With ``drift=True``, partitions 32-63 draw ``w`` from a shifted
    distribution (w+1024 for ~30% of rows) — the drift-detection fixture
    (FIXTURES.md §5).
    """
    i = F.col("id")
    h = F.xxhash64(F.lit(seed), i)
    hex16 = F.format_string("%016x", h)

    image_id = F.concat(F.lit("img-"), hex16)
    if inject_violations:
        # 0.5%: malformed ids (uppercase → pattern violation)
        image_id = F.when(i % 200 == 7, F.upper(image_id)).otherwise(image_id)
        # exact duplicate ids at known indices: row i takes row i-1's id
        dup_id = F.concat(F.lit("img-"), F.format_string("%016x", F.xxhash64(F.lit(seed), i - 1)))
        image_id = F.when((i % 5000 == 4999) & (i > 0), dup_id).otherwise(image_id)

    # hash-based uniform draws: the multiplicative-lattice form aliases with
    # part_id = i mod 64 (each partition would occupy a different residue
    # lattice → false drift signals); xxhash64 is uniform per partition
    w = (F.pmod(F.xxhash64(F.lit(seed + 1), i), F.lit(4096)) + 1).cast("int")
    hgt = (F.pmod(F.xxhash64(F.lit(seed + 2), i), F.lit(4096)) + 1).cast("int")
    if inject_violations:
        w = F.when(i % 200 == 23, F.lit(0)).when(i % 200 == 57, F.lit(70000)).otherwise(w)
        hgt = F.when(i % 200 == 91, F.lit(0)).when(i % 200 == 123, F.lit(70000)).otherwise(hgt)

    part_id = F.pmod(i, F.lit(n_parts)).cast("int")
    if drift:
        # drifted partitions: +1024 on 30% of rows
        w = F.when((part_id >= n_parts // 2) & (F.pmod(h, F.lit(10)) < 3), w + 1024).otherwise(w)

    fmt = F.element_at(F.array(F.lit("jpeg"), F.lit("png"), F.lit("webp")), (i % 3 + 1).cast("int"))
    if inject_violations:
        fmt = F.when(i % 200 == 141, F.lit("bmp")).when(i % 200 == 173, F.lit("")).otherwise(fmt)

    # bytes: correct magic numbers + deterministic hash payload.  Real
    # (decodable) PNG pixel payloads are produced by the multimodal module's
    # Arrow UDF encoder; here the binary column carries magic + payload so
    # magic-number format checks are meaningful at any scale.
    payload = F.unhex(F.format_string("%016x%016x%016x", h, F.xxhash64(i, w), F.xxhash64(i, hgt)))
    magic = (
        F.when(fmt == "png", F.unhex(F.lit(MAGIC["png"])))
        .when(fmt == "jpeg", F.unhex(F.lit(MAGIC["jpeg"])))
        .when(
            fmt == "webp",
            F.concat(F.unhex(F.lit(MAGIC["webp_riff"])), F.unhex(F.lit("2a000000")), F.unhex(F.lit(MAGIC["webp_tag"]))),
        )
        .otherwise(F.unhex(F.lit("00000000")))
    )
    img_bytes = F.concat(magic, payload)
    if inject_violations:
        # truncated/garbage bytes → magic-number conformance failures
        img_bytes = F.when(i % 200 == 39, F.unhex(F.lit("deadbeef"))).otherwise(img_bytes)

    words = F.array(*[F.lit(wd) for wd in _WORDS])
    n_words = (F.pmod(h, F.lit(8)) + 1).cast("int")
    caption = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda k: F.element_at(words, (F.pmod(F.xxhash64(i, k), F.lit(len(_WORDS))) + 1).cast("int")),
        ),
        " ",
    )
    # supplementary-plane char every 1000th row: codepoint-length parity probe
    caption = F.when(i % 1000 == 0, F.concat(caption, F.lit(" \U0001F600"))).otherwise(caption)
    if inject_violations:
        caption = F.when(i % 200 == 63, F.lit(None).cast("string")).when(i % 200 == 87, F.lit("")).otherwise(caption)

    phash = F.xxhash64(F.floor(i / 997))

    return spark.range(n_rows).select(
        image_id.alias("image_id"),
        img_bytes.alias("bytes"),
        w.alias("w"),
        hgt.alias("h"),
        fmt.alias("fmt"),
        caption.alias("caption"),
        phash.alias("phash"),
        part_id.alias("part_id"),
    )


# The flagship schema validated against `images` (FIXTURES.md §1) — the
# minimum end-to-end slice of SURVEY.md §7 step 2.
FLAGSHIP_SCHEMA = {
    "type": "object",
    "required": ["image_id", "bytes", "w", "h", "fmt"],
    "properties": {
        "image_id": {"type": "string", "pattern": "^img-[0-9a-f]{16}$"},
        "w": {"type": "integer", "minimum": 1, "maximum": 65535},
        "h": {"type": "integer", "minimum": 1, "maximum": 65535},
        "fmt": {"type": "string", "enum": ["jpeg", "png", "webp"]},
        "caption": {"type": "string", "minLength": 1, "maxLength": 512},
        "phash": {"type": "integer"},
    },
}


def qpng_images_df(
    spark: SparkSession,
    n_rows: int,
    seed: int = 5,
    step: int = 4,
    coarse_every: int | None = None,
    coarse_step: int = 32,
) -> DataFrame:
    """Lossy twin of :func:`png_images_df`: the same deterministic pixel
    fabric pushed through the toy quantize-then-PNG codec (fmt "qpng").
    Rows with ``id % coarse_every == 3`` are encoded at `coarse_step`
    (~28.9 dB — fails the 40 dB invariant deterministically); all others at
    `step` (~46.9 dB — passes it finitely, NOT the inf-PSNR lossless path).
    """
    from ..operators.multimodal import encode_qpng, fake_pixels

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                w, h = 24 + int(i) % 9, 16 + int(i) % 7
                px = fake_pixels(f"{seed}:{i}".encode(), w, h)
                s = coarse_step if coarse_every and i % coarse_every == 3 else step
                rows.append(
                    (f"img-{i:08d}", encode_qpng(px, s), w, h, "qpng", f"caption {i}", int(i))
                )
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    return spark.range(n_rows).mapInPandas(
        gen,
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )


def jpeg_images_df(
    spark: SparkSession,
    n_rows: int,
    seed: int = 5,
    quality: int = 95,
    coarse_every: int | None = None,
    coarse_quality: int = 6,
) -> DataFrame:
    """REAL-JPEG twin of :func:`qpng_images_df`: a smooth deterministic
    pixel fabric pushed through the pure-numpy baseline T.81 encoder
    (functions/jpeg.py).  Rows with ``id % coarse_every == 3`` are encoded
    at `coarse_quality` (deep quantization — deterministically below the
    40 dB invariant); all others at `quality` (well above it).  Every third
    non-coarse row uses a restart interval so the decoder's DRI/RSTn path
    runs in the distributed query, and every fifth uses 4:2:0 subsampling
    (margins for both verified by tests/test_jpeg_codec.py)."""
    from ..functions.jpeg import encode_jpeg
    from ..operators.multimodal import smooth_pixels

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                w, h = 24 + int(i) % 9, 16 + int(i) % 7
                px = smooth_pixels(f"{seed}:{i}".encode(), w, h)
                if coarse_every and i % coarse_every == 3:
                    data = encode_jpeg(px, quality=coarse_quality)
                else:
                    data = encode_jpeg(
                        px,
                        quality=quality,
                        subsampling="420" if i % 5 == 0 else "444",
                        restart_interval=2 if i % 3 == 0 else 0,
                    )
                rows.append((f"img-{i:08d}", data, w, h, "jpeg", f"caption {i}", int(i)))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    return spark.range(n_rows).mapInPandas(
        gen,
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )


def jpeg_progressive_images_df(
    spark: SparkSession,
    n_rows: int,
    seed: int = 5,
    quality: int = 95,
    coarse_every: int | None = None,
    coarse_quality: int = 6,
) -> DataFrame:
    """PROGRESSIVE-JPEG twin of :func:`jpeg_images_df`: the same smooth
    fabric pushed through the pure-numpy SOF2 encoder
    (functions/jpeg_progressive.py — spectral selection + successive
    approximation, per-scan Annex K.2 optimized Huffman tables).  Rows
    with ``id % coarse_every == 3`` are encoded at `coarse_quality`
    (deterministically below the 40 dB invariant); all others at
    `quality`.  Every fifth row uses 4:2:0 subsampling so the interleaved
    DC scan and the non-interleaved AC band grids diverge in the
    distributed decode path."""
    from ..functions.jpeg_progressive import encode_jpeg_progressive
    from ..operators.multimodal import smooth_pixels

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                w, h = 24 + int(i) % 9, 16 + int(i) % 7
                px = smooth_pixels(f"{seed}:{i}".encode(), w, h)
                if coarse_every and i % coarse_every == 3:
                    data = encode_jpeg_progressive(px, quality=coarse_quality)
                else:
                    data = encode_jpeg_progressive(
                        px,
                        quality=quality,
                        subsampling="420" if i % 5 == 0 else "444",
                    )
                rows.append((f"img-{i:08d}", data, w, h, "jpeg", f"caption {i}", int(i)))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    return spark.range(n_rows).mapInPandas(
        gen,
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )


def jpeg_ref_images_df(spark: SparkSession, n_rows: int, seed: int = 5) -> DataFrame:
    """Lossless PNG reference carrying the SAME smooth fabric as
    :func:`jpeg_images_df` — the other side of the PSNR join."""
    from ..operators.multimodal import encode_png, smooth_pixels

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                w, h = 24 + int(i) % 9, 16 + int(i) % 7
                px = smooth_pixels(f"{seed}:{i}".encode(), w, h)
                rows.append((f"img-{i:08d}", encode_png(px), w, h, "png", f"caption {i}", int(i)))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    return spark.range(n_rows).mapInPandas(
        gen,
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )


def webp_images_df(
    spark: SparkSession,
    n_rows: int,
    seed: int = 5,
    corrupt_every: int | None = None,
    extended_every: int | None = None,
) -> DataFrame:
    """REAL lossless-WebP corpus: the SAME deterministic fake-pixel fabric
    as :func:`png_images_df` (so the PNG reference of the same seed is the
    pixel-exact other side of the PSNR join) pushed through the pure-numpy
    VP8L encoder (functions/vp8l.py).  Encoder options cycle
    per row so the distributed decode exercises every bitstream path —
    subtract-green transform (i%3==1), color cache (i%5==2), backward
    references (i%4==0), all 14 spatial predictors (i%7==3 → mode i%14),
    cross-channel color transform (i%11==4), and any combination when the
    cycles align.
    `corrupt_every`: rows with id % corrupt_every == 7 get truncated bytes
    (planted decode failures with exactly known ids).  `extended_every`:
    rows with id % extended_every == 2 wrap the same VP8L stream in a
    VP8X extended container (still lossless — exercises the decoder's
    VP8X path distributed).  VP8L is lossless, so every intact row
    matches the PNG reference pixel-exactly."""
    from ..functions.vp8l import encode_webp
    from ..operators.multimodal import fake_pixels

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                w, h = 24 + int(i) % 9, 16 + int(i) % 7
                px = fake_pixels(f"{seed}:{i}".encode(), w, h)
                data = encode_webp(
                    px,
                    extended=bool(extended_every and i % extended_every == 2),
                    subtract_green=i % 3 == 1,
                    cache_bits=6 if i % 5 == 2 else 0,
                    use_backrefs=i % 4 == 0,
                    predictor_mode=int(i) % 14 if i % 7 == 3 else None,
                    color_transform=(34, -22, 17) if i % 11 == 4 else None,
                    meta_bits=3 if i % 13 == 6 else 0,
                )
                if corrupt_every and i % corrupt_every == 7:
                    data = data[: len(data) // 2]
                rows.append((f"img-{i:08d}", data, w, h, "webp", f"caption {i}", int(i)))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    return spark.range(n_rows).mapInPandas(
        gen,
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )


def png_images_df(
    spark: SparkSession,
    n_rows: int,
    seed: int = 5,
    corrupt_every: int | None = None,
    tamper_every: int | None = None,
    true_phash: bool = False,
) -> DataFrame:
    """Small corpus of REAL (decodable, pure-stdlib codec) PNG images — a
    pure function of (seed, id) so any two generations are byte-identical.
    `corrupt_every`: rows with id % corrupt_every == 7 get truncated bytes
    (planted decode failures with exactly known ids).

    The stored `phash` column is the row id by default; `true_phash=True`
    stores the TRUE perceptual hash of the pixels instead, and
    `tamper_every` flips two bits of the stored hash on rows with
    id % tamper_every == 3 (planted metadata corruption — see
    `phash_png_images_df`, the thin wrapper that turns both on).

    Used by the decode→PSNR per-row-invariant driver query; pixel fabric is
    the multimodal module's deterministic fake (no image libs in this
    container), encoded through the real PNG writer.
    """
    from ..operators.multimodal import encode_png, fake_pixels, phash64

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                i = int(i)
                w, h = 24 + i % 9, 16 + i % 7
                px = fake_pixels(f"{seed}:{i}".encode(), w, h)
                data = encode_png(px)
                ph = phash64(px) if true_phash else i
                if tamper_every and i % tamper_every == 3:
                    ph ^= (1 << 17) | (1 << 42)
                if corrupt_every and i % corrupt_every == 7:
                    data = data[: len(data) // 2]
                rows.append((f"img-{i:08d}", data, w, h, "png", f"caption {i}", ph))
            yield pd.DataFrame(
                rows, columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
            )

    return spark.range(n_rows).mapInPandas(
        gen,
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )


def phash_png_images_df(
    spark: SparkSession,
    n_rows: int,
    seed: int = 5,
    tamper_every: int | None = None,
    corrupt_every: int | None = None,
) -> DataFrame:
    """REAL-PNG corpus whose stored `phash` column is the TRUE perceptual
    hash of the pixels (computed by the same pure function the integrity
    operator recomputes with), with two disjoint plants:

    * ``id % tamper_every == 3`` → stored phash gets two bits flipped
      (metadata corruption: the integrity check must flag it);
    * ``id % corrupt_every == 7`` → bytes truncated (decode failure).

    Residues 3 mod 20 and 7 mod 40 are disjoint, so plant counts are exact
    closed forms of (n_rows, tamper_every, corrupt_every).

    Thin wrapper over `png_images_df` (same fabric, geometry, and plant
    residues) with the true-pHash column and tamper plant switched on."""
    return png_images_df(
        spark,
        n_rows,
        seed=seed,
        corrupt_every=corrupt_every,
        tamper_every=tamper_every,
        true_phash=True,
    )


def phash_pair_images_df(
    spark: SparkSession, n_base: int, clone_every: int = 10, seed: int = 7
) -> DataFrame:
    """Near-identical-pair corpus for the decode→hash→band pipeline: every
    base id gets a REAL PNG of the fake-pixel fabric; ids ≡ 4 (mod
    clone_every) additionally emit a NEAR-CLONE row (id + 1,000,000) whose
    pixels are the base image under step-2 quantization — perceptually the
    same image, byte-different file.  Planted pair ids are closed forms;
    independent fabrics sit ≥10 pHash bits apart (pinned by
    tests/test_phash.py), so banded Hamming-≤3 near-dup search recovers
    exactly the planted pairs."""
    from ..operators.multimodal import encode_png, fake_pixels

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                w, h = 24 + i % 9, 16 + i % 7
                px = fake_pixels(f"{seed}:{i}".encode(), w, h)
                rows.append((f"img-{i:08d}", encode_png(px), w, h, "png"))
                if i % clone_every == 4:
                    q = ((px.astype(np.int32) // 2) * 2 + 1).astype(np.uint8)
                    rows.append((f"img-{i + 1_000_000:08d}", encode_png(q), w, h, "png"))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"])

    return spark.range(n_base).mapInPandas(
        gen, "image_id string, bytes binary, w int, h int, fmt string"
    )


def solid_png_images_df(spark: SparkSession, n_rows: int, corrupt_every: int | None = None) -> DataFrame:
    """Solid-color REAL PNGs whose geometry and channel values are closed
    forms of the row id — the oracle-derivable corpus for the
    feature-extract and resize operators (constant pixels survive any
    resampling, so per-channel means are exact integers before AND after
    a resize).  Plant rules: w = 8 + i%5, h = 6 + i%3, (r,g,b) =
    (i*7, i*13, i*29) mod 256; `corrupt_every`: id % corrupt_every == 7
    rows get truncated bytes (decode failures)."""
    from ..operators.multimodal import encode_png

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                i = int(i)
                w, h = 8 + i % 5, 6 + i % 3
                px = np.empty((h, w, 3), np.uint8)
                px[..., 0], px[..., 1], px[..., 2] = (i * 7) % 256, (i * 13) % 256, (i * 29) % 256
                data = encode_png(px)
                if corrupt_every and i % corrupt_every == 7:
                    data = data[: len(data) // 2]
                rows.append((f"img-{i:08d}", data, w, h, "png"))
            yield pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt"])

    return spark.range(n_rows).mapInPandas(
        gen, "image_id string, bytes binary, w int, h int, fmt string"
    )

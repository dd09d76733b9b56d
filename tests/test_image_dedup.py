"""Perceptual image dedup (r10): stdlib BMP decode, dHash/aHash
integer algebra, Hamming-banded candidate pairs, and the end-to-end
phash_dup_pairs operator — closed-form duplicates collide, distinct
images don't, and banding reproduces brute force exactly."""

import random

import pytest
from pyspark.sql import functions as F

from titan_spark.pipeline.multimodal import (
    _bmp_luma_grid,
    ahash_from_grid,
    dhash_from_grid,
    encode_gray_bmp,
    image_dhash,
    image_luma_grid,
)


def _gradient(w=8, h=8):
    """Smooth horizontal gradient — the shift-tolerance fixture."""
    return [[(10 + 7 * c + r) for c in range(w)] for r in range(h)]


def _noise(seed, w=8, h=8):
    rng = random.Random(seed)
    return [[rng.randrange(256) for _ in range(w)] for _ in range(h)]


def test_bmp_roundtrip_all_paddings():
    """encode -> stdlib decode is lossless at every row-padding class
    (stride = 4k, 4k+1..3) and rectangular shapes."""
    for w, h in [(8, 8), (3, 5), (9, 2), (5, 3), (1, 1), (4, 7)]:
        grid = [[(r * 37 + c * 11 + w) % 256 for c in range(w)] for r in range(h)]
        assert _bmp_luma_grid(encode_gray_bmp(grid)) == grid, (w, h)


def test_bmp_8bpp_and_rle8_paths():
    """The palettized paths decode through the same palette-luma rule:
    an 8-bpp BI_RGB and a BI_RLE8 BMP with a grayscale palette recover
    the index grid as luminance."""
    import struct

    w, h = 5, 3
    palette = b"".join(bytes([i, i, i, 0]) for i in range(256))

    def bmp8(comp, pix):
        bih = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, comp, len(pix), 0, 0, 256, 0)
        off = 14 + 40 + len(palette)
        return (
            b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off) + bih + palette + pix
        )

    # 8-bpp uncompressed: rows bottom-up, stride padded to 8
    rows = [[10, 20, 30, 40, 50], [1, 2, 3, 4, 5], [200, 201, 202, 203, 204]]
    stride = (w + 3) // 4 * 4
    pix = b"".join(
        bytes(r) + b"\x00" * (stride - w) for r in reversed(rows)
    )
    assert _bmp_luma_grid(bmp8(0, pix)) == rows

    # BI_RLE8: one encoded run per row (bottom-up), values 7/8/9
    rle = (
        bytes([w, 9]) + b"\x00\x00"   # bottom row: run of 9, EOL
        + bytes([w, 8]) + b"\x00\x00"
        + bytes([w, 7]) + b"\x00\x01"  # top row + EOS
    )
    assert _bmp_luma_grid(bmp8(1, rle)) == [[7] * w, [8] * w, [9] * w]


def test_bmp_codec_boundary_is_routable():
    """Non-BMP payloads and unsupported encodings raise the routable
    NotImplementedError (PIL is absent in this environment, so the
    stdlib boundary is what image_luma_grid surfaces)."""
    import struct

    with pytest.raises(NotImplementedError, match="BMP only"):
        _bmp_luma_grid(b"\x89PNG not a bmp" + b"\x00" * 64)
    # 4-bpp has no stdlib decoder
    bih = struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 4, 0, 0, 0, 0, 0, 0)
    payload = b"BM" + struct.pack("<IHHI", 54 + 8, 0, 0, 54) + bih + b"\x00" * 8
    with pytest.raises(NotImplementedError, match="bpp=4"):
        _bmp_luma_grid(payload)
    # truncated pixel data
    grid = _gradient(8, 8)
    good = encode_gray_bmp(grid)
    with pytest.raises(NotImplementedError, match="truncated"):
        _bmp_luma_grid(good[: len(good) - 40])


def test_dhash_invariances_closed_form():
    """The VERDICT contract: brightness-jittered and 1-px-shifted
    duplicates collide (small Hamming), distinct images don't."""
    g = _gradient()
    # uniform brightness shift: hash IDENTICAL (exact invariance)
    shifted_bright = [[v + 23 for v in row] for row in g]
    assert dhash_from_grid(g) == dhash_from_grid(shifted_bright)
    # 1-px horizontal shift of smooth content: within a small radius
    shift1 = [row[1:] + [row[-1] + 7] for row in g]
    d = bin(dhash_from_grid(g) ^ dhash_from_grid(shift1)).count("1")
    assert d <= 3, d
    # single-pixel edit flips at most the one comparison it touches
    dent = [row[:] for row in g]
    dent[4][0] += 60
    assert bin(dhash_from_grid(g) ^ dhash_from_grid(dent)).count("1") <= 1
    # distinct noise images: far apart (56-bit sig, expect ~28)
    dists = [
        bin(dhash_from_grid(_noise(a)) ^ dhash_from_grid(_noise(b))).count("1")
        for a, b in [(1, 2), (3, 4), (5, 6), (7, 8)]
    ]
    assert min(dists) > 10, dists


def test_dhash_mean_pool_scale_invariance():
    """A 2x-upscaled image (pixel-doubled) mean-pools back to the same
    8x8 cells, so the hash is resolution-invariant for exact
    upscales."""
    g = _noise(42)
    big = [
        [g[r // 2][c // 2] for c in range(16)] for r in range(16)
    ]
    assert dhash_from_grid(big) == dhash_from_grid(g)


def test_ahash_exact_integer_decision():
    """aHash decides cell*n > total in exact integer arithmetic; a
    uniform shift changes every cell AND the mean equally, so the hash
    is brightness-invariant too (7x8 keeps the signature in signed-long
    range)."""
    g = _noise(7)
    shifted = [[v + 11 for v in row] for row in g]
    a = ahash_from_grid(g, grid_w=7, grid_h=8)
    assert a == ahash_from_grid(shifted, grid_w=7, grid_h=8)
    assert 0 <= a < 1 << 56


def test_banding_equals_brute_force(spark):
    """Recall-1.0 property of the Manku pigeonhole join: on a corpus
    of noise images with planted near-dups, phash_dup_pairs returns
    EXACTLY the brute-force Hamming-<=3 pair set."""
    from titan_spark.pipeline.dedup import phash_dup_pairs

    grids = {}
    for i in range(40):
        if i % 4 == 0:
            grids[i] = _noise(i)
        else:  # three planted variants of the previous base
            base = [row[:] for row in grids[i - i % 4]]
            if i % 4 == 1:  # brightness (clip-free: damp first)
                base = [[min(v, 240) + 9 for v in row] for row in base]
            elif i % 4 == 2:  # single-pixel dent
                base[3][3] = (base[3][3] + 97) % 256
            else:  # two-pixel dent
                base[0][0] = (base[0][0] + 50) % 256
                base[7][7] = (base[7][7] + 50) % 256
            grids[i] = base
    sigs = {i: dhash_from_grid(g) for i, g in grids.items()}
    brute = sorted(
        (a, b, bin(sigs[a] ^ sigs[b]).count("1"))
        for a in sigs
        for b in sigs
        if a < b and bin(sigs[a] ^ sigs[b]).count("1") <= 3
    )
    assert len(brute) >= 10  # the planted structure is actually there

    media = spark.createDataFrame(
        [(i, encode_gray_bmp(g)) for i, g in grids.items()],
        "media_id long, payload binary",
    ).withColumn("kind", F.lit("image"))
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_dup_pairs(media, max_hamming=3).collect()
    )
    assert got == brute


def test_image_dhash_kernel_matches_local(spark):
    """The mapInPandas signature kernel equals the local closed form
    on real encoded payloads, and reports decoded dimensions."""
    grids = {i: _noise(100 + i, w=12, h=10) for i in range(6)}
    media = spark.createDataFrame(
        [(i, encode_gray_bmp(g)) for i, g in grids.items()],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in image_dhash(media).collect()}
    for i, g in grids.items():
        assert rows[i]["sig"] == dhash_from_grid(g)
        assert (rows[i]["width"], rows[i]["height"]) == (12, 10)


def test_image_luma_grid_dispatch_matches_decoder():
    g = _gradient(5, 4)
    assert image_luma_grid(encode_gray_bmp(g)) == g

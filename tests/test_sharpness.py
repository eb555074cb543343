"""Laplacian sharpness statistics: exact-integer stencil values on
hand-built images (solid, checkerboard, stripes, gradient), random
cross-check against an independent reference implementation, and the
error-capture contract (truncated stream, too-small image).
"""

import numpy as np
import pytest

from scrapelect_spark.operators.imagemeta import laplacian_stats
from scrapelect_spark.sources.png import encode_png


def _ref_abs_lap(gray: np.ndarray) -> int:
    """Independent scalar-loop reference for the 4-neighbor stencil."""
    g = gray.astype(np.int64)
    h, w = g.shape
    total = 0
    for i in range(1, h - 1):
        for j in range(1, w - 1):
            lap = (
                4 * g[i, j]
                - g[i - 1, j] - g[i + 1, j]
                - g[i, j - 1] - g[i, j + 1]
            )
            total += abs(lap)
    return total


def _png(gray: np.ndarray) -> bytes:
    return encode_png(np.stack([gray, gray, gray], axis=-1))


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "image_id long, bytes binary, fmt string"
    )
    out = laplacian_stats(df).orderBy("image_id").collect()
    return {r.image_id: r for r in out}


def test_closed_forms_and_errors(spark):
    solid = np.full((32, 64), 77, dtype=np.uint8)
    ij = np.add.outer(np.arange(32), np.arange(20)) % 2
    checker = (10 + ij * 96).astype(np.uint8)
    stripes = np.repeat(
        ((np.arange(32) % 2) * 64 + 30).astype(np.uint8)[:, None], 20, axis=1
    )
    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (17, 23), dtype=np.uint8)
    rows = [
        (0, _png(solid), "png"),
        (1, _png(checker), "png"),
        (2, _png(stripes), "png"),
        (3, _png(noise), "png"),
        (4, _png(solid)[:40], "png"),      # truncated stream
        (5, _png(np.full((2, 2), 9, np.uint8)), "png"),  # too small
    ]
    got = _run(spark, rows)

    assert got[0].abs_lap_sum == 0
    assert got[0].lap_mean_milli == 0 and got[0].is_sharp == 0

    assert got[1].abs_lap_sum == 384 * 30 * 18
    assert got[1].lap_mean_milli == 384000 and got[1].is_sharp == 1

    assert got[2].abs_lap_sum == 128 * 30 * 18
    assert got[2].lap_mean_milli == 128000 and got[2].is_sharp == 1

    exp = _ref_abs_lap(noise)
    assert got[3].abs_lap_sum == exp
    assert got[3].lap_mean_milli == exp * 1000 // (15 * 21)
    assert got[3].w == 23 and got[3].h == 17 and got[3].failed == 0

    for bad in (4, 5):
        r = got[bad]
        assert r.failed == 1
        assert r.abs_lap_sum is None and r.is_sharp is None


def test_linear_ramp_is_blurry(spark):
    # second difference of a linear ramp is zero everywhere except
    # nowhere (interior only) — a smooth gradient must read as blurry
    ramp = np.repeat(
        np.arange(64, dtype=np.uint8)[None, :] * 2, 16, axis=0
    )
    got = _run(spark, [(0, _png(ramp), "png")])
    assert got[0].abs_lap_sum == 0 and got[0].is_sharp == 0


def test_color_stats_random_crosscheck(spark):
    from scrapelect_spark.operators.imagemeta import color_stats

    rng = np.random.default_rng(11)
    color = rng.integers(0, 256, (13, 19, 3), dtype=np.uint8)
    gray1 = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    gray = np.stack([gray1, gray1, gray1], axis=-1)
    df = spark.createDataFrame(
        [
            (0, encode_png(color), "png"),
            (1, encode_png(gray), "png"),
            (2, b"\x89PNG junk", "png"),
        ],
        "image_id long, bytes binary, fmt string",
    )
    got = {r.image_id: r for r in color_stats(df).collect()}

    c = color.astype(np.int64)
    chroma = c.max(axis=2) - c.min(axis=2)
    r0 = got[0]
    assert (r0.r_sum, r0.g_sum, r0.b_sum) == tuple(
        int(c[:, :, k].sum()) for k in range(3)
    )
    assert r0.chroma_sum == int(chroma.sum())
    assert r0.gray_permille == int((chroma == 0).sum()) * 1000 // chroma.size
    assert r0.is_grayscale == 0 and r0.failed == 0

    r1 = got[1]
    assert r1.chroma_sum == 0 and r1.gray_permille == 1000
    assert r1.is_grayscale == 1
    assert r1.r_sum == r1.g_sum == r1.b_sum == int(gray1.astype(np.int64).sum())

    assert got[2].failed == 1 and got[2].chroma_sum is None


def test_border_stats_geometry(spark):
    from scrapelect_spark.operators.imagemeta import border_stats

    rng = np.random.default_rng(3)
    # asymmetric bars around random (never-bar-colored) content
    content = rng.integers(10, 240, (20, 30, 3), dtype=np.uint8)
    img = np.zeros((20 + 2 + 7, 30 + 1 + 3, 3), dtype=np.uint8)
    img[2:22, 1:31] = content
    uniform = np.full((9, 9, 3), 123, dtype=np.uint8)
    # corner colors differ: top-left black bars, bottom-right white
    mixed = np.zeros((10, 10, 3), dtype=np.uint8)
    mixed[:, :] = rng.integers(10, 240, (10, 10, 3), dtype=np.uint8)
    mixed[:2, :] = 0          # top 2 rows black
    mixed[:, -3:] = 255       # right 3 cols white (incl. corner)
    mixed[-1, :] = 255        # bottom row white
    df = spark.createDataFrame(
        [
            (0, encode_png(img), "png"),
            (1, encode_png(uniform), "png"),
            (2, encode_png(mixed), "png"),
            (3, b"nope", "png"),
        ],
        "image_id long, bytes binary, fmt string",
    )
    got = {r.image_id: r for r in border_stats(df).collect()}

    r0 = got[0]
    assert (r0.top_border, r0.bottom_border) == (2, 7)
    assert (r0.left_border, r0.right_border) == (1, 3)
    assert (r0.content_w, r0.content_h) == (30, 20)

    r1 = got[1]
    assert r1.top_border == r1.bottom_border == 9
    assert r1.content_w == 0 and r1.content_h == 0

    r2 = got[2]
    # top bars measured against the BLACK top-left corner (the white
    # right columns break row 0's uniformity → 0), bottom/right
    # against the WHITE bottom-right corner
    assert r2.top_border == 0 and r2.bottom_border == 1
    assert r2.right_border == 3 and r2.left_border == 0

    assert got[3].failed == 1 and got[3].content_w is None


def test_rgb_luma_weighting(spark):
    # non-gray pixels: luma = (299r + 587g + 114b) // 1000 must be the
    # plane the stencil sees — a pure-blue/pure-red checkerboard has a
    # luma contrast of |76 - 34| = 42, |L| = 168 on interior pixels
    ij = np.add.outer(np.arange(16), np.arange(16)) % 2
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, :, 0] = np.where(ij == 0, 255, 0)   # red squares
    img[:, :, 2] = np.where(ij == 1, 255, 0)   # blue squares
    df = spark.createDataFrame(
        [(0, encode_png(img), "png")], "image_id long, bytes binary, fmt string"
    )
    r = laplacian_stats(df).collect()[0]
    lum_r = 255 * 299 // 1000   # 76
    lum_b = 255 * 114 // 1000   # 29
    assert r.abs_lap_sum == 4 * (lum_r - lum_b) * 14 * 14

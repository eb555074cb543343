"""JPEG quality estimation (sources/jpeg.py jpeg_quant_tables /
estimate_jpeg_quality) and the dhash64 / dct_phash64 perceptual
hashes (sources/png.py): exact inversion of the libjpeg quality
formula across the full 1..100 sweep, DQT walk behaviour on
progressive/malformed streams, hash invariance properties
(brightness shift for dhash, re-encode stability for dct_phash) and
the Spark-side estimate_quality operator with per-row error
capture."""

import numpy as np
import pytest

from scrapelect_spark.sources.jpeg import (
    Q_CHROMA,
    Q_LUMA,
    _quality_scale,
    encode_jpeg,
    estimate_jpeg_quality,
    jpeg_quant_tables,
)
from scrapelect_spark.sources.png import (
    dct_phash64,
    dhash64,
    encode_png,
    phash64,
)


def gradient_img(h=24, w=24):
    base = np.indices((h, w)).sum(0).astype(np.int64)
    return np.stack(
        [np.minimum(base * 5, 255), np.minimum(base * 3, 255),
         255 - np.minimum(base * 5, 255)], axis=-1
    ).astype(np.uint8)


def hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# --- quality estimation --------------------------------------------------


def test_quality_inverts_exactly_full_sweep():
    img = gradient_img()
    for q in range(1, 101):
        assert estimate_jpeg_quality(encode_jpeg(img, quality=q)) == q


def test_quant_tables_match_encoder():
    img = gradient_img()
    tabs = jpeg_quant_tables(encode_jpeg(img, quality=75))
    assert set(tabs) == {0, 1}
    assert np.array_equal(tabs[0], _quality_scale(Q_LUMA, 75))
    assert np.array_equal(tabs[1], _quality_scale(Q_CHROMA, 75))


def test_quality_estimation_progressive_stream():
    img = gradient_img()
    blob = encode_jpeg(img, quality=60, progressive=True)
    assert estimate_jpeg_quality(blob) == 60


def test_quality_estimation_grayscale_single_table():
    g = gradient_img()[:, :, :1]
    blob = encode_jpeg(g, quality=40)
    tabs = jpeg_quant_tables(blob)
    assert 0 in tabs
    assert estimate_jpeg_quality(blob) == 40


def test_quality_nearest_fit_for_foreign_tables():
    """A perturbed table still lands on the nearest quality."""
    img = gradient_img()
    blob = bytearray(encode_jpeg(img, quality=50))
    # bump one DQT byte by 1: find the first DQT segment payload
    i = blob.index(b"\xff\xdb") + 5
    blob[i] = min(255, blob[i] + 1)
    assert estimate_jpeg_quality(bytes(blob)) in (49, 50, 51)


def test_quality_error_paths():
    with pytest.raises(ValueError, match="no SOI"):
        estimate_jpeg_quality(b"not a jpeg")
    with pytest.raises(ValueError, match="no DQT"):
        jpeg_quant_tables(b"\xff\xd8\xff\xd9")
    with pytest.raises(ValueError, match="truncated DQT"):
        jpeg_quant_tables(b"\xff\xd8\xff\xdb\x00\x05\x00\x01\x02")


# --- perceptual hashes ---------------------------------------------------


def test_dhash_brightness_invariance():
    rng = np.random.default_rng(9)
    img = rng.integers(40, 180, (32, 32, 3)).astype(np.uint8)
    brighter = np.clip(img.astype(np.int64) + 60, 0, 255).astype(np.uint8)
    assert hamming(dhash64(img), dhash64(brighter)) <= 6
    # phash64's mean threshold is typically also stable here, but
    # dhash must be: gradients are unchanged by a constant shift
    assert dhash64(img) == dhash64(
        np.clip(img.astype(np.int64) + 20, 0, 255).astype(np.uint8)
    )


def test_dhash_distinguishes_unrelated():
    rng = np.random.default_rng(10)
    a = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    b = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    assert hamming(dhash64(a), dhash64(b)) >= 12


def test_dct_phash_survives_reencode_and_rescale():
    from scrapelect_spark.sources.jpeg import decode_jpeg

    rng = np.random.default_rng(11)
    # smooth image: random low-res upsampled (hash should survive JPEG)
    small = rng.integers(30, 220, (8, 8, 3))
    img = np.repeat(np.repeat(small, 8, 0), 8, 1).astype(np.uint8)
    h0 = dct_phash64(img)
    reenc = decode_jpeg(encode_jpeg(img, quality=50))
    assert hamming(h0, dct_phash64(reenc)) <= 8
    # 2x downscale (block mean)
    ds = img.reshape(32, 2, 32, 2, 3).mean(axis=(1, 3)).astype(np.uint8)
    assert hamming(h0, dct_phash64(ds)) <= 8


def test_dct_phash_distinguishes_unrelated():
    rng = np.random.default_rng(12)
    pairs = []
    for _ in range(8):
        a = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
        b = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
        pairs.append(hamming(dct_phash64(a), dct_phash64(b)))
    assert min(pairs) >= 10


def test_hashes_are_distinct_functions():
    img = gradient_img(32, 32)
    vals = {phash64(img), dhash64(img), dct_phash64(img)}
    assert len(vals) == 3


# --- Spark operator ------------------------------------------------------


def test_estimate_quality_operator(spark):
    import pandas as pd

    from scrapelect_spark.operators.imagemeta import estimate_quality

    img = gradient_img()
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "image_id": ["q30", "q85", "png", "junk"],
                "bytes": [
                    encode_jpeg(img, quality=30),
                    encode_jpeg(img, quality=85),
                    encode_png(img),
                    b"\x00\x01garbage",
                ],
            }
        )
    )
    rows = {r.image_id: r for r in estimate_quality(df).collect()}
    assert rows["q30"].quality == 30 and rows["q30"].quality_error is None
    assert rows["q85"].quality == 85
    assert rows["png"].quality is None
    assert "no SOI" in rows["png"].quality_error
    assert rows["junk"].quality is None

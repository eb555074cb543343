"""Baseline JFIF codec tests: roundtrip PSNR across shapes / qualities /
subsampling, container structure, restart markers, golden pixel arrays,
and declared non-baseline rejection.

Reference behavior: ITU T.81 baseline process; the PSNR ≥ 40 dB bound
is the BASELINE.json input_hint per-row invariant for lossy formats."""

import struct

import numpy as np
import pytest

from scrapelect_spark.sources.jpeg import (
    decode_jpeg,
    encode_jpeg,
    jpeg_size,
)
from scrapelect_spark.sources.png import psnr


def gradient(h, w):
    y, x = np.mgrid[0:h, 0:w]
    r = (x * 255 // max(w - 1, 1)).astype(np.uint8)
    g = (y * 255 // max(h - 1, 1)).astype(np.uint8)
    b = (((x + y) * 255) // max(w + h - 2, 1)).astype(np.uint8)
    return np.stack([r, g, b], axis=-1)


@pytest.mark.parametrize("shape", [(8, 8), (16, 16), (17, 23), (24, 32), (64, 48)])
@pytest.mark.parametrize("quality", [75, 90, 95])
def test_roundtrip_444_psnr(shape, quality):
    img = gradient(*shape)
    out = decode_jpeg(encode_jpeg(img, quality=quality, subsampling="444"))
    assert out.shape == img.shape
    p = psnr(img, out)
    floor = {75: 33.0, 90: 40.0, 95: 40.0}[quality]
    assert p >= floor, p


@pytest.mark.parametrize("shape", [(16, 16), (17, 23), (64, 48)])
def test_roundtrip_420_shape_and_quality(shape):
    """4:2:0 halves chroma resolution — lossy on steep chroma gradients
    by design; assert shape exactness + a luma-dominated bound."""
    img = gradient(*shape)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsampling="420"))
    assert out.shape == img.shape
    assert psnr(img, out) >= 30.0


def test_grayscale_roundtrip():
    g = gradient(32, 32)[:, :, 0]
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == (32, 32, 1)
    assert psnr(g[:, :, None], out) >= 45.0


def test_flat_image_near_exact():
    img = np.full((16, 16, 3), 130, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert np.abs(out.astype(int) - 130).max() <= 1


def test_noise_no_crash_and_bounded_error():
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert psnr(img, out) >= 30.0  # noise is the worst case for DCT


def test_restart_markers_roundtrip():
    """DRI + RSTn every 2 MCUs must decode identically to no restarts
    (predictor resets + byte alignment are lossless)."""
    img = gradient(40, 56)
    plain = decode_jpeg(encode_jpeg(img, quality=90))
    with_rst = encode_jpeg(img, quality=90, restart_interval=2)
    assert b"\xFF\xDD" in with_rst  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in with_rst for i in range(8))
    assert np.array_equal(decode_jpeg(with_rst), plain)


def test_jpeg_size_header_only():
    data = encode_jpeg(gradient(17, 23), quality=90)
    assert jpeg_size(data) == (23, 17)


def test_container_structure():
    data = encode_jpeg(gradient(16, 16), quality=90)
    assert data[:2] == b"\xFF\xD8" and data[-2:] == b"\xFF\xD9"
    assert data[2:4] == b"\xFF\xE0" and data[6:11] == b"JFIF\x00"
    # SOF0 reports the true dims
    i = data.find(b"\xFF\xC0")
    _, prec, h, w, nc = struct.unpack(">HBHHB", data[i + 2 : i + 10])
    assert (prec, h, w, nc) == (8, 16, 16, 3)


def test_mislabelled_progressive_rejected_cleanly():
    """Progressive (SOF2) is SUPPORTED now (test_jpeg_progressive.py);
    a baseline stream mislabelled as SOF2 is structurally invalid (a
    progressive DC scan cannot have Se=63) and must raise, not
    mis-decode."""
    data = bytearray(encode_jpeg(gradient(16, 16)))
    i = data.find(b"\xFF\xC0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(data))


def test_lossless_and_arithmetic_rejected():
    for sof in (0xC3, 0xC9, 0xCB):  # lossless / arith sequential / arith prog...
        data = bytearray(encode_jpeg(gradient(16, 16)))
        i = data.find(b"\xFF\xC0")
        data[i + 1] = sof
        with pytest.raises(NotImplementedError):
            decode_jpeg(bytes(data))


def test_not_a_jpeg_rejected():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")


def test_golden_pixels_8x8_gray():
    """Pin the decode of a fixed 8x8 ramp: quantization error must stay
    within the DC+AC bound for the q90 luma table (≤ 4 levels), and the
    exact decoded block must be stable across numpy versions."""
    ramp = np.arange(64, dtype=np.uint8).reshape(8, 8) * 2 + 60
    out = decode_jpeg(encode_jpeg(ramp, quality=90))[:, :, 0]
    assert np.abs(out.astype(int) - ramp.astype(int)).max() <= 4
    # determinism: encode twice → identical bytes
    assert encode_jpeg(ramp, quality=90) == encode_jpeg(ramp, quality=90)


def test_byte_stuffing_roundtrip():
    """An image engineered to produce 0xFF bytes in the entropy stream
    must unstuff correctly (all-255 blocks produce long 1-runs)."""
    img = np.full((24, 24, 3), 255, dtype=np.uint8)
    img[::2, ::2] = 0  # checkerboard: dense high-frequency content
    out = decode_jpeg(encode_jpeg(img, quality=95))
    assert out.shape == img.shape


@pytest.mark.parametrize("seed", range(120))
def test_mutation_fuzz_no_hang_no_crash(seed):
    """Corrupt streams must either decode or raise promptly — never
    hang, never allocate absurd buffers (SOF dims are sanity-capped).
    One random byte mutated / truncated per seed, deterministic."""
    import random

    r = random.Random(seed)
    base = bytearray(encode_jpeg(gradient(24, 32), quality=90))
    kind = r.random()
    data = bytearray(base)
    if kind < 0.45:  # flip one byte
        i = r.randrange(2, len(data) - 2)
        data[i] = r.randrange(256)
    elif kind < 0.8:  # truncate
        data = data[: r.randrange(4, len(data))]
    else:  # splice garbage
        i = r.randrange(2, len(data) - 2)
        data[i : i + 4] = bytes(r.randrange(256) for _ in range(4))
    try:
        out = decode_jpeg(bytes(data))
        assert out.dtype == np.uint8 and out.ndim == 3
        assert out.shape[0] * out.shape[1] <= (1 << 28)
    except (ValueError, NotImplementedError, struct.error, IndexError):
        pass  # clean rejection is the contract


def test_implausible_dims_rejected():
    data = bytearray(encode_jpeg(gradient(16, 16)))
    i = data.find(b"\xFF\xC0")
    data[i + 5 : i + 9] = struct.pack(">HH", 65535, 65535)  # h, w
    with pytest.raises(ValueError, match="pixel cap"):
        decode_jpeg(bytes(data))


def test_multi_scan_rejected_not_silently_luma_only():
    """A baseline file whose scan covers fewer components than the
    frame (non-interleaved layout) must refuse — decoding only the
    first scan would silently return Y-only pixels."""
    data = bytearray(encode_jpeg(gradient(16, 16), quality=90))
    i = data.find(b"\xFF\xDA")
    assert data[i + 4] == 3  # ns
    data[i + 4] = 1
    # shrink the SOS segment length to match one component
    data[i + 2 : i + 4] = struct.pack(">H", 6 + 2 * 1)
    # drop the two extra component entries so Ss/Se/Ah-Al line up
    del data[i + 7 : i + 11]
    with pytest.raises(NotImplementedError, match="non-interleaved"):
        decode_jpeg(bytes(data))


def test_single_component_sampling_factors_ignored():
    """T.81 A.2.2: a single-component scan is one data unit per MCU —
    declared sampling factors (e.g. 2x2) must not desync the grid."""
    g = gradient(24, 24)[:, :, 0]
    data = bytearray(encode_jpeg(g, quality=90))
    plain = decode_jpeg(bytes(data))
    i = data.find(b"\xFF\xC0")
    assert data[i + 11] == 0x11  # (hs<<4)|vs of the only component
    data[i + 11] = 0x22
    assert np.array_equal(decode_jpeg(bytes(data)), plain)


def test_pixel_cap():
    from scrapelect_spark.sources.jpeg import MAX_PIXELS

    data = bytearray(encode_jpeg(gradient(16, 16)))
    i = data.find(b"\xFF\xC0")
    data[i + 5 : i + 9] = struct.pack(">HH", 8192, 8192)  # 64M px > cap
    assert 8192 * 8192 > MAX_PIXELS
    with pytest.raises(ValueError, match="pixel"):
        decode_jpeg(bytes(data))

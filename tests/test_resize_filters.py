"""Bilinear/area resampling kernels (operators/multimodal.py):
vectorized implementations vs naive pure-Python references at
fractional scales, plus the analytic invariants each filter must hold.
The Spark-side gate parity runs in tests/test_oracle_parity.py."""

import math

import numpy as np
import pytest

from scrapelect_spark.operators.multimodal import (
    _axis_area,
    _axis_bilinear,
    _resize_area,
    _resize_bilinear,
    _resize_nn,
)


def ref_bilinear_1d(vals, target):
    n = len(vals)
    out = []
    for k in range(target):
        pos = (k + 0.5) * (n / target) - 0.5
        lo = min(max(math.floor(pos), 0), n - 1)
        hi = min(lo + 1, n - 1)
        f = min(max(pos - lo, 0.0), 1.0)
        out.append(vals[lo] * (1.0 - f) + vals[hi] * f)
    return out


def ref_area_1d(vals, target):
    n = len(vals)
    scale = n / target
    out = []
    for k in range(target):
        lo, hi = k * scale, min((k + 1) * scale, n)
        total, x = 0.0, lo
        while x < hi - 1e-12:
            i = int(math.floor(x + 1e-12))
            step = min(i + 1.0, hi) - x
            total += vals[i] * step
            x = i + 1.0
        out.append(total / (hi - lo))
    return out


@pytest.mark.parametrize("n,target", [(10, 3), (7, 5), (9, 4), (5, 5), (4, 7)])
def test_axis_kernels_match_reference(n, target):
    rng = np.random.RandomState(n * 100 + target)
    vals = rng.randint(0, 256, size=n).astype(np.uint8)
    got_bi = _axis_bilinear(vals, target, 0)
    got_ar = _axis_area(vals, target, 0)
    want_bi = ref_bilinear_1d([float(v) for v in vals], target)
    want_ar = ref_area_1d([float(v) for v in vals], target)
    np.testing.assert_allclose(got_bi, want_bi, rtol=0, atol=1e-9)
    np.testing.assert_allclose(got_ar, want_ar, rtol=0, atol=1e-9)


def test_area_integer_factor_is_block_mean():
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, size=(12, 8)).astype(np.uint8)
    out = _axis_area(_axis_area(arr, 6, 0), 4, 1)
    want = arr.reshape(6, 2, 4, 2).astype(np.float64).mean(axis=(1, 3))
    np.testing.assert_allclose(out, want, rtol=0, atol=1e-9)


def test_area_preserves_global_mean():
    rng = np.random.RandomState(11)
    arr = rng.randint(0, 256, size=(9, 15)).astype(np.uint8)
    out = _axis_area(_axis_area(arr, 3, 0), 5, 1)
    assert math.isclose(
        float(out.mean()), float(arr.astype(np.float64).mean()), abs_tol=1e-9
    )


def test_bilinear_reproduces_linear_ramp():
    # interpolating a linear function returns the same linear function
    y = np.arange(20, dtype=np.float64) * 3.0 + 5.0
    got = _axis_bilinear(y, 11, 0)
    pos = (np.arange(11) + 0.5) * (20 / 11) - 0.5
    np.testing.assert_allclose(got, pos * 3.0 + 5.0, rtol=0, atol=1e-9)


def test_constant_image_fixed_point_all_methods():
    arr = np.full((11, 13), 77, np.uint8)
    for fn in (_resize_nn, _resize_bilinear, _resize_area):
        out = fn(arr, 5, 7)
        assert out.shape == (7, 5) and (out == 77).all(), fn


def test_rgb_shape_passthrough():
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, size=(10, 8, 3)).astype(np.uint8)
    for fn in (_resize_nn, _resize_bilinear, _resize_area):
        assert fn(arr, 4, 5).shape == (5, 4, 3), fn


def test_factor2_tent_equals_box_equals_block_mean():
    rng = np.random.RandomState(5)
    arr = rng.randint(0, 256, size=(10, 8)).astype(np.uint8)
    bi = _resize_bilinear(arr, 4, 5)
    ar = _resize_area(arr, 4, 5)
    want = np.floor(
        arr.reshape(5, 2, 4, 2).astype(np.float64).mean(axis=(1, 3)) + 0.5
    ).astype(np.uint8)
    assert np.array_equal(bi, want)
    assert np.array_equal(ar, want)


def test_upscale_bilinear_edge_clamp():
    arr = np.array([[0, 255]], dtype=np.uint8)
    out = _resize_bilinear(arr, 4, 1)
    # half-pixel centers: outermost samples clamp to the edge pixels
    assert out[0, 0] == 0 and out[0, -1] == 255
    assert (np.diff(out[0].astype(int)) >= 0).all()

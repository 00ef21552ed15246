"""Tests for image-space ops (Sobel, morphology, inpaint) vs numpy references."""

import numpy as np
import pytest

from worldrenderer_tpu.ops.image import (
    batch_dilate,
    batch_erode,
    inpaint,
    max_pool2d,
    sobel_grad_magnitude,
)


def _sobel_np(img):
    kx = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], np.float32)
    ky = np.array([[1, 2, 1], [0, 0, 0], [-1, -2, -1]], np.float32)
    h, w = img.shape
    pad = np.pad(img, 1)
    gx = np.zeros_like(img)
    gy = np.zeros_like(img)
    for i in range(h):
        for j in range(w):
            win = pad[i : i + 3, j : j + 3]
            gx[i, j] = (win * kx).sum()
            gy[i, j] = (win * ky).sum()
    return np.sqrt(gx**2 + gy**2)


def test_sobel_matches_numpy(rng):
    img = rng.random((1, 12, 12)).astype(np.float32)
    out = np.asarray(sobel_grad_magnitude(img))[0]
    ref = _sobel_np(img[0])
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_max_pool_dilation():
    x = np.zeros((1, 9, 9), np.float32)
    x[0, 4, 4] = 1.0
    out = np.asarray(max_pool2d(x, 3))
    assert out[0, 3:6, 3:6].min() == 1.0
    assert out[0, 0, 0] == 0.0


def test_erode_dilate_roundtrip():
    m = np.zeros((1, 16, 16), np.float32)
    m[0, 4:12, 4:12] = 1.0
    d = np.asarray(batch_dilate(m, 3))
    assert d[0, 3:13, 3:13].min() == 1.0
    e = np.asarray(batch_erode(m, 3))
    assert e[0, 5:11, 5:11].min() == 1.0
    assert e[0, 4, 4] == 0.0
    # erosion then dilation restores a large-enough square
    ed = np.asarray(batch_dilate(np.asarray(e), 3))
    np.testing.assert_array_equal(ed[0, 5:11, 5:11], m[0, 5:11, 5:11])


def test_inpaint_fills_hole():
    img = np.full((10, 10, 3), 0.7, np.float32)
    mask = np.zeros((10, 10), bool)
    mask[4:6, 4:6] = True
    img[mask] = 0.0
    out = np.asarray(inpaint(img, mask, radius=3))
    np.testing.assert_allclose(out[mask], 0.7, atol=1e-5)
    # known pixels untouched
    np.testing.assert_allclose(out[~mask], 0.7, atol=1e-6)


def test_inpaint_radius_limits_fill():
    img = np.ones((20, 20, 1), np.float32)
    mask = np.zeros((20, 20), bool)
    mask[2:18, 2:18] = True
    img[mask] = 0.0
    out = np.asarray(inpaint(img, mask, radius=2))
    # center further than 2 pixels from known content stays 0
    assert out[10, 10, 0] == 0.0
    assert out[3, 3, 0] > 0.0

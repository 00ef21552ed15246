"""Poisson blending solver: grid-Jacobi vs a dense numpy reference solve."""

import numpy as np
import pytest

from worldrenderer_tpu.ops.poisson import poisson_blend


def _dense_poisson_np(src, mask, tgt, grad_mode="src"):
    """Direct dense solve of the same linear system the reference builds
    (mvadapter/utils/mesh_utils/blend.py:221-324)."""
    h, w, c = src.shape
    mask = mask.copy()
    mask[0, :] = mask[-1, :] = mask[:, 0] = mask[:, -1] = False
    ys, xs = np.nonzero(mask)
    n = len(ys)
    idx = -np.ones((h, w), np.int64)
    idx[ys, xs] = np.arange(n)

    def lap(im):
        out = 4 * im.copy()
        out[:-1] -= im[1:]
        out[1:] -= im[:-1]
        out[:, :-1] -= im[:, 1:]
        out[:, 1:] -= im[:, :-1]
        return out

    assert grad_mode == "src"
    b_img = lap(src)

    out = tgt.copy()
    a_mat = np.zeros((n, n))
    b_vec = np.zeros((n, c))
    for k in range(n):
        y, x = ys[k], xs[k]
        a_mat[k, k] = 4.0
        b_vec[k] = b_img[y, x]
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            yy, xx = y + dy, x + dx
            if mask[yy, xx]:
                a_mat[k, idx[yy, xx]] = -1.0
            else:
                b_vec[k] += tgt[yy, xx]
    sol = np.linalg.solve(a_mat, b_vec)
    out[ys, xs] = np.clip(sol, 0.0, 1.0)
    return out


def test_poisson_matches_dense_solve(rng):
    h = w = 12
    src = rng.random((h, w, 3)).astype(np.float32) * 0.5 + 0.25
    tgt = rng.random((h, w, 3)).astype(np.float32) * 0.5 + 0.25
    mask = np.zeros((h, w), bool)
    mask[3:9, 3:9] = True

    ref = _dense_poisson_np(src, mask, tgt)
    out = np.asarray(poisson_blend(src, mask, tgt, num_iters=2000))
    np.testing.assert_allclose(out, ref, atol=2e-4)


def test_poisson_constant_src_harmonic():
    """Constant source has zero Laplacian -> solution is the harmonic
    interpolant of the target boundary; for a constant target it equals the
    target everywhere."""
    h = w = 10
    src = np.full((h, w, 3), 0.9, np.float32)
    tgt = np.full((h, w, 3), 0.3, np.float32)
    mask = np.zeros((h, w), bool)
    mask[2:8, 2:8] = True
    out = np.asarray(poisson_blend(src, mask, tgt, num_iters=1000))
    np.testing.assert_allclose(out, 0.3, atol=1e-4)


def test_poisson_untouched_outside_mask(rng):
    h = w = 8
    src = rng.random((h, w, 3)).astype(np.float32)
    tgt = rng.random((h, w, 3)).astype(np.float32)
    mask = np.zeros((h, w), bool)
    mask[3:5, 3:5] = True
    out = np.asarray(poisson_blend(src, mask, tgt, num_iters=50))
    outside = ~mask
    np.testing.assert_array_equal(out[outside], tgt[outside])


@pytest.mark.parametrize("grad_mode", ["max", "avg"])
def test_poisson_grad_modes_run(rng, grad_mode):
    h = w = 10
    src = rng.random((h, w, 3)).astype(np.float32)
    tgt = rng.random((h, w, 3)).astype(np.float32)
    mask = np.zeros((h, w), bool)
    mask[3:7, 3:7] = True
    out = np.asarray(poisson_blend(src, mask, tgt, num_iters=200, grad_mode=grad_mode))
    assert np.isfinite(out).all()
    assert out.shape == src.shape


def test_multigrid_approximates_jacobi(rng):
    h = w = 64
    src = rng.random((h, w, 3)).astype(np.float32) * 0.5 + 0.25
    tgt = rng.random((h, w, 3)).astype(np.float32) * 0.5 + 0.25
    mask = np.zeros((h, w), bool)
    mask[8:56, 8:56] = True
    from worldrenderer_tpu.ops.poisson import poisson_blend_multigrid

    exact = np.asarray(poisson_blend(src, mask, tgt, num_iters=8000))
    mg = np.asarray(poisson_blend_multigrid(src, mask, tgt, num_iters=80))
    err = np.abs(exact - mg)[mask]
    assert err.mean() < 0.02, f"multigrid mean err {err.mean()}"
    # untouched outside
    np.testing.assert_array_equal(mg[~mask], tgt[~mask])


def test_cropped_matches_full(rng):
    from worldrenderer_tpu.ops.poisson import poisson_blend_cropped

    h = w = 96
    src = rng.random((h, w, 3)).astype(np.float32)
    tgt = rng.random((h, w, 3)).astype(np.float32)
    mask = np.zeros((h, w), bool)
    mask[10:30, 40:70] = True
    full = np.asarray(poisson_blend(src, mask, tgt, num_iters=500))
    crop = np.asarray(
        poisson_blend_cropped(src, mask, tgt, num_iters=500, bucket=32)
    )
    np.testing.assert_allclose(crop, full, atol=1e-4)


def test_cropped_empty_mask(rng):
    from worldrenderer_tpu.ops.poisson import poisson_blend_cropped

    tgt = rng.random((16, 16, 3)).astype(np.float32)
    out = np.asarray(poisson_blend_cropped(tgt, np.zeros((16, 16), bool), tgt))
    np.testing.assert_array_equal(out, tgt)

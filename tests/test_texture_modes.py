"""texture() boundary/filter-mode semantics vs a direct NumPy reference.

The op's linear path fetches all four bilinear taps with ONE fused
quad-table gather (ops/texture.py); these tests pin it to the plain
four-tap definition (nvdiffrast semantics, reference render.py:83-120)
including far out-of-range coordinates for every boundary mode.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from worldrenderer_tpu.ops.texture import texture


def _ref_fetch(tex, iy, ix, mode):
    th, tw = tex.shape[0], tex.shape[1]
    if mode == "wrap":
        return tex[iy % th, ix % tw]
    inside = (0 <= iy < th) and (0 <= ix < tw)
    if mode == "zero" and not inside:
        return np.zeros(tex.shape[-1], tex.dtype)
    return tex[np.clip(iy, 0, th - 1), np.clip(ix, 0, tw - 1)]


def _ref_texture(tex, uv, filter_mode, boundary_mode):
    b, h, w, _ = uv.shape
    th, tw, c = tex.shape[1], tex.shape[2], tex.shape[3]
    out = np.zeros((b, h, w, c), np.float32)
    for bi in range(b):
        t = tex[bi if tex.shape[0] > 1 else 0]
        for i in range(h):
            for j in range(w):
                x = uv[bi, i, j, 0] * tw - 0.5
                y = uv[bi, i, j, 1] * th - 0.5
                if filter_mode == "nearest":
                    out[bi, i, j] = _ref_fetch(
                        t,
                        int(np.floor(y + 0.5)),
                        int(np.floor(x + 0.5)),
                        boundary_mode,
                    )
                    continue
                x0, y0 = int(np.floor(x)), int(np.floor(y))
                fx, fy = x - x0, y - y0
                acc = np.zeros(c, np.float64)
                for dy, wy in ((0, 1 - fy), (1, fy)):
                    for dx, wx in ((0, 1 - fx), (1, fx)):
                        acc += wx * wy * _ref_fetch(
                            t, y0 + dy, x0 + dx, boundary_mode
                        )
                out[bi, i, j] = acc
    return out


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("boundary_mode", ["wrap", "clamp", "zero"])
@pytest.mark.parametrize("filter_mode", ["linear", "nearest"])
def test_texture_modes_match_reference(rng, boundary_mode, filter_mode):
    tex = rng.random((1, 9, 13, 3)).astype(np.float32)
    # Coordinates spanning far outside [0, 1] on both axes.
    uv = (rng.random((2, 7, 5, 2)) * 4.0 - 1.5).astype(np.float32)
    ref = _ref_texture(tex, uv, filter_mode, boundary_mode)
    ours = np.asarray(
        texture(
            jnp.asarray(tex), jnp.asarray(uv),
            filter_mode=filter_mode, boundary_mode=boundary_mode,
        )
    )
    np.testing.assert_allclose(ours, ref, atol=3e-6)


@pytest.mark.parametrize("boundary_mode", ["wrap", "clamp", "zero"])
def test_texture_straddle_taps_exact(rng, boundary_mode):
    """Pixels whose 2x2 footprint straddles the texture border — the case
    the padded quad table exists for."""
    tex = rng.random((1, 8, 8, 2)).astype(np.float32)
    edges = np.array(
        [
            [-0.01, 0.5], [0.01, 0.5], [0.99, 0.5], [1.01, 0.5],
            [0.5, -0.01], [0.5, 0.01], [0.5, 0.99], [0.5, 1.01],
            [-0.01, -0.01], [1.01, 1.01], [0.0, 0.0], [1.0, 1.0],
        ],
        np.float32,
    ).reshape(1, 12, 1, 2)
    ref = _ref_texture(tex, edges, "linear", boundary_mode)
    ours = np.asarray(
        texture(jnp.asarray(tex), jnp.asarray(edges), boundary_mode=boundary_mode)
    )
    np.testing.assert_allclose(ours, ref, atol=3e-6)


def test_texture_per_batch_textures(rng):
    """B distinct textures sample independently (no shared-broadcast path)."""
    tex = rng.random((3, 6, 6, 4)).astype(np.float32)
    uv = rng.random((3, 4, 4, 2)).astype(np.float32)
    ref = _ref_texture(tex, uv, "linear", "wrap")
    ours = np.asarray(texture(jnp.asarray(tex), jnp.asarray(uv)))
    np.testing.assert_allclose(ours, ref, atol=3e-6)


def test_texture_bf16_table_close_to_f32(rng):
    """A bfloat16 texture keeps the quad table in bf16 (1.3x faster
    gathers on v5e); outputs stay float32 and within bf16 texel
    precision of the f32 path."""
    tex = rng.random((1, 16, 16, 3)).astype(np.float32)
    uv = (rng.random((2, 8, 8, 2)) * 1.4 - 0.2).astype(np.float32)
    f32 = np.asarray(texture(jnp.asarray(tex), jnp.asarray(uv)))
    b16 = texture(jnp.asarray(tex, jnp.bfloat16), jnp.asarray(uv))
    assert b16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(b16), f32, atol=8e-3)


def test_render_auto_mip_reduces_minification_aliasing():
    """texture_filter_mode="auto_mip": mip level from screen-space UV
    finite differences. A fine checker viewed minified must come out close
    to its mean (box-filtered) instead of aliasing to near 0/1 patches."""
    import numpy as np

    from worldrenderer_tpu import TexturedMesh, get_camera, render
    from worldrenderer_tpu.mesh import make_grid_mesh

    verts, faces = make_grid_mesh(24, extent=1.0)
    uv = (verts[:, :2] - verts[:, :2].min(0)) / np.ptp(verts[:, :2], 0)
    t = (np.indices((256, 256)).sum(0) % 2).astype(np.float32)  # 1px checker
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.stack([t, t, t], -1),
    )
    cam = get_camera(
        elevation_deg=50.0, distance=3.0, fovy_deg=40.0, num_views=1,
        near=0.1, far=10.0,
    )
    lin = render(mesh, cam, 64, 64, render_depth=False, render_normal=False)
    mip = render(
        mesh, cam, 64, 64, render_depth=False, render_normal=False,
        texture_filter_mode="auto_mip",
    )
    m = np.asarray(lin.mask)
    a_lin = np.asarray(lin.attr[..., 0])[m]
    a_mip = np.asarray(mip.attr[..., 0])[m]
    # box-filtered checker converges to 0.5; auto_mip must sit far closer
    assert abs(a_mip.mean() - 0.5) < 0.05
    assert np.abs(a_mip - 0.5).mean() < 0.5 * np.abs(a_lin - 0.5).mean()

"""Differentiability of the inverse-rendering surfaces.

The texture-fit training path (dryrun_multichip, texture optimization)
backprops through ``render`` w.r.t. the TEXTURE: the rasterizer's uv/mask
outputs are constants on that path, so autodiff flows only through the
quad-table texture gather and the compositing math — this must hold on
the fused (Pallas-backed) backend too, since the kernel itself is never
differentiated. Pin it with finite differences.

Geometry (vertex-position) gradients through the rasterizer are an
explicit non-goal: the reference never optimizes geometry through
dr.rasterize (its warp-field optimizer uses its own grid lookup, which
ours reimplements analytically in baking/warp.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldrenderer_tpu import get_camera
from worldrenderer_tpu.mesh import TexturedMesh, uv_sphere_mesh
from worldrenderer_tpu.ops.rasterize import RasterizerConfig
from worldrenderer_tpu.render import render


@pytest.fixture(scope="module")
def scene():
    verts, faces, uv = uv_sphere_mesh(17, 33)
    tex = np.linspace(0.1, 0.9, 16 * 16 * 3, dtype=np.float32).reshape(16, 16, 3)
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.asarray(tex),
    )
    cam = get_camera(
        elevation_deg=20.0, distance=3.0, fovy_deg=45.0, num_views=2,
        near=0.1, far=10.0,
    )
    target = render(mesh, cam, 48, 48, render_attr=True,
                    render_depth=False, render_normal=False).attr
    return mesh, cam, target


@pytest.mark.parametrize("backend", ["xla", "fused_xla", "fused_pallas"])
def test_grad_wrt_texture_matches_finite_difference(scene, backend):
    mesh, cam, target = scene
    cfg = RasterizerConfig(backend=backend)

    def loss(tex):
        out = render(
            mesh, cam, 48, 48, render_attr=True, render_depth=False,
            render_normal=False, texture_override=tex, raster_config=cfg,
        ).attr
        return jnp.mean((out - target * 0.5) ** 2)

    g = jax.grad(loss)(mesh.texture)
    assert np.isfinite(np.asarray(g)).all()
    # Nonzero gradient over the sampled chart region.
    assert float(jnp.sum(jnp.abs(g))) > 0

    # Finite-difference check on the largest-gradient texel.
    ga = np.asarray(g)
    idx = np.unravel_index(np.abs(ga).argmax(), ga.shape)
    eps = 1e-3
    tp = mesh.texture.at[idx].add(eps)
    tm = mesh.texture.at[idx].add(-eps)
    fd = (float(loss(tp)) - float(loss(tm))) / (2 * eps)
    np.testing.assert_allclose(ga[idx], fd, rtol=5e-2, atol=1e-5)


def test_texture_fit_converges_fused(scene):
    """A few SGD steps through the fused path reduce the loss — the
    minimal inverse-rendering training loop (what dryrun_multichip shards
    over a device mesh)."""
    mesh, cam, target = scene
    cfg = RasterizerConfig(backend="fused_xla")

    def loss(tex):
        out = render(
            mesh, cam, 48, 48, render_attr=True, render_depth=False,
            render_normal=False, texture_override=tex, raster_config=cfg,
        ).attr
        return jnp.mean((out - target) ** 2)

    tex = jnp.full_like(mesh.texture, 0.5)
    l0 = float(loss(tex))
    g = jax.jit(jax.grad(loss))
    for _ in range(20):
        tex = tex - 200.0 * g(tex)
    l1 = float(loss(tex))
    assert l1 < 0.3 * l0, (l0, l1)

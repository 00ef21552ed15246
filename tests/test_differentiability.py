"""Differentiability of the inverse-rendering surfaces.

The texture-fit training path (dryrun_multichip, texture optimization)
backprops through ``render`` w.r.t. the TEXTURE: the rasterizer's uv/mask
outputs are constants on that path, so autodiff flows only through the
quad-table texture gather and the compositing math — this must hold on
the fused (Pallas-backed) backend too, since the kernel itself is never
differentiated. Pin it with finite differences.

Geometry (vertex-position) gradients: ``rasterize_diff`` implements
nvdiffrast's gradient model (fixed coverage + differentiable barycentrics;
silhouette terms via the analytic antialias pass) — pinned against finite
differences below. The reference itself never optimizes geometry through
dr.rasterize, so this exceeds its live usage.
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


def test_rasterize_diff_primal_matches_rasterize():
    """rasterize_diff's straight-through (u, v, z) must be bit-identical to
    rasterize, and its differentiable recompute must agree with the
    rasterizer's resolved barycentrics on covered pixels."""
    from worldrenderer_tpu.ops.rasterize import (
        _diff_barycentrics, rasterize, rasterize_diff,
    )
    from worldrenderer_tpu.transforms import get_clip_space_position

    verts, faces, _ = uv_sphere_mesh(17, 33)
    cam = get_camera(
        elevation_deg=25.0, distance=2.8, fovy_deg=45.0, num_views=2,
        near=0.1, far=10.0,
    )
    pos = get_clip_space_position(jnp.asarray(verts, jnp.float32), cam.mvp_mtx)
    tri = jnp.asarray(faces, jnp.int32)
    a = rasterize(pos, tri, (64, 64))
    b = rasterize_diff(pos, tri, (64, 64))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    tid = a[..., 3].astype(jnp.int32)
    u, v, z = _diff_barycentrics(pos, tri, tid, 64, 64)
    m = np.asarray(tid > 0)
    np.testing.assert_allclose(np.asarray(u)[m], np.asarray(a[..., 0])[m], atol=2e-4)
    np.testing.assert_allclose(np.asarray(v)[m], np.asarray(a[..., 1])[m], atol=2e-4)
    np.testing.assert_allclose(np.asarray(z)[m], np.asarray(a[..., 2])[m], atol=2e-4)


def test_grad_wrt_vertex_positions_matches_finite_difference():
    """dL/d(clip pos) through rasterize_diff + interpolate at FIXED coverage
    (nvdiffrast's vertex-gradient model; VERDICT r1 item 7). The loss reads
    interpolated attributes weighted by a smooth image field, so moving a
    vertex changes it smoothly through the barycentrics."""
    from worldrenderer_tpu.ops.interpolate import interpolate
    from worldrenderer_tpu.ops.rasterize import rasterize_diff
    from worldrenderer_tpu.transforms import get_clip_space_position

    verts, faces, uv = uv_sphere_mesh(9, 17)
    cam = get_camera(
        elevation_deg=25.0, distance=2.8, fovy_deg=45.0, num_views=1,
        near=0.1, far=10.0,
    )
    pos0 = get_clip_space_position(jnp.asarray(verts, jnp.float32), cam.mvp_mtx)
    tri = jnp.asarray(faces, jnp.int32)
    attr = jnp.asarray(uv, jnp.float32)[None]  # (1, V, 2)
    wfield = (
        jnp.linspace(0, 1, 48)[None, :, None, None]
        * jnp.linspace(1, 2, 48)[None, None, :, None]
    )

    def loss(pos):
        rast = rasterize_diff(pos, tri, (48, 48))
        out = interpolate(attr, rast, tri)
        return jnp.sum(out * wfield) / 100.0

    g = np.asarray(jax.grad(loss)(pos0))
    assert np.isfinite(g).all() and np.abs(g).sum() > 0

    # central differences on the 3 largest-gradient coordinates; step small
    # enough that coverage (fixed in the analytic model) rarely flips
    flat = np.abs(g).reshape(-1)
    order = np.argsort(flat)[::-1]
    checked = 0
    for k in order[:6]:
        idx = np.unravel_index(k, g.shape)
        eps = 1e-4
        pp = pos0.at[idx].add(eps)
        pm = pos0.at[idx].add(-eps)
        fd = (float(loss(pp)) - float(loss(pm))) / (2 * eps)
        if abs(fd) < 1e-7:
            continue
        np.testing.assert_allclose(g[idx], fd, rtol=8e-2, atol=1e-5)
        checked += 1
        if checked >= 3:
            break
    assert checked >= 2, "could not find stable FD probes"


@pytest.mark.slow  # ~30-65 s compile-bound; full-lane only
def test_antialias_silhouette_gradients():
    """Silhouette gradients: antialias' edge-crossing weights are analytic
    in pos, so d(sum of AA'd color)/d(vertex) is nonzero across the
    silhouette and matches finite differences (the term fixed-coverage
    rasterization alone cannot produce)."""
    from worldrenderer_tpu.ops.antialias import antialias
    from worldrenderer_tpu.ops.rasterize import rasterize, rasterize_diff

    # one big triangle over a contrasting background
    pos0 = jnp.asarray(
        [[[-0.6, -0.5, 0.2, 1.0], [0.7, -0.4, 0.2, 1.0], [0.0, 0.75, 0.2, 1.0]]],
        jnp.float32,
    )
    tri = jnp.asarray([[0, 1, 2]], jnp.int32)

    def loss(pos):
        rast = rasterize_diff(pos, tri, (32, 32))
        color = jnp.where(
            (rast[..., 3:4] > 0), 1.0, 0.0
        ) * jnp.ones((1, 32, 32, 3))
        aa = antialias(color, rast, pos, tri)
        return jnp.sum(aa) / 10.0

    g = np.asarray(jax.grad(loss)(pos0))
    assert np.isfinite(g).all()
    # growing the triangle adds covered area: gradient along x of vertex 0
    # (leftmost) should be negative (moving it left increases coverage)
    assert abs(g).sum() > 0

    # eps must stay below the sub-pixel scale where hard-coverage flips
    # enter the FD interval (probed: eps<=1e-3 agrees to ~0.1%, eps=4e-3
    # already straddles a flip)
    checked = 0
    for idx in [(0, 0, 0), (0, 1, 0), (0, 2, 1), (0, 0, 1)]:
        eps = 1e-3
        fd = (
            float(loss(pos0.at[idx].add(eps)))
            - float(loss(pos0.at[idx].add(-eps)))
        ) / (2 * eps)
        if abs(fd) < 1e-6:
            continue
        np.testing.assert_allclose(g[idx], fd, rtol=0.05, atol=2e-3)
        checked += 1
    assert checked >= 2


@pytest.mark.slow
def test_geometry_optimization_via_silhouette():
    """End-to-end mesh optimization through rasterize_diff + antialias:
    inflate a small sphere toward a larger target using only the AA'd
    silhouette loss — the capability axis the reference's stack (nvdiffrast)
    has and fixed-coverage texture grads alone cannot provide."""
    import optax

    from worldrenderer_tpu.mesh import icosphere
    from worldrenderer_tpu.ops.antialias import antialias
    from worldrenderer_tpu.ops.rasterize import rasterize_diff
    from worldrenderer_tpu.transforms import get_clip_space_position

    verts, faces = icosphere(1)
    tri = jnp.asarray(faces, jnp.int32)
    cam = get_camera(
        elevation_deg=[15.0, 15.0], distance=[4.0, 4.0], fovy_deg=[40.0, 40.0],
        azimuth_deg=[0.0, 90.0], near=0.1, far=10.0,
    )
    res = 48

    def silhouette(v_pos):
        pos = get_clip_space_position(v_pos, cam.mvp_mtx)
        rast = rasterize_diff(pos, tri, (res, res))
        cov = (rast[..., 3:4] > 0).astype(jnp.float32) * jnp.ones((1, 1, 1, 1))
        return antialias(cov, rast, pos, tri)[..., 0]

    target = silhouette(jnp.asarray(verts * 1.3, jnp.float32))

    v0 = jnp.asarray(verts, jnp.float32)

    def loss(v):
        return jnp.mean((silhouette(v) - target) ** 2)

    opt = optax.adam(2e-2)
    v = v0
    state = opt.init(v)
    grad_fn = jax.jit(jax.value_and_grad(loss))
    l0 = float(loss(v0))
    for _ in range(60):
        lv, g = grad_fn(v)
        updates, state = opt.update(g, state)
        v = optax.apply_updates(v, updates)
    l1 = float(loss(v))
    assert l1 < 0.35 * l0, (l0, l1)
    # vertices moved outward toward the 1.3x target
    r0 = float(jnp.linalg.norm(v0, axis=1).mean())
    r1 = float(jnp.linalg.norm(v, axis=1).mean())
    assert r1 > r0 * 1.05, (r0, r1)

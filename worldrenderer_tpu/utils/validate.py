"""On-chip correctness gates, importable by bench.py and the tools/ CLIs.

CPU CI cannot execute the Pallas/DMA fast paths (tests force the CPU
backend, where `_resolve_backend` maps onto the XLA implementations), so
the real TPU kernels are guarded here: the driver-captured bench runs these
gates on hardware every round and stamps the verdict into its JSON line —
a regressing kernel commit fails the round bench instead of shipping
silently (VERDICT r2 weak #3 / next #4).

Two gates:

* :func:`precision_gate` — renders reference scenes through the fast
  split_bf16 fused path AND the exact-fp32 ``vpu_pallas`` backend and
  bounds the differences (the bf16-default matmul corruption bug class:
  per-triangle texture shifts, back faces bleeding through).
* :func:`degenerate_probes` — elevation-90 camera (degenerate up vector),
  fully off-screen mesh, camera inside a sphere (near-plane crossings
  everywhere; the clipless cofactor path + auto budgets must give full
  interior coverage).

On a CPU backend both fast and exact paths resolve to the same XLA
implementation, so the precision gate passes trivially — it is a TPU gate.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

__all__ = ["precision_gate", "degenerate_probes"]


def _scene_grid(intersect: bool):
    import jax.numpy as jnp

    from ..mesh import TexturedMesh, make_grid_mesh

    verts, faces = make_grid_mesh(
        72, extent=1.0, height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y)
    )
    if intersect:
        big = np.array(
            [[-4.0, -4.0, -0.5], [4.0, -4.0, -0.5], [0.0, 6.0, -0.5]], np.float32
        )
        nv = verts.shape[0]
        verts = np.concatenate([verts, big], 0)
        faces = np.concatenate([faces, [[nv, nv + 1, nv + 2]]], 0).astype(np.int32)
    return TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32), t_pos_idx=jnp.asarray(faces, jnp.int32)
    )


def _check_scene(name, mesh, n_allowed_flips=8, res=512, quiet=False):
    """Fast-vs-exact comparison for one scene. Returns (ok, detail_line).

    Winner flips: at interpenetrating geometry, split_bf16 z ordering can
    cross fp32 ordering for a handful of pixels — those pixels legitimately
    show the OTHER triangle's attributes. The check therefore bounds the
    p99.9 error tightly and allows a tiny budget of arbitrarily-wrong
    pixels. Raw G-buffer z is compared (not normalized depth: one
    legitimate flip that exposes the far surface would rescale a whole
    view's min/max normalization)."""
    import worldrenderer_tpu as wr
    from ..ops.gbuffer import rasterize_gbuffer
    from ..ops.rasterize import FAST_TPU_CONFIG
    from ..transforms import get_clip_space_position

    cam = wr.get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0, num_views=4,
        near=0.1, far=10.0,
    )
    exact_cfg = FAST_TPU_CONFIG._replace(
        backend="vpu_pallas", dot_precision="highest"
    )
    fast = wr.render(
        mesh, cam, res, res, render_attr=False, render_depth=False,
        render_normal=True, raster_config=FAST_TPU_CONFIG,
    )
    exact = wr.render(
        mesh, cam, res, res, render_attr=False, render_depth=False,
        render_normal=True, raster_config=exact_cfg,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    gf = rasterize_gbuffer(
        pos_clip, mesh.t_pos_idx, None, (res, res), FAST_TPU_CONFIG
    )
    ge = rasterize_gbuffer(
        pos_clip, mesh.t_pos_idx, None, (res, res), exact_cfg
    )
    m_f, m_e = np.asarray(fast.mask), np.asarray(exact.mask)
    mask_diff = (m_f != m_e).sum()
    m = m_f & m_e
    dn = np.abs(np.asarray(fast.normal) - np.asarray(exact.normal)).max(-1)[m]
    dp = np.abs(np.asarray(fast.pos) - np.asarray(exact.pos)).max(-1)[m]
    gm = np.asarray(gf.mask) & np.asarray(ge.mask)
    dz = np.abs(np.asarray(gf.z) - np.asarray(ge.z))[gm]
    id_flips = int((np.asarray(gf.tri_id) != np.asarray(ge.tri_id))[gm].sum())

    # Bounds are regression-detection thresholds, not tolerances: the
    # round-1 bf16 corruption produced O(1) errors over whole triangles
    # (dn ~ 0.5+ across >>0.1% of pixels). Honest split_bf16 differs from
    # fp32 only at silhouette-edge coverage and budgeted winner flips.
    p999 = lambda a: float(np.percentile(a, 99.9)) if a.size else 0.0
    flips = int((dn > 1e-2).sum())
    edge_budget = max(16, int(1e-4 * m.sum()))
    ok = (
        mask_diff <= edge_budget
        and p999(dn) < 1e-3
        and p999(dp) < 2e-2
        and p999(dz) < 1e-4
        and flips <= n_allowed_flips
        and id_flips <= max(n_allowed_flips * 4, int(1e-4 * gm.sum()))
    )
    status = "PASS" if ok else "FAIL"
    line = (
        f"{status} {name}: mask_diff={mask_diff} flips={flips} "
        f"id_flips={id_flips} p99.9 |dn|={p999(dn):.2e} |dp|={p999(dp):.2e} "
        f"raw |dz|={p999(dz):.2e} max |dn|={dn.max() if dn.size else 0:.2e}"
    )
    if not quiet:
        print(line)
    return ok, line


def precision_gate(res: int = 512, quiet: bool = False) -> dict:
    """Run the split_bf16-vs-exact comparison on the three gate scenes.
    Returns {"ok": bool, "scenes": [detail lines]}."""
    import jax.numpy as jnp

    from ..mesh import TexturedMesh, icosphere

    results = []
    ok1, l1 = _check_scene(
        "heightfield", _scene_grid(False), n_allowed_flips=0, res=res,
        quiet=quiet,
    )
    ok2, l2 = _check_scene(
        "heightfield+intersecting", _scene_grid(True), res=res, quiet=quiet
    )
    verts, faces = icosphere(4)  # 5120 tris -> still sort_pairs
    ok3, l3 = _check_scene(
        "icosphere",
        TexturedMesh(
            v_pos=jnp.asarray(verts, jnp.float32),
            t_pos_idx=jnp.asarray(faces, jnp.int32),
        ),
        # 2 shared-edge coverage flips observed (1 px on 2 of 4 views) —
        # legitimate split_bf16 behavior, budgeted.
        n_allowed_flips=4,
        res=res,
        quiet=quiet,
    )
    results = [l1, l2, l3]
    return {"ok": bool(ok1 and ok2 and ok3), "scenes": results}


def degenerate_probes(res: int = 256, quiet: bool = False) -> dict:
    """Elevation-90 / off-screen / camera-inside-sphere probes.
    Returns {"ok": bool, "probes": [detail lines]}."""
    import jax.numpy as jnp

    import worldrenderer_tpu as wr
    from ..mesh import TexturedMesh, make_grid_mesh, uv_sphere_mesh
    from ..ops.rasterize import auto_fast_config
    from ..transforms import get_clip_space_position

    lines = []
    ok = True

    verts, faces = make_grid_mesh(
        72, extent=1.0, height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y)
    )
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    )

    # 1. elevation 90 (up vector degenerate with look direction)
    cam = wr.get_camera(
        elevation_deg=[90.0], distance=[3.0], fovy_deg=[50.0],
        azimuth_deg=[0.0], near=0.1, far=10.0,
    )
    pc = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    cfg = auto_fast_config(pc, mesh.t_pos_idx, (res, res))
    out = wr.render(
        mesh, cam, res, res, render_attr=False, render_depth=True,
        render_normal=True, raster_config=cfg,
    )
    cov = float(out.mask.mean())
    fin = bool(np.isfinite(np.asarray(out.normal)).all())
    p_ok = fin and cov > 0.3
    ok &= p_ok
    lines.append(f"{'PASS' if p_ok else 'FAIL'} elev90: cov={cov:.3f} finite={fin}")

    # 2. mesh fully off-screen (clean background, no NaNs)
    cam2 = wr.get_camera(
        elevation_deg=[10.0], distance=[3.0], fovy_deg=[30.0],
        azimuth_deg=[0.0], near=0.1, far=10.0,
    )
    far_mesh = mesh._replace(v_pos=mesh.v_pos + jnp.array([100.0, 0.0, 0.0]))
    pc2 = get_clip_space_position(far_mesh.v_pos, cam2.mvp_mtx)
    cfg2 = auto_fast_config(pc2, far_mesh.t_pos_idx, (res, res))
    out2 = wr.render(
        far_mesh, cam2, res, res, render_attr=False, render_depth=True,
        render_normal=True, raster_config=cfg2,
    )
    cov2 = float(out2.mask.mean())
    fin2 = bool(np.isfinite(np.asarray(out2.depth)).all())
    p_ok = fin2 and cov2 == 0.0
    ok &= p_ok
    lines.append(f"{'PASS' if p_ok else 'FAIL'} offscreen: cov={cov2:.3f} finite={fin2}")

    # 3. camera inside a sphere (near-plane crossings everywhere; the
    # clipless cofactor path must give full interior coverage)
    sv, sf, _ = uv_sphere_mesh(33, 65)
    sphere = TexturedMesh(
        v_pos=jnp.asarray(sv, jnp.float32), t_pos_idx=jnp.asarray(sf, jnp.int32)
    )
    cam3 = wr.get_camera(
        elevation_deg=[0.0], distance=[0.2], fovy_deg=[80.0],
        azimuth_deg=[30.0], near=0.05, far=10.0,
    )
    pc3 = get_clip_space_position(sphere.v_pos, cam3.mvp_mtx)
    cfg3 = auto_fast_config(pc3, sphere.t_pos_idx, (res, res))
    out3 = wr.render(
        sphere, cam3, res, res, render_attr=False, render_depth=True,
        render_normal=True, raster_config=cfg3,
    )
    cov3 = float(out3.mask.mean())
    fin3 = bool(np.isfinite(np.asarray(out3.normal)).all())
    p_ok = fin3 and cov3 > 0.95
    ok &= p_ok
    lines.append(
        f"{'PASS' if p_ok else 'FAIL'} inside-sphere: cov={cov3:.3f} finite={fin3}"
    )

    if not quiet:
        for ln in lines:
            print(ln)
    return {"ok": bool(ok), "probes": lines}

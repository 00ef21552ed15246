"""Scripted on-chip precision check (run on the real TPU).

Renders reference scenes through the fast split_bf16 fused path and through
the exact-fp32 `vpu_pallas` validation backend, and asserts bounds on the
differences. This automates the manual ritual that caught the bf16-default
matmul corruption class of bugs (CLAUDE.md precision hazard): any kernel or
layout change that silently degrades geometry precision fails loudly here.

Winner flips: at interpenetrating geometry, split_bf16 z ordering can cross
fp32 ordering for a handful of pixels — those pixels legitimately show the
OTHER triangle's attributes. The check therefore bounds the p99.9 error
tightly and allows a tiny budget of arbitrarily-wrong pixels.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/check_precision.py
Prints one PASS/FAIL line per scene and exits nonzero on failure.
"""

from __future__ import annotations

import sys

import numpy as np


def _scene_grid(intersect: bool):
    import jax.numpy as jnp

    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh

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


def check(name, mesh, n_allowed_flips=8):
    import jax.numpy as jnp  # noqa: F401

    import worldrenderer_tpu as wr
    from worldrenderer_tpu.ops.gbuffer import rasterize_gbuffer
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG
    from worldrenderer_tpu.transforms import get_clip_space_position

    cam = wr.get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0, num_views=4,
        near=0.1, far=10.0,
    )
    fast = wr.render(
        mesh, cam, 512, 512, render_attr=False, render_depth=False,
        render_normal=True, raster_config=FAST_TPU_CONFIG,
    )
    exact = wr.render(
        mesh, cam, 512, 512, render_attr=False, render_depth=False,
        render_normal=True,
        raster_config=FAST_TPU_CONFIG._replace(
            backend="vpu_pallas", dot_precision="highest"
        ),
    )
    # RAW z/id from the G-buffer: normalized depth (the render-level depth
    # strategies) min/max-normalizes per view, so ONE legitimate winner
    # flip that exposes the far surface rescales the WHOLE view's depth
    # map — an amplification of the comparison, not of the kernel error.
    # Bound the raw z the kernel actually computes; flips carry the budget.
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    gf = rasterize_gbuffer(
        pos_clip, mesh.t_pos_idx, None, (512, 512), FAST_TPU_CONFIG
    )
    ge = rasterize_gbuffer(
        pos_clip, mesh.t_pos_idx, None, (512, 512),
        FAST_TPU_CONFIG._replace(backend="vpu_pallas", dot_precision="highest"),
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
    # fp32 only at silhouette-edge coverage (a few mask pixels) and at
    # winner flips where bf16-rounded edge/z ordering crosses fp32's
    # (including rare shared-edge coverage flips that expose the far
    # surface — arbitrarily wrong VALUES on a budgeted count of pixels).
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
    print(
        f"{status} {name}: mask_diff={mask_diff} flips={flips} "
        f"id_flips={id_flips} p99.9 |dn|={p999(dn):.2e} |dp|={p999(dp):.2e} "
        f"raw |dz|={p999(dz):.2e} max |dn|={dn.max() if dn.size else 0:.2e}"
    )
    return ok


def main():
    import jax.numpy as jnp

    from worldrenderer_tpu.mesh import TexturedMesh, icosphere

    ok = True
    ok &= check("heightfield", _scene_grid(False), n_allowed_flips=0)
    ok &= check("heightfield+intersecting", _scene_grid(True))
    verts, faces = icosphere(4)  # 5120 tris -> still sort_pairs at 4+ subdiv
    ok &= check(
        "icosphere",
        TexturedMesh(
            v_pos=jnp.asarray(verts, jnp.float32),
            t_pos_idx=jnp.asarray(faces, jnp.int32),
        ),
        # 2 shared-edge coverage flips observed (1 px on 2 of 4 views:
        # bf16-rounded edge test loses the front triangle, exposing the
        # back face) — legitimate split_bf16 behavior, budgeted.
        n_allowed_flips=4,
    )
    if not ok:
        sys.exit(1)
    print("precision check: ALL PASS")


if __name__ == "__main__":
    main()

"""Interleaved A/B of the quad-table layout on the config4 workload
(4-view 1024^2 UV texture + materials — the texture-gather-bound config).

Variants: row-major quad table ("linear") vs 8x8 block-swizzled
("linear_block8"). Full-render timing, alternating within one process.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_texlayout.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

R_INNER = 2
N_VIEWS = 4
RES = 1024
PAIRS = 3


def main():
    import jax
    import jax.numpy as jnp

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG, auto_fast_config
    from worldrenderer_tpu.render import render
    from worldrenderer_tpu.transforms import get_clip_space_position

    verts, faces = make_grid_mesh(
        72, extent=1.0,
        height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y),
    )
    uv = (verts[:, :2] - verts[:, :2].min(0)) / np.ptp(verts[:, :2], 0)
    t = (np.indices((1024, 1024)).sum(0) // 64 % 2).astype(np.float32)
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.stack([t, 1 - t, t * 0 + 0.5], -1),
    )
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0, num_views=N_VIEWS,
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    cfg = auto_fast_config(
        pos_clip, mesh.t_pos_idx, (RES, RES), base=FAST_TPU_CONFIG
    )

    runners = {}
    for name, fm in (
        ("row", "linear"), ("block8", "linear_block8"), ("auto_mip", "auto_mip"),
    ):
        render_fn = functools.partial(
            render, height=RES, width=RES, render_attr=True,
            render_depth=True, render_normal=True, raster_config=cfg,
            texture_filter_mode=fm,
        )

        def run(mesh, cam, seed, render_fn=render_fn):
            def body(acc, i):
                c = cam._replace(
                    mvp_mtx=cam.mvp_mtx + (seed + i).astype(jnp.float32) * 1e-6
                )
                out = render_fn(mesh, c)
                return (
                    acc + jnp.sum(jnp.abs(out.attr)) + jnp.sum(out.mask)
                    + jnp.sum(jnp.abs(out.normal))
                ), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R_INNER))
            return acc

        runners[name] = jax.jit(run)

    checks = {}
    for name, fn in runners.items():
        t0 = time.perf_counter()
        checks[name] = float(fn(mesh, cam, jnp.float32(0)))
        assert np.isfinite(checks[name])
        print(f"{name}: compiled+first in {time.perf_counter()-t0:.1f}s",
              flush=True)
    assert abs(checks["row"] - checks["block8"]) < 1e-3 * abs(checks["row"]), checks
    # auto_mip filters differently by design — only sanity-check finiteness

    results = {n: [] for n in runners}
    for pair in range(PAIRS):
        for name, fn in runners.items():
            t0 = time.perf_counter()
            reps = 3
            for i in range(reps):
                float(fn(mesh, cam, jnp.float32(pair * 10 + i + 1)))
            dt = (time.perf_counter() - t0) / reps / R_INNER
            vps = N_VIEWS / dt
            results[name].append(vps)
            print(f"pair {pair} {name}: {vps:8.1f} views/s", flush=True)

    for name, vals in results.items():
        print(f"{name}: median {np.median(vals):.1f}  all {[round(v,1) for v in vals]}")
    for other in ("block8", "auto_mip"):
        ratios = [b / a for a, b in zip(results["row"], results[other])]
        print(f"{other}/row per-pair ratios: {[round(r,3) for r in ratios]}  median {np.median(ratios):.3f}")


if __name__ == "__main__":
    main()

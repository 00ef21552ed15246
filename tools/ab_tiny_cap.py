"""Interleaved A/B of bin_tiny_cap (tiny-candidate compaction) on the raw
1M-tri tinysort scene: only ~area-fraction of sub-pixel candidates cover
their pixel center, so compacting them with one single-operand T-entry sort
shrinks the tiny path's two multi-operand sorts from (T + H*W) to
(cap + H*W) entries.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_tiny_cap.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

R_INNER = 4
N_VIEWS = 6
RES = 512
PAIRS = 3


def main():
    import jax
    import jax.numpy as jnp

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh, with_normals
    from worldrenderer_tpu.ops.rasterize import (
        FAST_TPU_CONFIG,
        auto_fast_config,
        binning_stats,
    )
    from worldrenderer_tpu.render import render
    from worldrenderer_tpu.transforms import get_clip_space_position

    verts, faces = make_grid_mesh(
        708, extent=1.0,
        height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y),
    )
    mesh = with_normals(TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    ))
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0,
        num_views=N_VIEWS, near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    auto = auto_fast_config(
        pos_clip, mesh.t_pos_idx, (RES, RES),
        base=FAST_TPU_CONFIG._replace(bin_tiny_px=1.0),
    )
    st = binning_stats(pos_clip, mesh.t_pos_idx, (RES, RES), auto)
    print("auto cfg: tiny_cap =", auto.bin_tiny_cap,
          "n_tiny_cov =", st["n_tiny_cov"],
          "n_tiny_1px =", st["n_tiny_1px"], flush=True)
    variants = {
        "uncapped": auto._replace(bin_tiny_cap=0),
        "compacted": auto,
    }

    runners = {}
    for name, cfg in variants.items():
        render_fn = functools.partial(
            render, height=RES, width=RES, render_attr=False,
            render_depth=False, render_normal=True, raster_config=cfg,
        )

        def run(mesh, cam, seed, render_fn=render_fn):
            def body(acc, i):
                c = cam._replace(
                    mvp_mtx=cam.mvp_mtx + (seed + i).astype(jnp.float32) * 1e-6
                )
                out = render_fn(mesh, c)
                return acc + jnp.sum(jnp.abs(out.normal)) + jnp.sum(out.mask), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R_INNER))
            return acc

        runners[name] = jax.jit(run)

    checks = {}
    for name, fn in runners.items():
        t0 = time.perf_counter()
        checks[name] = float(fn(mesh, cam, jnp.float32(0)))
        assert np.isfinite(checks[name])
        print(f"{name}: compiled+first in {time.perf_counter()-t0:.1f}s", flush=True)
    assert checks["compacted"] == checks["uncapped"], checks  # bit-identical

    results = {n: [] for n in runners}
    for pair in range(PAIRS):
        for name, fn in runners.items():
            t0 = time.perf_counter()
            reps = 2
            for i in range(reps):
                float(fn(mesh, cam, jnp.float32(pair * 10 + i + 1)))
            dt = (time.perf_counter() - t0) / reps / R_INNER
            results[name].append(N_VIEWS / dt)
            print(f"pair {pair} {name}: {N_VIEWS/dt:8.1f} views/s", flush=True)

    for name, vals in results.items():
        print(f"{name}: median {np.median(vals):.1f}  all {[round(v,1) for v in vals]}")
    ratios = [b / a for a, b in zip(results["uncapped"], results["compacted"])]
    print(f"compacted/uncapped per-pair ratios: {[round(r,3) for r in ratios]}"
          f"  median {np.median(ratios):.3f}")


if __name__ == "__main__":
    main()

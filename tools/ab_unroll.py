"""Interleaved A/B of kernel_unroll=1 vs 2 on the headline scene.

Per CLAUDE.md protocol: machine drift reaches +-30%, so both variants
compile once and then alternate A/B/A/B... within ONE process; report
per-pair ratios and medians. Full-render timing (stage-isolated profiles
mislead).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_unroll.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

R_INNER = 8
N_VIEWS = 6
RES = 512
PAIRS = 3


def main():
    import jax
    import jax.numpy as jnp

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh
    from worldrenderer_tpu.ops.rasterize import auto_fast_config, FAST_TPU_CONFIG, binning_stats
    from worldrenderer_tpu.render import render
    from worldrenderer_tpu.transforms import get_clip_space_position

    verts, faces = make_grid_mesh(
        72, extent=1.0,
        height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y),
    )
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    )
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0,
        num_views=N_VIEWS, near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    base = auto_fast_config(
        pos_clip, mesh.t_pos_idx, (RES, RES), base=FAST_TPU_CONFIG
    )
    variants = {
        "unroll1": base,
        "unroll2": base._replace(kernel_unroll=2),
    }

    runners = {}
    for name, cfg in variants.items():
        stats = binning_stats(pos_clip, mesh.t_pos_idx, (RES, RES), cfg)
        assert stats["ok"], (name, stats)
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

    # compile + warm both
    for name, fn in runners.items():
        t0 = time.perf_counter()
        v = float(fn(mesh, cam, jnp.float32(0)))
        assert np.isfinite(v)
        print(f"{name}: compiled+first in {time.perf_counter()-t0:.1f}s", flush=True)

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
    names = list(results)
    ratios = [b / a for a, b in zip(results[names[0]], results[names[1]])]
    print(f"{names[1]}/{names[0]} per-pair ratios: {[round(r,3) for r in ratios]}  median {np.median(ratios):.3f}")


if __name__ == "__main__":
    main()

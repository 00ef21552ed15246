"""Interleaved A/B of texture-gather lowerings on the config4 workload
(4-view 1024^2 UV texture + materials — the texture-gather-bound config).

The gather is ~51% of the frame and XLA's TPU gather emitter is
shape-dependent (table-size sweep measured NON-monotonic, CLAUDE.md), so
this times the FULL render per gather_mode, alternating within one
process. Modes: vmap (default) / flat1d / block8 / shard4
(ops/texture.py:_gather_rows).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_gather_mode.py
       [--modes vmap,flat1d,block8,shard4] [--pairs 3] [--res 1024]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np

R_INNER = 2
N_VIEWS = 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--modes", default="vmap,flat1d,block8,shard4")
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--res", type=int, default=1024)
    args = ap.parse_args()
    res = args.res

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
    # 255-quantize the checker (image-file semantics) so pack_mode='u8'
    # runners produce the SAME checksum as the f32 table runners.
    checker = np.round(np.stack([t, 1 - t, t * 0 + 0.5], -1) * 255) / 255
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.asarray(checker, jnp.float32),
    )
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0, num_views=N_VIEWS,
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    cfg = auto_fast_config(
        pos_clip, mesh.t_pos_idx, (res, res), base=FAST_TPU_CONFIG
    )

    runners = {}
    for name in args.modes.split(","):
        # "u8:<gather_mode>" = byte-packed quad table + that gather mode.
        pack, gname = (
            name.split(":", 1) if ":" in name else ("none", name)
        )
        render_fn = functools.partial(
            render, height=res, width=res, render_attr=True,
            render_depth=True, render_normal=True, raster_config=cfg,
            texture_gather_mode=gname, texture_pack_mode=pack,
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
    base = next(iter(checks.values()))
    for name, v in checks.items():
        assert abs(v - base) < 1e-3 * abs(base), (name, checks)

    results = {n: [] for n in runners}
    for pair in range(args.pairs):
        for name, fn in runners.items():
            t0 = time.perf_counter()
            reps = 3
            for r in range(reps):
                float(fn(mesh, cam, jnp.float32(10 + pair * reps + r)))
            dt = (time.perf_counter() - t0) / reps / R_INNER
            vps = N_VIEWS / dt
            results[name].append(vps)
            print(f"pair {pair} {name:8s}: {vps:7.2f} views/s", flush=True)

    print("\nmedians:")
    for name, vals in results.items():
        v = sorted(vals)
        print(f"  {name:8s}: {np.median(v):7.2f} views/s "
              f"[{v[0]:.1f}-{v[-1]:.1f}]")
    base_med = np.median(results[next(iter(runners))])
    for name, vals in results.items():
        print(f"  ratio {name}/baseline: {np.median(vals)/base_med:.3f}")


if __name__ == "__main__":
    main()

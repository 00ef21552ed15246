"""Gather-cost diagnosis on the config4 workload: is the texture gather
sensitive to TABLE SIZE (cache/locality-bound) or flat (engine-rate-bound)?

Variants: no-texture baseline (geometry-only), then linear sampling from a
1024^2 / 512^2 / 256^2 texture (same screen work, same gather COUNT, 16x
table-size spread). If views/s is flat across sizes, the per-row gather
rate is the floor and layout/size tricks cannot move config4.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_texsize.py
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

    def mesh_with_tex(size):
        if size is None:
            return TexturedMesh(
                v_pos=jnp.asarray(verts, jnp.float32),
                t_pos_idx=jnp.asarray(faces, jnp.int32),
            )
        t = (np.indices((size, size)).sum(0) // max(size // 16, 1) % 2).astype(
            np.float32
        )
        return TexturedMesh(
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
    m0 = mesh_with_tex(None)
    pos_clip = get_clip_space_position(m0.v_pos, cam.mvp_mtx)
    cfg = auto_fast_config(
        pos_clip, m0.t_pos_idx, (RES, RES), base=FAST_TPU_CONFIG
    )

    variants = {
        "notex": (None, False),
        "tex1024": (1024, True),
        "tex512": (512, True),
        "tex256": (256, True),
    }
    runners = {}
    meshes = {}
    for name, (size, attr) in variants.items():
        meshes[name] = mesh_with_tex(size)
        render_fn = functools.partial(
            render, height=RES, width=RES, render_attr=attr,
            render_depth=True, render_normal=True, raster_config=cfg,
        )

        def run(mesh, cam, seed, render_fn=render_fn, attr=attr):
            def body(acc, i):
                c = cam._replace(
                    mvp_mtx=cam.mvp_mtx + (seed + i).astype(jnp.float32) * 1e-6
                )
                out = render_fn(mesh, c)
                s = jnp.sum(out.mask) + jnp.sum(jnp.abs(out.normal))
                if attr:
                    s = s + jnp.sum(jnp.abs(out.attr))
                return acc + s, None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R_INNER))
            return acc

        runners[name] = jax.jit(run)

    for name, fn in runners.items():
        t0 = time.perf_counter()
        v = float(fn(meshes[name], cam, jnp.float32(0)))
        assert np.isfinite(v)
        print(f"{name}: compiled+first in {time.perf_counter()-t0:.1f}s", flush=True)

    results = {n: [] for n in runners}
    for pair in range(PAIRS):
        for name, fn in runners.items():
            t0 = time.perf_counter()
            reps = 3
            for i in range(reps):
                float(fn(meshes[name], cam, jnp.float32(pair * 10 + i + 1)))
            dt = (time.perf_counter() - t0) / reps / R_INNER
            results[name].append(N_VIEWS / dt)
            print(f"pair {pair} {name}: {N_VIEWS/dt:8.1f} views/s", flush=True)

    meds = {n: float(np.median(v)) for n, v in results.items()}
    for name, vals in results.items():
        print(f"{name}: median {meds[name]:.1f}  all {[round(v,1) for v in vals]}")
    base = meds["notex"]
    for name in ("tex1024", "tex512", "tex256"):
        share = 1.0 - meds[name] / base
        print(f"{name}: gather+sample share of frame = {share*100:.1f}%")


if __name__ == "__main__":
    main()

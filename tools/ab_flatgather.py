"""Interleaved A/B of grid_sample_parts' batched-table gather layout on the
uv2048 projection workload (the two view->UV gathers are ~83% of its device
time): "flat" reshapes the (N, qh*qw, cols) quad table into one 2D
(N*qh*qw, cols) gather operand (row-major rows), "vmap" is the batched
gather (risk: planar operand layout, ~2.2x per row on the raw-1M record
gather). Bit-identical outputs.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_flatgather.py
"""

from __future__ import annotations

import importlib
import time

import numpy as np

UV_SIZE = 2048
N_VIEWS, RES = 6, 512
PAIRS = 3
R_INNER = 4


def main():
    import jax
    import jax.numpy as jnp

    gs = importlib.import_module("worldrenderer_tpu.ops.grid_sample")
    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.baking import uv_precompute, uv_render_geometry
    from worldrenderer_tpu.mesh import TexturedMesh, uv_sphere_mesh
    from worldrenderer_tpu.render import render

    verts, faces, uv = uv_sphere_mesh(65, 129)
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.zeros((UV_SIZE, UV_SIZE, 3), jnp.float32),
    )
    cam = get_camera(
        elevation_deg=20.0, distance=2.7, fovy_deg=40.0, num_views=N_VIEWS,
        near=0.1, far=10.0,
    )
    out = render(mesh, cam, RES, RES, render_attr=True)
    images = out.attr
    pre = uv_precompute(mesh, UV_SIZE, UV_SIZE)
    pre = jax.tree.map(
        lambda x: x if x is None else jax.device_put(x), pre
    )

    def geom(images):
        g = uv_render_geometry(
            mesh, cam, RES, RES, pre, compute_depth_grad=True,
            sample_images=images,
        )
        return (
            jnp.sum(jnp.abs(g.uv_pos_proj)) + jnp.sum(g.uv_aoi_cos)
            + jnp.sum(g.uv_attr_proj)
        )

    def run(images, seed):
        def body(acc, i):
            return acc + geom(images + (seed + i) * 1e-9), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R_INNER))
        return acc

    runners = {}
    for name, flag in (("vmap", False), ("flat", True)):
        gs._FLAT_BATCH_GATHER = flag
        runners[name] = jax.jit(run)  # traces lazily — force below per flag
        t0 = time.perf_counter()
        check = float(runners[name](images, jnp.float32(0)))
        assert np.isfinite(check)
        if name == "vmap":
            base_check = check
        else:
            assert check == base_check, (check, base_check)
        print(f"{name}: compiled+first in {time.perf_counter()-t0:.1f}s",
              flush=True)
    gs._FLAT_BATCH_GATHER = True

    results = {n: [] for n in runners}
    for pair in range(PAIRS):
        for name, fn in runners.items():
            t0 = time.perf_counter()
            reps = 2
            for i in range(reps):
                float(fn(images, jnp.float32(pair * 10 + i + 1)))
            dt = (time.perf_counter() - t0) / reps / R_INNER
            results[name].append(N_VIEWS / dt)
            print(f"pair {pair} {name}: {N_VIEWS/dt:8.2f} proj-views/s",
                  flush=True)

    for name, vals in results.items():
        print(f"{name}: median {np.median(vals):.2f}  "
              f"all {[round(v, 2) for v in vals]}")
    ratios = [b / a for a, b in zip(results["vmap"], results["flat"])]
    print(f"flat/vmap per-pair ratios: {[round(r, 3) for r in ratios]}"
          f"  median {np.median(ratios):.3f}")


if __name__ == "__main__":
    main()

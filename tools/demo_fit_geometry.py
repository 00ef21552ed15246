"""On-chip mesh optimization demo: inflate a coarse sphere toward a larger
target from SILHOUETTES alone, via rasterize_diff (fixed-coverage vertex
gradients) + the analytic antialias pass (differentiable edge-crossing
weights). Validates the vertex-gradient path end-to-end on real TPU
hardware — compile, 120 Adam steps, loss trajectory, final radius.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/demo_fit_geometry.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import icosphere
    from worldrenderer_tpu.ops.antialias import antialias
    from worldrenderer_tpu.ops.rasterize import rasterize_diff
    from worldrenderer_tpu.transforms import get_clip_space_position

    verts, faces = icosphere(2)
    tri = jnp.asarray(faces, jnp.int32)
    cam = get_camera(
        elevation_deg=[15.0, 15.0, 60.0], distance=[4.0] * 3,
        fovy_deg=[40.0] * 3, azimuth_deg=[0.0, 90.0, 200.0],
        near=0.1, far=10.0,
    )
    res = 128

    def silhouette(v_pos):
        pos = get_clip_space_position(v_pos, cam.mvp_mtx)
        rast = rasterize_diff(pos, tri, (res, res))
        cov = (rast[..., 3:4] > 0).astype(jnp.float32)
        return antialias(cov, rast, pos, tri)[..., 0]

    target = silhouette(jnp.asarray(verts * 1.35, jnp.float32))
    v0 = jnp.asarray(verts, jnp.float32)

    def loss(v):
        return jnp.mean((silhouette(v) - target) ** 2)

    opt = optax.adam(2e-2)

    @jax.jit
    def step_fn(v, s):
        lv, g = jax.value_and_grad(loss)(v)
        updates, s2 = opt.update(g, s)
        return lv, optax.apply_updates(v, updates), s2

    v = v0
    state = opt.init(v)
    t0 = time.perf_counter()
    lv, v, state = step_fn(v, state)
    print(f"compiled+step0 in {time.perf_counter()-t0:.1f}s loss={float(lv):.6f}",
          flush=True)
    t0 = time.perf_counter()
    for i in range(1, 120):
        lv, v, state = step_fn(v, state)
        if i % 20 == 0:
            print(f"step {i:3d}: loss {float(lv):.6f}", flush=True)
    dt = time.perf_counter() - t0
    l0 = float(loss(v0))
    l1 = float(loss(v))
    r0 = float(jnp.linalg.norm(v0, axis=1).mean())
    r1 = float(jnp.linalg.norm(v, axis=1).mean())
    print(f"119 steps in {dt:.1f}s ({dt/119*1e3:.1f} ms/step)")
    print(f"loss {l0:.6f} -> {l1:.6f}  mean radius {r0:.3f} -> {r1:.3f} "
          f"(target 1.35)")
    assert l1 < 0.2 * l0, (l0, l1)
    # silhouettes constrain the boundary, not every interior vertex — the
    # mean radius moves most of the way, not all (measured 1.197 on-chip)
    assert r1 > 1.15, r1
    print("GEOMETRY FIT OK")


if __name__ == "__main__":
    main()

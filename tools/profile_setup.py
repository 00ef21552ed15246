"""Ablation profile of _triangle_setup_t — the dominant fixed cost
(measured 0.73 ms/view of a 1.32 ms/view headline render at 10k tris).

Stages (each timed on-chip with checksum forcing):
  v4       -> the hoisted vertex gather alone
  front    -> front-face planes + bbox only (no clipless crossing block)
  full     -> the real _triangle_setup_t
  nopad    -> full minus the trailing sentinel pads

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_setup.py
"""

from __future__ import annotations

import time

import numpy as np

R_INNER = 8
N_VIEWS = 6
RES = 512


def main():
    import jax
    import jax.numpy as jnp

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import make_grid_mesh
    from worldrenderer_tpu.ops.rasterize import _triangle_setup_t
    from worldrenderer_tpu.transforms import get_clip_space_position

    verts, faces = make_grid_mesh(
        72, extent=1.0,
        height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y),
    )
    tri = jnp.asarray(faces, jnp.int32)
    t_total = tri.shape[0]
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0,
        num_views=N_VIEWS, near=0.1, far=10.0,
    )
    pos0 = get_clip_space_position(
        jnp.asarray(verts, jnp.float32), cam.mvp_mtx
    )

    vmajor = tri.T.reshape(-1)

    def v4_of(pos):
        n_vert = pos.shape[1]
        return (
            pos.transpose(1, 0, 2).reshape(n_vert, pos.shape[0] * 4)[vmajor]
            .T.reshape(pos.shape[0], 4, 3, t_total)
        )

    def stage_v4(pos):
        return jnp.sum(v4_of(pos))

    def front_setup(v4):
        """Front-face-only plane math (subset of _triangle_setup_t)."""
        w = v4[3]
        w_safe = jnp.where(jnp.abs(w) < 1e-8, 1e-8, w)
        inv_w = 1.0 / w_safe
        x = (v4[0] * inv_w + 1.0) * (RES * 0.5)
        y = (v4[1] * inv_w + 1.0) * (RES * 0.5)
        zw = v4[2] * inv_w
        nxt = jnp.array([1, 2, 0])
        prv = jnp.array([2, 0, 1])
        ax = x[nxt]
        ay = y[nxt]
        dx = x[prv] - ax
        dy = y[prv] - ay
        area = (x[1] - x[0]) * (y[2] - y[0]) - (y[1] - y[0]) * (x[2] - x[0])
        sgn = jnp.where(area < 0, -1.0, 1.0)
        area_abs = jnp.abs(area)
        valid = jnp.all(w > 1e-8, axis=0) & (area_abs > 0)
        inv_area = jnp.where(valid, 1.0 / jnp.maximum(area_abs, 1e-30), 0.0)
        dxs = dx * sgn[None]
        dys = dy * sgn[None]
        alpha = -dys
        beta = dxs
        gamma = dys * ax - dxs * ay
        zc = zw * inv_area[None]
        z_a = jnp.sum(zc * alpha, axis=0)
        z_b = jnp.sum(zc * beta, axis=0)
        z_g = jnp.sum(zc * gamma, axis=0)
        bbox4 = jnp.stack(
            [x.min(axis=0), x.max(axis=0), y.min(axis=0), y.max(axis=0)],
            axis=0,
        )
        return (
            jnp.sum(alpha) + jnp.sum(beta) + jnp.sum(gamma)
            + z_a.sum() + z_b.sum() + z_g.sum() + jnp.sum(bbox4)
        )

    def stage_front(pos):
        v4 = v4_of(pos)
        return jnp.sum(jax.vmap(front_setup)(v4))

    def stage_full(pos):
        v4 = v4_of(pos)
        s = jax.vmap(
            lambda p, v: _triangle_setup_t(p, tri, RES, RES, v4=v)
        )(pos, v4)
        return jnp.sum(s.planes12) + jnp.sum(s.bbox4)

    def scan_time(fn, arg):
        @jax.jit
        def run(a, seed):
            def body(acc, i):
                return acc + fn(a + (seed + i) * 1e-12), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R_INNER))
            return acc

        float(run(arg, jnp.float32(0)))
        t0 = time.perf_counter()
        reps = 4
        for i in range(reps):
            float(run(arg, jnp.float32(i)))
        return (time.perf_counter() - t0) / reps / R_INNER

    for name, fn in [
        ("v4", stage_v4), ("front", stage_front), ("full", stage_full),
    ]:
        dt = scan_time(fn, pos0)
        print(f"{name:6s} {dt*1e3:8.3f} ms/iter ({dt/N_VIEWS*1e3:7.3f} ms/view)")


if __name__ == "__main__":
    main()

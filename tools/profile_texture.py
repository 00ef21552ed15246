"""Texture-sampling cost model on the real chip.

1. Gather microbenchmark: is a random gather's cost per ROW or per ELEMENT?
   Times (N, C)-row gathers for several (N, C) at fixed N*C and fixed N.
2. config4 breakdown: 1024^2 render with / without attr (texture sampling)
   to isolate the gather-bound stage.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_texture.py
"""

from __future__ import annotations

import functools
import time

import numpy as np


def scan_time(fn, *args, r_inner=8, reps=4):
    """Args are passed INTO the jit (closure-captured arrays become baked
    constants, which blow past the remote-compile request size limit)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(seed, *a):
        def body(acc, i):
            return acc + fn(seed + i, *a), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(r_inner))
        return acc

    float(run(jnp.float32(0), *args))
    t0 = time.perf_counter()
    for i in range(reps):
        float(run(jnp.float32(i), *args))
    return (time.perf_counter() - t0) / reps / r_inner


def main():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)

    print("== gather cost model (random row gathers from a 1M-row table)")
    for n_rows, n_cols, n_idx in [
        (1 << 20, 4, 1 << 20),
        (1 << 20, 16, 1 << 20),
        (1 << 20, 64, 1 << 20),
        (1 << 20, 4, 1 << 22),
        (1 << 18, 4, 1 << 20),
    ]:
        table = jax.random.normal(key, (n_rows, n_cols), jnp.float32)
        idx = jax.random.randint(key, (n_idx,), 0, n_rows, jnp.int32)

        def g(seed, table, idx, n_rows=n_rows):
            i = jnp.clip(idx + seed.astype(jnp.int32), 0, n_rows - 1)
            return jnp.sum(table[i])

        dt = scan_time(g, table, idx, r_inner=4)
        ns_row = dt / n_idx * 1e9
        ns_el = dt / (n_idx * n_cols) * 1e9
        print(
            f"  rows={n_rows:>8} cols={n_cols:>3} idx={n_idx:>8}: "
            f"{dt*1e3:7.3f} ms  {ns_row:6.2f} ns/row  {ns_el:6.2f} ns/elem"
        )

    print("== 2D gather (image-shaped indices, like texture sampling)")
    th = tw = 1024
    tex = jax.random.normal(key, (th, tw, 3), jnp.float32)
    for res in (512, 1024):
        iy = jax.random.randint(key, (res, res), 0, th, jnp.int32)
        ix = jax.random.randint(key, (res, res), 0, tw, jnp.int32)

        def g2(seed, tex, iy, ix):
            y = jnp.clip(iy + seed.astype(jnp.int32), 0, th - 1)
            return jnp.sum(tex[y, ix])

        dt = scan_time(g2, tex, iy, ix, r_inner=4)
        print(f"  {res}^2 from {th}^2x3: {dt*1e3:7.3f} ms "
              f"({dt/(res*res)*1e9:5.2f} ns/px)")

    print("== config4 breakdown: 1024^2, 4 views, 10k tris")
    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG
    from worldrenderer_tpu.render import render

    verts, faces = make_grid_mesh(
        72, extent=1.0, height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y)
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
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0, num_views=4,
        near=0.1, far=10.0,
    )
    variants = [
        ("normals+depth only", dict(render_attr=False, render_depth=True,
                                    render_normal=True)),
        ("+attr (uv+texture)", dict(render_attr=True, render_depth=True,
                                    render_normal=True)),
        ("attr only", dict(render_attr=True, render_depth=False,
                           render_normal=False)),
    ]
    for name, kw in variants:
        render_fn = functools.partial(
            render, height=1024, width=1024,
            raster_config=FAST_TPU_CONFIG, **kw,
        )

        def rstep(seed, mesh=mesh, cam=cam, render_fn=render_fn):
            out = render_fn(mesh, cam._replace(mvp_mtx=cam.mvp_mtx + seed * 1e-7))
            s = jnp.float32(0)
            for f in ("normal", "pos", "attr", "depth"):
                v = getattr(out, f)
                if v is not None:
                    s = s + jnp.sum(jnp.abs(v))
            return s + jnp.sum(out.mask)

        dt = scan_time(rstep, r_inner=4, reps=3)
        print(f"  {name:22s} {dt*1e3:8.2f} ms/iter "
              f"({dt/4*1e3:7.2f} ms/view, {4/dt:6.1f} views/s)")


if __name__ == "__main__":
    main()

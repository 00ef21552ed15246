"""Interleaved on-chip A/B: record tables via stack-of-columns vs .T.

The raw-1M trace showed ~24% of the frame in XLA's loop-materialized
transposes of the flat/tiny record tables (see _rows_to_records in
ops/gbuffer.py). This A/Bs the FULL raw-1M tinysort render with the
helper monkeypatched to the old ``rows.T`` form vs the shipped stack
form, in one process, interleaved — and asserts the G-buffer checksums
are BIT-identical between the two (it is a pure layout change).

Usage: PYTHONPATH=/root/repo:/root/repo/tools:/root/.axon_site \
       python tools/ab_recstack.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench as _bench
    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh, with_normals
    from worldrenderer_tpu.ops import gbuffer as _gb
    from worldrenderer_tpu.ops.rasterize import auto_fast_config
    from worldrenderer_tpu.render import render
    from worldrenderer_tpu.transforms import get_clip_space_position

    n = 708  # (n-1)^2 * 2 = 999,698 triangles
    verts, faces = make_grid_mesh(
        n, extent=1.0,
        height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y),
    )
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    )
    mesh = with_normals(mesh)
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0, num_views=6,
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    cfg = auto_fast_config(
        pos_clip, mesh.t_pos_idx, (512, 512),
        base=_bench._fast_cfg()._replace(bin_tiny_px=1.0),
    )

    stack_impl = _gb._rows_to_records

    def t_impl(rows):
        return rows.T

    def xor_bits(x):
        u = jax.lax.bitcast_convert_type(
            jnp.asarray(x, jnp.float32), jnp.uint32
        ).reshape(-1)
        return jax.lax.reduce(u, jnp.uint32(0), jax.lax.bitwise_xor, (0,))

    def make_frame():
        def frame(mesh, cam, seed):
            out = render(
                mesh, cam._replace(mvp_mtx=cam.mvp_mtx + seed * 1e-6),
                512, 512, render_attr=False, render_depth=False,
                render_normal=True, raster_config=cfg,
            )
            # Timing checksum (float) + exact bit hashes of every output.
            s = jnp.sum(out.mask) + jnp.sum(jnp.abs(out.normal))
            bits = (
                xor_bits(out.normal)
                ^ xor_bits(out.mask.astype(jnp.float32))
            )
            return s, bits

        return jax.jit(frame)

    _gb._rows_to_records = t_impl
    f_old = make_frame()
    s_old, b_old = f_old(mesh, cam, jnp.float32(0))
    s_old, b_old = float(s_old), int(b_old)
    _gb._rows_to_records = stack_impl
    f_new = make_frame()
    s_new, b_new = f_new(mesh, cam, jnp.float32(0))
    s_new, b_new = float(s_new), int(b_new)
    print(
        f"checksum old {s_old!r}/{b_old:08x} new {s_new!r}/{b_new:08x} "
        f"bit_identical={b_old == b_new and s_old == s_new}", flush=True,
    )

    n_views = 6
    results = {"old": [], "new": []}
    for pair in range(3):
        for name, f in (("old", f_old), ("new", f_new)):
            # warm dispatch
            float(f(mesh, cam, jnp.float32(pair + 1))[0])
            t0 = time.perf_counter()
            reps = 4
            for r in range(reps):
                float(f(mesh, cam, jnp.float32(pair * 10 + r))[0])
            dt = (time.perf_counter() - t0) / reps
            vps = n_views / dt
            results[name].append(vps)
            print(f"pair {pair} {name}: {vps:7.2f} views/s", flush=True)

    mo, mn = np.median(results["old"]), np.median(results["new"])
    print(f"median old {mo:.2f} new {mn:.2f} ratio {mn / mo:.3f}")


if __name__ == "__main__":
    main()

"""In-context tuner for FAST_TPU_CONFIG knobs on the headline scene.

Stage-isolated profiles mislead (XLA hides overlapped work), so each
variant times the FULL bench-parity render. Prints views/s per variant
and asserts the variant's binning budgets are lossless for the scene
first (binning_stats) — a fast variant that drops triangles is invalid.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/tune_fast_config.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

R_INNER = 8
N_VIEWS = 6
RES = 512


def main():
    import jax
    import jax.numpy as jnp

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG, binning_stats
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

    base = FAST_TPU_CONFIG
    variants = [
        ("baseline", base),
        ("span_2x2", base._replace(bin_span_tiles_y=2, bin_span_tiles_x=2)),
        ("span_2x1", base._replace(bin_span_tiles_y=2, bin_span_tiles_x=1,
                                   bin_huge=128)),
        ("tile_h32", base._replace(tile_h=32)),
        ("chunk256", base._replace(chunk=256)),
        ("span22_tile32", base._replace(
            bin_span_tiles_y=2, bin_span_tiles_x=2, tile_h=32)),
        ("capfactor3", base._replace(bin_flat_cap_factor=3)),
    ]

    def time_cfg(cfg):
        stats = binning_stats(pos_clip, mesh.t_pos_idx, (RES, RES), cfg)
        if not stats["ok"]:
            return None, stats
        render_fn = functools.partial(
            render, height=RES, width=RES, render_attr=False,
            render_depth=False, render_normal=True, raster_config=cfg,
        )

        @jax.jit
        def run(mesh, cam, seed):
            def body(acc, i):
                c = cam._replace(
                    mvp_mtx=cam.mvp_mtx + (seed + i).astype(jnp.float32) * 1e-6
                )
                out = render_fn(mesh, c)
                return acc + jnp.sum(jnp.abs(out.normal)) + jnp.sum(out.mask), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R_INNER))
            return acc

        v = float(run(mesh, cam, jnp.float32(0)))
        assert np.isfinite(v)
        t0 = time.perf_counter()
        reps = 3
        for i in range(reps):
            float(run(mesh, cam, jnp.float32(i + 1)))
        dt = (time.perf_counter() - t0) / reps / R_INNER
        return N_VIEWS / dt, stats

    for name, cfg in variants:
        try:
            vps, stats = time_cfg(cfg)
        except Exception as e:  # compile failures (e.g. VMEM) are data too
            print(f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:120]}")
            continue
        if vps is None:
            print(f"{name:14s} SKIPPED (lossy budgets: {stats})")
        else:
            print(f"{name:14s} {vps:8.1f} views/s")


if __name__ == "__main__":
    main()

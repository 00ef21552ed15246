"""Ablation profiler for the DMA G-buffer path (current fast path).

Times, on the real chip with checksum forcing:
  setup    -> _triangle_setup_t only (6 views vmapped)
  bin      -> + _bin_flat (the global replica sort)
  prep     -> + _flat_chunks (full host prep = everything before the kernel)
  kernel   -> gbuffer_tiles_dma alone on fixed prep outputs
  render   -> full bench-parity render()

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_v3.py
       [res] [grid_n]   (defaults 512 72)
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

R_INNER = 8
N_VIEWS = 6


def main():
    import jax
    import jax.numpy as jnp

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh
    from worldrenderer_tpu.ops.gbuffer import _flat_chunks, _gbuffer_dma_batched
    from worldrenderer_tpu.ops.gbuffer_pallas import gbuffer_tiles_dma
    from worldrenderer_tpu.ops.rasterize import (
        FAST_TPU_CONFIG, _bin_flat, _triangle_setup_t,
    )
    from worldrenderer_tpu.render import render
    from worldrenderer_tpu.transforms import get_clip_space_position
    from worldrenderer_tpu.ops.gbuffer import _attr_planes_t, _PRECISIONS

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    grid_n = int(sys.argv[2]) if len(sys.argv) > 2 else 72
    cfg = FAST_TPU_CONFIG
    tile_h, tile_w = cfg.tile_h, cfg.tile_w
    n_ty, n_tx = res // tile_h, res // tile_w
    n_tiles = n_ty * n_tx

    verts, faces = make_grid_mesh(
        grid_n, extent=1.0,
        height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y),
    )
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    )
    tri = mesh.t_pos_idx
    t_total = tri.shape[0]
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0,
        num_views=N_VIEWS, near=0.1, far=10.0,
    )
    pos0 = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)  # (B, V, 4)

    c = max(128, (cfg.chunk // 128) * 128)
    k_cap = min(cfg.max_tris_per_tile, t_total)
    span = cfg.bin_span_tiles_y * cfg.bin_span_tiles_x
    l_keys = t_total * span + (
        min(cfg.bin_huge, t_total) * n_tiles if cfg.bin_huge > 0 else 0
    )
    if cfg.bin_med > 0:
        l_keys += min(cfg.bin_med, t_total) * cfg.bin_med_span_y * cfg.bin_med_span_x
    if cfg.bin_flat_cap_factor > 0:
        l_keys = min(l_keys, cfg.bin_flat_cap_factor * t_total)
    l_cap = min(l_keys + n_tiles * (c - 1), n_tiles * (-(-k_cap // c) * c))
    l_cap = -(-l_cap // c) * c

    def v4_of(pos):
        n_vert = pos.shape[1]
        vmajor = tri.T.reshape(-1)
        return (
            pos.transpose(1, 0, 2).reshape(n_vert, pos.shape[0] * 4)[vmajor]
            .T.reshape(pos.shape[0], 4, 3, t_total)
        )

    def stage_setup(pos):
        v4 = v4_of(pos)
        s = jax.vmap(
            lambda p, v: _triangle_setup_t(p, tri, res, res, v4=v)
        )(pos, v4)
        return jnp.sum(s.planes12) + jnp.sum(s.bbox4)

    def stage_bin(pos):
        v4 = v4_of(pos)

        def per(p, v):
            s = _triangle_setup_t(p, tri, res, res, v4=v)
            f = _bin_flat(
                s, res, res, tile_h, tile_w, cfg.bin_span_tiles_y,
                cfg.bin_span_tiles_x, cfg.bin_huge, cfg.bin_flat_cap_factor,
                n_med=cfg.bin_med, med_span_y=cfg.bin_med_span_y,
                med_span_x=cfg.bin_med_span_x,
            )
            return f[0].sum() + f[2].sum() + f[3].sum()

        return jnp.sum(jax.vmap(per)(pos, v4))

    def stage_prep(pos):
        v4 = v4_of(pos)

        def per(p, v):
            s = _triangle_setup_t(p, tri, res, res, v4=v)
            f = _bin_flat(
                s, res, res, tile_h, tile_w, cfg.bin_span_tiles_y,
                cfg.bin_span_tiles_x, cfg.bin_huge, cfg.bin_flat_cap_factor,
                n_med=cfg.bin_med, med_span_y=cfg.bin_med_span_y,
                med_span_x=cfg.bin_med_span_x,
            )
            pf, sf, sc, nc = _flat_chunks(
                s, tri, None, f, k_cap, n_tx, tile_w, tile_h, c, l_cap
            )
            return jnp.sum(pf) + jnp.sum(sf) + jnp.sum(sc) + jnp.sum(nc)

        return jnp.sum(jax.vmap(per)(pos, v4))

    # Fixed prep outputs for the kernel-only stage.
    def prep_all(pos):
        v4 = v4_of(pos)

        def per(p, v):
            s = _triangle_setup_t(p, tri, res, res, v4=v)
            f = _bin_flat(
                s, res, res, tile_h, tile_w, cfg.bin_span_tiles_y,
                cfg.bin_span_tiles_x, cfg.bin_huge, cfg.bin_flat_cap_factor,
                n_med=cfg.bin_med, med_span_y=cfg.bin_med_span_y,
                med_span_x=cfg.bin_med_span_x,
            )
            return _flat_chunks(
                s, tri, None, f, k_cap, n_tx, tile_w, tile_h, c, l_cap
            )

        return jax.vmap(per)(pos, v4)

    pf, sf, sc, nc = jax.jit(prep_all)(pos0)
    pf, sf, sc, nc = jax.block_until_ready((pf, sf, sc, nc))

    def stage_kernel(eps):
        z, idm, _ = gbuffer_tiles_dma(
            pf + eps * 0, sf, sc, nc, 1, tile_h, tile_w, n_ty, n_tx, c,
            _PRECISIONS["split_bf16"],
        )
        return jnp.sum(jnp.where(jnp.isfinite(z), z, 0.0)) + jnp.sum(idm % 7)

    render_fn = functools.partial(
        render, height=res, width=res, render_attr=False,
        render_depth=False, render_normal=True, raster_config=cfg,
    )

    def stage_render(pos):
        out = render_fn(mesh, cam._replace(mvp_mtx=cam.mvp_mtx + pos[0, 0, 0] * 0))
        return jnp.sum(jnp.abs(out.normal)) + jnp.sum(out.mask)

    def scan_time(fn, arg):
        @jax.jit
        def run(a, seed):
            def body(acc, i):
                return acc + fn(a + (seed + i) * 1e-12), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R_INNER))
            return acc

        float(run(arg, jnp.float32(0)))  # compile
        t0 = time.perf_counter()
        reps = 4
        for i in range(reps):
            float(run(arg, jnp.float32(i)))
        dt = (time.perf_counter() - t0) / reps / R_INNER
        return dt

    stages = [
        ("setup", stage_setup, pos0),
        ("bin", stage_bin, pos0),
        ("prep", stage_prep, pos0),
        ("kernel", stage_kernel, jnp.float32(0)),
        ("render", stage_render, pos0),
    ]
    prev = 0.0
    for name, fn, arg in stages:
        dt = scan_time(fn, arg)
        ms = dt * 1e3
        print(f"{name:8s} {ms:8.3f} ms/iter ({ms / N_VIEWS:7.3f} ms/view)"
              + (f"  [+{(ms - prev):6.3f}]" if name in ("bin", "prep") else ""))
        if name in ("setup", "bin", "prep"):
            prev = ms


if __name__ == "__main__":
    main()

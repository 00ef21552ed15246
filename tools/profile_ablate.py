"""Ablation profiler for the fused G-buffer hot path (bench.py scene).

Times successive prefixes of the per-view pipeline on the real chip:
  setup   -> _triangle_setup only
  bin     -> + _bin_flat (sort-pairs binning)
  gather  -> + flat record gather + per-entry rebase (no dense expansion)
  dense   -> + dense per-tile expansion (_gather_tile_rows_flat complete)
  kernel  -> zattr_tiles_pallas alone on precomputed coeffs (r=9)
  kernel5 -> same with only z/id + 1 val row (r=6) to size the r-scaling
  gbuf    -> full rasterize_gbuffer (dense + kernel + detile/epilogue)
  full    -> bench-parity render() (adds unproject/normalize epilogue)

All stages run R_INNER iterations inside one jitted lax.scan with per-iter
input perturbation, reduced to an on-device scalar checksum (axon rule:
only float() of a scalar forces execution).
"""

from __future__ import annotations

import functools
import time

import numpy as np

R_INNER = 8
N_VIEWS, HEIGHT, WIDTH = 6, 512, 512


def main():
    import jax
    import jax.numpy as jnp

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, compute_vertex_normals, make_grid_mesh
    from worldrenderer_tpu.ops.gbuffer import _attr_planes, _gather_tile_rows_flat
    from worldrenderer_tpu.ops.gbuffer_pallas import zattr_tiles_pallas
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG, _bin_flat, _triangle_setup
    from worldrenderer_tpu.render import render
    from worldrenderer_tpu.transforms import get_clip_space_position

    cfg = FAST_TPU_CONFIG
    tile_h, tile_w = cfg.tile_h, cfg.tile_w
    k_cap = cfg.max_tris_per_tile
    n_ty, n_tx = HEIGHT // tile_h, WIDTH // tile_w
    n_tiles = n_ty * n_tx

    verts, faces = make_grid_mesh(
        72, extent=1.0, height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y)
    )
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    )
    tri = mesh.t_pos_idx
    v_nrm = compute_vertex_normals(mesh.v_pos, mesh.t_pos_idx)
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0,
        num_views=N_VIEWS, near=0.1, far=10.0,
    )
    pos_clip0 = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)  # (B, V, 4)

    tile_ix = jnp.arange(n_tiles, dtype=jnp.int32)
    origin = jnp.stack(
        [(tile_ix % n_tx * tile_w).astype(jnp.float32),
         (tile_ix // n_tx * tile_h).astype(jnp.float32)], axis=-1)

    def build_planes(setup):
        t_total = tri.shape[0]
        id_plane = jnp.zeros((t_total + 1, 1, 3), jnp.float32)
        id_plane = id_plane.at[:, 0, 2].set(jnp.arange(t_total + 1, dtype=jnp.float32))
        attr_planes = _attr_planes(setup, tri, v_nrm)
        return jnp.concatenate([setup.planes, id_plane, attr_planes], axis=1)

    def stage_single(pos_clip, upto):
        setup = _triangle_setup(pos_clip, tri, WIDTH, HEIGHT)
        if upto == "setup":
            return jnp.sum(jnp.abs(jnp.clip(setup.planes, -1e3, 1e3)))
        flat = _bin_flat(
            setup, WIDTH, HEIGHT, tile_h, tile_w,
            cfg.bin_span_tiles_y, cfg.bin_span_tiles_x, cfg.bin_huge,
            cfg.bin_flat_cap_factor,
        )
        if upto == "bin":
            s_tri, s_tile, starts, counts = flat
            return (jnp.sum(s_tri) + jnp.sum(starts) + jnp.sum(counts)).astype(jnp.float32)
        all_planes = build_planes(setup)
        if upto == "gather":
            # Replicate the gather+rebase part of _gather_tile_rows_flat
            s_tri, s_tile, starts, counts = flat
            r = all_planes.shape[1]
            record = jnp.concatenate(
                [all_planes.reshape(all_planes.shape[0], r * 3),
                 setup.valid[:, None].astype(jnp.float32)], axis=1)
            rec = record[s_tri]
            ep = rec[:, : r * 3].reshape(-1, r, 3)
            st = jnp.clip(s_tile, 0, n_tiles - 1)
            ox = ((st % n_tx) * tile_w).astype(jnp.float32)[:, None]
            oy = ((st // n_tx) * tile_h).astype(jnp.float32)[:, None]
            gamma = ep[..., 2] + ep[..., 0] * ox + ep[..., 1] * oy
            return jnp.sum(jnp.abs(jnp.clip(gamma, -1e3, 1e3)))
        coeffs, used = _gather_tile_rows_flat(
            all_planes, setup.valid, flat, origin, k_cap,
            n_tx=n_tx, tile_w=tile_w, tile_h=tile_h,
        )
        if upto == "dense":
            return jnp.sum(jnp.abs(jnp.clip(coeffs, -1e3, 1e3)))
        raise ValueError(upto)

    def make_stage_fn(upto):
        def fn(pos_clip0, seed):
            def body(acc, i):
                eps = (seed + i).astype(jnp.float32) * 1e-7
                s = jax.vmap(lambda p: stage_single(p + eps, upto))(pos_clip0)
                return acc + jnp.sum(s), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R_INNER))
            return acc
        return fn

    def full_fn(pos_clip_unused, seed):
        def body(acc, i):
            eps = (seed + i).astype(jnp.float32) * 1e-6
            c = cam._replace(mvp_mtx=cam.mvp_mtx + eps)
            out = render(
                mesh, c, HEIGHT, WIDTH, render_attr=False, render_depth=False,
                render_normal=True, raster_config=cfg,
            )
            s = jnp.sum(jnp.abs(out.normal)) + jnp.sum(jnp.abs(out.pos)) + jnp.sum(out.mask)
            return acc + s, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R_INNER))
        return acc

    def gbuf_fn(pos_clip0, seed):
        from worldrenderer_tpu.ops.gbuffer import rasterize_gbuffer
        def body(acc, i):
            eps = (seed + i).astype(jnp.float32) * 1e-7
            out = rasterize_gbuffer(
                pos_clip0 + eps, tri, v_nrm, (HEIGHT, WIDTH), cfg)
            s = (jnp.sum(jnp.where(out.mask, out.z, 0.0))
                 + jnp.sum(out.tri_id)
                 + jnp.sum(jnp.abs(jnp.where(out.mask[..., None], out.attr, 0.0))))
            return acc + s, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R_INNER))
        return acc

    # Precompute dense coeffs once for kernel-only stages.
    @jax.jit
    def precompute(pos_clip0):
        def single(pos_clip):
            setup = _triangle_setup(pos_clip, tri, WIDTH, HEIGHT)
            flat = _bin_flat(
                setup, WIDTH, HEIGHT, tile_h, tile_w,
                cfg.bin_span_tiles_y, cfg.bin_span_tiles_x, cfg.bin_huge,
                cfg.bin_flat_cap_factor,
            )
            all_planes = build_planes(setup)
            return _gather_tile_rows_flat(
                all_planes, setup.valid, flat, origin, k_cap,
                n_tx=n_tx, tile_w=tile_w, tile_h=tile_h,
            )
        return jax.vmap(single)(pos_clip0)

    coeffs0, counts0 = precompute(pos_clip0)
    coeffs0 = jax.block_until_ready(coeffs0)

    def make_kernel_fn(n_vals):
        r_full = 9
        r = 5 + n_vals
        def fn(coeffs0, counts0, seed):
            k = coeffs0.shape[-1] // r_full
            if n_vals != 4:
                cs = coeffs0.reshape(coeffs0.shape[0], n_tiles, 3, r_full, k)[
                    :, :, :, :r].reshape(coeffs0.shape[0], n_tiles, 3, r * k)
            else:
                cs = coeffs0
            def body(acc, i):
                eps = (seed + i).astype(jnp.float32) * 1e-12
                z, idm, vals = jax.vmap(
                    lambda co, ct: zattr_tiles_pallas(
                        co + eps, ct, n_vals, tile_h, tile_w, cfg.chunk,
                        "split_bf16")
                )(cs, counts0)
                s = (jnp.sum(jnp.where(jnp.isfinite(z), z, 0.0))
                     + jnp.sum(jnp.clip(idm, 0, 2**24))
                     + jnp.sum(jnp.abs(jnp.clip(vals, -1e3, 1e3))))
                return acc + s, None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R_INNER))
            return acc
        return fn

    def timeit(fn, *args):
        f = jax.jit(fn)
        t0 = time.perf_counter()
        float(f(*args, jnp.float32(0)))
        compile_s = time.perf_counter() - t0
        reps = 1
        while True:
            t0 = time.perf_counter()
            for i in range(reps):
                v = float(f(*args, jnp.float32(i + 1)))
            dt = time.perf_counter() - t0
            if dt > 1.5 or reps >= 64:
                break
            reps *= 4
        assert np.isfinite(v), v
        per_view_ms = dt / (reps * R_INNER * N_VIEWS) * 1e3
        return per_view_ms, compile_s

    # Scene stats
    total_live = int(jnp.sum(counts0))
    max_count = int(jnp.max(counts0))
    print(f"scene: L_live_total={total_live} (per view ~{total_live//N_VIEWS}), "
          f"max_per_tile={max_count}, k_cap={k_cap}, n_tiles={n_tiles}")

    results = {}
    for name, fn, args in [
        ("setup", make_stage_fn("setup"), (pos_clip0,)),
        ("bin", make_stage_fn("bin"), (pos_clip0,)),
        ("gather", make_stage_fn("gather"), (pos_clip0,)),
        ("dense", make_stage_fn("dense"), (pos_clip0,)),
        ("kernel_r9", make_kernel_fn(4), (coeffs0, counts0)),
        ("kernel_r6", make_kernel_fn(1), (coeffs0, counts0)),
        ("gbuf", gbuf_fn, (pos_clip0,)),
        ("full", full_fn, (pos_clip0,)),
    ]:
        ms, cs = timeit(fn, *args)
        results[name] = ms
        print(f"{name:12s} {ms:8.3f} ms/view   (compile {cs:.1f}s)")

    print("\nderived:")
    print(f"  bin-only     {results['bin'] - results['setup']:.3f}")
    print(f"  gather-only  {results['gather'] - results['bin']:.3f}")
    print(f"  dense-only   {results['dense'] - results['gather']:.3f}")
    print(f"  kernel r9    {results['kernel_r9']:.3f}")
    print(f"  detile/etc   {results['gbuf'] - results['dense'] - results['kernel_r9']:.3f}")
    print(f"  render-epi   {results['full'] - results['gbuf']:.3f}")
    print(f"  full => {1e3 / results['full']:.1f} views/s")


if __name__ == "__main__":
    main()

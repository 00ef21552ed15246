"""Profile v2 path stages: prep (flat chunks) vs DMA kernel vs full."""
import functools, time
import numpy as np

R_INNER = 8
N_VIEWS, HEIGHT, WIDTH = 6, 512, 512

def main():
    import jax
    import jax.numpy as jnp
    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, compute_vertex_normals, make_grid_mesh
    from worldrenderer_tpu.ops import gbuffer as G
    from worldrenderer_tpu.ops.gbuffer_pallas import gbuffer_tiles_dma
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG, _bin_flat, _triangle_setup_t, _auto_cap
    from worldrenderer_tpu.render import render
    from worldrenderer_tpu.transforms import get_clip_space_position

    cfg = FAST_TPU_CONFIG
    tile_h, tile_w = cfg.tile_h, cfg.tile_w
    n_ty, n_tx = HEIGHT // tile_h, WIDTH // tile_w
    n_tiles = n_ty * n_tx
    t_total_holder = {}

    verts, faces = make_grid_mesh(72, extent=1.0, height_fn=lambda x, y: 0.3*np.sin(3*x)*np.cos(3*y))
    mesh = TexturedMesh(v_pos=jnp.asarray(verts, jnp.float32), t_pos_idx=jnp.asarray(faces, jnp.int32))
    tri = mesh.t_pos_idx
    v_nrm = compute_vertex_normals(mesh.v_pos, mesh.t_pos_idx)
    cam = get_camera(elevation_deg=35., distance=3., fovy_deg=50., num_views=N_VIEWS, near=0.1, far=10.)
    pos_clip0 = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)

    t_total = tri.shape[0]
    c = max(128, (cfg.chunk // 128) * 128)
    k_cap = min(cfg.max_tris_per_tile or _auto_cap(t_total, n_tiles), t_total)
    cap_factor = cfg.bin_flat_cap_factor
    span = cfg.bin_span_tiles_y * cfg.bin_span_tiles_x
    l_keys = t_total * span + min(cfg.bin_huge, t_total) * n_tiles
    if cap_factor > 0:
        l_keys = min(l_keys, cap_factor * t_total)
    l_cap = min(l_keys + n_tiles * (c - 1), n_tiles * (-(-k_cap // c) * c))
    l_cap = -(-l_cap // c) * c
    print(f"l_cap={l_cap} ({l_cap//c} chunks capacity)")

    def prep(pos_clip):
        setup = _triangle_setup_t(pos_clip, tri, WIDTH, HEIGHT)
        flat = _bin_flat(setup, WIDTH, HEIGHT, tile_h, tile_w,
                         cfg.bin_span_tiles_y, cfg.bin_span_tiles_x, cfg.bin_huge, cap_factor)
        return G._flat_chunks(setup, tri, v_nrm, flat, k_cap, n_tx, tile_w, tile_h, c, l_cap)

    def prep_fn(pos_clip0, seed):
        def body(acc, i):
            eps = (seed + i).astype(jnp.float32) * 1e-7
            pf, sf, sc, nc = jax.vmap(prep)(pos_clip0 + eps)
            s = (jnp.sum(jnp.abs(jnp.clip(pf, -1e3, 1e3))) + jnp.sum(jnp.abs(jnp.clip(sf, -1e3, 1e3)))
                 + jnp.sum(sc).astype(jnp.float32) + jnp.sum(nc).astype(jnp.float32))
            return acc + s, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R_INNER))
        return acc

    pf0, sf0, sc0, nc0 = jax.jit(lambda p: jax.vmap(prep)(p))(pos_clip0)
    pf0 = jax.block_until_ready(pf0)
    print("total chunks/view:", int(jnp.sum(nc0)) / N_VIEWS)

    def kern_fn(pf0, sf0, sc0, nc0, seed):
        def body(acc, i):
            eps = (seed + i).astype(jnp.float32) * 1e-12
            z, idm, vals = gbuffer_tiles_dma(pf0 + eps, sf0, sc0, nc0, 4,
                                             tile_h, tile_w, n_ty, n_tx, c, "split_bf16")
            s = (jnp.sum(jnp.where(jnp.isfinite(z), z, 0.0)) + jnp.sum(jnp.clip(idm, 0, 2**24))
                 + jnp.sum(jnp.abs(jnp.clip(vals, -1e3, 1e3))))
            return acc + s, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R_INNER))
        return acc

    def full_fn(pos_clip_unused, seed):
        def body(acc, i):
            eps = (seed + i).astype(jnp.float32) * 1e-6
            cm = cam._replace(mvp_mtx=cam.mvp_mtx + eps)
            out = render(mesh, cm, HEIGHT, WIDTH, render_attr=False, render_depth=False,
                         render_normal=True, raster_config=cfg)
            s = jnp.sum(jnp.abs(out.normal)) + jnp.sum(jnp.abs(out.pos)) + jnp.sum(out.mask)
            return acc + s, None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R_INNER))
        return acc

    def timeit(fn, *args):
        f = jax.jit(fn)
        t0 = time.perf_counter(); float(f(*args, jnp.float32(0))); csec = time.perf_counter() - t0
        reps = 1
        while True:
            t0 = time.perf_counter()
            for i in range(reps):
                v = float(f(*args, jnp.float32(i + 1)))
            dt = time.perf_counter() - t0
            if dt > 1.5 or reps >= 64: break
            reps *= 4
        assert np.isfinite(v)
        return dt / (reps * R_INNER * N_VIEWS) * 1e3, csec

    for name, fn, args in [
        ("prep", prep_fn, (pos_clip0,)),
        ("kernel_dma", kern_fn, (pf0, sf0, sc0, nc0)),
        ("full", full_fn, (pos_clip0,)),
    ]:
        ms, cs = timeit(fn, *args)
        print(f"{name:12s} {ms:8.3f} ms/view   (compile {cs:.1f}s)")

if __name__ == "__main__":
    main()

"""Bisect _flat_chunks prep cost on the chip."""
import time
import numpy as np

R_INNER = 8
N_VIEWS, HEIGHT, WIDTH = 6, 512, 512

def main():
    import jax
    import jax.numpy as jnp
    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, compute_vertex_normals, make_grid_mesh
    from worldrenderer_tpu.ops import gbuffer as G
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG, _bin_flat, _triangle_setup, _BIG_NEG
    from worldrenderer_tpu.transforms import get_clip_space_position

    cfg = FAST_TPU_CONFIG
    tile_h, tile_w = cfg.tile_h, cfg.tile_w
    n_ty, n_tx = HEIGHT // tile_h, WIDTH // tile_w
    n_tiles = n_ty * n_tx
    verts, faces = make_grid_mesh(72, extent=1.0, height_fn=lambda x, y: 0.3*np.sin(3*x)*np.cos(3*y))
    mesh = TexturedMesh(v_pos=jnp.asarray(verts, jnp.float32), t_pos_idx=jnp.asarray(faces, jnp.int32))
    tri = mesh.t_pos_idx
    v_nrm = compute_vertex_normals(mesh.v_pos, mesh.t_pos_idx)
    cam = get_camera(elevation_deg=35., distance=3., fovy_deg=50., num_views=N_VIEWS, near=0.1, far=10.)
    pos_clip0 = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    t_total = tri.shape[0]
    c = 128
    k_cap = min(cfg.max_tris_per_tile, t_total)
    l_cap = 56704

    def stage(pos_clip, upto):
        setup = _triangle_setup(pos_clip, tri, WIDTH, HEIGHT)
        flat = _bin_flat(setup, WIDTH, HEIGHT, tile_h, tile_w,
                         cfg.bin_span_tiles_y, cfg.bin_span_tiles_x, cfg.bin_huge,
                         cfg.bin_flat_cap_factor)
        s_tri, s_tile, starts, counts = flat
        attr_planes = G._attr_planes(setup, tri, v_nrm)
        nv = attr_planes.shape[1]
        counts_c = jnp.minimum(counts, k_cap).astype(jnp.int32)
        aligned = (-(-counts_c // c) * c).astype(jnp.int32)
        astarts = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(aligned)[:-1].astype(jnp.int32)])
        posn = jnp.arange(l_cap, dtype=jnp.int32)
        ptile = jnp.clip(jnp.searchsorted(astarts, posn, side="right").astype(jnp.int32) - 1, 0, n_tiles - 1)
        if upto == "map":
            return jnp.sum(ptile).astype(jnp.float32)
        rank = posn - astarts[ptile]
        src = jnp.clip(starts[ptile] + rank, 0, s_tri.shape[0] - 1)
        live = rank < counts_c[ptile]
        flat_ids = jnp.where(live, s_tri[src], t_total)
        if upto == "ids":
            return jnp.sum(flat_ids).astype(jnp.float32)
        record = jnp.concatenate([
            setup.planes.reshape(t_total + 1, 12),
            jnp.arange(t_total + 1, dtype=jnp.float32)[:, None],
            attr_planes.reshape(t_total + 1, nv * 3),
            setup.valid[:, None].astype(jnp.float32)], axis=1)
        rec = record[flat_ids]
        if upto == "gather":
            return jnp.sum(jnp.abs(jnp.clip(rec, -1e3, 1e3)))
        rec_t = rec.T
        if upto == "transpose":
            return jnp.sum(jnp.abs(jnp.clip(rec_t, -1e3, 1e3)))
        p12 = rec_t[:12].reshape(4, 3, l_cap)
        pa, pb, pgm = p12[:, 0], p12[:, 1], p12[:, 2]
        idv = rec_t[12:13]
        ap3 = rec_t[13:13 + 3 * nv].reshape(nv, 3, l_cap)
        validv = rec_t[-1] > 0.5
        ox = ((ptile % n_tx) * tile_w).astype(jnp.float32)[None]
        oy = ((ptile // n_tx) * tile_h).astype(jnp.float32)[None]
        pg = pgm + pa * ox + pb * oy
        pg = pg.at[0].set(jnp.where(validv, pg[0], _BIG_NEG))
        ag = ap3[:, 2] + ap3[:, 0] * ox + ap3[:, 1] * oy
        if upto == "rebase":
            return jnp.sum(jnp.abs(jnp.clip(pg, -1e3, 1e3))) + jnp.sum(jnp.abs(jnp.clip(ag, -1e3, 1e3)))
        nch_total = l_cap // c
        planes_flat = jnp.stack([pa, pb, pg, jnp.zeros_like(pg)], axis=0)
        planes_flat = planes_flat.reshape(4, 4, nch_total, c).transpose(0, 2, 1, 3).reshape(4, nch_total * 4 * c)
        if upto == "pf":
            return jnp.sum(jnp.abs(jnp.clip(planes_flat, -1e3, 1e3)))
        m_sel = 4 + 3 * nv
        m_pad = -(-m_sel // 8) * 8
        val_rows = jnp.stack([ap3[:, 0], ap3[:, 1], ag], axis=1).reshape(3 * nv, l_cap)
        sel_flat = jnp.concatenate([idv, pa[3:4], pb[3:4], pg[3:4], val_rows,
                                    jnp.zeros((m_pad - m_sel, l_cap), jnp.float32)], axis=0)
        return jnp.sum(jnp.abs(jnp.clip(planes_flat, -1e3, 1e3))) + jnp.sum(jnp.abs(jnp.clip(sel_flat, -1e3, 1e3)))

    def make_fn(upto):
        def fn(pos_clip0, seed):
            def body(acc, i):
                eps = (seed + i).astype(jnp.float32) * 1e-7
                s = jax.vmap(lambda p: stage(p + eps, upto))(pos_clip0)
                return acc + jnp.sum(s), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R_INNER))
            return acc
        return fn

    def timeit(fn, *args):
        f = jax.jit(fn)
        float(f(*args, jnp.float32(0)))
        reps = 1
        while True:
            t0 = time.perf_counter()
            for i in range(reps):
                v = float(f(*args, jnp.float32(i + 1)))
            dt = time.perf_counter() - t0
            if dt > 1.2 or reps >= 64: break
            reps *= 4
        assert np.isfinite(v)
        return dt / (reps * R_INNER * N_VIEWS) * 1e3

    prev = 0.0
    for upto in ["map", "ids", "gather", "transpose", "rebase", "pf", "all"]:
        ms = timeit(make_fn(upto), pos_clip0)
        print(f"{upto:10s} {ms:8.3f} ms/view  (+{ms - prev:.3f})")
        prev = ms

if __name__ == "__main__":
    main()

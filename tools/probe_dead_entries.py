"""Measure DEAD (tile, tri) binning entries: bbox-overlap candidates whose
triangle covers no pixel center in the tile.

The v2 kernel's time scales with live chunk trip counts, and PERF.md §8
closed every scheduling lever — the remaining win is FEWER CHUNKS. Bbox
binning emits an entry for every tile the bbox touches; near diagonal
edges the triangle itself may miss the tile entirely. This probe reports,
per headline-class scene:

  - live small-tier entries (the chunk population)
  - exactly-dead entries (no covered pixel center in the tile)
  - entries a conservative 4-corner edge test would cull (all four tile
    corners strictly outside one edge, with a float-safety margin) —
    the cheap prep-side test we could actually ship

Runs on CPU (exact math, no kernel needed).

Usage: JAX_PLATFORMS=cpu python tools/probe_dead_entries.py
"""

from __future__ import annotations

import numpy as np


def probe_scene(name, mesh, cam, res, cfg):
    import jax
    import jax.numpy as jnp

    from worldrenderer_tpu.ops.rasterize import (
        _bin_classify,
        _tiny_mask,
        _triangle_setup_t,
    )
    from worldrenderer_tpu.transforms import get_clip_space_position

    height, width = res
    tile_h, tile_w = cfg.tile_h, 128
    n_tx = -(-width // tile_w)

    pos_clip = np.asarray(
        get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    )
    nv = pos_clip.shape[0]

    tot = dict(live=0, dead=0, cull=0, cull_alive=0, cull2=0, cull2_alive=0)
    for v in range(nv):
        setup = _triangle_setup_t(
            jnp.asarray(pos_clip[v]), mesh.t_pos_idx, width, height
        )
        (tx0, ty0, span_x, span_y, small) = [
            np.asarray(a)
            for a in (
                _bin_classify(
                    setup, width, height, tile_h, tile_w,
                    cfg.bin_span_tiles_y, cfg.bin_span_tiles_x,
                    cfg.bin_med, cfg.bin_med_span_y, cfg.bin_med_span_x,
                    tiny_px=cfg.bin_tiny_px,
                )[i]
                for i in (0, 2, 4, 5, 7)
            )
        ]
        planes = np.asarray(setup.planes12, np.float64)  # (12, T+1)
        t_total = planes.shape[1] - 1

        ids = np.nonzero(small)[0]
        # Expand replicas: (entry, sy, sx) for sy<span_y, sx<span_x.
        reps = []
        for sy in range(int(span_y[ids].max(initial=1))):
            for sx in range(int(span_x[ids].max(initial=1))):
                m = (sy < span_y[ids]) & (sx < span_x[ids])
                e = ids[m]
                reps.append(
                    np.stack([e, ty0[e] + sy, tx0[e] + sx], axis=1)
                )
        reps = np.concatenate(reps, axis=0)  # (E, 3): tri, ty, tx
        tri, ty, tx = reps[:, 0], reps[:, 1], reps[:, 2]
        E = len(tri)

        # planes12 rows: [e0a,e0b,e0g, e1a,e1b,e1g, e2a,e2b,e2g, za,zb,zg]
        P = planes[:, tri].T  # (E, 12)
        bbox = np.asarray(setup.bbox4, np.float64).T[tri]  # (E,4) xmin,xmax,ymin,ymax
        x0 = tx * tile_w + 0.5
        y0 = ty * tile_h + 0.5
        xw = tile_w - 1.0
        yh = tile_h - 1.0

        # Conservative corner cull: for edge k, max over the pixel-center
        # rect corners = e(x0,y0) + max(0, a*xw) + max(0, b*yh). Cull when
        # that max < -margin for any edge (margin covers f32/kernel eval
        # divergence; scaled to the eval magnitude).
        cull = np.zeros(E, bool)
        for k in range(3):
            ak, bk, gk = P[:, 3 * k], P[:, 3 * k + 1], P[:, 3 * k + 2]
            e00 = ak * x0 + bk * y0 + gk
            emax = e00 + np.maximum(0.0, ak * xw) + np.maximum(0.0, bk * yh)
            mag = np.abs(ak) * (x0 + xw) + np.abs(bk) * (y0 + yh) + np.abs(gk)
            cull |= emax < -(1e-5 * mag)

        # Tightened cull: intersect the tile's pixel-center rect with the
        # pixel centers the triangle's own bbox can cover. First/last
        # candidate center x = ceil(xmin-0.5)+0.5 / floor(xmax-0.5)+0.5.
        bx0 = np.ceil(bbox[:, 0] - 0.5) + 0.5
        bx1 = np.floor(bbox[:, 1] - 0.5) + 0.5
        by0 = np.ceil(bbox[:, 2] - 0.5) + 0.5
        by1 = np.floor(bbox[:, 3] - 0.5) + 0.5
        rx0 = np.maximum(x0, bx0)
        rx1 = np.minimum(x0 + xw, bx1)
        ry0 = np.maximum(y0, by0)
        ry1 = np.minimum(y0 + yh, by1)
        cull2 = (rx1 < rx0) | (ry1 < ry0)  # no candidate centers at all
        rxw = np.maximum(rx1 - rx0, 0.0)
        ryh = np.maximum(ry1 - ry0, 0.0)
        for k in range(3):
            ak, bk, gk = P[:, 3 * k], P[:, 3 * k + 1], P[:, 3 * k + 2]
            e00 = ak * rx0 + bk * ry0 + gk
            emax = e00 + np.maximum(0.0, ak * rxw) + np.maximum(0.0, bk * ryh)
            mag = (
                np.abs(ak) * np.abs(rx1) + np.abs(bk) * np.abs(ry1)
                + np.abs(gk)
            )
            cull2 |= emax < -(2e-5 * mag)  # shipped _CULL_MARGIN

        # Exact coverage: any pixel center in the tile with all e >= 0 and
        # z in [-1, 1]. Batched over entries; f64 ground truth.
        px = x0[:, None] + np.arange(tile_w)[None, :]  # (E, tw)
        py = y0[:, None] + np.arange(tile_h)[None, :]  # (E, th)
        covered = np.zeros(E, bool)
        B = 4096
        for s in range(0, E, B):
            sl = slice(s, min(s + B, E))
            pxs = px[sl][:, None, :]  # (b, 1, tw)
            pys = py[sl][:, :, None] if False else py[sl][:, :, None]
            ok = np.ones((sl.stop - sl.start, tile_h, tile_w), bool)
            for k in range(4):
                ak = P[sl, 3 * k][:, None, None]
                bk = P[sl, 3 * k + 1][:, None, None]
                gk = P[sl, 3 * k + 2][:, None, None]
                e = ak * pxs + bk * pys + gk
                if k < 3:
                    ok &= e >= 0
                else:
                    ok &= (e >= -1.0) & (e <= 1.0)
            covered[sl] = ok.any(axis=(1, 2))

        dead = ~covered
        tot["live"] += E
        tot["dead"] += int(dead.sum())
        tot["cull"] += int(cull.sum())
        tot["cull_alive"] += int((cull & covered).sum())
        tot["cull2"] += int(cull2.sum())
        tot["cull2_alive"] += int((cull2 & covered).sum())

        # Model the kernel win: per-tile chunk trips sum(ceil(count/c)).
        tile_ids = ty * n_tx + tx
        n_tiles_total = n_tx * (-(-height // tile_h))
        c = 128
        for label, keep in (("chunks_base", np.ones(E, bool)),
                            ("chunks_cull2", ~cull2)):
            cnt = np.bincount(tile_ids[keep], minlength=n_tiles_total)
            tot[label] = tot.get(label, 0) + int(
                np.sum(-(-cnt[cnt > 0] // c))
            )

    print(
        f"{name}: entries {tot['live']}  dead {tot['dead']} "
        f"({100.0 * tot['dead'] / max(tot['live'], 1):.1f}%)  "
        f"corner-cull {tot['cull']} "
        f"({100.0 * tot['cull'] / max(tot['live'], 1):.1f}%)  "
        f"bbox-rect-cull {tot['cull2']} "
        f"({100.0 * tot['cull2'] / max(tot['live'], 1):.1f}%)  "
        f"cull-of-ALIVE {tot['cull_alive']}/{tot['cull2_alive']} (must be 0)"
    )
    print(
        f"  modeled kernel chunks (c=128): {tot['chunks_base']} -> "
        f"{tot['chunks_cull2']} "
        f"({100.0 * (1 - tot['chunks_cull2'] / max(tot['chunks_base'], 1)):.1f}% fewer)"
    )
    return tot


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    import bench as _bench
    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh, with_normals
    from worldrenderer_tpu.ops.rasterize import auto_fast_config
    from worldrenderer_tpu.transforms import get_clip_space_position

    def _auto(mesh, cam, res):
        pc = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
        return auto_fast_config(
            pc, mesh.t_pos_idx, res, base=_bench._fast_cfg()
        )

    # Headline: 6-view 512^2 heightfield.
    mesh = with_normals(_bench._heightfield_scene())
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0, num_views=6,
        near=0.1, far=10.0,
    )
    probe_scene("headline-512", mesh, cam, (512, 512),
                _auto(mesh, cam, (512, 512)))

    # c1: icosphere 256^2 (high coverage, big triangles).
    m1 = _bench._textured_icosphere()
    cam1 = get_camera(
        elevation_deg=20.0, distance=2.7, fovy_deg=40.0, num_views=6,
        near=0.1, far=10.0,
    )
    probe_scene("config1-icosphere-256", m1, cam1, (256, 256),
                _auto(m1, cam1, (256, 256)))

    # c3: 20k-tri fractal terrain, 8 aerial views 512^2 (bench_config3 scene).
    rng = np.random.default_rng(0)

    def fractal(x, y):
        h = np.zeros_like(x)
        for octv in range(4):
            f = 2.0**octv
            h += (
                np.sin(f * 3 * x + rng.uniform(0, 6))
                * np.cos(f * 2.7 * y + rng.uniform(0, 6))
                / (2.0**octv)
            )
        return 0.15 * h

    verts, faces = make_grid_mesh(101, extent=2.0, height_fn=fractal)
    m3 = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    )
    cam3 = get_camera(
        elevation_deg=55.0, distance=3.5, fovy_deg=45.0, num_views=8,
        near=0.1, far=20.0,
    )
    probe_scene("config3-terrain-512", m3, cam3, (512, 512),
                _auto(m3, cam3, (512, 512)))


if __name__ == "__main__":
    main()

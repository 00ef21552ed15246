"""Interleaved on-chip A/B: bin_subtile (in-kernel sub-tile row banding).

The fused DMA kernel evaluates every binned (triangle, pixel) pair across
its full 16x128 tile; typical headline triangles cover ~26 px, so most of
each coverage/select MXU pass is waste. bin_subtile=s bins at
(tile_h/s)-row band granularity and evaluates each chunk against only its
band's pixels — per-entry MXU passes divide by s while entries grow only
by the band-straddle factor — with ONE continuous per-tile DMA pipeline so
per-tile fixed costs don't multiply (the plain tile_h=8 A/B lost 15% to
exactly those).

Runs the FULL headline render (6-view 512^2 pos+normal heightfield)
interleaved sub=1 vs sub=2 vs sub=4 in one process and asserts the
outputs are BIT-identical (tile-origin rebase + band-local ly offsets
keep every float expression unchanged).

Usage: PYTHONPATH=/root/repo:/root/repo/tools:/root/.axon_site \
       python tools/ab_subtile.py [subs, default "2,4"]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import bench as _bench
    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import with_normals
    from worldrenderer_tpu.ops.rasterize import auto_fast_config, binning_stats
    from worldrenderer_tpu.render import render
    from worldrenderer_tpu.transforms import get_clip_space_position

    subs = [int(s) for s in (sys.argv[1] if len(sys.argv) > 1 else "2,4").split(",")]

    mesh = with_normals(_bench._heightfield_scene())
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0, num_views=6,
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)

    def cfg_for(sub):
        cfg = auto_fast_config(
            pos_clip, mesh.t_pos_idx, (512, 512),
            base=_bench._fast_cfg()._replace(bin_subtile=sub),
        )
        st = binning_stats(pos_clip, mesh.t_pos_idx, (512, 512), cfg)
        assert st["ok"], (sub, st)
        print(f"sub={sub}: live={st['live_entries']} max_per_bin="
              f"{st['max_per_tile']} k_cap={st['k_cap']} "
              f"med={st['n_med']} huge={st['n_huge']}", flush=True)
        return cfg

    def xor_bits(x):
        u = jax.lax.bitcast_convert_type(
            jnp.asarray(x, jnp.float32), jnp.uint32
        ).reshape(-1)
        return jax.lax.reduce(u, jnp.uint32(0), jax.lax.bitwise_xor, (0,))

    def make_frame(cfg):
        def frame(mesh, cam, seed):
            out = render(
                mesh, cam._replace(mvp_mtx=cam.mvp_mtx + seed * 1e-6),
                512, 512, render_attr=False, render_depth=False,
                render_normal=True, raster_config=cfg,
            )
            s = jnp.sum(out.mask) + jnp.sum(jnp.abs(out.normal))
            bits = xor_bits(out.normal) ^ xor_bits(out.mask.astype(jnp.float32))
            return s, bits

        return jax.jit(frame)

    R_INNER = 16

    def make_scan(cfg):
        # Device-only timing: R perturbed frames under one lax.scan,
        # checksum-forced (per-call eager dispatch over the tunnel costs
        # ~30 ms — 6x the real 512^2 frame; see CLAUDE.md).
        def step(mesh, cam, seed):
            def body(acc, i):
                eps = (seed + i).astype(jnp.float32) * 1e-6
                out = render(
                    mesh, cam._replace(mvp_mtx=cam.mvp_mtx + eps),
                    512, 512, render_attr=False, render_depth=False,
                    render_normal=True, raster_config=cfg,
                )
                return acc + jnp.sum(out.mask) + jnp.sum(jnp.abs(out.normal)), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R_INNER))
            return acc

        return jax.jit(step)

    variants = [("sub1", make_frame(cfg_for(1)), make_scan(cfg_for(1)))]
    for s in subs:
        variants.append(
            (f"sub{s}", make_frame(cfg_for(s)), make_scan(cfg_for(s)))
        )

    ref = None
    for name, f, _ in variants:
        sv, bv = f(mesh, cam, jnp.float32(0))
        sv, bv = float(sv), int(bv)
        tag = ""
        if ref is None:
            ref = (sv, bv)
        else:
            tag = f" bit_identical={ref == (sv, bv)}"
            assert ref == (sv, bv), (name, ref, (sv, bv))
        print(f"{name}: checksum {sv!r}/{bv:08x}{tag}", flush=True)

    n_views = 6
    results = {name: [] for name, _, _ in variants}
    for pair in range(4):
        for name, _, fs in variants:
            float(fs(mesh, cam, jnp.float32(pair + 1)))  # warm (compile)
            t0 = time.perf_counter()
            float(fs(mesh, cam, jnp.float32(pair * 10)))
            dt = (time.perf_counter() - t0) / R_INNER
            vps = n_views / dt
            results[name].append(vps)
            print(f"pair {pair} {name}: {vps:7.2f} views/s", flush=True)

    m1 = np.median(results["sub1"])
    print(f"median sub1 {m1:.2f}")
    for name in results:
        if name == "sub1":
            continue
        mn = np.median(results[name])
        wins = sum(
            b > a for a, b in zip(results["sub1"], results[name])
        )
        print(f"median {name} {mn:.2f} ratio {mn / m1:.3f} "
              f"wins {wins}/{len(results[name])}")


if __name__ == "__main__":
    main()

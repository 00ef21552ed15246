"""Interleaved on-chip A/B: grouped DMA streaming + bitwise coverage.

The v2 DMA kernel is per-chunk fixed-cost bound (PERF.md §8: DMA issue +
VPU reduce/merge chains, not MXU passes). Two levers aimed exactly there:

  dma_group=g   fetch g consecutive chunks per double-buffered DMA pair —
                DMA issue + semaphore waits per chunk divide by up to g.
                BIT-identical (same data, same expressions, same order).
  cov_mode=bits sign-bit OR coverage + |z|-bits range test: 9 VPU passes
                over (c, P) per chunk become 6. Identical except at
                e == -0.0, unreachable for live entries.

Runs the FULL headline render (6-view 512^2 pos+normal heightfield)
interleaved base vs each variant in one process, asserts XOR-bit-identical
outputs, then reports per-pair views/s and medians.

Usage: PYTHONPATH=/root/repo:/root/repo/tools:/root/.axon_site \
       python tools/ab_dmagroup.py [variants, default "g4,g8,bits,g4bits"]
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

    names = (sys.argv[1] if len(sys.argv) > 1 else "g4,g8,bits,g4bits").split(",")

    mesh = with_normals(_bench._heightfield_scene())
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0, num_views=6,
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)

    def cfg_for(name):
        over = {}
        if name.startswith("g4"):
            over["dma_group"] = 4
        elif name.startswith("g8"):
            over["dma_group"] = 8
        elif name.startswith("g2"):
            over["dma_group"] = 2
        if name.endswith("bits"):
            over["cov_mode"] = "bits"
        cfg = auto_fast_config(
            pos_clip, mesh.t_pos_idx, (512, 512),
            base=_bench._fast_cfg()._replace(**over),
        )
        st = binning_stats(pos_clip, mesh.t_pos_idx, (512, 512), cfg)
        assert st["ok"], (name, st)
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

    variants = [("base", make_frame(cfg_for("base")), make_scan(cfg_for("base")))]
    for n in names:
        variants.append((n, make_frame(cfg_for(n)), make_scan(cfg_for(n))))

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

    m1 = np.median(results["base"])
    print(f"median base {m1:.2f}")
    for name in results:
        if name == "base":
            continue
        mn = np.median(results[name])
        wins = sum(b > a for a, b in zip(results["base"], results[name]))
        print(
            f"median {name} {mn:.2f} ratio {mn / m1:.3f} "
            f"wins {wins}/{len(results[name])}"
        )


if __name__ == "__main__":
    main()

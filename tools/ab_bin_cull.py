"""Interleaved on-chip A/B + bit-identity check for the dead-entry corner
cull (RasterizerConfig.bin_cull).

Times the FULL bench-parity headline render (stage-isolated harnesses
overstate prep costs; CLAUDE.md) with cull off/on INTERLEAVED in pairs —
machine-state drift of ~30% makes non-interleaved deltas meaningless.
Also renders one frame per variant through the z+id checksum path and
asserts BIT-identical z/id maps (a culled entry must never win a pixel).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_bin_cull.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

R_INNER = 8
N_VIEWS = 6
RES = 512
PAIRS = 4


def main():
    import jax
    import jax.numpy as jnp

    import bench as _bench
    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import with_normals
    from worldrenderer_tpu.ops.gbuffer import rasterize_gbuffer
    from worldrenderer_tpu.ops.rasterize import auto_fast_config, binning_stats
    from worldrenderer_tpu.render import render
    from worldrenderer_tpu.transforms import get_clip_space_position

    mesh = with_normals(_bench._heightfield_scene())
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0,
        num_views=N_VIEWS, near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    base = auto_fast_config(pos_clip, mesh.t_pos_idx, (RES, RES),
                            base=_bench._fast_cfg())
    variants = {
        "base": base._replace(bin_cull=False),
        "cull": base._replace(bin_cull=True),
    }

    # --- bit-identity first (z + id maps, exact fp32 kernel path) ---
    zs, ids = {}, {}
    for name, cfg in variants.items():
        g = jax.jit(
            functools.partial(
                rasterize_gbuffer, resolution=(RES, RES),
                config=cfg._replace(dot_precision="highest"),
            ),
            static_argnames=(),
        )(pos_clip, mesh.t_pos_idx, None)
        zs[name] = np.asarray(g.z)
        ids[name] = np.asarray(g.tri_id)
    zdiff = np.abs(zs["base"] - zs["cull"]).max()
    flips = int((ids["base"] != ids["cull"]).sum())
    print(f"bit-identity (fp32 kernel): z maxdiff {zdiff}  id flips {flips}")
    assert zdiff == 0.0 and flips == 0, "cull changed the render!"

    # And in the shipping split_bf16 mode (the margin must cover its noise).
    zs, ids = {}, {}
    for name, cfg in variants.items():
        g = jax.jit(
            functools.partial(
                rasterize_gbuffer, resolution=(RES, RES), config=cfg,
            )
        )(pos_clip, mesh.t_pos_idx, None)
        zs[name] = np.asarray(g.z)
        ids[name] = np.asarray(g.tri_id)
    zdiff = np.abs(zs["base"] - zs["cull"]).max()
    flips = int((ids["base"] != ids["cull"]).sum())
    print(f"bit-identity (split_bf16):  z maxdiff {zdiff}  id flips {flips}")
    assert zdiff == 0.0 and flips == 0, "cull changed the split_bf16 render!"

    # --- interleaved timing ---
    def make_run(cfg):
        stats = binning_stats(pos_clip, mesh.t_pos_idx, (RES, RES), cfg)
        assert stats["ok"], stats
        render_fn = functools.partial(
            render, height=RES, width=RES, render_attr=False,
            render_depth=False, render_normal=True, raster_config=cfg,
        )

        @jax.jit
        def run(mesh, cam, seed):
            def body(acc, i):
                c = cam._replace(
                    mvp_mtx=cam.mvp_mtx
                    + (seed + i).astype(jnp.float32) * 1e-6
                )
                out = render_fn(mesh, c)
                return (
                    acc + jnp.sum(jnp.abs(out.normal)) + jnp.sum(out.mask),
                    None,
                )

            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R_INNER))
            return acc

        return run

    runs = {name: make_run(cfg) for name, cfg in variants.items()}
    for name, run in runs.items():  # compile + warm
        assert np.isfinite(float(run(mesh, cam, jnp.float32(0))))

    results = {name: [] for name in runs}
    for p in range(PAIRS):
        for name, run in runs.items():
            t0 = time.perf_counter()
            float(run(mesh, cam, jnp.float32(p + 1)))
            dt = time.perf_counter() - t0
            results[name].append(N_VIEWS * R_INNER / dt)
        pair = {n: results[n][-1] for n in results}
        print(
            f"pair {p}: base {pair['base']:.1f}  cull {pair['cull']:.1f}  "
            f"ratio {pair['cull'] / pair['base']:.3f}"
        )
    ratios = sorted(
        c / b for b, c in zip(results["base"], results["cull"])
    )
    print(
        f"median ratio {ratios[len(ratios) // 2]:.3f}  "
        f"(all: {['%.3f' % r for r in ratios]})"
    )


if __name__ == "__main__":
    main()

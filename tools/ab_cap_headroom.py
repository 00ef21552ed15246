"""Interleaved on-chip A/B of auto_fast_config's cap_headroom on the
raw-1M tinysort render. The row-proportional caps (bin_flat_cap_abs /
bin_small_cap / bin_tiny_cap) size the flat record gathers and
multi-operand sorts; binning_stats validates losslessness at every
setting, so all variants must be BIT-identical — only the sentinel tails
shrink.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_cap_headroom.py
"""
from __future__ import annotations
import functools, time
import numpy as np

R_INNER = 4
N_VIEWS = 6
RES = 512
PAIRS = 4

def main():
    import jax, jax.numpy as jnp
    import bench as _bench
    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh, with_normals
    from worldrenderer_tpu.ops.gbuffer import rasterize_gbuffer
    from worldrenderer_tpu.ops.rasterize import auto_fast_config, binning_stats
    from worldrenderer_tpu.render import render
    from worldrenderer_tpu.transforms import get_clip_space_position

    n = 708
    verts, faces = make_grid_mesh(
        n, extent=1.0, height_fn=lambda x, y: 0.3*np.sin(3*x)*np.cos(3*y))
    mesh = with_normals(TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32)))
    cam = get_camera(elevation_deg=35.0, distance=3.0, fovy_deg=50.0,
                     num_views=N_VIEWS, near=0.1, far=10.0)
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    base = _bench._fast_cfg()._replace(bin_tiny_px=1.0)
    variants = {}
    for hr in (2.0, 1.5, 1.2):
        cfg = auto_fast_config(pos_clip, mesh.t_pos_idx, (RES, RES),
                               base=base, cap_headroom=hr)
        st = binning_stats(pos_clip, mesh.t_pos_idx, (RES, RES), cfg)
        assert st["ok"], (hr, st)
        print(f"hr{hr}: cap_abs {cfg.bin_flat_cap_abs} small {cfg.bin_small_cap} tiny {cfg.bin_tiny_cap}")
        variants[f"hr{hr}"] = cfg

    # bit-identity across variants (exact fp32 kernels)
    ref = None
    for name, cfg in variants.items():
        g = jax.jit(functools.partial(
            rasterize_gbuffer, resolution=(RES, RES),
            config=cfg._replace(dot_precision="highest")))(
            pos_clip, mesh.t_pos_idx, None)
        cur = (np.asarray(g.z), np.asarray(g.tri_id), np.asarray(g.mask))
        if ref is None:
            ref = cur
        else:
            assert np.array_equal(ref[0], cur[0]), name
            assert np.array_equal(ref[1], cur[1]), name
            assert np.array_equal(ref[2], cur[2]), name
    print("bit-identity across cap headrooms: OK")

    def make_run(cfg):
        render_fn = functools.partial(
            render, height=RES, width=RES, render_attr=False,
            render_depth=False, render_normal=True, raster_config=cfg)
        @jax.jit
        def run(mesh, cam, seed):
            def body(acc, i):
                c = cam._replace(mvp_mtx=cam.mvp_mtx + (seed+i).astype(jnp.float32)*1e-6)
                out = render_fn(mesh, c)
                return acc + jnp.sum(jnp.abs(out.normal)) + jnp.sum(out.mask), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R_INNER))
            return acc
        return run

    runs = {n_: make_run(c) for n_, c in variants.items()}
    for n_, run in runs.items():
        assert np.isfinite(float(run(mesh, cam, jnp.float32(0))))
    results = {n_: [] for n_ in runs}
    for p in range(PAIRS):
        for n_, run in runs.items():
            t0 = time.perf_counter()
            float(run(mesh, cam, jnp.float32(p+1)))
            results[n_].append(N_VIEWS*R_INNER/(time.perf_counter()-t0))
        print(f"pair {p}: " + "  ".join(f"{n_} {results[n_][-1]:.1f}" for n_ in results))
    for n_, v in results.items():
        v = sorted(v)
        print(f"{n_}: median {v[len(v)//2]:.1f} views/s")

if __name__ == "__main__":
    main()

"""Device-trace the town-fixture frame (the driver's real-scene metric:
8 flythrough frames 384x576, strip atlas + seam-cut + backface_cull) and
print per-HLO-op exclusive device times — the first trace of a REAL
multi-material scene (every earlier trace was procedural geometry).

Usage: PYTHONPATH=/root/repo:/root/repo/tools:/root/.axon_site \
       python tools/trace_town.py
"""

from __future__ import annotations

import glob
import time


def main():
    import jax
    import jax.numpy as jnp

    import bench as _bench
    from worldrenderer_tpu.mesh import unify_mesh_uv, with_normals
    from worldrenderer_tpu.ops.rasterize import auto_fast_config
    from worldrenderer_tpu.render import render
    from worldrenderer_tpu.transforms import get_clip_space_position
    from worldrenderer_tpu.utils.roofline import exclusive_times

    mesh, cam, res_h, res_w = _bench._town_scene()
    # Mirror the render()'s auto path eagerly so the traced program is
    # the steady-state one (seam-cut memoized, normals precomputed).
    mesh = with_normals(unify_mesh_uv(mesh))
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    cfg = auto_fast_config(
        pos_clip, mesh.t_pos_idx, (res_h, res_w),
        base=_bench._fast_cfg(), backface_cull=-1,
    )
    print("cfg:", cfg, flush=True)

    @jax.jit
    def frame(mesh, cam, seed):
        out = render(
            mesh, cam._replace(mvp_mtx=cam.mvp_mtx + seed * 1e-6),
            res_h, res_w, render_attr=True, render_depth=True,
            render_normal=True, attr_background=0.7, raster_config=cfg,
        )
        return (
            jnp.sum(out.mask) + jnp.sum(jnp.abs(out.normal))
            + jnp.sum(jnp.abs(out.attr)) + jnp.sum(jnp.abs(out.depth))
        )

    t0 = time.perf_counter()
    float(frame(mesh, cam, jnp.float32(0)))
    print(f"compiled+first: {time.perf_counter()-t0:.1f}s", flush=True)

    logdir = "/tmp/trace_town"
    with jax.profiler.trace(logdir):
        for i in range(16):
            float(frame(mesh, cam, jnp.float32(i + 1)))

    paths = sorted(glob.glob(logdir + "/plugins/profile/*/*.trace.json.gz"))
    print("trace:", paths[-1], flush=True)
    ex = exclusive_times(paths[-1])
    tot = sum(s for n, s in ex.items() if not n.startswith("jit_frame"))
    print(f"device busy total: {tot*1e3:.2f} ms (16 frames of 8 views)\n")
    print(f"{'ms':>9} {'%':>6}  op")
    for name, s in sorted(ex.items(), key=lambda kv: -kv[1])[:24]:
        if name.startswith("jit_frame"):
            continue
        print(f"{s*1e3:9.3f} {100*s/tot:6.1f}  {name}")


if __name__ == "__main__":
    main()

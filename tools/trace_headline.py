"""Device-trace the headline render (6 views 512^2 pos+normal, 10k-tri
heightfield, auto config) and print per-HLO-op exclusive device times —
the post-round-4 stage split (corner-gather fusion landed; where does the
frame go now?).

Usage: PYTHONPATH=/root/repo:/root/repo/tools:/root/.axon_site \
       python tools/trace_headline.py
"""

from __future__ import annotations

import glob
import time

import numpy as np

from trace_config4 import exclusive_times  # noqa: E402 (same dir)


def main():
    import jax
    import jax.numpy as jnp

    import bench as _bench
    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import with_normals
    from worldrenderer_tpu.ops.rasterize import auto_fast_config
    from worldrenderer_tpu.render import render
    from worldrenderer_tpu.transforms import get_clip_space_position

    mesh = with_normals(_bench._heightfield_scene())
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0, num_views=6,
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    cfg = auto_fast_config(pos_clip, mesh.t_pos_idx, (512, 512))
    print("cfg:", cfg, flush=True)

    @jax.jit
    def frame(mesh, cam, seed):
        out = render(
            mesh, cam._replace(mvp_mtx=cam.mvp_mtx + seed * 1e-6),
            512, 512, render_attr=False, render_depth=False,
            render_normal=True, raster_config=cfg,
        )
        return jnp.sum(out.mask) + jnp.sum(jnp.abs(out.normal))

    t0 = time.perf_counter()
    float(frame(mesh, cam, jnp.float32(0)))
    print(f"compiled+first: {time.perf_counter()-t0:.1f}s", flush=True)

    logdir = "/tmp/trace_headline"
    with jax.profiler.trace(logdir):
        for i in range(16):
            float(frame(mesh, cam, jnp.float32(i + 1)))

    paths = sorted(glob.glob(logdir + "/plugins/profile/*/*.trace.json.gz"))
    print("trace:", paths[-1], flush=True)
    ex = exclusive_times(paths[-1])
    tot = sum(ex.values())
    print(f"device busy total: {tot*1e3:.2f} ms (16 frames of 6 views)\n")
    print(f"{'ms':>9} {'%':>6}  op")
    for name, s in sorted(ex.items(), key=lambda kv: -kv[1])[:28]:
        print(f"{s*1e3:9.3f} {100*s/tot:6.1f}  {name}")


if __name__ == "__main__":
    main()

"""Device-trace the config4 frame (4-view 1024^2 UV texture + materials)
and print per-HLO-op exclusive device times.

This is the committed form of the round-4 trace workflow (CLAUDE.md:
"jax.profiler device traces WORK over the tunnel") that found the
sequential chunk-window loop the stage ablations missed. TRACE BEFORE
TUNING.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/trace_config4.py
       [--res 1024] [--views 4] [--logdir /tmp/trace_c4]
"""

from __future__ import annotations

import argparse
import glob
import time

import numpy as np


# Canonical parser lives in the package (worldrenderer_tpu/utils/roofline.py
# — it also backs the bench's kernel_mfu fields); re-exported here so the
# other trace tools' `from trace_config4 import exclusive_times` keeps
# working without a second copy that could drift.
from worldrenderer_tpu.utils.roofline import exclusive_times  # noqa: F401

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--logdir", default="/tmp/trace_c4")
    ap.add_argument("--no-attr", action="store_true",
                    help="geometry-only frame (isolates the texture stage)")
    ap.add_argument("--pack", default="none", choices=["none", "u8"],
                    help="texture_pack_mode for the attr stage")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG, auto_fast_config
    from worldrenderer_tpu.render import render
    from worldrenderer_tpu.transforms import get_clip_space_position

    verts, faces = make_grid_mesh(
        72, extent=1.0,
        height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y),
    )
    uv = (verts[:, :2] - verts[:, :2].min(0)) / np.ptp(verts[:, :2], 0)
    t = (np.indices((1024, 1024)).sum(0) // 64 % 2).astype(np.float32)
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.stack([t, 1 - t, t * 0 + 0.5], -1),
    )
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0, num_views=args.views,
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    cfg = auto_fast_config(
        pos_clip, mesh.t_pos_idx, (args.res, args.res), base=FAST_TPU_CONFIG
    )

    @jax.jit
    def frame(mesh, cam, seed):
        out = render(
            mesh, cam._replace(mvp_mtx=cam.mvp_mtx + seed * 1e-6),
            args.res, args.res,
            render_attr=not args.no_attr, render_depth=True,
            render_normal=True, raster_config=cfg,
            texture_pack_mode=args.pack,
        )
        acc = jnp.sum(out.mask) + jnp.sum(jnp.abs(out.normal))
        if not args.no_attr:
            acc = acc + jnp.sum(jnp.abs(out.attr))
        return acc

    t0 = time.perf_counter()
    float(frame(mesh, cam, jnp.float32(0)))
    print(f"compiled+first: {time.perf_counter()-t0:.1f}s", flush=True)

    with jax.profiler.trace(args.logdir):
        for i in range(4):
            float(frame(mesh, cam, jnp.float32(1 + i)))

    paths = sorted(glob.glob(args.logdir + "/**/*.trace.json.gz",
                             recursive=True))
    if not paths:
        raise SystemExit(f"no trace under {args.logdir}")
    excl = exclusive_times(paths[-1])
    total = sum(excl.values())
    print(f"\ntrace: {paths[-1]}")
    print(f"device busy total: {total*1e3:.2f} ms (4 frames)\n")
    print(f"{'ms':>9}  {'%':>5}  op")
    for name, s in excl.most_common(30):
        print(f"{s*1e3:9.3f}  {100*s/max(total,1e-12):5.1f}  {name[:110]}")


if __name__ == "__main__":
    main()

"""Device-trace the projection benchmark (6-view 512^2 -> uv2048 bake)
and print per-HLO-op exclusive device times. Same workflow as
tools/trace_config4.py — TRACE BEFORE TUNING.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/trace_projection.py
       [--uv 2048] [--res 512] [--views 6] [--full]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from trace_config4 import exclusive_times  # noqa: E402 (same dir)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--uv", type=int, default=2048)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--full", action="store_true",
                    help="include poisson blending + uv padding")
    ap.add_argument("--fused", action="store_true",
                    help="fuse the attr gather into uv_render_geometry")
    ap.add_argument("--pack", action="store_true",
                    help="255-quantize views + byte-pack their columns")
    ap.add_argument("--logdir", default="/tmp/trace_proj")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.baking.uv import (
        uv_blend, uv_precompute, uv_render_attr, uv_render_geometry,
    )
    from worldrenderer_tpu.mesh import TexturedMesh, uv_sphere_mesh
    from worldrenderer_tpu.render import render

    import bench as _bench  # repo-root bench.py for the shared auto config

    verts, faces, uv = uv_sphere_mesh(65, 129)
    tex = np.full((args.uv, args.uv, 3), 0.25, np.float32)
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.asarray(tex),
    )
    cam = get_camera(
        elevation_deg=20.0, distance=2.7, fovy_deg=40.0,
        num_views=args.views, near=0.1, far=10.0,
    )
    views = render(mesh, cam, args.res, args.res, render_attr=True).attr
    if args.pack:
        views = jnp.round(jnp.clip(views, 0, 1) * 255.0) / 255.0
    cfg = _bench._projection_auto_cfg(mesh, cam, args.res, args.uv)

    from worldrenderer_tpu.baking.uv import UVRenderAttrOutput

    @jax.jit
    def project(mesh, cam, views, seed):
        cam = cam._replace(mvp_mtx=cam.mvp_mtx + seed * 1e-9)
        pre = uv_precompute(mesh, args.uv, args.uv, raster_config=cfg)
        geo = uv_render_geometry(
            mesh, cam, args.res, args.res, pre, raster_config=cfg,
            sample_images=views if args.fused else None,
            images_pack_mode="u8" if args.pack else "none",
        )
        if args.fused:
            attr = UVRenderAttrOutput(
                uv_attr_proj=geo.uv_attr_proj, uv_mask_proj=None
            )
        else:
            attr = uv_render_attr(
                views, geo, pack_mode="u8" if args.pack else "none"
            )
        out = uv_blend(
            pre, geo, attr,
            do_uv_padding=args.full, poisson_blending=args.full,
            pb_num_iters=1000,
        ).uv_attr_blend
        return jnp.sum(jnp.abs(out))

    t0 = time.perf_counter()
    float(project(mesh, cam, views, jnp.float32(0)))
    print(f"compiled+first: {time.perf_counter()-t0:.1f}s", flush=True)

    with jax.profiler.trace(args.logdir):
        for i in range(4):
            float(project(mesh, cam, views, jnp.float32(i + 1)))

    import glob
    paths = sorted(glob.glob(args.logdir + "/plugins/profile/*/*.trace.json.gz"))
    print("trace:", paths[-1], flush=True)
    ex = exclusive_times(paths[-1])
    tot = sum(ex.values())
    print(f"device busy total: {tot*1e3:.2f} ms (4 runs)\n")
    print(f"{'ms':>9} {'%':>6}  op")
    for name, s in sorted(ex.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{s*1e3:9.3f} {100*s/tot:6.1f}  {name}")


if __name__ == "__main__":
    main()

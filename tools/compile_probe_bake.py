"""Probe WHERE the 4096^2 bake program's cold-compile time goes.

bench.py bake4k (uv4096, texel_chunks=8) takes >15 min to compile cold on
the remote TPU compiler (two driver-visible timeouts at 580/900 s). This
tool AOT-lowers + compiles the bake and its stages on the CPU backend at a
sweep of uv sizes so the structural blowup (if any) shows in pass time /
HLO size scaling without spending chip time. CPU absolute times differ
from the remote TPU compiler's, but superlinear scaling in uv_size or
texel_chunks is backend-independent evidence.

Usage: python tools/compile_probe_bake.py [--sizes 1024,2048,4096] \
          [--chunks 8] [--stage all|bake|pre|band|post]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax

# --backend tpu: leave the platform alone (axon sitecustomize sets it);
# default cpu keeps the sweep off the chip.
if "--backend" not in " ".join(sys.argv) or "--backend=cpu" in sys.argv or (
    "--backend" in sys.argv and sys.argv[sys.argv.index("--backend") + 1] == "cpu"
):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from worldrenderer_tpu.baking.uv import (
    ExponentialBlend,
    SimpleUVValidityStrategy,
    UVPrecomputeOutput,
    uv_blend_post,
    uv_blend_sum,
    uv_gather_geometry,
    uv_precompute,
    uv_render_attr,
    uv_view_geometry,
)
from worldrenderer_tpu.camera import get_camera
from worldrenderer_tpu.mesh import TexturedMesh
from worldrenderer_tpu.ops.rasterize import auto_fast_config
from worldrenderer_tpu.parallel.bake import _build_bake


def make_scene(n=24, uv_res=1024):
    # Small analytic mesh: compile time depends on SHAPES, not content.
    gx, gy = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
    v = np.stack([gx, gy, 0.1 * np.sin(6 * gx) * np.cos(6 * gy)], -1)
    v = (v - 0.5).reshape(-1, 3).astype(np.float32)
    idx = np.arange(n * n).reshape(n, n)
    quads = np.stack(
        [idx[:-1, :-1], idx[1:, :-1], idx[1:, 1:], idx[:-1, 1:]], -1
    ).reshape(-1, 4)
    tri = np.concatenate([quads[:, [0, 1, 2]], quads[:, [0, 2, 3]]], 0)
    uv = (v[:, :2] + 0.5).astype(np.float32)
    return TexturedMesh(
        v_pos=jnp.asarray(v), t_pos_idx=jnp.asarray(tri, jnp.int32),
        v_tex=jnp.asarray(uv), t_tex_idx=jnp.asarray(tri, jnp.int32),
    )


def timed_compile(tag, fn, *args):
    t0 = time.time()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.time()
    text = lowered.as_text()
    hlo_lines = text.count("\n")
    compiled = lowered.compile()
    t2 = time.time()
    try:
        mod_bytes = sum(
            len(m.to_string()) for m in compiled.runtime_executable().hlo_modules()
        )
    except Exception:
        mod_bytes = -1
    print(
        f"{tag:36s} lower {t1 - t0:7.2f}s  compile {t2 - t1:7.2f}s  "
        f"stablehlo_lines {hlo_lines:8d}  opt_hlo_chars {mod_bytes}"
    )
    return t2 - t1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1024,2048,4096")
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--stage", default="all")
    ap.add_argument("--backend", default="cpu", choices=["cpu", "tpu"])
    ap.add_argument("--scene", default="grid", choices=["grid", "bench"])
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    if args.scene == "bench":
        # EXACTLY bench_bake4k's scene + config (uv sphere, 768^2 views,
        # auto config sized for BOTH the uv_size^2 atlas raster and the
        # view renders) — the generic 512^2 cfg under-budgets the 4096^2
        # atlas pass and OOMs the uv_precompute compile on a v5e.
        import sys as _sys
        _sys.path.insert(0, "/root/repo")
        from bench import _projection_auto_cfg
        from worldrenderer_tpu.mesh import uv_sphere_mesh

        nv, h, w = args.views, 768, 768
        verts, faces, uv = uv_sphere_mesh(65, 129)
        mesh = TexturedMesh(
            v_pos=jnp.asarray(verts, jnp.float32),
            t_pos_idx=jnp.asarray(faces, jnp.int32),
            v_tex=jnp.asarray(uv, jnp.float32),
            t_tex_idx=jnp.asarray(faces, jnp.int32),
        )
        cam = get_camera(
            elevation_deg=20.0, distance=2.7, fovy_deg=40.0, num_views=nv,
            near=0.1, far=10.0,
        )
        images = jnp.zeros((nv, h, w, 3), jnp.float32)
        cfg = _projection_auto_cfg(mesh, cam, h, int(args.sizes.split(",")[0]))
    else:
        mesh = make_scene()
        nv, h, w = args.views, 512, 512
        cam = get_camera(
            elevation_deg=30.0, num_views=nv, distance=2.0, fovy_deg=40.0
        )
        images = jnp.zeros((nv, h, w, 3), jnp.float32)
        from worldrenderer_tpu.transforms import get_clip_space_position

        pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
        cfg = auto_fast_config(pos_clip, mesh.t_pos_idx, (h, w))

    validity = SimpleUVValidityStrategy()
    weights = ExponentialBlend()

    for uv_size in sizes:
        print(f"== uv_size {uv_size}  texel_chunks {args.chunks} ==")
        if args.stage in ("all", "pre"):
            timed_compile(
                f"uv_precompute {uv_size}",
                lambda m: uv_precompute(
                    m, height=uv_size, width=uv_size, raster_config=cfg
                ),
                mesh,
            )
        if args.stage in ("all", "band"):
            # One texel chunk's gather stage (the lax.map body).
            hc = uv_size // args.chunks

            def band(m, cam_j, images_j, uv_attr, uv_mask, uv_pos):
                view_geo = uv_view_geometry(
                    m, cam_j, h, w, compute_depth_grad=True,
                    raster_config=cfg,
                )
                pre_c = UVPrecomputeOutput(
                    height=hc, width=uv_size, uv_attr=uv_attr,
                    uv_mask=uv_mask, uv_pos=uv_pos,
                )
                geo = uv_gather_geometry(view_geo, cam_j, pre_c)
                attr = uv_render_attr(
                    images=images_j, masks=None,
                    uv_render_geometry_output=geo,
                )
                out = uv_blend_sum(pre_c, geo, attr, validity, weights)
                return out.uv_attr_blend

            timed_compile(
                f"band chunk ({hc}x{uv_size})",
                band,
                mesh, cam, images,
                jnp.zeros((hc, uv_size, 3), jnp.float32),
                jnp.zeros((hc, uv_size), bool),
                jnp.zeros((hc, uv_size, 3), jnp.float32),
            )
        if args.stage in ("all", "post"):
            def post(uv_attr, uv_mask, uv_pos, b, v, _n=uv_size):
                p = UVPrecomputeOutput(
                    height=_n, width=_n, uv_attr=uv_attr,
                    uv_mask=uv_mask, uv_pos=uv_pos,
                )
                return uv_blend_post(
                    p, b, v, empty_value=1.0, do_uv_padding=True,
                    pad_unseen_area=False, poisson_blending=True,
                    pb_num_iters=1000, pb_keep_original_border=True,
                )

            timed_compile(
                f"uv_blend_post {uv_size}",
                post,
                jnp.zeros((uv_size, uv_size, 3), jnp.float32),
                jnp.zeros((uv_size, uv_size), bool),
                jnp.zeros((uv_size, uv_size, 3), jnp.float32),
                jnp.zeros((uv_size, uv_size, 3), jnp.float32),
                jnp.zeros((uv_size, uv_size), bool),
            )
        if args.stage in ("all", "bake"):
            from jax.sharding import Mesh

            dmesh = Mesh(np.asarray(jax.devices()[:1]), ("uv",))
            bake = _build_bake(
                dmesh, "uv", uv_size, h, w, 3, False, False,
                0.3, 5, 0.1, 6.0, True, 1000, True, False, True, cfg,
                "none", args.chunks,
            )
            timed_compile(
                f"FULL bake {uv_size} c{args.chunks}",
                bake, images, None, mesh, cam, None,
            )


if __name__ == "__main__":
    main()

"""Main end-to-end app: blend/GLB -> cameras -> project video onto mesh ->
bake texture -> re-render rgb / 16-bit depth / normal / mask frame sequence.

Reference contract: mvadapter/test/pipeline.py:24-323 (project_and_render +
CLI). The per-frame Python render loop of the reference
(pipeline.py:194-219) becomes one batched render over the whole camera
trajectory, optionally chunked to bound device memory.
"""

from __future__ import annotations

import argparse
import os
import shutil
from pathlib import Path
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..camera import Camera
from ..mesh import TexturedMesh, load_mesh
from ..ops.tensor import chunk_batch
from ..render import SimpleNormalization, render
from ..scene.blender import export_blend_to_glb, export_camera_json
from ..scene.camera_json import load_camera_from_json
from ..scene.video import load_frames, save_depth_frames_16bit, save_frames
from .texture_pipeline import ModProcessConfig, TexturePipeline

__all__ = ["project_and_render", "main"]


def _auto_near_far(mesh: TexturedMesh, cam: Camera, near0: float, far0: float):
    """Near/far from mesh<->camera distance span with 5% padding
    (reference pipeline.py:160-173)."""
    try:
        cam_pos = np.asarray(cam.c2w)[:, :3, 3]
        v = np.asarray(mesh.v_pos)[None]
        dist = np.linalg.norm(v - cam_pos[:, None, :], axis=-1)
        min_d, max_d = float(dist.min()), float(dist.max())
        span = max_d - min_d
        pad = span * 0.05 if span > 0 else 1.0
        near = max(1e-4, min_d - pad)
        far = max(near + 1e-4, max_d + pad)
        return near, far
    except Exception:
        return near0, far0


def project_and_render(
    mesh_path,
    video_path,
    output_dir,
    height: Optional[int] = None,
    width: Optional[int] = None,
    blender_bin: str = "blender",
    uv_size: int = 2048,
    frame_step: int = 1,
    max_frames: int = 0,
    camera_json=None,
    next_camera_json=None,
    axis_convert: bool = False,
    uv_unwarp: bool = True,
    render_chunk: int = 16,
    keyframe_selection: bool = False,
    keyframe_t_position: float = 0.20,
    keyframe_t_rotation: float = 0.5,
    debug: bool = False,
    raster: str = "exact",
    pos_error_eps=1e-3,
) -> None:
    """``raster='fast'`` auto-tunes the lossy fast-path binning budgets to
    this scene's cameras (ops.rasterize.auto_fast_config: exact span
    histogram + headroom + lossless validation) before rendering; 'exact'
    keeps the default always-exact configuration."""
    mesh_path = Path(mesh_path)
    output_dir = Path(output_dir)
    if output_dir.exists():
        shutil.rmtree(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)

    ifproject = video_path is not None
    if mesh_path.suffix == ".blend":
        glb_path = mesh_path.with_suffix(".glb")
        if camera_json is None:
            camera_json = output_dir / "camera.json"
            export_camera_json(mesh_path, camera_json, blender_bin)
        export_blend_to_glb(mesh_path, glb_path, blender_bin)
    else:
        glb_path = mesh_path
        if camera_json is None or not Path(camera_json).exists():
            raise ValueError(
                "non-.blend input requires camera_json "
                "(pass a .blend for automatic export)"
            )
    camera_json = Path(camera_json)

    video_h, video_w = height or 512, width or 512
    num_views_all = max_frames if max_frames > 0 else 1
    frames_np = None
    if ifproject:
        frames_np = load_frames(video_path, 0, frame_step, max_frames)
        num_views_all, video_h, video_w = frames_np.shape[:3]

    cam_all, clip_near, clip_far = load_camera_from_json(
        camera_json, video_h, video_w,
        max_views=max_frames if max_frames > 0 else 10**9,
        axis_convert=axis_convert,
    )
    num_views = min(num_views_all, len(cam_all))
    cam = cam_all[:num_views]

    if keyframe_selection:
        # Project from keyframes only (reference pipeline_opt.py:69-88);
        # rendering below still follows the full/next trajectory.
        from ..scene.keyframe import get_keyframes

        key_idx = [
            int(i)
            for i in get_keyframes(
                camera_json, num_views,
                t_position=keyframe_t_position, t_rotation=keyframe_t_rotation,
            )
            if 0 <= int(i) < num_views
        ]
        if not key_idx:
            raise RuntimeError("No valid keyframes found within camera range.")
        cam = cam_all[key_idx]
        if ifproject:
            frames_np = frames_np[key_idx]
        num_views = len(key_idx)

    tp = TexturePipeline()
    if ifproject:
        frames_np = frames_np[:num_views]
        tp_out = tp(
            mesh_path=str(glb_path),
            save_dir=str(output_dir),
            save_name="projected",
            keep_original_transform=True,
            uv_size=uv_size,
            uv_unwarp=uv_unwarp,
            rgb_tensor=jnp.asarray(frames_np),
            rgb_process_config=ModProcessConfig(inpaint_mode="uv"),
            camera_projection_type="CUSTOM",
            cameras_override=cam,
            debug_mode=debug,
            pos_error_eps=pos_error_eps,
        )
        mesh = load_mesh(
            tp_out.shaded_model_save_path or str(glb_path),
            default_uv_size=uv_size,
            merge_vertices=True,
        )
        if tp_out.uv_proj_rgb is None:
            raise RuntimeError("TexturePipeline returned no RGB UV projection.")
        # Use the projection-time texture + UVs so re-render sampling matches
        # (reference pipeline.py:118-129).
        mesh = mesh._replace(texture=tp_out.uv_proj_rgb)
        if tp_out.mesh_v_tex is not None:
            mesh = mesh._replace(
                v_tex=tp_out.mesh_v_tex, t_tex_idx=tp_out.mesh_t_tex_idx
            )
        if debug:
            from PIL import Image

            dbg = output_dir / "debug"
            dbg.mkdir(parents=True, exist_ok=True)
            Image.fromarray(
                (np.clip(np.asarray(tp_out.uv_proj_rgb), 0, 1) * 255).astype(np.uint8)
            ).save(dbg / "uv_proj.png")
    else:
        path = str(glb_path)
        if uv_unwarp:
            from ..meshproc import process_raw

            suffix = os.path.splitext(path)[-1]
            path_new = path.replace(suffix, f"_unwarp{suffix}")
            process_raw(path, path_new, preprocess=False)
            path = path_new
        mesh = load_mesh(path, default_uv_size=uv_size, merge_vertices=True)

    clip_near, clip_far = _auto_near_far(mesh, cam, clip_near, clip_far)

    # mm-scale 16-bit depth normalization (reference pipeline.py:177-184).
    norm_range = 65.535
    depth_norm = SimpleNormalization(
        scale=1.0 / norm_range, offset=0.0, clamp=True, bg_value=1.0
    )

    if next_camera_json is not None and Path(next_camera_json).exists():
        cam_all, _, _ = load_camera_from_json(
            next_camera_json, video_h, video_w,
            max_views=num_views_all, axis_convert=axis_convert,
        )
        cam = cam_all[:num_views]

    out_h = height or video_h
    out_w = width or video_w

    from ..ops.rasterize import DEFAULT_CONFIG

    raster_config = DEFAULT_CONFIG
    if raster == "fast":
        from ..ops.rasterize import FAST_TPU_CONFIG, auto_fast_config
        from ..transforms import get_clip_space_position

        pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
        raster_config = auto_fast_config(
            pos_clip, mesh.t_pos_idx, (out_h, out_w), base=FAST_TPU_CONFIG
        )

    def render_batch(c2w, w2c, proj_mtx, mvp_mtx, cam_pos):
        batch_cam = Camera(c2w, w2c, proj_mtx, mvp_mtx, cam_pos)
        out = render(
            mesh,
            batch_cam,
            out_h,
            out_w,
            render_attr=True,
            render_depth=True,
            render_normal=True,
            depth_normalization_strategy=depth_norm,
            attr_background=0.0,
            raster_config=raster_config,
        )
        rgb = out.attr
        geo_mask = out.mask
        tex_mask = (jnp.abs(rgb).sum(-1) > 1e-6) & geo_mask
        rgb = jnp.where(tex_mask[..., None], rgb, 0.0)
        depth = jnp.where(geo_mask, out.depth, 1.0)
        return rgb, depth, out.normal, tex_mask

    rgb, depth, normal, mask = chunk_batch(
        render_batch, render_chunk, cam.c2w, cam.w2c, cam.proj_mtx, cam.mvp_mtx,
        cam.cam_pos,
    )

    if ifproject:
        save_frames(np.asarray(rgb), output_dir / "rgb", "rgb")
        save_frames(np.asarray(mask), output_dir / "mask", "mask")
    save_depth_frames_16bit(np.asarray(depth), output_dir / "depth", "depth")
    save_frames(
        np.asarray(jnp.clip(normal * 0.5 + 0.5, 0, 1)), output_dir / "normal", "normal"
    )


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Project video onto a scene and export rgb/depth/mask frames."
    )
    parser.add_argument("--uv-size", type=int, default=2048)
    parser.add_argument("--frame-step", type=int, default=1)
    parser.add_argument("--max-frames", type=int, default=0)
    parser.add_argument("--blender-bin", type=str, default="blender")
    parser.add_argument("--output-dir", type=str, default="output_project")
    parser.add_argument("--debug", action="store_true")
    parser.add_argument("--axis-convert", action="store_true")
    parser.add_argument("--blend-path", type=str, required=True)
    parser.add_argument("--video-path", type=str, default=None)
    parser.add_argument("--next-camera-json", type=str, default=None)
    parser.add_argument("--height", type=int, default=None)
    parser.add_argument("--width", type=int, default=None)
    parser.add_argument("--no-uv-unwarp", action="store_true")
    parser.add_argument(
        "--camera-json",
        type=str,
        default=None,
        help="pre-exported camera trajectory (required for non-.blend input)",
    )
    parser.add_argument(
        "--keyframes",
        action="store_true",
        help="project only from auto-selected trajectory keyframes "
        "(reference pipeline_opt behavior)",
    )
    parser.add_argument(
        "--raster", choices=["exact", "fast"], default="exact",
        help="fast = auto-tuned lossy-budget fused kernels (validated lossless for this scene)",
    )
    parser.add_argument("--keyframe-t-position", type=float, default=0.20)
    parser.add_argument("--keyframe-t-rotation", type=float, default=0.5)
    parser.add_argument(
        "--pos-error-eps", default="1e-3",
        help="world-unit reprojection-validity bound, or 'auto' to scale "
        "it to the view-pixel footprint (native-scale scenes)",
    )
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    eps = args.pos_error_eps
    eps = eps if eps == "auto" else float(eps)
    project_and_render(
        mesh_path=args.blend_path,
        video_path=args.video_path,
        output_dir=args.output_dir,
        height=args.height,
        width=args.width,
        blender_bin=args.blender_bin,
        uv_size=args.uv_size,
        frame_step=max(1, args.frame_step),
        max_frames=args.max_frames,
        camera_json=args.camera_json,
        next_camera_json=args.next_camera_json,
        axis_convert=args.axis_convert,
        uv_unwarp=not args.no_uv_unwarp,
        keyframe_selection=args.keyframes,
        keyframe_t_position=args.keyframe_t_position,
        keyframe_t_rotation=args.keyframe_t_rotation,
        pos_error_eps=eps,
        debug=args.debug,
        raster=args.raster,
    )


if __name__ == "__main__":
    main()

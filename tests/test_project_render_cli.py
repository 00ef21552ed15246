"""End-to-end test of the main application path (reference pipeline.py):
synthetic GLB + camera.json + mp4 -> texture bake -> frame export."""

import numpy as np
import pytest

import jax.numpy as jnp

from worldrenderer_tpu import get_camera
from worldrenderer_tpu.mesh import load_mesh, uv_sphere_mesh
from worldrenderer_tpu.pipelines.project_render import project_and_render
from worldrenderer_tpu.render import render
from worldrenderer_tpu.scene.camera_json import save_camera_json
from worldrenderer_tpu.scene.gltf import save_glb

RES = 96
N_FRAMES = 4


@pytest.mark.slow
@pytest.mark.parametrize("raster", ["exact", "fast"])
def test_project_and_render_end_to_end(tmp_path, raster):
    cv2 = pytest.importorskip("cv2")

    # Scene: textured sphere GLB.
    verts, faces, uv = uv_sphere_mesh(17, 33)
    yy, xx = np.meshgrid(np.arange(64), np.arange(64), indexing="ij")
    tex = np.stack(
        [((yy // 8 + xx // 8) % 2).astype(np.float32), xx / 64.0, yy / 64.0],
        axis=-1,
    ).astype(np.float32)
    glb = tmp_path / "scene.glb"
    save_glb(glb, verts.astype(np.float32), faces.astype(np.uint32), uv=uv, texture=tex)

    # Trajectory + ground-truth frames rendered with the known texture.
    cam = get_camera(
        elevation_deg=10.0, distance=3.0, fovy_deg=45.0, num_views=N_FRAMES,
        near=0.1, far=10.0,
    )
    out_dir = tmp_path / "out"
    cam_json = tmp_path / "camera.json"
    save_camera_json(cam_json, np.asarray(cam.c2w), 45.0, 0.1, 10.0)

    mesh = load_mesh(str(glb), flip_uv=True)
    frames = np.asarray(
        render(
            mesh, cam, RES, RES, render_attr=True, render_depth=False,
            render_normal=False, attr_background=0.0,
        ).attr
    )

    video = tmp_path / "footage.mp4"
    writer = cv2.VideoWriter(
        str(video), cv2.VideoWriter_fourcc(*"mp4v"), 10, (RES, RES)
    )
    for f in frames:
        writer.write(cv2.cvtColor((np.clip(f, 0, 1) * 255).astype(np.uint8),
                                  cv2.COLOR_RGB2BGR))
    writer.release()

    project_and_render(
        mesh_path=glb,
        video_path=video,
        output_dir=out_dir,
        height=RES,
        width=RES,
        uv_size=96,
        max_frames=N_FRAMES,
        camera_json=cam_json,
        uv_unwarp=False,  # GLB already has UVs
        debug=True,
        raster=raster,
    )

    assert (out_dir / "rgb" / "rgb_00000.png").exists()
    assert (out_dir / "depth" / "depth_00000.png").exists()
    assert (out_dir / "normal" / "normal_00000.png").exists()
    assert (out_dir / "mask" / "mask_00000.png").exists()
    assert (out_dir / "debug" / "uv_proj.png").exists()

    # Re-rendered rgb should resemble the input footage inside the mask.
    from PIL import Image

    rerendered = (
        np.asarray(Image.open(out_dir / "rgb" / "rgb_00001.png"), np.float32) / 255.0
    )
    mask = np.asarray(Image.open(out_dir / "mask" / "mask_00001.png")) > 0
    err = np.abs(rerendered - frames[1])[mask]
    assert np.median(err) < 0.1, f"median reprojection err {np.median(err)}"


@pytest.mark.slow
def test_project_and_render_keyframes_and_next_camera(tmp_path):
    """pipeline_opt-style keyframe subselection + next-camera re-render."""
    cv2 = pytest.importorskip("cv2")

    verts, faces, uv = uv_sphere_mesh(17, 33)
    tex = np.full((64, 64, 3), 0.5, np.float32)
    glb = tmp_path / "scene.glb"
    save_glb(glb, verts.astype(np.float32), faces.astype(np.uint32), uv=uv, texture=tex)

    # Trajectory with a large jump in the middle -> keyframes {0, 2}.
    az = np.array([0.0, 1.0, 120.0, 121.0], np.float32)
    cam = get_camera(
        elevation_deg=np.full(4, 10.0, np.float32), distance=np.full(4, 3.0, np.float32),
        fovy_deg=np.full(4, 45.0, np.float32), azimuth_deg=az, near=0.1, far=10.0,
    )
    cam_json = tmp_path / "camera.json"
    save_camera_json(cam_json, np.asarray(cam.c2w), 45.0, 0.1, 10.0)

    next_cam = get_camera(
        elevation_deg=np.full(4, 30.0, np.float32), distance=np.full(4, 3.0, np.float32),
        fovy_deg=np.full(4, 45.0, np.float32), azimuth_deg=az + 5.0, near=0.1, far=10.0,
    )
    next_json = tmp_path / "next_camera.json"
    save_camera_json(next_json, np.asarray(next_cam.c2w), 45.0, 0.1, 10.0)

    mesh = load_mesh(str(glb), flip_uv=True)
    frames = np.asarray(
        render(mesh, cam, RES, RES, render_attr=True, render_depth=False,
               render_normal=False, attr_background=0.0).attr
    )
    video = tmp_path / "footage.mp4"
    writer = cv2.VideoWriter(str(video), cv2.VideoWriter_fourcc(*"mp4v"), 10, (RES, RES))
    for f in frames:
        writer.write(cv2.cvtColor((np.clip(f, 0, 1) * 255).astype(np.uint8),
                                  cv2.COLOR_RGB2BGR))
    writer.release()

    out_dir = tmp_path / "out"
    project_and_render(
        mesh_path=glb, video_path=video, output_dir=out_dir,
        height=RES, width=RES, uv_size=64, max_frames=4,
        camera_json=cam_json, next_camera_json=next_json,
        keyframe_selection=True, keyframe_t_position=0.5, keyframe_t_rotation=0.5,
        uv_unwarp=False,
    )
    # keyframes -> only 2 projected/rendered frames, along the NEXT trajectory
    assert (out_dir / "rgb" / "rgb_00001.png").exists()
    assert not (out_dir / "rgb" / "rgb_00002.png").exists()
    assert (out_dir / "depth" / "depth_00001.png").exists()

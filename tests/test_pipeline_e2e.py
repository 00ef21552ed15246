"""End-to-end pipeline test: procedural textured scene -> synthetic camera
trajectory JSON -> TexturePipeline bake -> re-render (SURVEY.md §4d: the
committed-fixture strategy, with a procedural scene instead of town.blend).
"""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from worldrenderer_tpu import get_camera
from worldrenderer_tpu.mesh import TexturedMesh, load_mesh, uv_sphere_mesh
from worldrenderer_tpu.pipelines import ModProcessConfig, TexturePipeline
from worldrenderer_tpu.render import render
from worldrenderer_tpu.scene.camera_json import save_camera_json
from worldrenderer_tpu.scene.gltf import load_glb, save_glb

RES = 96
UV = 96
N_VIEWS = 4


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("scene")
    verts, faces, uv = uv_sphere_mesh(17, 33)
    yy, xx = np.meshgrid(np.arange(UV), np.arange(UV), indexing="ij")
    tex = np.stack(
        [
            ((yy // 12 + xx // 12) % 2).astype(np.float32),
            (xx / UV).astype(np.float32),
            (yy / UV).astype(np.float32),
        ],
        axis=-1,
    )
    glb = tmp / "scene.glb"
    save_glb(glb, verts.astype(np.float32), faces.astype(np.uint32), uv=uv, texture=tex)

    cam = get_camera(
        elevation_deg=10.0, distance=3.0, fovy_deg=45.0, num_views=N_VIEWS,
        near=0.1, far=10.0,
    )
    cam_json = tmp / "camera.json"
    save_camera_json(cam_json, np.asarray(cam.c2w), 45.0, 0.1, 10.0)
    return {"glb": glb, "cam_json": cam_json, "cam": cam, "tex": tex}


@pytest.mark.slow
def test_texture_pipeline_custom_cameras(scene, tmp_path):
    # Render ground-truth views with the original texture...
    mesh = load_mesh(str(scene["glb"]), flip_uv=True)
    views = render(
        mesh, scene["cam"], RES, RES,
        render_attr=True, render_depth=False, render_normal=False,
        attr_background=0.0,
    )
    # ...then bake them back through the full pipeline.
    tp = TexturePipeline()
    out = tp(
        mesh_path=str(scene["glb"]),
        save_dir=str(tmp_path),
        save_name="e2e",
        uv_size=UV,
        rgb_tensor=views.attr,
        rgb_process_config=ModProcessConfig(inpaint_mode="uv"),
        camera_projection_type="CUSTOM",
        custom_camera_json=str(scene["cam_json"]),
    )
    assert out.shaded_model_save_path is not None
    baked_glb = load_glb(out.shaded_model_save_path)
    assert baked_glb["texture"] is not None

    # Re-render with the baked texture and compare to ground truth.
    baked_mesh = mesh._replace(texture=out.uv_proj_rgb)
    rerendered = render(
        baked_mesh, scene["cam"], RES, RES,
        render_attr=True, render_depth=False, render_normal=False,
        attr_background=0.0,
    )
    mask = np.asarray(views.mask)
    err = np.abs(np.asarray(rerendered.attr) - np.asarray(views.attr))[mask]
    assert np.median(err) < 0.05
    assert err.mean() < 0.15


def test_texture_pipeline_ortho_six_view(scene, tmp_path):
    tp = TexturePipeline()
    # Six synthetic white views baked with the ORTHO rig — checks the rig
    # construction path end to end.
    images = np.full((6, RES, RES, 3), 0.75, np.float32)
    import os

    view_dir = tmp_path / "views"
    view_dir.mkdir()
    from PIL import Image

    for i, im in enumerate(images):
        Image.fromarray((im * 255).astype(np.uint8)).save(view_dir / f"v{i}.png")
    out = tp(
        mesh_path=str(scene["glb"]),
        save_dir=str(tmp_path),
        save_name="ortho",
        uv_size=UV,
        rgb_path=str(view_dir),
        camera_projection_type="ORTHO",
        camera_distance=3.0,
        camera_ortho_scale=2.4,
    )
    assert out.uv_proj_rgb is not None
    baked = np.asarray(out.uv_proj_rgb)
    # Most of the seen texture should take the projected constant color.
    frac_close = (np.abs(baked - 0.75) < 0.02).all(-1).mean()
    assert frac_close > 0.5

"""Scene interchange: GLB roundtrip, texture replacement, camera JSON,
keyframes, frame IO."""

import json

import numpy as np
import pytest

from worldrenderer_tpu.mesh import load_mesh, make_grid_mesh, uv_sphere_mesh
from worldrenderer_tpu.scene.camera_json import (
    build_camera,
    load_camera_from_json,
    save_camera_json,
)
from worldrenderer_tpu.scene.gltf import load_glb, replace_glb_texture, save_glb
from worldrenderer_tpu.scene.keyframe import extract_keyframes
from worldrenderer_tpu.scene.video import save_depth_frames_16bit, save_frames


def test_glb_roundtrip(tmp_path, rng):
    verts, faces, uv = uv_sphere_mesh(9, 17)
    tex = rng.random((32, 32, 3)).astype(np.float32)
    p = tmp_path / "m.glb"
    save_glb(p, verts.astype(np.float32), faces.astype(np.uint32), uv=uv, texture=tex)
    out = load_glb(p)
    np.testing.assert_allclose(out["vertices"], verts, atol=1e-6)
    np.testing.assert_array_equal(out["faces"], faces)
    np.testing.assert_allclose(out["uv"], uv, atol=1e-6)
    # texture round-trips through PNG (exact for 8-bit quantized values)
    assert out["texture"].shape == (32, 32, 3)
    np.testing.assert_allclose(
        out["texture"], np.round(tex * 255) / 255.0, atol=1 / 255.0
    )


def test_glb_replace_texture(tmp_path, rng):
    verts, faces, uv = uv_sphere_mesh(9, 17)
    tex = rng.random((16, 16, 3)).astype(np.float32)
    src = tmp_path / "src.glb"
    dst = tmp_path / "dst.glb"
    save_glb(src, verts.astype(np.float32), faces.astype(np.uint32), uv=uv, texture=tex)
    new_tex = np.zeros((64, 64, 3), np.float32)
    new_tex[:, :, 0] = 1.0
    replace_glb_texture(src, dst, new_tex)
    out = load_glb(dst)
    assert out["texture"].shape == (64, 64, 3)
    np.testing.assert_allclose(out["texture"][..., 0], 1.0, atol=1 / 255.0)
    np.testing.assert_array_equal(out["faces"], faces)


def test_load_mesh_from_glb(tmp_path, rng):
    verts, faces, uv = uv_sphere_mesh(9, 17)
    tex = rng.random((16, 16, 3)).astype(np.float32)
    p = tmp_path / "m.glb"
    save_glb(p, verts.astype(np.float32), faces.astype(np.uint32), uv=uv, texture=tex)
    mesh = load_mesh(str(p))
    assert mesh.v_pos.shape == (len(verts), 3)
    assert mesh.texture is not None
    # flip_uv default flips V
    np.testing.assert_allclose(np.asarray(mesh.v_tex)[:, 1], 1.0 - uv[:, 1], atol=1e-6)


def test_camera_json_roundtrip(tmp_path):
    cam = build_camera(4, 256, 256)
    p = tmp_path / "cam.json"
    save_camera_json(p, np.asarray(cam.c2w), 60.0, clip_start=0.5, clip_end=20.0)
    loaded, near, far = load_camera_from_json(p, 256, 256)
    assert len(loaded) == 4
    assert (near, far) == (0.5, 20.0)
    np.testing.assert_allclose(np.asarray(loaded.c2w), np.asarray(cam.c2w), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(loaded.mvp_mtx), np.asarray(cam.mvp_mtx), atol=1e-4
    )


def test_keyframe_extraction():
    def frame(pos, angle):
        c, s = np.cos(angle), np.sin(angle)
        mw = np.eye(4)
        mw[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        mw[:3, 3] = pos
        return {"matrix_world": mw.tolist()}

    data = [frame([0, 0, 0], 0.0)]
    # tiny motion: no keyframes
    data += [frame([0.01 * i, 0, 0], 0.0) for i in range(1, 5)]
    # big jump: keyframe
    data += [frame([2, 0, 0], 0.0)]
    # big rotation at same position: keyframe
    data += [frame([2, 0, 0], 1.0)]
    kf = extract_keyframes(data, t_position=0.5, t_rotation=0.1)
    assert kf[0] == 0
    assert 5 in kf and 6 in kf
    assert not any(k in kf for k in (1, 2, 3, 4))


def test_frame_savers(tmp_path, rng):
    frames = rng.random((3, 8, 8, 3)).astype(np.float32)
    save_frames(frames, tmp_path / "rgb", "rgb")
    assert (tmp_path / "rgb" / "rgb_00002.png").exists()
    depth = rng.random((2, 8, 8)).astype(np.float32)
    save_depth_frames_16bit(depth, tmp_path / "d", "depth")
    from PIL import Image

    img = np.asarray(Image.open(tmp_path / "d" / "depth_00001.png"))
    assert img.dtype == np.uint16 or img.dtype == np.int32
    np.testing.assert_allclose(
        img / 65535.0, np.clip(depth[1], 0, 1), atol=1e-4
    )

"""Scene interchange: GLB roundtrip, texture replacement, camera JSON,
keyframes, frame IO."""

import json
from pathlib import Path

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


def test_glb_default_white_materials_get_atlas_cells(tmp_path):
    """Materials with neither baseColorTexture nor baseColorFactor default
    to white per the glTF spec, and material-less primitives render as the
    default (white) material — in a multi-material strip atlas BOTH must
    get a dedicated white cell with their UVs remapped into it, or they'd
    sample arbitrary texels from other materials' cells (ADVICE r4 #1)."""
    from worldrenderer_tpu.scene.gltf import (
        _build_glb, parse_glb, save_glb_scene,
    )

    quad_v = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    quad_f = np.array([[0, 1, 2], [0, 2, 3]], np.uint32)
    quad_uv = quad_v[:, :2].astype(np.float32)
    red = np.zeros((8, 8, 3), np.float32)
    red[..., 0] = 1.0
    prims = [
        {"vertices": quad_v, "faces": quad_f, "uv": quad_uv, "texture": red},
        # Neither texture nor base_color -> material with EMPTY
        # pbrMetallicRoughness (spec default = white).
        {"vertices": quad_v + [2, 0, 0], "faces": quad_f, "uv": quad_uv},
        {"vertices": quad_v + [4, 0, 0], "faces": quad_f, "uv": quad_uv},
    ]
    p = tmp_path / "m.glb"
    save_glb_scene(p, prims)
    # Strip the third primitive's material reference entirely
    # (material-less primitive — glTF default material).
    scene = parse_glb(p)
    del scene.gltf["meshes"][0]["primitives"][2]["material"]
    p2 = tmp_path / "m2.glb"
    p2.write_bytes(_build_glb(scene.gltf, scene.blob))

    out = load_glb(p2)
    tex = out["texture"]
    uv = out["uv"]
    assert tex is not None and uv is not None
    ncols = 3  # red + default-white material + material-less white cell
    assert tex.shape[1] == ncols * tex.shape[0]  # one-row strip of square cells

    # Every primitive's UVs land in a distinct cell.
    cells = [
        set(np.floor(uv[4 * k:4 * (k + 1), 0] * ncols).clip(0, ncols - 1)
            .astype(int).tolist())
        for k in range(3)
    ]
    assert all(len(c) == 1 for c in cells), cells
    assert len({next(iter(c)) for c in cells}) == 3, cells
    # Sampling the cell centers: red for prim 0, white for prims 1 and 2.
    cw = tex.shape[1] // ncols
    for k, expect in [(0, [1, 0, 0]), (1, [1, 1, 1]), (2, [1, 1, 1])]:
        cell = next(iter(cells[k]))
        texel = tex[tex.shape[0] // 2, cell * cw + cw // 2]
        np.testing.assert_allclose(texel, expect, atol=1 / 255.0)


def test_loaded_texture_quantization_registry(tmp_path, rng):
    """load_mesh verifies 255-quantization on the host-side decoded image
    and registers the device texture, so render's texture_pack_mode=
    'auto' byte-packs file-loaded meshes WITHOUT pulling the array back
    from the device — and the packed render is bit-identical (PNG images
    are k/255 by construction)."""
    import jax.numpy as jnp

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import is_registered_quantized_texture
    from worldrenderer_tpu.render import render

    verts, faces, uv = uv_sphere_mesh(9, 17)
    # >= 512^2 texels: render's auto pack only upgrades big tables (the
    # packed gather LOSES on small coherent atlases — measured 0.90x on
    # the town fixture's 256x768 strip; PERF.md §2).
    tex = rng.random((512, 512, 3)).astype(np.float32)
    p = tmp_path / "m.glb"
    save_glb(p, verts.astype(np.float32), faces.astype(np.uint32), uv=uv,
             texture=tex)
    mesh = load_mesh(str(p))
    assert is_registered_quantized_texture(mesh.texture)
    # A directly-constructed float texture is NOT registered.
    assert not is_registered_quantized_texture(jnp.asarray(tex))

    cam = get_camera(
        elevation_deg=[20.0], distance=[2.7], fovy_deg=[40.0],
        azimuth_deg=[30.0],
    )
    auto = render(mesh, cam, 64, 64, render_attr=True)
    packed = render(mesh, cam, 64, 64, render_attr=True,
                    texture_pack_mode="u8")
    unpacked = render(mesh, cam, 64, 64, render_attr=True,
                      texture_pack_mode="none")
    np.testing.assert_array_equal(np.asarray(auto.attr),
                                  np.asarray(packed.attr))
    np.testing.assert_array_equal(np.asarray(packed.attr),
                                  np.asarray(unpacked.attr))


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


def test_load_text_gltf_with_external_bin(tmp_path, rng):
    """A JSON .gltf with an external .bin buffer must load like a GLB
    (reference trimesh loader accepts both, mesh.py:198-345)."""
    import base64
    import struct

    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32
    )
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.uint32)
    blob = verts.tobytes() + faces.tobytes()
    (tmp_path / "mesh.bin").write_bytes(blob)
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0}, "indices": 1, "mode": 4}
        ]}],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3", "min": [0, 0, 0], "max": [1, 1, 0]},
            {"bufferView": 1, "componentType": 5125, "count": 6,
             "type": "SCALAR"},
        ],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": verts.nbytes},
            {"buffer": 0, "byteOffset": verts.nbytes,
             "byteLength": faces.nbytes},
        ],
        "buffers": [{"uri": "mesh.bin", "byteLength": len(blob)}],
    }
    path = tmp_path / "mesh.gltf"
    path.write_text(json.dumps(gltf))
    parsed = load_glb(path)
    np.testing.assert_allclose(parsed["vertices"], verts, atol=1e-6)
    np.testing.assert_array_equal(parsed["faces"], faces.reshape(-1, 3))

    # data: URI variant of the same buffer.
    gltf["buffers"] = [{
        "uri": "data:application/octet-stream;base64,"
        + base64.b64encode(blob).decode(),
        "byteLength": len(blob),
    }]
    path2 = tmp_path / "mesh_datauri.gltf"
    path2.write_text(json.dumps(gltf))
    parsed2 = load_glb(path2)
    np.testing.assert_allclose(parsed2["vertices"], verts, atol=1e-6)

    # And through the high-level loader.
    mesh = load_mesh(str(path), merge_vertices=False)
    assert mesh.v_pos.shape == (4, 3) and mesh.t_pos_idx.shape == (2, 3)


def test_load_ply_ascii_and_binary(tmp_path):
    verts = np.array(
        [[0, 0, 0], [2, 0, 0], [0, 2, 0], [2, 2, 1]], np.float64
    )
    nrm = np.array([[0, 0, 1]] * 4, np.float64)
    uv = np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32)

    ascii_ply = "ply\nformat ascii 1.0\nelement vertex 4\n"
    ascii_ply += "".join(
        f"property float {p}\n" for p in ("x", "y", "z", "nx", "ny", "nz", "s", "t")
    )
    ascii_ply += (
        "element face 2\nproperty list uchar int vertex_indices\nend_header\n"
    )
    for i in range(4):
        row = list(verts[i]) + list(nrm[i]) + list(uv[i])
        ascii_ply += " ".join(str(float(x)) for x in row) + "\n"
    ascii_ply += "3 0 1 2\n4 0 1 3 2\n"  # one tri + one quad (fan split)
    pa = tmp_path / "mesh_ascii.ply"
    pa.write_text(ascii_ply)

    from worldrenderer_tpu.scene.ply import load_ply

    parsed = load_ply(pa)
    np.testing.assert_allclose(parsed["vertices"], verts)
    np.testing.assert_allclose(parsed["normals"], nrm)
    np.testing.assert_allclose(parsed["uv"], uv)
    assert parsed["faces"].shape == (3, 3)  # quad fan-triangulated

    # Binary little-endian variant of the same mesh.
    header = (
        "ply\nformat binary_little_endian 1.0\nelement vertex 4\n"
        + "".join(f"property float {p}\n" for p in ("x", "y", "z"))
        + "element face 1\nproperty list uchar uint vertex_indices\n"
        + "end_header\n"
    )
    body = verts.astype("<f4").tobytes()
    body += np.uint8(3).tobytes() + np.array([0, 1, 2], "<u4").tobytes()
    pb = tmp_path / "mesh_bin.ply"
    pb.write_bytes(header.encode("ascii") + body)
    parsed_b = load_ply(pb)
    np.testing.assert_allclose(parsed_b["vertices"], verts, atol=1e-6)
    np.testing.assert_array_equal(parsed_b["faces"], [[0, 1, 2]])
    assert parsed_b["uv"] is None

    mesh = load_mesh(str(pa), default_uv_size=64)
    assert mesh.v_pos.shape == (4, 3) and mesh.v_tex is not None


REFERENCE_CAMERA_JSON = Path("/root/reference/mvadapter/test/camera_path.json")


@pytest.mark.skipif(
    not REFERENCE_CAMERA_JSON.exists(), reason="reference fixture unavailable"
)
def test_load_reference_camera_fixture():
    """Parity against the reference's ACTUAL committed camera trajectory
    (mvadapter/test/camera_path.json, 100 Blender-exported frames): our
    loader must parse it, produce orthonormal rotations and well-formed
    MVPs, and keyframe extraction must run on the real data."""
    from worldrenderer_tpu.scene.camera_json import load_camera_from_json
    from worldrenderer_tpu.scene.keyframe import extract_keyframes

    cam, near, far = load_camera_from_json(
        REFERENCE_CAMERA_JSON, height=480, width=720
    )
    n = cam.c2w.shape[0]
    assert n == 100
    assert 0 < near < far
    rot = np.asarray(cam.c2w)[:, :3, :3]
    # Blender matrices carry scale; R^T R must be a scaled identity.
    rtr = np.einsum("nij,nik->njk", rot, rot)
    scale = rtr[:, 0, 0][:, None, None]
    np.testing.assert_allclose(
        rtr / scale, np.broadcast_to(np.eye(3), rtr.shape), atol=1e-4
    )
    # w2c really inverts c2w.
    ident = np.einsum("nij,njk->nik", np.asarray(cam.w2c), np.asarray(cam.c2w))
    np.testing.assert_allclose(
        ident, np.broadcast_to(np.eye(4), ident.shape), atol=1e-4
    )
    # MVP is finite and the frustum has the exported ~60 deg fov.
    assert np.isfinite(np.asarray(cam.mvp_mtx)).all()
    f = np.asarray(cam.proj_mtx)[0, 1, 1]
    fov = 2 * np.degrees(np.arctan(1.0 / abs(f)))
    assert abs(fov - 60.0) < 1.0, fov

    from worldrenderer_tpu.scene.keyframe import get_keyframes

    keys = get_keyframes(
        REFERENCE_CAMERA_JSON, num_views=100, t_position=0.2, t_rotation=0.5
    )
    assert 1 <= len(keys) <= 100 and keys[0] == 0


def test_video_frame_selection_semantics(tmp_path):
    """load_frames keeps frame k iff k % step == 0 and k+offset is a valid
    index (reference video.py:31-54's gating), capped at max_frames;
    export_frames writes source frame i+offset as output i."""
    cv2 = pytest.importorskip("cv2")
    from worldrenderer_tpu.scene.video import export_frames, load_frames

    path = str(tmp_path / "clip.avi")
    wr = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"MJPG"), 10.0, (32, 32)
    )
    n = 12
    for k in range(n):
        wr.write(np.full((32, 32, 3), k * 20, np.uint8))
    wr.release()
    if not cv2.VideoCapture(path).isOpened():
        pytest.skip("no MJPG codec in this cv2 build")

    def levels(frames):
        return np.round(frames.mean(axis=(1, 2, 3)) * 255 / 20).astype(int)

    got = levels(load_frames(path, frame_offset=0, frame_step=3))
    np.testing.assert_array_equal(got, [0, 3, 6, 9])
    # offset -2: frames 0,1 have k+offset < 0 and are dropped off the grid
    got = levels(load_frames(path, frame_offset=-2, frame_step=3))
    np.testing.assert_array_equal(got, [3, 6, 9])
    # positive offset drops the tail; max_frames caps the kept count
    got = levels(load_frames(path, frame_offset=4, frame_step=2, max_frames=3))
    np.testing.assert_array_equal(got, [0, 2, 4])

    out = tmp_path / "frames"
    export_frames(path, out, frame_offset=3)
    names = sorted(p.name for p in out.iterdir())
    assert names[0] == "frame_00000.png" and len(names) == n - 3
    img = cv2.imread(str(out / "frame_00002.png"))
    assert abs(int(img.mean()) - 5 * 20) <= 2

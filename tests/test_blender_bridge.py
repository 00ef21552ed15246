"""Execute the generated Blender-side scripts against the stub bpy
(tests/stub_bpy.py; VERDICT r4 item 6): the GLB-export expression, the
per-frame camera export (whose JSON must round-trip through
load_camera_from_json), and the depth-compositor script (whose node
graph must match the reference's fixed-range MapValue structure,
reference depth.py:85-116). subprocess.run is monkeypatched to exec the
script Blender would run, so the production wrappers are exercised
end-to-end."""

import json
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from worldrenderer_tpu import get_camera
from worldrenderer_tpu.scene import blender, blender_depth
from worldrenderer_tpu.scene.camera_json import load_camera_from_json

from stub_bpy import Matrix, Scene, Vector, _Object, make_stub_bpy


def _fake_blender_run(monkeypatch, scene):
    """Patch subprocess.run in both bridge modules to exec the generated
    script / expression with the stub bpy installed."""
    bpy, mathutils = make_stub_bpy(scene)

    real_run = subprocess.run

    def run(cmd, *args, **kwargs):
        if not (isinstance(cmd, list) and cmd and "blender" in str(cmd[0])):
            # blender.subprocess IS the stdlib module: patching its .run
            # affects every caller in the process (numpy.testing among
            # them) — pass anything non-blender through untouched.
            return real_run(cmd, *args, **kwargs)
        assert cmd[1] == "-b", cmd  # headless
        if "--python-expr" in cmd:
            src = cmd[cmd.index("--python-expr") + 1]
        else:
            src = Path(cmd[cmd.index("--python") + 1]).read_text()
        monkeypatch.setitem(sys.modules, "bpy", bpy)
        monkeypatch.setitem(sys.modules, "mathutils", mathutils)
        exec(compile(src, "<blender-script>", "exec"), {"__name__": "__main__"})

    monkeypatch.setattr(blender.subprocess, "run", run)
    monkeypatch.setattr(blender_depth.subprocess, "run", run)
    return bpy


def _orbit_scene(n_frames=5, fov=40.0, clip=(0.25, 60.0), meshes=()):
    cam = get_camera(
        elevation_deg=[20.0] * n_frames,
        distance=[3.0] * n_frames,
        fovy_deg=[fov] * n_frames,
        azimuth_deg=list(np.linspace(0, 300, n_frames)),
    )
    c2w = np.asarray(cam.c2w, np.float64)
    path = {f + 1: c2w[f].tolist() for f in range(n_frames)}
    return Scene(path, fov_deg=fov, clip=clip, mesh_objects=meshes), c2w


def test_camera_export_script_roundtrips_through_loader(monkeypatch, tmp_path):
    scene, c2w = _orbit_scene()
    _fake_blender_run(monkeypatch, scene)

    json_path = tmp_path / "cams" / "camera_path.json"
    blender.export_camera_json("scene.blend", json_path)

    assert json_path.exists()
    data = json.loads(json_path.read_text())
    assert [d["frame"] for d in data] == [1, 2, 3, 4, 5]
    assert scene.frames_set == [1, 2, 3, 4, 5]
    # The schema is exactly what load_camera_from_json consumes.
    loaded, near, far = load_camera_from_json(json_path, 128, 128)
    np.testing.assert_allclose(np.asarray(loaded.c2w), c2w, atol=1e-5)
    assert (near, far) == (0.25, 60.0)
    np.testing.assert_allclose(
        [d["fov_deg"] for d in data], 40.0, atol=1e-5
    )


def test_glb_export_expression(monkeypatch, tmp_path):
    scene, _ = _orbit_scene(2)
    bpy = _fake_blender_run(monkeypatch, scene)

    glb = tmp_path / "out" / "scene.glb"
    blender.export_blend_to_glb("scene.blend", glb)
    assert glb.exists()
    assert bpy.calls == [
        ("export_scene.gltf", {"filepath": str(glb), "export_format": "GLB"})
    ]
    # Skip-if-exists contract (reference glb.py:6-8): no second export.
    blender.export_blend_to_glb("scene.blend", glb)
    assert len(bpy.calls) == 1


def _unit_cube_corners():
    return [Vector((x, y, z)) for x in (0, 1) for y in (0, 1) for z in (0, 1)]


def test_depth_script_node_graph_and_range(monkeypatch, tmp_path):
    """The compositor graph matches the reference structure (RLayers.Depth
    -> MapValue -> Composite.Image, fixed range with use_min/use_max) and
    the range derives from the scene bbox vs camera with 5% padding."""
    # Camera at origin looking wherever; one unit cube offset on +x.
    cube = _Object(
        "MESH",
        Matrix([[1, 0, 0, 4], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]]),
        bound_box=_unit_cube_corners(),
    )
    path = {f: np.eye(4).tolist() for f in (1, 2, 3)}
    scene = Scene(path, fov_deg=40.0, clip=(0.25, 60.0), mesh_objects=[cube])
    _fake_blender_run(monkeypatch, scene)

    out_dir = tmp_path / "depth"
    blender_depth.export_depth_frames("scene.blend", out_dir)

    assert scene.view_layers["ViewLayer"].use_pass_z is True
    assert scene.use_nodes is True
    types_ = [n.type for n in scene.node_tree.nodes]
    assert types_ == [
        "CompositorNodeRLayers", "CompositorNodeMapValue",
        "CompositorNodeComposite",
    ]
    assert scene.node_tree.links == [
        ("CompositorNodeRLayers", "Depth", "CompositorNodeMapValue", 0),
        ("CompositorNodeMapValue", 0, "CompositorNodeComposite", "Image"),
    ]
    mv = scene.node_tree.nodes[1]
    # Distances camera(origin)->cube corners: min = |(4,0,0)| = 4,
    # max = |(5,1,1)| = sqrt(27); 5% span padding on both ends.
    min_d, max_d = 4.0, np.sqrt(27.0)
    pad = (max_d - min_d) * 0.05
    lo, hi = min_d - pad, max_d + pad
    size = 1.0 / (hi - lo)
    np.testing.assert_allclose(mv.size[0], size, rtol=1e-6)
    np.testing.assert_allclose(mv.offset[0], -lo * size, rtol=1e-6)
    assert mv.use_min and mv.use_max
    assert mv.min == [0.0] and mv.max == [1.0]

    # 16-bit grayscale PNG render settings + one render per frame.
    assert scene.render.image_settings.file_format == "PNG"
    assert scene.render.image_settings.color_mode == "BW"
    assert scene.render.image_settings.color_depth == "16"
    assert scene.render.engine == "CYCLES"
    assert scene.cycles.samples == 1
    for f in (1, 2, 3):
        assert (out_dir / f"{f:04d}.png").exists()


def test_depth_script_falls_back_to_camera_clip(monkeypatch, tmp_path):
    """No mesh objects -> the range falls back to the camera clip
    interval (reference depth.py:23-34)."""
    path = {1: np.eye(4).tolist()}
    scene = Scene(path, fov_deg=40.0, clip=(0.5, 20.0))
    _fake_blender_run(monkeypatch, scene)
    blender_depth.export_depth_frames("scene.blend", tmp_path / "d")
    mv = scene.node_tree.nodes[1]
    size = 1.0 / (20.0 - 0.5)
    np.testing.assert_allclose(mv.size[0], size, rtol=1e-6)
    np.testing.assert_allclose(mv.offset[0], -0.5 * size, rtol=1e-6)

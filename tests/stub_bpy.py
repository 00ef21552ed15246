"""Test-only fake ``bpy`` / ``mathutils`` (VERDICT r4 item 6): enough of
Blender's Python API, as recording stubs, to ``exec`` the generated
scripts in scene/blender.py and scene/blender_depth.py — so an API typo
or JSON-schema drift vs load_camera_from_json surfaces in the fast lane
instead of on a user's machine. Reference surfaces mirrored:
mvadapter/test/utils/camera.py:30-59 (camera export), glb.py:9-20 (GLB
export), depth.py:6-126 (depth compositor).
"""

from __future__ import annotations

import math
import types
from pathlib import Path


class Vector:
    def __init__(self, xyz):
        self.x, self.y, self.z = (float(v) for v in xyz)

    def __sub__(self, other):
        return Vector((self.x - other.x, self.y - other.y, self.z - other.z))

    @property
    def length(self):
        return math.sqrt(self.x**2 + self.y**2 + self.z**2)

    def __iter__(self):
        return iter((self.x, self.y, self.z))


class Matrix:
    """Row-major 4x4, indexable mw[i][j] like Blender's."""

    def __init__(self, rows):
        self.rows = [[float(v) for v in r] for r in rows]

    def __getitem__(self, i):
        return self.rows[i]

    def to_translation(self):
        return Vector((self.rows[0][3], self.rows[1][3], self.rows[2][3]))

    def __matmul__(self, v: Vector):
        out = []
        for i in range(3):
            r = self.rows[i]
            out.append(r[0] * v.x + r[1] * v.y + r[2] * v.z + r[3])
        return Vector(out)


class _Socket:
    def __init__(self, node, key):
        self.node = node
        self.key = key


class _Sockets:
    def __init__(self, node):
        self.node = node

    def __getitem__(self, key):
        return _Socket(self.node, key)


class Node:
    def __init__(self, type_):
        self.type = type_
        self.inputs = _Sockets(self)
        self.outputs = _Sockets(self)
        # CompositorNodeMapValue value arrays (length-1 like Blender's).
        self.offset = [0.0]
        self.size = [1.0]
        self.min = [0.0]
        self.max = [1.0]
        self.use_min = False
        self.use_max = False


class _Nodes(list):
    def new(self, type_):
        n = Node(type_)
        self.append(n)
        return n

    def clear(self):
        del self[:]


class _Links(list):
    def new(self, out_sock, in_sock):
        self.append(
            (out_sock.node.type, out_sock.key, in_sock.node.type, in_sock.key)
        )


class _NodeTree:
    def __init__(self):
        self.nodes = _Nodes()
        self.links = _Links()


class _Attr:
    """Free-form attribute bag (render.image_settings etc.)."""


class _CameraData:
    def __init__(self, angle_deg=40.0, clip_start=0.25, clip_end=60.0):
        self.angle = math.radians(angle_deg)
        self.clip_start = clip_start
        self.clip_end = clip_end


class _Object:
    def __init__(self, type_, matrix_world, bound_box=None, data=None):
        self.type = type_
        self.matrix_world = matrix_world
        self.bound_box = bound_box or []
        self.data = data


class _ViewLayer:
    def __init__(self):
        self.use_pass_z = False


class Scene:
    def __init__(self, camera_path, fov_deg=40.0, clip=(0.25, 60.0),
                 mesh_objects=()):
        """``camera_path``: {frame: 4x4 nested list} world matrices."""
        self._camera_path = {f: Matrix(m) for f, m in camera_path.items()}
        frames = sorted(camera_path)
        self.frame_start, self.frame_end = frames[0], frames[-1]
        self.frame_current = frames[0]
        self.frames_set = []
        self.camera = _Object(
            "CAMERA", self._camera_path[frames[0]],
            data=_CameraData(fov_deg, *clip),
        )
        self.objects = [self.camera, *mesh_objects]
        self.view_layers = {"ViewLayer": _ViewLayer()}
        self.use_nodes = False
        self.node_tree = _NodeTree()
        self.render = _Attr()
        self.render.image_settings = _Attr()
        self.render.filepath = ""
        self.cycles = _Attr()

    def frame_set(self, f):
        self.frames_set.append(f)
        self.frame_current = f
        self.camera.matrix_world = self._camera_path[f]


def make_stub_bpy(scene):
    """Build (bpy_module, mathutils_module) around ``scene``. Recorded
    calls land in bpy.calls — a list of (opname, kwargs) tuples; render
    calls also touch the current ``scene.render.filepath`` target (plus
    extension when use_file_extension is set) so scripts' output-file
    expectations are observable."""
    bpy = types.ModuleType("bpy")
    bpy.calls = []

    context = types.SimpleNamespace(scene=scene)
    bpy.context = context

    def _gltf(**kw):
        bpy.calls.append(("export_scene.gltf", kw))
        Path(kw["filepath"]).write_bytes(b"glTF-stub")

    def _render(**kw):
        bpy.calls.append(("render.render", kw))
        p = scene.render.filepath
        if getattr(scene.render, "use_file_extension", False):
            fmt = getattr(scene.render.image_settings, "file_format", "PNG")
            ext = {"PNG": ".png", "JPEG": ".jpg"}.get(fmt, "")
            if not p.endswith(ext):
                p = p + ext
        Path(p).write_bytes(b"img-stub")

    bpy.ops = types.SimpleNamespace(
        export_scene=types.SimpleNamespace(gltf=_gltf),
        render=types.SimpleNamespace(render=_render),
    )

    mathutils = types.ModuleType("mathutils")
    mathutils.Vector = Vector
    mathutils.Matrix = Matrix
    return bpy, mathutils

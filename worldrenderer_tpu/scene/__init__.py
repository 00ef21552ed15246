"""Scene interchange: GLB load/save, Blender bridge, camera trajectories,
keyframes, video/frame IO.

Reference layer L7 (mvadapter/test/utils/{glb,camera,depth,keyframe,video,
file}.py) plus the GLB texture writer (mvadapter/utils/mesh_utils/
mesh.py:348-526). All host-side — nothing here enters the jitted path.
"""

from .gltf import load_glb, save_glb, replace_glb_texture
from .camera_json import build_camera, load_camera_from_json, save_camera_json
from .blender import export_blend_to_glb, export_camera_json
from .blender_depth import export_depth_frames
from .keyframe import extract_keyframes, get_keyframes
from .video import (
    export_frames,
    load_frames,
    save_frames,
    save_depth_frames_16bit,
)

__all__ = [
    "load_glb",
    "save_glb",
    "replace_glb_texture",
    "build_camera",
    "load_camera_from_json",
    "save_camera_json",
    "export_blend_to_glb",
    "export_camera_json",
    "export_depth_frames",
    "extract_keyframes",
    "get_keyframes",
    "export_frames",
    "load_frames",
    "save_frames",
    "save_depth_frames_16bit",
]

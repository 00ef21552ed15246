"""Camera-trajectory JSON interchange (Blender-exported per-frame cameras).

Reference contracts: mvadapter/test/utils/camera.py:9-113 (build_camera,
load_camera_from_json) with the same JSON schema
({frame, fov_deg, clip_start, clip_end, matrix_world}).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..camera import Camera, get_camera

__all__ = ["build_camera", "load_camera_from_json", "save_camera_json"]

# Blender -> glTF axis change-of-basis (reference camera.py:86-99).
_BLENDER_TO_GLTF = np.array(
    [
        [1, 0, 0, 0],
        [0, 0, 1, 0],
        [0, -1, 0, 0],
        [0, 0, 0, 1],
    ],
    dtype=np.float32,
)


def build_camera(num_views: int, height: int, width: int) -> Camera:
    """Default orbit rig: evenly spaced azimuths at elevation 0, distance 2.5,
    fovy 60 (reference camera.py:9-24)."""
    azimuth = np.linspace(0, 360, num_views + 1, dtype=np.float32)[:-1]
    return get_camera(
        elevation_deg=np.zeros_like(azimuth),
        distance=np.full_like(azimuth, 2.5),
        fovy_deg=np.full_like(azimuth, 60.0),
        azimuth_deg=azimuth,
        num_views=num_views,
        aspect_wh=width / height,
    )


def load_camera_from_json(
    json_path,
    height: int,
    width: int,
    max_views: int = 10**9,
    axis_convert: bool = False,
) -> Tuple[Camera, float, float]:
    """Load per-frame cameras from a Blender camera-export JSON.

    Returns (Camera batch, near, far) with near/far = median clip range
    across frames (reference camera.py:61-113)."""
    data = json.loads(Path(json_path).read_text())
    if len(data) == 0:
        raise RuntimeError("Camera json is empty.")
    data = data[:max_views]

    c2w = np.stack(
        [np.asarray(item["matrix_world"], np.float32) for item in data], axis=0
    )
    if axis_convert:
        axis = _BLENDER_TO_GLTF
        c2w = axis[None] @ c2w @ np.linalg.inv(axis)[None]
    fov = np.asarray([item["fov_deg"] for item in data], np.float32)
    clip_start = np.asarray(
        [item.get("clip_start", 0.1) for item in data], np.float32
    )
    clip_end = np.asarray([item.get("clip_end", 100.0) for item in data], np.float32)

    cam = get_camera(c2w=jnp.asarray(c2w), fovy_deg=fov, aspect_wh=width / height)

    near = float(np.median(clip_start))
    far = float(np.median(clip_end))
    if far <= near + 1e-6:
        near, far = 0.1, 100.0
    return cam, near, far


def save_camera_json(
    json_path,
    c2w: np.ndarray,
    fov_deg,
    clip_start: float = 0.1,
    clip_end: float = 100.0,
) -> None:
    """Write a camera trajectory in the same JSON schema the Blender bridge
    produces — lets pipelines round-trip synthetic rigs through the same
    loader used for real scenes."""
    c2w = np.asarray(c2w, np.float64)
    fov_deg = np.broadcast_to(np.asarray(fov_deg, np.float64), (len(c2w),))
    data = [
        {
            "frame": int(i + 1),
            "fov_deg": float(fov_deg[i]),
            "clip_start": float(clip_start),
            "clip_end": float(clip_end),
            "matrix_world": c2w[i].tolist(),
        }
        for i in range(len(c2w))
    ]
    path = Path(json_path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(data))

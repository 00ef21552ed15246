"""Video/frame IO: video -> float frame stacks, 8-bit and 16-bit PNG savers.

Reference contracts: mvadapter/test/utils/video.py:7-54 (export_frames,
load_frames) and mvadapter/test/utils/file.py:6-18 (save_frames,
save_depth_frames_16bit).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

__all__ = ["export_frames", "load_frames", "save_frames", "save_depth_frames_16bit"]


def export_frames(video_path, output_dir, frame_offset: int = 0) -> None:
    """Dump every video frame to PNG with an optional index offset
    (reference video.py:7-29)."""
    import cv2

    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        raise RuntimeError(f"Failed to open video: {video_path}")
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    os.makedirs(output_dir, exist_ok=True)
    for frame_idx in range(total):
        target = frame_idx + frame_offset
        if target < 0 or target >= total:
            continue
        cap.set(cv2.CAP_PROP_POS_FRAMES, target)
        ok, frame = cap.read()
        if not ok:
            continue
        out_path = Path(output_dir) / f"frame_{frame_idx:05d}.png"
        cv2.imwrite(str(out_path), frame)
    cap.release()


def load_frames(
    video_path, frame_offset: int = -1, frame_step: int = 1, max_frames: int = -1
) -> np.ndarray:
    """Load video frames as (N, H, W, 3) float32 in [0, 1]
    (reference video.py:31-54)."""
    import cv2

    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        raise RuntimeError(f"Failed to open video: {video_path}")
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    frames = []
    idx = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        target = idx + frame_offset
        if target < 0 or target >= total:
            idx += 1
            continue
        if idx % frame_step == 0:
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            if 0 < max_frames <= len(frames):
                break
        idx += 1
    cap.release()
    if not frames:
        raise RuntimeError("No frames loaded from video.")
    return np.stack(frames, axis=0).astype(np.float32) / 255.0


def _to_uint8(frame: np.ndarray) -> np.ndarray:
    arr = np.asarray(frame)
    if arr.dtype in (np.float32, np.float64, np.float16):
        arr = (np.clip(arr, 0.0, 1.0) * 255).astype(np.uint8)
    elif arr.dtype == np.bool_:
        arr = arr.astype(np.uint8) * 255
    return arr


def save_frames(frames, out_dir, prefix: str) -> None:
    """Save (N, H, W, C) frames as 8-bit PNGs (reference file.py:6-9)."""
    from PIL import Image

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for i, frame in enumerate(frames):
        Image.fromarray(_to_uint8(frame)).save(out_dir / f"{prefix}_{i:05d}.png")


def save_depth_frames_16bit(frames, out_dir, prefix: str) -> None:
    """Save (N, H, W) depth maps in [0,1] as 16-bit PNGs
    (reference file.py:11-18)."""
    from PIL import Image

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    for i, frame in enumerate(frames):
        arr = np.clip(np.asarray(frame), 0.0, 1.0)
        arr16 = (arr * 65535.0 + 0.5).astype(np.uint16)
        Image.fromarray(arr16, mode="I;16").save(out_dir / f"{prefix}_{i:05d}.png")

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


def _open_video(video_path):
    import cv2

    cap = cv2.VideoCapture(str(video_path))
    if not cap.isOpened():
        raise RuntimeError(f"Failed to open video: {video_path}")
    return cap, int(cap.get(cv2.CAP_PROP_FRAME_COUNT))


def export_frames(video_path, output_dir, frame_offset: int = 0) -> None:
    """Dump video frames to ``frame_{i:05d}.png``, where output index i maps
    to source frame i + frame_offset; pairs falling outside the video are
    skipped (output semantics of reference video.py:7-29).

    The valid output indices form one contiguous run, so a single seek to
    the first source frame plus sequential reads replaces per-frame seeking.
    """
    import cv2

    cap, total = _open_video(video_path)
    # i valid  <=>  0 <= i < total  and  0 <= i + frame_offset < total
    first = max(0, -frame_offset)
    last = min(total, total - frame_offset)  # exclusive
    os.makedirs(output_dir, exist_ok=True)
    if first + frame_offset > 0:
        cap.set(cv2.CAP_PROP_POS_FRAMES, first + frame_offset)
    for i in range(first, last):
        ok, frame = cap.read()
        if ok:
            cv2.imwrite(str(Path(output_dir) / f"frame_{i:05d}.png"), frame)
    cap.release()


def load_frames(
    video_path, frame_offset: int = -1, frame_step: int = 1, max_frames: int = -1
) -> np.ndarray:
    """Load video frames as (N, H, W, 3) float32 in [0, 1].

    Keeps frame k iff k is a multiple of ``frame_step`` AND k + frame_offset
    is a valid frame index, up to ``max_frames`` kept frames — the exact
    selection of reference video.py:31-54 (note the offset *gates* which
    frames are kept; the pixel data is always frame k itself). The wanted
    index set is computed up front and frames are read sequentially.
    """
    import cv2

    cap, total = _open_video(video_path)
    wanted = {
        k
        for k in range(0, total, max(1, frame_step))
        if 0 <= k + frame_offset < total
    }
    if max_frames > 0:
        wanted = set(sorted(wanted)[:max_frames])
    frames = []
    for k in range(max(wanted) + 1 if wanted else 0):
        ok, frame = cap.read()
        if not ok:
            break
        if k in wanted:
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
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

"""Background segmentation (foreground matting) used as an optional mask
source for projection.

Reference contract: mvadapter/utils/mesh_utils/seg.py:9-38 (RMBG via
transformers). The network stays a host-side pluggable callable — it is an
external pretrained model, not part of the TPU compute path — and a simple
chroma/luma-threshold matting fallback is provided for fully self-contained
runs without model weights.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Optional

import jax.numpy as jnp
import numpy as np

__all__ = ["SegmentationModel", "RMBGModel", "ThresholdMatting"]


class SegmentationModel(ABC):
    """(Nv, H, W, C) float images in [0,1] -> (Nv, H, W, 1) float matte."""

    @abstractmethod
    def __call__(self, images) -> jnp.ndarray: ...


class ThresholdMatting(SegmentationModel):
    """Weightless fallback: foreground = pixels far from a given background
    color. Useful for synthetic renders with a known background."""

    def __init__(self, bg_color=(0.5, 0.5, 0.5), threshold: float = 0.05):
        self.bg_color = np.asarray(bg_color, np.float32)
        self.threshold = threshold

    def __call__(self, images) -> jnp.ndarray:
        images = jnp.asarray(images, jnp.float32)
        dist = jnp.linalg.norm(images[..., :3] - self.bg_color, axis=-1)
        return (dist > self.threshold).astype(jnp.float32)[..., None]


class RMBGModel(SegmentationModel):
    """RMBG matting via transformers (reference seg.py:18-38). Runs on host
    CPU/torch; only the resulting matte enters the TPU path."""

    def __init__(self, pretrained_model_name_or_path: str, device: str = "cpu"):
        import torch  # host-side only
        import transformers

        self.torch = torch
        self.model = transformers.AutoModelForImageSegmentation.from_pretrained(
            pretrained_model_name_or_path, trust_remote_code=True
        ).to(device)
        self.device = device

    def __call__(self, images) -> jnp.ndarray:
        torch = self.torch
        x = torch.as_tensor(np.asarray(images), dtype=torch.float32, device=self.device)
        batched = x.ndim == 4
        if not batched:
            x = x[None]
        with torch.no_grad():
            out = self.model(x.permute(0, 3, 1, 2) - 0.5)[0][0]
        out = out.clamp(0.0, 1.0).permute(0, 2, 3, 1).cpu().numpy()
        if not batched:
            out = out[0]
        return jnp.asarray(out)

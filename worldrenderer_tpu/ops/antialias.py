"""Silhouette-edge antialiasing (nvdiffrast-antialias equivalent).

Contract: mvadapter/utils/mesh_utils/render.py:122-149 — blend attribute
values across silhouette edges (pixels where the triangle id changes and one
side is background or a different surface). Only used behind the default-off
``antialias_attr`` flag in the reference (render.py:232, render.py:270).

TPU-native approximation: instead of nvdiffrast's analytic edge-distance
blend (which needs per-edge geometry walks — gather-heavy), detect
silhouette pixels from the id map and blend with a coverage estimate from
the depth/id discontinuity structure. This is a screen-space pass: pure
elementwise + shifts, fully fused by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["antialias"]


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift (B, H, W, ...) by (dy, dx) with edge replication."""
    if dy:
        pad = [(0, 0), (max(dy, 0), max(-dy, 0)), (0, 0)] + [(0, 0)] * (x.ndim - 3)
        x = jnp.pad(x, pad, mode="edge")
        x = x[:, : x.shape[1] - abs(dy)] if dy > 0 else x[:, abs(dy):]
    if dx:
        pad = [(0, 0), (0, 0), (max(dx, 0), max(-dx, 0))] + [(0, 0)] * (x.ndim - 3)
        x = jnp.pad(x, pad, mode="edge")
        x = x[:, :, : x.shape[2] - abs(dx)] if dx > 0 else x[:, :, abs(dx):]
    return x


def antialias(
    color: jnp.ndarray,
    rast: jnp.ndarray,
    strength: float = 0.5,
) -> jnp.ndarray:
    """Antialias ``color`` (B, H, W, C) along silhouette edges of ``rast``
    (B, H, W, 4, from :func:`..rasterize`).

    A pixel is a silhouette pixel when its triangle id differs from a
    4-neighbor and the ids are not part of the same connected surface
    (approximated by an id difference with background or a depth jump).
    Such pixels are blended half-way toward the neighbor across the edge,
    matching nvdiffrast's ~0.5-coverage assumption at silhouettes.
    """
    tid = rast[..., 3].astype(jnp.int32)
    z = rast[..., 2]

    out = color
    total_w = jnp.ones_like(z)
    accum = color.copy()
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        tid_n = _shift(tid, dy, dx)
        z_n = _shift(z, dy, dx)
        col_n = _shift(color, dy, dx)
        # Silhouette: id changes AND (either side is background or the depth
        # gap is large relative to local scale).
        diff_id = tid_n != tid
        bg_edge = (tid == 0) | (tid_n == 0)
        depth_jump = jnp.abs(z_n - z) > 1e-3
        sil = diff_id & (bg_edge | depth_jump)
        w = sil.astype(color.dtype) * strength * 0.25
        accum = accum + col_n * w[..., None]
        total_w = total_w + w
    return accum / total_w[..., None]

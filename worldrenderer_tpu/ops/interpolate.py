"""Barycentric attribute interpolation (nvdiffrast-interpolate equivalent).

Contract: mvadapter/utils/mesh_utils/render.py:64-81.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["interpolate"]


def interpolate(attr: jnp.ndarray, rast: jnp.ndarray, tri: jnp.ndarray) -> jnp.ndarray:
    """Interpolate vertex attributes over the rasterized image.

    attr: (B, V, C) or (1, V, C) float32 (broadcast over the batch axis).
    rast: (B, H, W, 4) output of :func:`rasterize`.
    tri:  (T, 3) int32.

    Returns (B, H, W, C); background pixels are 0 (nvdiffrast semantics).
    """
    attr = jnp.asarray(attr, jnp.float32)
    if attr.ndim != 3:
        raise ValueError("attr must be (B, V, C)")
    tri = tri.astype(jnp.int32)
    b = rast.shape[0]
    if attr.shape[0] == 1 and b > 1:
        attr = jnp.broadcast_to(attr, (b,) + attr.shape[1:])

    u = rast[..., 0]
    v = rast[..., 1]
    idx = rast[..., 3].astype(jnp.int32)  # tri_id + 1, 0 = bg
    t = jnp.maximum(idx - 1, 0)  # (B, H, W)
    verts = tri[t]  # (B, H, W, 3)

    def gather_one(attr_b, verts_b):
        return attr_b[verts_b]  # (H, W, 3, C)

    a = jax.vmap(gather_one)(attr, verts)  # (B, H, W, 3, C)
    w0 = (1.0 - u - v)[..., None]
    w1 = u[..., None]
    w2 = v[..., None]
    out = a[..., 0, :] * w0 + a[..., 1, :] * w1 + a[..., 2, :] * w2
    mask = (idx > 0)[..., None]
    return jnp.where(mask, out, 0.0)

"""Barycentric attribute interpolation (nvdiffrast-interpolate equivalent).

Contract: mvadapter/utils/mesh_utils/render.py:64-81, including the optional
image-space attribute derivatives (rast_db + diff_attrs -> second output of
shape (B, H, W, 2 * len(diff_attrs)) with channels (dA/dX, dA/dY) per
selected attribute).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

__all__ = ["interpolate"]


def interpolate(
    attr: jnp.ndarray,
    rast: jnp.ndarray,
    tri: jnp.ndarray,
    rast_db: Optional[jnp.ndarray] = None,
    diff_attrs: Optional[Union[str, Sequence[int]]] = None,
):
    """Interpolate vertex attributes over the rasterized image.

    attr: (B, V, C) or (1, V, C) float32 (broadcast over the batch axis).
    rast: (B, H, W, 4) output of :func:`rasterize`.
    tri:  (T, 3) int32.
    rast_db: (B, H, W, 4) barycentric derivatives from :func:`rasterize_db`.
    diff_attrs: attribute indices to differentiate ('all' = every channel).

    Returns (B, H, W, C); background pixels are 0 (nvdiffrast semantics).
    With rast_db + diff_attrs, returns a tuple (out, out_da) where out_da is
    (B, H, W, 2 * len(diff_attrs)): since A = a0 + u*(a1-a0) + v*(a2-a0),
    dA/dX = (a1-a0)*du/dX + (a2-a0)*dv/dX exactly.
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
    out = jnp.where(mask, out, 0.0)
    if diff_attrs is None:
        return out

    if rast_db is None:
        raise ValueError("diff_attrs requires rast_db (use rasterize_db)")
    if isinstance(diff_attrs, str):
        if diff_attrs != "all":
            raise ValueError(f"unknown diff_attrs {diff_attrs!r}")
        sel = list(range(attr.shape[-1]))
    else:
        sel = list(diff_attrs)
    da_u = a[..., 1, sel] - a[..., 0, sel]  # (B, H, W, S)
    da_v = a[..., 2, sel] - a[..., 0, sel]
    du_dx = rast_db[..., 0:1]
    du_dy = rast_db[..., 1:2]
    dv_dx = rast_db[..., 2:3]
    dv_dy = rast_db[..., 3:4]
    d_dx = da_u * du_dx + da_v * dv_dx  # (B, H, W, S)
    d_dy = da_u * du_dy + da_v * dv_dy
    out_da = jnp.stack([d_dx, d_dy], axis=-1).reshape(
        d_dx.shape[:-1] + (2 * len(sel),)
    )
    out_da = jnp.where(mask, out_da, 0.0)
    return out, out_da

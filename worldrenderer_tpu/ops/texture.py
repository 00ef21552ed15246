"""UV texture sampling (nvdiffrast-texture equivalent).

Contract: mvadapter/utils/mesh_utils/render.py:83-120. The reference only
exercises 'linear' / 'nearest' filter modes (render.py:236,
smart_paint.py:110); mip-mapped modes are not implemented.

Convention: uv in [0, 1]^2, texel (ix, iy) center at ((ix+0.5)/W, (iy+0.5)/H),
texture row 0 is v~=0 (matches nvdiffrast).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["texture"]


def _boundary(idx: jnp.ndarray, size: int, mode: str) -> jnp.ndarray:
    if mode == "wrap":
        return jnp.mod(idx, size)
    if mode in ("clamp", "zero"):
        return jnp.clip(idx, 0, size - 1)
    raise ValueError(f"unknown boundary_mode {mode!r}")


def texture(
    tex: jnp.ndarray,
    uv: jnp.ndarray,
    filter_mode: str = "linear",
    boundary_mode: str = "wrap",
) -> jnp.ndarray:
    """Sample a 2D texture.

    tex: (B, TH, TW, C) or (1, TH, TW, C) float32 (broadcast over batch).
    uv:  (B, H, W, 2) float32 texture coordinates.

    Returns (B, H, W, C).
    """
    tex = jnp.asarray(tex, jnp.float32)
    uv = jnp.asarray(uv, jnp.float32)
    if filter_mode == "auto":
        filter_mode = "linear"
    b = uv.shape[0]
    if tex.shape[0] == 1 and b > 1:
        tex = jnp.broadcast_to(tex, (b,) + tex.shape[1:])
    th, tw = tex.shape[1], tex.shape[2]

    x = uv[..., 0] * tw - 0.5
    y = uv[..., 1] * th - 0.5

    def sample(tex_b, ix, iy, in_range):
        out = tex_b[iy, ix]  # (H, W, C)
        if boundary_mode == "zero":
            out = jnp.where(in_range[..., None], out, 0.0)
        return out

    if filter_mode == "nearest":
        ix = jnp.floor(x + 0.5).astype(jnp.int32)
        iy = jnp.floor(y + 0.5).astype(jnp.int32)
        in_range = (ix >= 0) & (ix < tw) & (iy >= 0) & (iy < th)
        ixc = _boundary(ix, tw, boundary_mode)
        iyc = _boundary(iy, th, boundary_mode)
        return jax.vmap(sample)(tex, ixc, iyc, in_range)

    if filter_mode != "linear":
        raise NotImplementedError(f"filter_mode {filter_mode!r} not supported")

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0.astype(jnp.float32))[..., None]
    fy = (y - y0.astype(jnp.float32))[..., None]

    out = 0.0
    for dy_, wy in ((0, None), (1, None)):
        for dx_, wx in ((0, None), (1, None)):
            ix = x0 + dx_
            iy = y0 + dy_
            in_range = (ix >= 0) & (ix < tw) & (iy >= 0) & (iy < th)
            ixc = _boundary(ix, tw, boundary_mode)
            iyc = _boundary(iy, th, boundary_mode)
            t = jax.vmap(sample)(tex, ixc, iyc, in_range)
            wgt = (fx if dx_ else 1.0 - fx) * (fy if dy_ else 1.0 - fy)
            out = out + t * wgt
    return out

"""Bilinear / nearest sampling at normalized device coordinates —
``torch.nn.functional.grid_sample(align_corners=False, padding_mode='zeros')``
semantics, expressed as pure jnp gathers (the cuDNN-free TPU equivalent).

Used wherever the reference grid_samples view maps back into UV space
(mvadapter/utils/mesh_utils/uv.py:143-169, uv.py:200-218, warp.py:180-185).

Layout note: unlike torch (NCHW + grid (N, Hg, Wg, 2)), we take channels-last
images (N, H, W, C) and return (N, Hg, Wg, C) — avoiding the permute dance of
the reference and keeping the lane dimension contiguous for the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["grid_sample"]


def grid_sample(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
) -> jnp.ndarray:
    """Sample ``image`` (N, H, W, C) at ``grid`` (N, Hg, Wg, 2) NDC coords
    in [-1, 1] (x, y order). align_corners=False; out-of-bounds reads 0.
    """
    image = jnp.asarray(image, jnp.float32)
    grid = jnp.asarray(grid, jnp.float32)
    n, h, w, _ = image.shape

    # align_corners=False: ix = ((x + 1) * W - 1) / 2
    x = (grid[..., 0] + 1.0) * (w * 0.5) - 0.5
    y = (grid[..., 1] + 1.0) * (h * 0.5) - 0.5

    def gather(img, iy, ix, valid):
        iyc = jnp.clip(iy, 0, h - 1)
        ixc = jnp.clip(ix, 0, w - 1)
        out = img[iyc, ixc]
        return jnp.where(valid[..., None], out, 0.0)

    if mode == "nearest":
        # torch grid_sample 'nearest' rounds half away via floor(x + 0.5)?
        # torch uses std::nearbyint (round half to even); jnp.round matches.
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        return jax.vmap(gather)(image, iy, ix, valid)

    if mode == "bicubic":
        return _bicubic(image, x, y, gather)

    if mode != "bilinear":
        raise NotImplementedError(f"grid_sample mode {mode!r}")

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0.astype(jnp.float32)
    fy = y - y0.astype(jnp.float32)

    out = 0.0
    for dy_ in (0, 1):
        for dx_ in (0, 1):
            ix = x0 + dx_
            iy = y0 + dy_
            valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
            t = jax.vmap(gather)(image, iy, ix, valid)
            wgt = ((fx if dx_ else 1.0 - fx) * (fy if dy_ else 1.0 - fy))[..., None]
            out = out + t * wgt
    return out


def _cubic_weights(t: jnp.ndarray, a: float = -0.75):
    """Cubic convolution weights for taps at offsets -1, 0, 1, 2 relative to
    floor(x) (torch bicubic grid_sample kernel, a = -0.75)."""
    t2 = t * t
    t3 = t2 * t
    w_m1 = a * (t3 - 2 * t2 + t)
    w_0 = (a + 2) * t3 - (a + 3) * t2 + 1
    w_1 = -(a + 2) * t3 + (2 * a + 3) * t2 - a * t
    w_2 = a * (t2 - t3)
    return (w_m1, w_0, w_1, w_2)


def _bicubic(image, x, y, gather):
    n, h, w = image.shape[0], image.shape[1], image.shape[2]
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    wx = _cubic_weights(x - x0.astype(jnp.float32))
    wy = _cubic_weights(y - y0.astype(jnp.float32))
    out = 0.0
    for j, wyj in enumerate(wy):
        for i, wxi in enumerate(wx):
            ix = x0 + (i - 1)
            iy = y0 + (j - 1)
            valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
            t = jax.vmap(gather)(image, iy, ix, valid)
            out = out + t * (wxi * wyj)[..., None]
    return out

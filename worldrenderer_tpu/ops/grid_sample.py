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
    pack_mode: str = "none",
) -> jnp.ndarray:
    """Sample ``image`` (N, H, W, C) at ``grid`` (N, Hg, Wg, 2) NDC coords
    in [-1, 1] (x, y order). align_corners=False; out-of-bounds reads 0.

    pack_mode='u8' (bilinear only): gather the 2x2 taps as bit-packed
    uint32 words — EXACT iff every pixel value is k/255 (image-file
    sources, e.g. video frames). The gather emitter's cost is per-row
    with an element term (see ops/texture.py), so 3 words beat 12 f32
    columns. Do NOT use on continuous-valued maps (positions, depths).
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
    fx = (x - x0.astype(jnp.float32))[..., None]
    fy = (y - y0.astype(jnp.float32))[..., None]

    # ONE fused gather of all four bilinear taps per sample: random row
    # gathers are latency-bound on TPU (~12 ns each on v5e), so a zero-padded
    # QUAD TABLE holding each texel's 2x2 neighborhood contiguously halves
    # the dominant cost of UV-scale sampling (same trick as ops/texture.py).
    c_ch = image.shape[-1]
    src = image
    if pack_mode == "u8":
        src = jnp.clip(jnp.round(image * 255.0), 0.0, 255.0).astype(jnp.uint8)
    elif pack_mode != "none":
        raise ValueError(f"unknown pack_mode {pack_mode!r}")
    p = jnp.pad(src, [(0, 0), (1, 1), (1, 1), (0, 0)])
    quad = jnp.concatenate(
        [p[:, :-1, :-1], p[:, :-1, 1:], p[:, 1:, :-1], p[:, 1:, 1:]],
        axis=-1,
    )  # (N, H+1, W+1, 4C); row (y+1, x+1) = taps of (y, x)
    qh, qw = h + 1, w + 1
    flat = jnp.clip(y0 + 1, 0, h) * qw + jnp.clip(x0 + 1, 0, w)
    if pack_mode == "u8":
        from .texture import _pack_u8_words, _unpack_u8_words

        table = _pack_u8_words(quad.reshape(n, qh, qw, 4 * c_ch))
    else:
        table = quad.reshape(n, qh * qw, 4 * c_ch)

    def quad_gather(table_b, flat_b):
        return table_b[flat_b]

    taps = jax.vmap(quad_gather)(table, flat)  # (N, Hg, Wg, cols)
    if pack_mode == "u8":
        taps = _unpack_u8_words(taps, 4 * c_ch)
    in_x0 = ((x0 >= 0) & (x0 < w))[..., None]
    in_x1 = ((x0 + 1 >= 0) & (x0 + 1 < w))[..., None]
    in_y0 = ((y0 >= 0) & (y0 < h))[..., None]
    in_y1 = ((y0 + 1 >= 0) & (y0 + 1 < h))[..., None]
    return (
        taps[..., 0 * c_ch : 1 * c_ch] * ((1 - fx) * (1 - fy) * (in_x0 & in_y0))
        + taps[..., 1 * c_ch : 2 * c_ch] * (fx * (1 - fy) * (in_x1 & in_y0))
        + taps[..., 2 * c_ch : 3 * c_ch] * ((1 - fx) * fy * (in_x0 & in_y1))
        + taps[..., 3 * c_ch : 4 * c_ch] * (fx * fy * (in_x1 & in_y1))
    )


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

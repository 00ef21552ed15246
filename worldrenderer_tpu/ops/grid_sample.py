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

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["grid_sample", "grid_sample_parts"]


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

    return grid_sample_parts([(image, pack_mode)], grid)


# Flatten batched quad tables into one 2D (N*qh*qw, cols) gather operand
# (module flag so tools/ A/B scripts can monkeypatch the vmapped variant).
_FLAT_BATCH_GATHER = True


def grid_sample_parts(
    parts: Sequence[Tuple[jnp.ndarray, str]],
    grid: jnp.ndarray,
) -> jnp.ndarray:
    """Bilinear grid_sample of SEVERAL same-resolution images with ONE row
    gather. The TPU gather emitter's cost is per-row with a small
    per-element term, so N separate grid_sample calls at the same coords
    pay N times the dominant row cost for nothing; this packs every
    part's 2x2-tap quad row into one table row (f32 columns for
    pack_mode='none' parts, byte-packed uint32 words for 'u8' parts) and
    splits after the gather. Per-channel results are bit-identical to
    separate grid_sample calls. Returns the channel-concatenation of the
    parts' samples.

    parts: sequence of ((N, H, W, C_i) image, pack_mode) with shared
    (N, H, W); grid: (N, Hg, Wg, 2) NDC as in :func:`grid_sample`.
    """
    from .texture import _pack_u8_words, _quantize_u8, _unpack_u8_words

    assert parts, "grid_sample_parts needs at least one part"
    images = [jnp.asarray(im, jnp.float32) for im, _ in parts]
    modes = [pm for _, pm in parts]
    n, h, w = images[0].shape[:3]
    for im in images[1:]:
        assert im.shape[:3] == (n, h, w), (
            "all parts must share (N, H, W): "
            f"{[tuple(i.shape) for i in images]}"
        )
    grid = jnp.asarray(grid, jnp.float32)
    x = (grid[..., 0] + 1.0) * (w * 0.5) - 0.5
    y = (grid[..., 1] + 1.0) * (h * 0.5) - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0.astype(jnp.float32))[..., None]
    fy = (y - y0.astype(jnp.float32))[..., None]

    qh, qw = h + 1, w + 1
    flat = jnp.clip(y0 + 1, 0, h) * qw + jnp.clip(x0 + 1, 0, w)

    def quad_of(src):
        p = jnp.pad(src, [(0, 0), (1, 1), (1, 1), (0, 0)])
        return jnp.concatenate(
            [p[:, :-1, :-1], p[:, :-1, 1:], p[:, 1:, :-1], p[:, 1:, 1:]],
            axis=-1,
        )  # (N, H+1, W+1, 4C); row (y+1, x+1) = taps of (y, x)

    # Merge all parts of a pack mode into ONE image BEFORE the quad-table
    # build: per-part tables concatenated column-wise traced 6x slower
    # than a single-source quad table of the same total width (the gather
    # operand's provenance/layout matters to the emitter, not just its
    # column count — measured on the uv2048 projection). With both modes
    # present the two group tables ride one uint32 table via bitcast
    # (pure bit movement — no float canonicalization risk).
    for pm in modes:
        if pm not in ("none", "u8"):
            raise ValueError(f"unknown pack_mode {pm!r}")
    f32_ims = [im for im, pm in zip(images, modes) if pm == "none"]
    u8_ims = [im for im, pm in zip(images, modes) if pm == "u8"]
    groups = []  # (kind, 4C_total, ncols, table (N, qh, qw, ncols))
    if f32_ims:
        im = f32_ims[0] if len(f32_ims) == 1 else jnp.concatenate(
            f32_ims, axis=-1
        )
        q = quad_of(im)
        if u8_ims:
            q = jax.lax.bitcast_convert_type(q, jnp.uint32)
        groups.append(("f32", 4 * im.shape[-1], q.shape[-1], q))
    if u8_ims:
        im = u8_ims[0] if len(u8_ims) == 1 else jnp.concatenate(
            u8_ims, axis=-1
        )
        src = _quantize_u8(im)
        words = _pack_u8_words(quad_of(src)).reshape(n, qh, qw, -1)
        groups.append(("u8", 4 * im.shape[-1], words.shape[-1], words))
    if len(groups) == 1:
        table = groups[0][3].reshape(n, qh * qw, -1)
    else:
        table = jnp.concatenate(
            [g[3] for g in groups], axis=-1
        ).reshape(n, qh * qw, -1)

    # Flat 2D gather with global row offsets instead of a vmapped batched
    # gather: a batched (N, qh*qw, cols) operand can get a PLANAR layout
    # where every gathered row costs `cols` separate HBM transactions
    # (traced 2.2x per row on the raw-1M record gather; see docs/PERF.md).
    # Flattening the batch into the row dim keeps rows contiguous.
    # Bit-identical: same rows, same order.
    if _FLAT_BATCH_GATHER and n > 1:
        cols = table.shape[-1]
        goff = jnp.arange(n, dtype=jnp.int32).reshape(
            (n,) + (1,) * (flat.ndim - 1)
        ) * (qh * qw)
        taps_all = table.reshape(n * qh * qw, cols)[
            (flat + goff).reshape(-1)
        ].reshape(flat.shape + (cols,))
    else:
        taps_all = jax.vmap(lambda t, f: t[f])(table, flat)
    # (N, Hg, Wg, cols)
    # Pin the gather result before its consumers: layout assignment once
    # chose a transposed {0,1} root layout for the fused multi-part
    # gather (a (25M, cols) reshape written column-major — traced at 6x
    # the gather's own cost); the barrier keeps the natural row-major
    # result as the fusion boundary.
    taps_all = jax.lax.optimization_barrier(taps_all)

    in_x0 = ((x0 >= 0) & (x0 < w))[..., None]
    in_x1 = ((x0 + 1 >= 0) & (x0 + 1 < w))[..., None]
    in_y0 = ((y0 >= 0) & (y0 < h))[..., None]
    in_y1 = ((y0 + 1 >= 0) & (y0 + 1 < h))[..., None]
    w00 = (1 - fx) * (1 - fy) * (in_x0 & in_y0)
    w01 = fx * (1 - fy) * (in_x1 & in_y0)
    w10 = (1 - fx) * fy * (in_x0 & in_y1)
    w11 = fx * fy * (in_x1 & in_y1)

    mixed = len(groups) > 1
    group_out = {}
    at = 0
    for kind, k4, ncol, _ in groups:
        taps = taps_all[..., at : at + ncol]
        at += ncol
        if kind == "u8":
            taps = _unpack_u8_words(taps, k4)
        elif mixed:
            taps = jax.lax.bitcast_convert_type(taps, jnp.float32)
        c_ch = k4 // 4
        group_out[kind] = (
            taps[..., 0 * c_ch : 1 * c_ch] * w00
            + taps[..., 1 * c_ch : 2 * c_ch] * w01
            + taps[..., 2 * c_ch : 3 * c_ch] * w10
            + taps[..., 3 * c_ch : 4 * c_ch] * w11
        )
    # Reassemble per-part outputs in the caller's part order.
    offs = {"f32": 0, "u8": 0}
    outs = []
    for im, pm in zip(images, modes):
        kind = "f32" if pm == "none" else "u8"
        c_ch = im.shape[-1]
        o = offs[kind]
        outs.append(group_out[kind][..., o : o + c_ch])
        offs[kind] = o + c_ch
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


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

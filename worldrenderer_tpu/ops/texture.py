"""UV texture sampling (nvdiffrast-texture equivalent).

Contract: mvadapter/utils/mesh_utils/render.py:83-120. The reference only
exercises 'linear' / 'nearest' filter modes (render.py:236,
smart_paint.py:110); mip-mapped modes are not implemented.

Convention: uv in [0, 1]^2, texel (ix, iy) center at ((ix+0.5)/W, (iy+0.5)/H),
texture row 0 is v~=0 (matches nvdiffrast).

Performance: random row gathers on TPU are latency-bound (~12 ns per 3-4
column row on v5e, measured), so bilinear's four taps as four separate
gathers cost ~50 ns/pixel. The linear path instead precomputes a QUAD
TABLE holding each texel's 2x2 neighborhood contiguously (4C columns) and
fetches all four taps with ONE row gather (~2x total win; table build is a
bandwidth-bound pass over 4x the texture, negligible against the gathers
it replaces).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = ["texture", "texture_construct_mip"]


def _boundary(idx: jnp.ndarray, size: int, mode: str) -> jnp.ndarray:
    if mode == "wrap":
        return jnp.mod(idx, size)
    if mode in ("clamp", "zero"):
        return jnp.clip(idx, 0, size - 1)
    raise ValueError(f"unknown boundary_mode {mode!r}")


def _quad_table(tex: jnp.ndarray, boundary_mode: str):
    """(B, TH, TW, C) -> (B, QH, QW, 4C) where row (y, x) holds the taps
    [t(y,x), t(y,x+1), t(y+1,x), t(y+1,x+1)] under the boundary mode.

    wrap: neighbors wrap (rolled copies), gather index = mod(x0, tw).
    clamp/zero: the texture is edge-/zero-padded by one texel on each side
    so the straddling taps of x0 = -1 and x0 = tw-1 come out right; gather
    index = clip(x0 + 1, 0, tw). Far-out-of-range indices clamp onto the
    border, which IS clamp semantics; zero mode masks them via weights.
    """
    if boundary_mode == "wrap":
        tx = jnp.roll(tex, -1, axis=2)
        ty = jnp.roll(tex, -1, axis=1)
        txy = jnp.roll(tx, -1, axis=1)
        return jnp.concatenate([tex, tx, ty, txy], axis=-1)
    pad_mode = "edge" if boundary_mode == "clamp" else "constant"
    p = jnp.pad(tex, [(0, 0), (1, 1), (1, 1), (0, 0)], mode=pad_mode)
    return jnp.concatenate(
        [p[:, :-1, :-1], p[:, :-1, 1:], p[:, 1:, :-1], p[:, 1:, 1:]],
        axis=-1,
    )


def _blend_taps(taps, fx, fy, c_ch, zero_masks=None):
    """Combine a fused quad gather's four taps with bilinear weights.
    ``zero_masks``: (in_x0, in_x1, in_y0, in_y1) per-tap validity for the
    'zero' boundary mode (kills clamped-index taps that aliased a live
    texel); None otherwise."""
    w00 = (1.0 - fx) * (1.0 - fy)
    w01 = fx * (1.0 - fy)
    w10 = (1.0 - fx) * fy
    w11 = fx * fy
    if zero_masks is not None:
        in_x0, in_x1, in_y0, in_y1 = zero_masks
        w00 = w00 * (in_x0 & in_y0)
        w01 = w01 * (in_x1 & in_y0)
        w10 = w10 * (in_x0 & in_y1)
        w11 = w11 * (in_x1 & in_y1)
    return (
        taps[..., 0 * c_ch : 1 * c_ch] * w00
        + taps[..., 1 * c_ch : 2 * c_ch] * w01
        + taps[..., 2 * c_ch : 3 * c_ch] * w10
        + taps[..., 3 * c_ch : 4 * c_ch] * w11
    )


def texture_construct_mip(
    tex: jnp.ndarray, max_mip_level: Optional[int] = None
) -> list:
    """Mipmap stack for :func:`texture` (nvdiffrast texture_construct_mip
    equivalent; reference render.py:83-120 documents the contract). The base
    level is NOT included. Levels are 2x2 box-filtered averages; the chain
    stops when either dimension turns odd (or at max_mip_level)."""
    tex = jnp.asarray(tex)
    if tex.dtype != jnp.bfloat16:
        tex = tex.astype(jnp.float32)
    levels = []
    t = tex
    th, tw = t.shape[1], t.shape[2]
    while (
        th % 2 == 0 and tw % 2 == 0 and th >= 2 and tw >= 2
        and (max_mip_level is None or len(levels) < max_mip_level)
    ):
        t = 0.25 * (
            t[:, 0::2, 0::2] + t[:, 0::2, 1::2]
            + t[:, 1::2, 0::2] + t[:, 1::2, 1::2]
        )
        th //= 2
        tw //= 2
        levels.append(t)
    return levels


def texture(
    tex: jnp.ndarray,
    uv: jnp.ndarray,
    uv_da: Optional[jnp.ndarray] = None,
    mip_level_bias: Optional[jnp.ndarray] = None,
    mip: Optional[Sequence[jnp.ndarray]] = None,
    filter_mode: str = "linear",
    boundary_mode: str = "wrap",
    max_mip_level: Optional[int] = None,
) -> jnp.ndarray:
    """Sample a 2D texture.

    tex: (B, TH, TW, C) or (1, TH, TW, C) float32 (broadcast over batch).
    uv:  (B, H, W, 2) float32 texture coordinates.
    uv_da: (B, H, W, 4) image-space uv derivatives (du/dX, du/dY, dv/dX,
        dv/dY) from :func:`rasterize_db` — drives mip level selection.
    mip_level_bias: (B, H, W) additive mip level (or the level itself when
        uv_da is omitted).
    mip: optional prebuilt stack from :func:`texture_construct_mip`.
    filter_mode: 'auto' | 'nearest' | 'linear' | 'linear-mipmap-nearest' |
        'linear-mipmap-linear' ('auto' = 'linear-mipmap-linear' when uv_da
        or mip_level_bias is given, else 'linear'; nvdiffrast semantics).

    Returns (B, H, W, C) float32.

    dtype: a bfloat16 ``tex`` keeps the quad/mip tables in bf16 — HALF
    the table memory (a 4096^2 RGB quad table drops 800 -> 400 MB) at
    bf16 texel precision; weights and the lerp still run in float32 and
    the output is float32. Speed is NEUTRAL in-context (interleaved A/B
    at 1024^2 measured 0.95x: real UV access is coherent, so the random-
    gather microbench's 1.3x does not transfer). Any other dtype is
    promoted to float32.
    """
    tex = jnp.asarray(tex)
    if tex.dtype != jnp.bfloat16:
        tex = tex.astype(jnp.float32)
    uv = jnp.asarray(uv, jnp.float32)
    if filter_mode == "auto":
        filter_mode = (
            "linear-mipmap-linear"
            if (uv_da is not None or mip_level_bias is not None)
            else "linear"
        )
    if filter_mode in ("linear-mipmap-nearest", "linear-mipmap-linear"):
        return _texture_mip(
            tex, uv, uv_da, mip_level_bias, mip, filter_mode, boundary_mode,
            max_mip_level,
        )
    b = uv.shape[0]
    th, tw = tex.shape[1], tex.shape[2]
    c_ch = tex.shape[3]
    # Shared texture stays un-broadcast; the gather vmaps with in_axes=None
    # (a broadcast quad table would materialize B copies of 4x the texture).
    shared = tex.shape[0] == 1 and b > 1

    x = uv[..., 0] * tw - 0.5
    y = uv[..., 1] * th - 0.5

    if filter_mode == "nearest":
        ix = jnp.floor(x + 0.5).astype(jnp.int32)
        iy = jnp.floor(y + 0.5).astype(jnp.int32)
        in_range = (ix >= 0) & (ix < tw) & (iy >= 0) & (iy < th)
        ixc = _boundary(ix, tw, boundary_mode)
        iyc = _boundary(iy, th, boundary_mode)

        def sample(tex_b, ix_b, iy_b, in_b):
            out = tex_b[iy_b, ix_b].astype(jnp.float32)
            if boundary_mode == "zero":
                out = jnp.where(in_b[..., None], out, 0.0)
            return out

        return jax.vmap(sample, in_axes=(None if shared else 0, 0, 0, 0))(
            tex[0] if shared else tex, ixc, iyc, in_range
        )

    if filter_mode not in ("linear", "linear_block8"):
        raise NotImplementedError(f"filter_mode {filter_mode!r} not supported")

    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0.astype(jnp.float32))[..., None]
    fy = (y - y0.astype(jnp.float32))[..., None]

    quad = _quad_table(tex, boundary_mode)
    qh, qw = quad.shape[1], quad.shape[2]
    if boundary_mode == "wrap":
        ix = jnp.mod(x0, tw)
        iy = jnp.mod(y0, th)
    else:
        ix = jnp.clip(x0 + 1, 0, tw)
        iy = jnp.clip(y0 + 1, 0, th)

    if filter_mode == "linear_block8":
        # Block-swizzled table: rows regrouped in 8x8 texel blocks so
        # UV-coherent screen neighborhoods hit one ~3KB row block instead
        # of strided rows 8 apart (gathers are latency-bound; layout
        # locality is the lever).
        bs = 8
        qh_p = -(-qh // bs) * bs
        qw_p = -(-qw // bs) * bs
        quad_p = jnp.pad(
            quad, [(0, 0), (0, qh_p - qh), (0, qw_p - qw), (0, 0)]
        )
        nbx = qw_p // bs
        table = (
            quad_p.reshape(quad.shape[0], qh_p // bs, bs, nbx, bs, 4 * c_ch)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(quad.shape[0], qh_p * qw_p, 4 * c_ch)
        )
        flat = (
            ((iy // bs) * nbx + ix // bs) * (bs * bs)
            + (iy % bs) * bs + (ix % bs)
        )
    else:
        table = quad.reshape(quad.shape[0], qh * qw, 4 * c_ch)
        flat = iy * qw + ix  # (B, H, W)

    def sample_quad(table_b, flat_b):
        return table_b[flat_b]  # (H, W, 4C)

    taps = jax.vmap(sample_quad, in_axes=(None if shared else 0, 0))(
        table[0] if shared else table, flat
    ).astype(jnp.float32)
    zero_masks = None
    if boundary_mode == "zero":
        # Far-out taps landed on the zero border already; these masks kill
        # the ones whose clamped index aliased a live texel.
        zero_masks = (
            ((x0 >= 0) & (x0 < tw))[..., None],
            ((x0 + 1 >= 0) & (x0 + 1 < tw))[..., None],
            ((y0 >= 0) & (y0 < th))[..., None],
            ((y0 + 1 >= 0) & (y0 + 1 < th))[..., None],
        )
    return _blend_taps(taps, fx, fy, c_ch, zero_masks)


def _texture_mip(
    tex, uv, uv_da, mip_level_bias, mip, filter_mode, boundary_mode,
    max_mip_level,
):
    """Mip-mapped sampling: every level's quad table is flattened and packed
    into ONE row table with per-level offsets, so a pixel's bilinear tap at
    its (per-pixel, data-dependent) mip level is still a single row gather —
    2 gathers total for trilinear. Level selection follows nvdiffrast:
    level = 0.5 * log2(max footprint axis in texel^2 units) + bias."""
    b = uv.shape[0]
    th, tw = tex.shape[1], tex.shape[2]
    c_ch = tex.shape[3]
    shared = tex.shape[0] == 1 and b > 1

    levels = [tex] + list(
        mip if mip is not None else texture_construct_mip(tex, max_mip_level)
    )
    n_lvl = len(levels)

    offs, tws, ths, qws = [], [], [], []
    packed = []
    at = 0
    for lv in levels:
        q = _quad_table(lv, boundary_mode)  # (B, QH, QW, 4C)
        qh_l, qw_l = q.shape[1], q.shape[2]
        packed.append(q.reshape(q.shape[0], qh_l * qw_l, 4 * c_ch))
        offs.append(at)
        tws.append(lv.shape[2])
        ths.append(lv.shape[1])
        qws.append(qw_l)
        at += qh_l * qw_l
    packed = jnp.concatenate(packed, axis=1)  # (B, R_total, 4C)
    offs = jnp.asarray(offs, jnp.int32)
    tws_i = jnp.asarray(tws, jnp.int32)
    ths_i = jnp.asarray(ths, jnp.int32)
    qws_i = jnp.asarray(qws, jnp.int32)
    tws_f = tws_i.astype(jnp.float32)
    ths_f = ths_i.astype(jnp.float32)

    # Per-pixel level (f32).
    if uv_da is not None:
        dx2 = (uv_da[..., 0] * tw) ** 2 + (uv_da[..., 2] * th) ** 2
        dy2 = (uv_da[..., 1] * tw) ** 2 + (uv_da[..., 3] * th) ** 2
        foot = jnp.maximum(jnp.maximum(dx2, dy2), 1e-20)
        lvl = 0.5 * jnp.log2(foot)
        if mip_level_bias is not None:
            lvl = lvl + mip_level_bias
    elif mip_level_bias is not None:
        lvl = jnp.broadcast_to(
            jnp.asarray(mip_level_bias, jnp.float32), uv.shape[:-1]
        )
    else:
        raise ValueError(
            "mip-mapped filter modes need uv_da and/or mip_level_bias"
        )
    lvl = jnp.clip(lvl, 0.0, float(n_lvl - 1))

    def sample_level(li):  # li (B, H, W) int32 per-pixel level index
        twp = tws_f[li]
        thp = ths_f[li]
        x = uv[..., 0] * twp - 0.5
        y = uv[..., 1] * thp - 0.5
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = (x - x0.astype(jnp.float32))[..., None]
        fy = (y - y0.astype(jnp.float32))[..., None]
        twi = tws_i[li]
        thi = ths_i[li]
        if boundary_mode == "wrap":
            ix = jnp.mod(x0, twi)
            iy = jnp.mod(y0, thi)
        else:
            ix = jnp.clip(x0 + 1, 0, twi)
            iy = jnp.clip(y0 + 1, 0, thi)
        flat = offs[li] + iy * qws_i[li] + ix

        def g(packed_b, flat_b):
            return packed_b[flat_b]  # (H, W, 4C)

        taps = jax.vmap(g, in_axes=(None if shared else 0, 0))(
            packed[0] if shared else packed, flat
        ).astype(jnp.float32)
        zero_masks = None
        if boundary_mode == "zero":
            zero_masks = (
                ((x0 >= 0) & (x0 < twi))[..., None],
                ((x0 + 1 >= 0) & (x0 + 1 < twi))[..., None],
                ((y0 >= 0) & (y0 < thi))[..., None],
                ((y0 + 1 >= 0) & (y0 + 1 < thi))[..., None],
            )
        return _blend_taps(taps, fx, fy, c_ch, zero_masks)

    if filter_mode == "linear-mipmap-nearest":
        return sample_level(jnp.round(lvl).astype(jnp.int32))
    l0 = jnp.floor(lvl).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, n_lvl - 1)
    f = (lvl - l0.astype(jnp.float32))[..., None]
    return sample_level(l0) * (1.0 - f) + sample_level(l1) * f

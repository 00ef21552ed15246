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

import functools
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


def _gather_rows(table, flat, shared, mode):
    """The one hot gather of the linear path: rows ``flat`` (B, H, W) out of
    ``table`` (B, R, cols) (or (1, R, cols) shared). ``mode`` selects the
    lowering — XLA's TPU gather emitter is shape-dependent and measured
    NON-monotonic in table size (CLAUDE.md round-4 sweep), so equivalent
    formulations can differ materially; A/B per shape with
    tools/ab_gather_mode.py.

    vmap     — per-view vmapped advanced indexing (the long-time default).
    flat1d   — one 1-D index vector over a flattened (B*R) table.
    block8   — gather 8-row blocks (8x fewer, 8x wider rows) + in-register
               take_along_axis sub-row select.
    shard4   — 4 quarter-table gathers + predicated merge (4x gather work,
               each in a smaller-table regime).
    """
    if mode == "vmap":
        def sample(table_b, flat_b):
            return table_b[flat_b]

        return jax.vmap(sample, in_axes=(None if shared else 0, 0))(
            table[0] if shared else table, flat
        )
    b, h, w = flat.shape
    r, cols = table.shape[1], table.shape[2]
    if table.shape[0] == 1:
        tab = table[0]
    else:
        flat = flat + jnp.arange(b, dtype=flat.dtype)[:, None, None] * r
        tab = table.reshape(-1, cols)
    if mode == "flat1d":
        return tab[flat.reshape(-1)].reshape(b, h, w, cols)
    if mode == "block8":
        pad = (-tab.shape[0]) % 8
        if pad:
            tab = jnp.pad(tab, [(0, pad), (0, 0)])
        blocks = tab.reshape(-1, 8 * cols)[flat // 8]  # (B, H, W, 8*cols)
        sub = (flat % 8)[..., None, None]
        return jnp.take_along_axis(
            blocks.reshape(b, h, w, 8, cols), sub, axis=3
        )[..., 0, :]
    if mode == "shard4":
        r4 = -(-tab.shape[0] // 4)
        pad = r4 * 4 - tab.shape[0]
        if pad:
            tab = jnp.pad(tab, [(0, pad), (0, 0)])
        shards = tab.reshape(4, r4, cols)
        s = flat // r4
        rm = flat % r4
        out = shards[0][rm]
        for k in range(1, 4):
            out = jnp.where((s == k)[..., None], shards[k][rm], out)
        return out
    raise ValueError(f"unknown gather_mode {mode!r}")


def _quantize_u8(x):
    """255-quantize to uint8. EXACTNESS-CRITICAL recipe: round (not
    truncate) + clip, so ``byte / 255.0`` in :func:`_unpack_u8_words`
    reconstructs the caller's k/255 texels bit-for-bit. Every packed
    path must use THIS helper."""
    return jnp.clip(
        jnp.round(jnp.asarray(x, jnp.float32) * 255.0), 0.0, 255.0
    ).astype(jnp.uint8)


def _pack_u8_words(quad_u8):
    """(B, QH, QW, K) uint8 -> (B, QH*QW, ceil(K/4)) uint32, little-endian
    byte order within each word. Shrinks the gathered row 4x in element
    count: the TPU gather emitter's cost scales with gathered *elements*
    (not bytes) in the coherent-access regime, so 12 u8 taps as 3 words
    beat 12 f32 columns (A/B per shape; see texture() pack_mode)."""
    b, qh, qw, k = quad_u8.shape
    kw = -(-k // 4)
    if k % 4:
        quad_u8 = jnp.pad(quad_u8, [(0, 0)] * 3 + [(0, kw * 4 - k)])
    w = quad_u8.reshape(b, qh * qw, kw, 4).astype(jnp.uint32)
    words = (
        w[..., 0]
        | (w[..., 1] << 8)
        | (w[..., 2] << 16)
        | (w[..., 3] << 24)
    )
    return words  # (B, R, kw) uint32


def _unpack_u8_words(words, k):
    """Inverse of :func:`_pack_u8_words` on gathered rows:
    (..., KW) uint32 -> (..., K) float32 in [0, 1] (texel = byte / 255)."""
    shifts = jnp.asarray([0, 8, 16, 24], jnp.uint32)
    bytes_ = (words[..., None] >> shifts) & jnp.uint32(0xFF)
    flat = bytes_.reshape(*words.shape[:-1], words.shape[-1] * 4)
    # IEEE division (not reciprocal-multiply): byte / 255.0 must be
    # bit-identical to the caller's own v = q / 255 quantization.
    return flat[..., :k].astype(jnp.float32) / jnp.float32(255.0)


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


# --- cube-map sampling -------------------------------------------------
# OpenGL cube-map convention (face order +x,-x,+y,-y,+z,-z; per-face
# (sc, tc) axes as in the GL spec table). nvdiffrast's boundary_mode='cube'
# follows the same convention; the reference itself never exercises cube
# mode (render.py:83-120 only passes wrap/clamp), so this exists purely to
# close the capability gap with the underlying library.


def _cube_face_dirs(face, sc, tc):
    """Per-face direction vector for in-face coords (numpy, vectorized)."""
    import numpy as np

    one = np.ones_like(sc)
    table = [
        (one, -tc, -sc),      # +x
        (-one, -tc, sc),      # -x
        (sc, one, tc),        # +y
        (sc, -one, -tc),      # -y
        (sc, -tc, one),       # +z
        (-sc, -tc, -one),     # -z
    ]
    out = np.empty(sc.shape + (3,), np.float64)
    for f in range(6):
        m = face == f
        for a in range(3):
            out[..., a][m] = table[f][a][m]
    return out


def _cube_lookup_np(d):
    """direction -> (face, u, v) in numpy (used for static border maps)."""
    import numpy as np

    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    is_x = (ax >= ay) & (ax >= az)
    is_y = ~is_x & (ay >= az)
    is_z = ~(is_x | is_y)
    face = np.where(
        is_x, np.where(x >= 0, 0, 1),
        np.where(is_y, np.where(y >= 0, 2, 3), np.where(z >= 0, 4, 5)),
    )
    ma = np.where(is_x, ax, np.where(is_y, ay, az))
    sc = np.select(
        [face == 0, face == 1, face == 5],
        [-z, z, -x],
        default=x,
    )
    tc = np.select(
        [face == 2, face == 3],
        [z, -z],
        default=-y,
    )
    return face, 0.5 * (sc / ma + 1.0), 0.5 * (tc / ma + 1.0)


def _cube_lookup(d):
    """direction -> (face int32, u, v) in jnp (per-pixel runtime lookup)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    is_x = (ax >= ay) & (ax >= az)
    is_y = ~is_x & (ay >= az)
    face = jnp.where(
        is_x, jnp.where(x >= 0, 0, 1),
        jnp.where(is_y, jnp.where(y >= 0, 2, 3), jnp.where(z >= 0, 4, 5)),
    ).astype(jnp.int32)
    ma = jnp.maximum(jnp.maximum(ax, ay), az)
    inv = 1.0 / jnp.maximum(ma, 1e-30)
    sc = jnp.where(
        face == 0, -z, jnp.where(face == 1, z, jnp.where(face == 5, -x, x))
    )
    tc = jnp.where(face == 2, z, jnp.where(face == 3, -z, -y))
    return face, 0.5 * (sc * inv + 1.0), 0.5 * (tc * inv + 1.0)


@functools.lru_cache(maxsize=8)
def _cube_border_maps(size: int):
    """Static source-texel maps for the one-texel seamless border.

    For every border cell of every padded face, the direction of that
    cell's texel center (|sc| or |tc| slightly beyond 1) resolves onto an
    adjacent face; nearest-sampling that face fills the border so plain
    bilinear inside the padded face becomes seamless across cube edges
    (corner cells land on one of the three meeting faces — continuous
    along edges, nvdiffrast's 3-texel corner average is approximated by
    the nearest corner texel). Returns (dst_face, dst_row, dst_col,
    src_face, src_iy, src_ix) int32 numpy arrays.
    """
    import numpy as np

    s = size
    rr, cc = np.meshgrid(np.arange(s + 2), np.arange(s + 2), indexing="ij")
    border = (rr == 0) | (rr == s + 1) | (cc == 0) | (cc == s + 1)
    r_b, c_b = rr[border], cc[border]
    dst_face = np.repeat(np.arange(6), r_b.size)
    r_all = np.tile(r_b, 6)
    c_all = np.tile(c_b, 6)
    sc = ((c_all - 1) + 0.5) / s * 2.0 - 1.0
    tc = ((r_all - 1) + 0.5) / s * 2.0 - 1.0
    d = _cube_face_dirs(dst_face, sc, tc)
    src_face, u, v = _cube_lookup_np(d)
    src_ix = np.clip(np.floor(u * s), 0, s - 1).astype(np.int32)
    src_iy = np.clip(np.floor(v * s), 0, s - 1).astype(np.int32)
    return (
        dst_face.astype(np.int32), r_all.astype(np.int32),
        c_all.astype(np.int32), src_face.astype(np.int32), src_iy, src_ix,
    )


def _cube_padded(tex):
    """(B, 6, S, S, C) -> (B, 6, S+2, S+2, C) with seamless borders."""
    s = tex.shape[2]
    df, dr, dc, sf, sy, sx = _cube_border_maps(s)
    padded = jnp.pad(tex, [(0, 0), (0, 0), (1, 1), (1, 1), (0, 0)])
    return padded.at[:, df, dr, dc, :].set(tex[:, sf, sy, sx, :])


def _texture_cube(tex, uv, filter_mode):
    """Cube sampling: tex (B, 6, S, S, C), uv = directions (B, H, W, 3)."""
    if tex.ndim != 5 or tex.shape[1] != 6 or tex.shape[2] != tex.shape[3]:
        raise ValueError(
            "cube sampling needs tex (B, 6, S, S, C) with square faces, "
            f"got {tex.shape}"
        )
    if uv.shape[-1] != 3:
        raise ValueError(f"cube sampling needs 3-D directions, got {uv.shape}")
    if filter_mode not in ("nearest", "linear"):
        raise NotImplementedError(
            f"cube filter_mode {filter_mode!r} not supported (no cube mip)"
        )
    b = uv.shape[0]
    s = tex.shape[2]
    c_ch = tex.shape[4]
    shared = tex.shape[0] == 1 and b > 1
    face, u, v = _cube_lookup(uv)

    if filter_mode == "nearest":
        ix = jnp.clip(jnp.floor(u * s).astype(jnp.int32), 0, s - 1)
        iy = jnp.clip(jnp.floor(v * s).astype(jnp.int32), 0, s - 1)
        flat = (face * s + iy) * s + ix
        table = tex.reshape(tex.shape[0], 6 * s * s, c_ch)

        def g(t_b, f_b):
            return t_b[f_b]

        return jax.vmap(g, in_axes=(None if shared else 0, 0))(
            table[0] if shared else table, flat
        ).astype(jnp.float32)

    x = u * s - 0.5
    y = v * s - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0.astype(jnp.float32))[..., None]
    fy = (y - y0.astype(jnp.float32))[..., None]
    padded = _cube_padded(tex)  # (B, 6, S+2, S+2, C)
    quad = _quad_table(
        padded.reshape(tex.shape[0] * 6, s + 2, s + 2, c_ch), "clamp"
    )  # (B*6, S+3, S+3, 4C): row (y, x) = 2x2 window at padded coord (y-1, x-1)
    q = s + 3
    table = quad.reshape(tex.shape[0], 6 * q * q, 4 * c_ch)
    # u,v in [0,1] => x0 in [-1, S-1]; the 2x2 window anchored at seamless-
    # padded coord x0+1 lives at quad row x0+2 (one extra +1 for the clamp
    # ring _quad_table itself added) in [1, S+1].
    ix = jnp.clip(x0 + 2, 1, s + 1)
    iy = jnp.clip(y0 + 2, 1, s + 1)
    flat = (face * q + iy) * q + ix

    def g(t_b, f_b):
        return t_b[f_b]

    taps = jax.vmap(g, in_axes=(None if shared else 0, 0))(
        table[0] if shared else table, flat
    ).astype(jnp.float32)
    return _blend_taps(taps, fx, fy, c_ch)


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
    gather_mode: str = "vmap",
    pack_mode: str = "none",
) -> jnp.ndarray:
    """Sample a 2D texture.

    tex: (B, TH, TW, C) or (1, TH, TW, C) float32 (broadcast over batch).
        For boundary_mode='cube': (B, 6, S, S, C), OpenGL face order
        +x,-x,+y,-y,+z,-z, square faces.
    uv:  (B, H, W, 2) float32 texture coordinates. For cube mode:
        (B, H, W, 3) direction vectors (need not be normalized);
        bilinear cube sampling is seamless across face edges.
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
    if boundary_mode == "cube":
        return _texture_cube(tex, uv, filter_mode)
    if filter_mode in ("linear-mipmap-nearest", "linear-mipmap-linear"):
        return _texture_mip(
            tex, uv, uv_da, mip_level_bias, mip, filter_mode, boundary_mode,
            max_mip_level, pack_mode,
        )
    b = uv.shape[0]
    th, tw = tex.shape[1], tex.shape[2]
    c_ch = tex.shape[3]
    # Shared texture stays un-broadcast; the gather vmaps with in_axes=None
    # (a broadcast quad table would materialize B copies of 4x the texture).
    shared = tex.shape[0] == 1 and b > 1

    x = uv[..., 0] * tw - 0.5
    y = uv[..., 1] * th - 0.5

    if pack_mode not in ("none", "u8"):
        raise ValueError(f"unknown pack_mode {pack_mode!r}")

    if filter_mode == "nearest":
        # pack_mode='u8' is a no-op here: nearest taps are exact texels
        # (no blend to byte-pack), so the packed and unpacked paths are
        # bit-identical by construction.
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

    if pack_mode == "u8":
        # Byte-packed quad table for 255-quantized textures (image-file
        # sources): each gathered row carries the 2x2 taps as ceil(4C/4)
        # uint32 words instead of 4C f32 columns. EXACT iff every texel is
        # k/255 (uint8 image data); callers with synthetic float textures
        # must quantize first. 'wrap'/'clamp'/'zero' boundaries all ride
        # the same u8 quad-table construction.
        tex_u8 = _quantize_u8(tex)
    elif pack_mode != "none":
        raise ValueError(f"unknown pack_mode {pack_mode!r}")

    quad = _quad_table(tex_u8 if pack_mode == "u8" else tex, boundary_mode)
    if pack_mode == "u8":
        qh_q, qw_q = quad.shape[1], quad.shape[2]
        quad = _pack_u8_words(quad).reshape(
            quad.shape[0], qh_q, qw_q, -1
        )
    n_cols = quad.shape[3]
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
            quad_p.reshape(quad.shape[0], qh_p // bs, bs, nbx, bs, n_cols)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(quad.shape[0], qh_p * qw_p, n_cols)
        )
        flat = (
            ((iy // bs) * nbx + ix // bs) * (bs * bs)
            + (iy % bs) * bs + (ix % bs)
        )
    else:
        table = quad.reshape(quad.shape[0], qh * qw, n_cols)
        flat = iy * qw + ix  # (B, H, W)

    taps = _gather_rows(table, flat, shared, gather_mode)
    if pack_mode == "u8":
        taps = _unpack_u8_words(taps, 4 * c_ch)
    taps = taps.astype(jnp.float32)
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
    max_mip_level, pack_mode="none",
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

    if pack_mode == "u8":
        # 8-bit mip chain (GPU texture units store 8-bit mips too): every
        # level re-quantized to 255ths, rows byte-packed. Exact vs the f32
        # path when the caller passes an already-quantized `mip` stack.
        levels = [_quantize_u8(lv) for lv in levels]
    elif pack_mode != "none":
        raise ValueError(f"unknown pack_mode {pack_mode!r}")

    offs, tws, ths, qws = [], [], [], []
    packed = []
    at = 0
    for lv in levels:
        q = _quad_table(lv, boundary_mode)  # (B, QH, QW, 4C)
        qh_l, qw_l = q.shape[1], q.shape[2]
        if pack_mode == "u8":
            packed.append(_pack_u8_words(q))
        else:
            packed.append(q.reshape(q.shape[0], qh_l * qw_l, 4 * c_ch))
        offs.append(at)
        tws.append(lv.shape[2])
        ths.append(lv.shape[1])
        qws.append(qw_l)
        at += qh_l * qw_l
    packed = jnp.concatenate(packed, axis=1)  # (B, R_total, 4C | KW words)
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
        )
        if pack_mode == "u8":
            taps = _unpack_u8_words(taps, 4 * c_ch)
        taps = taps.astype(jnp.float32)
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

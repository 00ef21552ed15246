"""Fused gather-free G-buffer rasterization: attributes as affine planes.

The key identity: perspective-correct interpolation of any per-vertex
attribute a is a ratio of two *screen-affine* planes,

    a(p) = [sum_i e_i(p) * invw_i * a_i] / [sum_i e_i(p) * invw_i]

so a chunk of triangles' edge tests, depth, attribute numerators and the
shared denominator all evaluate over a pixel tile with ONE
((4 + 1 + A) * C, 3) @ (3, P) matmul on the MXU. The winning triangle's
values are selected in-register by min/where reductions — the per-pixel
plane/attribute gathers of the classic resolve+interpolate pipeline
(ops/rasterize.py:_resolve_uv, ops/interpolate.py) disappear entirely.

This is the performance path behind ``render(..., raster_config=
RasterizerConfig(backend="fused"))``; the nvdiffrast-contract ``rasterize``
stays available for exact API parity. Both an XLA scan implementation (CPU
golden tests, fallback) and a Pallas kernel (TPU) are provided and agree
bitwise.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .tensor import edge0_pad_block
from .rasterize import (
    DEFAULT_CONFIG,
    RasterizerConfig,
    _auto_cap,
    _bin_dispatch,
    _bin_flat,
    _CULL_MARGIN,
    _triangle_setup,
    _triangle_setup_t,
    _BIG_NEG,
)

__all__ = ["rasterize_gbuffer", "GBufferOutput"]

_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
    # Manual bf16 hi/lo split, merged into one MXU contraction (Pallas
    # kernels only; ~3x cheaper than fp32, near-fp32 accurate). The DMA
    # kernel keeps exact ids to T < 2^24 (hi/lo id rows); the v1 kernel's
    # constant id plane caps at 2^16 (both gated by their callers).
    "split_bf16": "split_bf16",
}

_BIG_SLOT = 2**30


class GBufferOutput(NamedTuple):
    mask: jnp.ndarray  # (B, H, W) bool
    z: jnp.ndarray  # (B, H, W) f32 NDC depth (0 where background)
    tri_id: jnp.ndarray  # (B, H, W) i32 triangle_id + 1, 0 = background
    attr: Optional[jnp.ndarray]  # (B, H, W, A) perspective-correct attrs


def _uv_corner_attrs_t(t_total: int) -> jnp.ndarray:
    """Per-corner one-hot attributes (2, 3, T) whose perspective-correct
    interpolation IS the nvdiffrast (u, v) barycentrics of local vertices
    1 and 2 — (u, v) ride the fused attribute-plane machinery and the
    per-pixel plane gather of the classic resolve disappears."""
    eye = jnp.array([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], jnp.float32)
    return jnp.broadcast_to(eye[:, :, None], (2, 3, t_total))


def _attr_planes(
    setup, tri: jnp.ndarray, v_attr: jnp.ndarray, a=None
) -> jnp.ndarray:
    """Per-triangle numerator planes for each attribute channel plus the
    shared denominator plane. v_attr (V, A) -> (T+1, A+1, 3) with the
    denominator last. ``a`` (T, 3, A): pre-gathered per-corner attributes
    (overrides the ``v_attr[tri]`` gather — used for foreign-topology
    attribute indices and the uv-barycentric one-hots)."""
    if a is None:
        a = v_attr[tri]  # (T, 3, A)
    inv_w = setup.inv_w[:-1]  # (T, 3)
    eplanes = setup.planes[:-1, :3, :]  # (T, 3edges, 3coef)
    num = jnp.einsum("tia,ti,tic->tac", a, inv_w, eplanes,
                     precision=jax.lax.Precision.HIGHEST)  # (T, A, 3)
    den = jnp.einsum("ti,tic->tc", inv_w, eplanes,
                     precision=jax.lax.Precision.HIGHEST)[:, None, :]  # (T, 1, 3)
    planes = jnp.concatenate([num, den], axis=1)  # (T, A+1, 3)
    return jnp.pad(planes, [(0, 1), (0, 0), (0, 0)])


def _attr_planes_t(
    setup_t, tri: jnp.ndarray, v_attr: jnp.ndarray, a3=None
) -> jnp.ndarray:
    """Transposed twin of :func:`_attr_planes` for _TriSetupT pipelines:
    returns ((A+1)*3, T+1) rows [val0_a, val0_b, val0_g, val1_a, ...] with
    the shared denominator plane last. Same math, (rows, T) orientation.
    ``a3`` (A, 3, T): pre-gathered per-corner attributes (view-independent —
    batched callers hoist the gather out of their view vmap)."""
    t_total = tri.shape[0]
    n_attr = v_attr.shape[1]
    if a3 is None:
        a3 = v_attr[tri.T.reshape(-1)].T.reshape(n_attr, 3, t_total)
    inv_w = setup_t.inv_w[:, :-1]  # (3, T)
    ep = setup_t.planes12[:9, :-1].reshape(3, 3, t_total)  # (edge, coef, T)
    s = a3 * inv_w[None]  # (A, 3, T)
    num = (
        s[:, 0][:, None] * ep[0][None]
        + s[:, 1][:, None] * ep[1][None]
        + s[:, 2][:, None] * ep[2][None]
    )  # (A, 3coef, T)
    den = (
        inv_w[0] * ep[0] + inv_w[1] * ep[1] + inv_w[2] * ep[2]
    )  # (3coef, T)
    rows = jnp.concatenate(
        [num.reshape(n_attr * 3, t_total), den], axis=0
    )  # ((A+1)*3, T)
    return jnp.pad(rows, [(0, 0), (0, 1)])


# Host-side int (NOT jnp.int32: a module-level device constant would
# initialize the JAX backend at import time, breaking
# jax.distributed.initialize and claiming the TPU on bare imports).
_I32_MAX = np.int32(2**31 - 1)


def _rows_to_records(rows: jnp.ndarray) -> jnp.ndarray:
    """(R, N) coef-major row vectors -> (N, R) row-major gather table.

    Expressed as a stack-of-columns instead of ``rows.T``: XLA lowers the
    big transpose to paired 'wide.body' while loops (~18 GB/s through a
    flat buffer; isolated on-chip probe tools/probe_transpose.py: stack
    29.5 vs transpose 37.9 ms on a (6, 24, 1M) table). IN CONTEXT the
    full raw-1M render measured NEUTRAL (tools/ab_recstack.py: 3
    interleaved pairs, median ratio 1.002, bit-identical) — the loop
    transpose overlaps with other work, the usual stage-isolation trap
    (CLAUDE.md profiling gotchas). Kept as the never-worse form. Must
    stay bit-moving (no dot-with-identity transpose: the tiny path's zb
    column is bitcast int32 whose NaN patterns would poison MXU output
    columns via 0 * NaN).
    """
    r = rows.shape[0]
    return jnp.stack([rows[i] for i in range(r)], axis=-1)


def _z_sort_bits(z: jnp.ndarray) -> jnp.ndarray:
    """Order-preserving f32 -> i32 mapping (signed compare). Involution:
    applying it twice restores the original bits."""
    b = jax.lax.bitcast_convert_type(z, jnp.int32)
    return b ^ jax.lax.shift_right_arithmetic(b, 31) & jnp.int32(0x7FFFFFFF)


def _tiny_candidates(
    rows12: jnp.ndarray,  # (12, T+1) [e0_a, e0_b, e0_g, e1..., e2..., z...]
    bbox4: jnp.ndarray,  # (4, T+1) xmin, xmax, ymin, ymax
    tiny: jnp.ndarray,  # (T,) bool — triangles owned by this path
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
):
    """Each tiny triangle's unique pixel-center candidate: pix (T,) i32
    row-major pixel index (H*W where the candidate misses / is off-screen /
    fails the edge or depth test) and z (T,) f32 NDC depth (undefined where
    pix == H*W). Shared by _tiny_images and binning_stats' bin_tiny_cap
    guard — the budget must count EXACTLY the candidates the sort path
    emits, so there is one definition of "covered candidate"."""
    hw = height * width
    xmin, xmax = bbox4[0, :-1], bbox4[1, :-1]
    ymin, ymax = bbox4[2, :-1], bbox4[3, :-1]

    # The unique candidate: the smallest pixel center >= bbox min per axis.
    pxf = jnp.ceil(xmin - 0.5) + 0.5
    pyf = jnp.ceil(ymin - 0.5) + 0.5
    ix = (pxf - 0.5).astype(jnp.int32)
    iy = (pyf - 0.5).astype(jnp.int32)
    inb = (
        (pxf <= xmax) & (pyf <= ymax)
        & (ix >= 0) & (ix < width) & (iy >= 0) & (iy < height)
    )

    # Evaluate with the SAME tile-rebased expression structure as the flat
    # kernels (constants rebased to the pixel's tile origin, then a local-
    # coordinate FMA): sub-pixel triangles have steep planes (gradients
    # ~1/bbox), and a global-coordinate a*px + b*py + c amplifies last-bit
    # cancellation ~tile-origin/bbox-fold (measured 4e-5 on uv channels vs
    # last-bit after rebasing).
    oxf = ((ix // tile_w) * tile_w).astype(jnp.float32)
    oyf = ((iy // tile_h) * tile_h).astype(jnp.float32)
    lxf = pxf - oxf  # exact: both are small fp32 integers + 0.5
    lyf = pyf - oyf

    def ev(r):
        a, b2, c2 = rows12[r, :-1], rows12[r + 1, :-1], rows12[r + 2, :-1]
        return a * lxf + b2 * lyf + (c2 + a * oxf + b2 * oyf)

    e0, e1, e2, z = ev(0), ev(3), ev(6), ev(9)
    cov = (
        tiny & inb
        & (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
        & (z >= -1.0) & (z <= 1.0)
    )
    pix = jnp.where(cov, iy * width + ix, hw)
    return pix, z


def _tiny_images(
    rows12: jnp.ndarray,  # (12, T+1) [e0_a, e0_b, e0_g, e1..., e2..., z...]
    attr_rows,  # ((A+1)*3, T+1) numerator planes + denominator, or None
    bbox4: jnp.ndarray,  # (4, T+1) xmin, xmax, ymin, ymax
    tiny: jnp.ndarray,  # (T,) bool — triangles owned by this path
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
    defer: bool = False,
    cap: int = 0,
):
    """Sort-path rasterization of sub-pixel triangles (bin_tiny_px).

    A triangle whose bbox is < 1 px in both axes contains AT MOST ONE
    pixel center per axis, so each tiny triangle emits exactly one
    (pixel, z, id) candidate (or none). Two XLA sorts then produce the
    dense winner image with no scatter at all (TPU scatters are ~serial,
    measured 32 ms even for 262k unique writes; sorts are ~12 ms/M):

      1. sort candidates + one background sentinel per pixel by
         (pixel, z-bits, id) — ascending z-bits = nearest, ascending id
         ties = the reference's min-id rule;
      2. mark each pixel group's FIRST entry, re-sort by
         (winner ? pixel : HW): every pixel has >= 1 entry (the
         sentinels), so the first H*W entries ARE the image row-major.

    Returns (z (H, W) +inf background, idm (H, W) f32 raw id with
    _BIG_SLOT background, vals ((A+1), H, W) numerator/denominator plane
    evaluations — same conventions as the tile kernels, mergeable by
    straight z/id comparison.

    ``cap`` (0 = off, RasterizerConfig.bin_tiny_cap): pre-compact covered
    candidates with ONE single-operand T-entry sort before the triple
    sort. At 1M tris / 512^2 only ~10-25% of tiny candidates actually
    cover their pixel center (sub-pixel coverage probability ~ area), so
    the two multi-operand sorts carry (T + H*W) mostly-sentinel entries;
    compaction shrinks them to (cap + H*W). Bit-identical while cap holds
    every covered candidate (the live triple set is unchanged and all
    sorts are over unique keys); overflow drops the HIGHEST triangle ids
    deterministically — binning_stats guards it like every other budget."""
    from .gbuffer_pallas import _BIG_SLOT, _BIG_Z

    t_total = tiny.shape[0]
    hw = height * width
    pix, z = _tiny_candidates(
        rows12, bbox4, tiny, height, width, tile_h, tile_w
    )
    zb = jnp.where(pix < hw, _z_sort_bits(z), _I32_MAX)
    tid = jnp.arange(t_total, dtype=jnp.int32)

    if 0 < cap < t_total:
        # Pin ONE materialized candidate eval: compaction makes (pix, zb)
        # feed BOTH the selection key and a gather operand, and XLA may
        # duplicate the steep-plane eval into each consumer fusion with
        # different FMA groupings (observed on-chip under lax.scan: ~0.9%
        # of candidates selected-but-gathered-inconsistently, coverage
        # drift vs the uncapped path). The barrier forces the selection
        # and the gathered values to read the same bits.
        pix, zb = jax.lax.optimization_barrier((pix, zb))
        ckey = jnp.where(pix < hw, tid, jnp.int32(t_total))
        (ckey,) = jax.lax.sort((ckey,), num_keys=1, is_stable=False)
        sid = ckey[:cap]  # ascending covered ids; t_total sentinels behind
        livec = sid < t_total
        sid_c = jnp.minimum(sid, t_total - 1)
        # ONE 2-column row gather (per-row latency floor: one wide gather
        # beats two 1-column gathers, docs/PERF.md §1).
        pz = jnp.stack([pix, zb], axis=1)[sid_c]
        pix_in = jnp.where(livec, pz[:, 0], hw)
        zb_in = jnp.where(livec, pz[:, 1], _I32_MAX)
        tid_in = jnp.where(livec, sid_c, _I32_MAX)
    else:
        pix_in, zb_in, tid_in = pix, zb, tid

    # One sentinel per pixel: guarantees every pixel group is non-empty,
    # so pass 2's first hw entries are dense.
    pix_all = jnp.concatenate([pix_in, jnp.arange(hw, dtype=jnp.int32)])
    zb_all = jnp.concatenate([zb_in, jnp.full((hw,), _I32_MAX, jnp.int32)])
    tid_all = jnp.concatenate([tid_in, jnp.full((hw,), _I32_MAX, jnp.int32)])

    # UNSTABLE sorts: (pix, zb, tid) triples are unique (tid is unique per
    # candidate; sentinels differ in pix), so all three ride as keys and no
    # stability is needed — jax.lax.sort's default is_stable=True made XLA
    # carry a 4th iota operand through both 1.26M-entry sorts (traced:
    # 12 ms/view at 1M tris). (An i64 (pix << 32 | zb) key pack would drop
    # another operand but jnp.int64 silently truncates to int32 under the
    # default jax_enable_x64=False — not available.)
    pix_s, zb_s, tid_s = jax.lax.sort(
        (pix_all, zb_all, tid_all), num_keys=3, is_stable=False
    )
    first = jnp.concatenate(
        [jnp.ones((1,), bool), pix_s[1:] != pix_s[:-1]]
    )
    # Winners have UNIQUE winkeys (exactly one first entry per pixel, every
    # pixel has >= 1 entry) and the winkey = hw mass is discarded, so the
    # compaction sort is unstable too.
    winkey = jnp.where(first & (pix_s < hw), pix_s, hw)

    if attr_rows is None:
        _, zb_w, tid_w = jax.lax.sort(
            (winkey, zb_s, tid_s), num_keys=1, is_stable=False
        )
        zb_img = zb_w[:hw]
        tid_img = tid_w[:hw]
        bg = tid_img == _I32_MAX
        z_img = jnp.where(
            bg, jnp.inf,
            jax.lax.bitcast_convert_type(
                zb_img ^ jax.lax.shift_right_arithmetic(zb_img, 31)
                & jnp.int32(0x7FFFFFFF),
                jnp.float32,
            ),
        ).reshape(height, width)
        idm_img = jnp.where(
            bg, jnp.float32(_BIG_SLOT), tid_img.astype(jnp.float32)
        ).reshape(height, width)
        return z_img, idm_img, None

    # With attributes, the per-candidate zb rides the record table as a
    # BITCAST f32 column instead of a sort payload: gathers transport
    # bits untouched, so zb_img == the dropped payload exactly while the
    # compaction sort sheds 1/3 of its operand traffic (traced 1.66
    # ms/view at 1M tris). Sentinel z column = _I32_MAX bits (background
    # pixels are masked to +inf downstream regardless).
    _, tid_w = jax.lax.sort((winkey, tid_s), num_keys=1, is_stable=False)
    tid_img = tid_w[:hw]
    zrow = jax.lax.bitcast_convert_type(
        jnp.concatenate([zb, jnp.full((1,), _I32_MAX, jnp.int32)]),
        jnp.float32,
    )[None]  # (1, T+1)
    table = _rows_to_records(
        jnp.concatenate([attr_rows, zrow], axis=0)
    )  # (T+1, m+1)
    if defer:
        # Batched callers hoist the per-pixel winner-record gather out of
        # their view vmap: a batched (V, T+1, m+1) gather operand gets a
        # PLANAR layout (each row read = m+1 separate HBM transactions,
        # traced 29.8 ns/row at 1M tris); the flattened 2D table gathers
        # rows contiguously (probe: 16.9 -> 12.1 ns/row at 12 cols).
        return tid_img, table
    bg = tid_img == _I32_MAX
    g = table[jnp.where(bg, t_total, tid_img)]  # sentinel attr rows: zeros
    return _tiny_finish(g, tid_img, height, width, tile_h, tile_w)


def _tiny_finish(
    g: jnp.ndarray,  # (HW, m+1) gathered winner records [attr planes | zb]
    tid_img: jnp.ndarray,  # (HW,) winner ids, _I32_MAX for background
    height: int,
    width: int,
    tile_h: int,
    tile_w: int,
):
    """Post-gather half of the attr-carrying tiny path: decode the bitcast
    zb column and evaluate the winner attribute planes at the pixel coords
    (same tile-rebased expression structure as the candidate pass)."""
    hw = height * width
    bg = tid_img == _I32_MAX
    zb_img = jax.lax.bitcast_convert_type(g[:, -1], jnp.int32)
    z_img = jnp.where(
        bg, jnp.inf,
        jax.lax.bitcast_convert_type(
            zb_img ^ jax.lax.shift_right_arithmetic(zb_img, 31)
            & jnp.int32(0x7FFFFFFF),
            jnp.float32,
        ),
    ).reshape(height, width)
    idm_img = jnp.where(
        bg, jnp.float32(_BIG_SLOT), tid_img.astype(jnp.float32)
    ).reshape(height, width)

    m = g.shape[1] - 1
    px_img = (
        jax.lax.broadcasted_iota(jnp.float32, (hw,), 0) % width + 0.5
    )
    py_img = (
        jnp.floor(jax.lax.broadcasted_iota(jnp.float32, (hw,), 0) / width)
        + 0.5
    )
    a = g[:, 0:m:3]
    b = g[:, 1:m:3]
    c = g[:, 2:m:3]
    ox_i = (px_img - 0.5) // tile_w * tile_w
    oy_i = (py_img - 0.5) // tile_h * tile_h
    lx_i = (px_img - ox_i)[:, None]
    ly_i = (py_img - oy_i)[:, None]
    vals_img = (
        a * lx_i + b * ly_i
        + (c + a * ox_i[:, None] + b * oy_i[:, None])
    ).T.reshape(m // 3, height, width)
    return z_img, idm_img, vals_img


def _merge_zidvals(z_a, idm_a, vals_a, z_b, idm_b, vals_b):
    """Merge two (z, id, vals) image sets by nearest-z, min-id-on-ties
    (the kernel's winner rule, applied across the tile and tiny paths).
    Backgrounds carry z=+inf and id=_BIG_SLOT in both, so background
    resolves correctly without special cases."""
    take_b = (z_b < z_a) | ((z_b == z_a) & (idm_b < idm_a))
    z = jnp.where(take_b, z_b, z_a)
    idm = jnp.where(take_b, idm_b, idm_a)
    vals = None
    if vals_a is not None:
        vals = jnp.where(take_b[..., None, :, :] if vals_a.ndim == 4
                         else take_b[None], vals_b, vals_a)
    return z, idm, vals


def _gather_tile_rows_flat(
    all_planes: jnp.ndarray,  # (T+1, R, 3)
    valid: jnp.ndarray,  # (T+1,)
    flat,  # _bin_flat output
    tile_origin: jnp.ndarray,  # (n_tiles, 2)
    k_cap: int,
    n_tx: int = 1,
    tile_w: int = 128,
    tile_h: int = 16,
) -> tuple:
    """Contiguous-slice coefficient expansion: ONE gather over the sorted
    flat pair list (~live entries only), per-entry tile rebase, then cheap
    vmapped dynamic slices build the dense per-tile blocks — replacing the
    (n_tiles, K)-row gather that dominated the profile (57ms of 85ms).

    Returns (coeffs (n_tiles, 3, R*K), counts (n_tiles,))."""
    s_tri, s_tile, starts, counts = flat
    n_tiles = tile_origin.shape[0]
    r = all_planes.shape[1]

    # ONE fused gather: planes + validity ride a single record per triangle
    # (separate gathers each pay the per-row gather cost); tile origins come
    # from s_tile arithmetic, not a lookup.
    record = jnp.concatenate(
        [
            all_planes.reshape(all_planes.shape[0], r * 3),
            valid[:, None].astype(jnp.float32),
        ],
        axis=1,
    )  # (T+1, R*3 + 1)
    rec = record[s_tri]  # (L, R*3+1) — THE gather
    ep = rec[:, : r * 3].reshape(-1, r, 3)
    v = (rec[:, r * 3] > 0.5) & (s_tile < n_tiles)

    # Origins from tile-index arithmetic — the tile grid is regular, so no
    # lookup is needed (tile t sits at ((t % n_tx) * tile_w, ...)).
    st = jnp.clip(s_tile, 0, n_tiles - 1)
    ox = ((st % n_tx) * tile_w).astype(jnp.float32)[:, None]
    oy = ((st // n_tx) * tile_h).astype(jnp.float32)[:, None]
    gamma = ep[..., 2] + ep[..., 0] * ox + ep[..., 1] * oy
    gamma = gamma.at[:, 0].set(jnp.where(v, gamma[:, 0], _BIG_NEG))
    ep = jnp.concatenate([ep[..., :2], gamma[..., None]], axis=-1)
    flat_coeffs = ep.transpose(2, 1, 0)  # (3, R, L)
    # Pad the lane dim by k_cap so per-tile slices never clamp-shift.
    # (edge0_pad_block, not zeros().at[].set(): the scatter form constant-
    # folds into a baked k_cap-sized literal — see ops/tensor.py.)
    pad_block = edge0_pad_block(r, k_cap, flat_coeffs.dtype, _BIG_NEG)
    flat_coeffs = jnp.concatenate([flat_coeffs, pad_block], axis=2)

    def tile_block(start):
        return jax.lax.dynamic_slice(
            flat_coeffs, (0, 0, start), (3, r, k_cap)
        )

    dense = jax.vmap(tile_block)(starts)  # (n_tiles, 3, R, K)
    used = jnp.minimum(counts, k_cap)
    # The fixed-size window overruns into the NEXT tile's segment when
    # count < K — those foreign entries carry the wrong tile's rebase.
    # Kill them via the e0 constant (same trick as validity folding).
    j = jnp.arange(k_cap, dtype=jnp.int32)[None, :]
    in_seg = j < used[:, None]
    dense = dense.at[:, 2, 0, :].set(
        jnp.where(in_seg, dense[:, 2, 0, :], _BIG_NEG)
    )

    coeffs = dense.reshape(n_tiles, 3, r * k_cap)
    return coeffs, used


def _chunk_windows(
    s_tri_pad: jnp.ndarray, csrc: jnp.ndarray, c: int, mode: str
) -> jnp.ndarray:
    """Read NCH c-length windows of the flat id list at arbitrary offsets.

    "dynamic": vmapped 1-D dynamic slices. PROFILED as the 2nd-largest
    non-kernel device cost of the headline frame: XLA lowers the vmap to a
    SEQUENTIAL while loop (~0.85 us per window x ~285 windows/view).
    "shift": TWO aligned row gathers (rows q, q+1 of the c-column reshape)
    + an arithmetic barrel shift by (csrc mod c) — fully vectorized, no
    loop, no per-window op. "gather": one lax.gather of c-length windows
    (whatever the TPU gather emitter makes of it)."""
    if mode == "dynamic":
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(s_tri_pad, (s,), (c,))
        )(csrc)
    if mode == "gather":
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(), start_index_map=(0,)
        )
        return jax.lax.gather(
            s_tri_pad, csrc[:, None], dn, slice_sizes=(c,),
            mode=jax.lax.GatherScatterMode.CLIP,
        )
    if mode != "shift":
        raise ValueError(f"unknown chunk_slice_mode {mode!r}")
    ln = s_tri_pad.shape[0]
    pad = (-ln) % c + c  # round up to rows AND guarantee row q+1 exists
    s2d = jnp.concatenate(
        [s_tri_pad, jnp.full((pad,), s_tri_pad[-1], s_tri_pad.dtype)]
    ).reshape(-1, c)
    q = csrc // c
    r = csrc % c
    x = jnp.concatenate([s2d[q], s2d[q + 1]], axis=1)  # (NCH, 2c)
    # barrel shift left by r (r < c): after the loop, x[:, :c] == window
    b = 1
    while b < c:
        x = jnp.where((r[:, None] & b) != 0, jnp.roll(x, -b, axis=1), x)
        b *= 2
    return x[:, :c]


def _flat_chunks(
    setup,
    tri: jnp.ndarray,
    v_attr,
    flat,  # _bin_flat output
    k_cap: int,
    n_tx: int,
    tile_w: int,
    tile_h: int,
    c: int,
    l_cap: int,
    a3=None,
    chunk_slice_mode: str = "dynamic",
    defer: bool = False,
    sub: int = 1,
):
    """Build the 128-aligned chunked flat coefficient lists consumed by the
    DMA kernel (gbuffer_pallas.gbuffer_tiles_dma).

    Each tile's (capped) segment of the sorted flat list is re-laid-out at a
    c-aligned start so the kernel can DMA (chunk-index * c)-offset slices.
    The position -> source mapping is pure gather (no scatter): a position p
    belongs to tile ptile(p) = searchsorted(aligned_starts, p) - 1 and reads
    source entry starts[ptile] + (p - aligned_starts[ptile]) when in range,
    else the sentinel triangle T.

    Returns:
      planes_flat (4, NCH*4c) — per chunk [e0|e1|e2|z] blocks, coef-major
      with a zero 4th coefficient row (DMA sublane-tiling pad),
          constants rebased to the owning tile's origin, invalid entries'
          e0 constant = -BIG;
      sel_flat (m_sel, NCH*c) — per chunk select rows
          [id, z_a, z_b, z_g, (a, b, g) per attribute value];
      start_chunks (n_tiles,) i32; n_chunks (n_tiles,) i32.
    """
    s_tri, s_tile, starts, counts = flat
    t_total = setup.valid.shape[0] - 1
    n_tiles = starts.shape[0]

    if v_attr is not None:
        attr_rows = _attr_planes_t(setup, tri, v_attr, a3)  # ((A+1)*3, T+1)
    else:
        attr_rows = jnp.zeros((3, t_total + 1), jnp.float32)
    nv = attr_rows.shape[0] // 3

    counts_c = jnp.minimum(counts, k_cap).astype(jnp.int32)
    aligned = (-(-counts_c // c) * c).astype(jnp.int32)
    astarts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(aligned)[:-1].astype(jnp.int32)]
    )

    # Per-CHUNK mapping (l_cap // c chunks), not per-position: a 56k-query
    # searchsorted plus per-position table gathers measured ~3.5 ms/view on
    # v5e (random gathers are ~7 ns/element). Each chunk's source entries
    # are CONTIGUOUS in the sorted flat list, so one tiny searchsorted over
    # chunks + vmapped contiguous dynamic slices replace them all.
    nch_total = l_cap // c
    start_chunks = astarts // c
    qidx = jnp.arange(nch_total, dtype=jnp.int32)
    chunk_tile = jnp.clip(
        jnp.searchsorted(start_chunks, qidx, side="right").astype(jnp.int32)
        - 1,
        0,
        n_tiles - 1,
    )  # (NCH,)
    chunk_rank = qidx - start_chunks[chunk_tile]
    s_tri_pad = jnp.concatenate(
        [s_tri, jnp.full((c,), t_total, jnp.int32)]
    )
    csrc = jnp.clip(
        starts[chunk_tile] + chunk_rank * c, 0, s_tri_pad.shape[0] - c
    )
    ccount = counts_c[chunk_tile] - chunk_rank * c  # live lanes in chunk

    ids2d = _chunk_windows(s_tri_pad, csrc, c, chunk_slice_mode)  # (NCH, c)
    lane = jnp.arange(c, dtype=jnp.int32)[None, :]
    live2d = lane < ccount[:, None]
    flat_ids = jnp.where(live2d, ids2d, t_total).reshape(l_cap)

    # ONE fused record gather per entry: 4 geometry planes + the attribute
    # planes. Everything before and after the gather keeps the
    # triangle/entry count on the LANE dim — per-entry layouts like
    # (l_cap, 4, 3) tile their (4, 3) minor dims to (8, 128) on TPU, a
    # ~85x VMEM/HBM blowup. The gather emitter's cost is per-row with a
    # per-element term (CLAUDE.md round-5), so rows carry no derivable
    # columns: the triangle id IS the gather index (hi/lo byte rows are
    # computed arithmetically below — split_bf16 keeps them exact up to
    # T = 2^24 through the two-pass select matmul), and validity is
    # pre-baked into a record-local copy of the e0 constant (BIG_NEG
    # swallows the |tile-origin|-sized rebase exactly in f32, so invalid
    # entries can never win coverage; setup.planes12 itself stays clean
    # because the attribute-plane build divides by its edge planes).
    planes_rec = (
        setup.planes12
        .at[0].set(jnp.where(setup.valid, setup.planes12[0], 0.0))
        .at[1].set(jnp.where(setup.valid, setup.planes12[1], 0.0))
        .at[2].set(jnp.where(setup.valid, setup.planes12[2], _BIG_NEG))
    )  # zeroed e0 alpha/beta keep the rebase from overflowing past BIG_NEG
    record_t = jnp.concatenate([planes_rec, attr_rows], axis=0)
    # (12 + 3nv, T+1)
    if defer:
        # Batched callers hoist the record gather out of their view vmap:
        # a batched (V, T+1, R) gather operand gets a PLANAR layout {1,2,0}
        # — each gathered row = R separate HBM transactions ~4 MB apart,
        # traced at 40.7 ns/row on the raw-1M scene (11.3 ms/view) vs the
        # 4-6 ns/row floor of 2D row-major tables. Flattening views into
        # the row dim recovers the row-major layout (on-chip probe:
        # 24.6 -> 18.3 ns/row at 24 cols; column-splitting LOSES, 23.4).
        return (
            _rows_to_records(record_t),  # (T+1, R); (V*(T+1), R) outside
            flat_ids,
            chunk_tile,
            start_chunks.astype(jnp.int32),
            (aligned // c).astype(jnp.int32),
        )
    rec_t = _rows_to_records(record_t)[flat_ids].T  # gather rows
    planes_flat, sel_flat = _flat_chunks_finish(
        rec_t, flat_ids, chunk_tile, n_tx, tile_w, tile_h, c, sub=sub
    )
    return (
        planes_flat,
        sel_flat,
        start_chunks.astype(jnp.int32),
        (aligned // c).astype(jnp.int32),
    )


def _flat_chunks_finish(
    rec_t: jnp.ndarray,  # (12 + 3nv, l_cap) gathered per-entry records
    flat_ids: jnp.ndarray,  # (l_cap,) triangle ids, t_total = dead lane
    chunk_tile: jnp.ndarray,  # (NCH,) owning tile per chunk
    n_tx: int,
    tile_w: int,
    tile_h: int,
    c: int,
    sub: int = 1,
):
    """Post-gather half of :func:`_flat_chunks`: tile-origin rebase + the
    chunk-contiguous [planes | select-rows] re-layout the DMA kernel reads.

    ``sub`` > 1 (RasterizerConfig.bin_subtile): ``chunk_tile`` indexes
    band-granular bins and ``tile_h`` holds the BAND height, but the rebase
    must stay at the OUTPUT-TILE origin (band-origin rebasing would change
    the per-pixel float expressions and break bit-identity with sub == 1;
    the kernel offsets each band's local ly by h * band_h instead)."""
    nv = (rec_t.shape[0] - 12) // 3
    l_cap = flat_ids.shape[0]
    nch_total = l_cap // c
    p12 = rec_t[:12].reshape(4, 3, l_cap)
    pa = p12[:, 0]  # (4, l_cap) alpha of e0, e1, e2, z
    pb = p12[:, 1]
    pgm = p12[:, 2]
    idv = jnp.stack(
        [
            (flat_ids // 256).astype(jnp.float32),
            (flat_ids % 256).astype(jnp.float32),
        ]
    )  # (2, l_cap) id hi/lo, derived — not gathered
    ap3 = rec_t[12 : 12 + 3 * nv].reshape(nv, 3, l_cap)

    ox = jnp.broadcast_to(
        ((chunk_tile % n_tx) * tile_w).astype(jnp.float32)[:, None],
        (nch_total, c),
    ).reshape(1, l_cap)
    oy_rows = (
        (chunk_tile // n_tx) // sub * (tile_h * sub) if sub > 1
        else (chunk_tile // n_tx) * tile_h
    )
    oy = jnp.broadcast_to(
        oy_rows.astype(jnp.float32)[:, None],
        (nch_total, c),
    ).reshape(1, l_cap)
    pg = pgm + pa * ox + pb * oy  # (4, l_cap) rebased constants
    # (validity already baked into the e0 record rows — dead lanes carry
    # alpha = beta = 0, gamma = _BIG_NEG, so pg[0] is exactly _BIG_NEG)
    ag = ap3[:, 2] + ap3[:, 0] * ox + ap3[:, 1] * oy  # (nv, l_cap)

    # Coef dim padded 3 -> 4 (zero row): DMA slice shapes must align to the
    # sublane tiling; the kernel's B matrix carries a matching zero row.
    planes_flat = jnp.stack(
        [pa, pb, pg, jnp.zeros_like(pg)], axis=0
    )  # (4 coef, 4 row, l_cap)
    planes_flat = (
        planes_flat.reshape(4, 4, nch_total, c)
        .transpose(0, 2, 1, 3)
        .reshape(4, nch_total * 4 * c)
    )

    m_sel = 5 + 3 * nv
    m_pad = -(-m_sel // 8) * 8
    val_rows = jnp.stack([ap3[:, 0], ap3[:, 1], ag], axis=1).reshape(
        3 * nv, l_cap
    )  # (a, b, g) per value
    sel_flat = jnp.concatenate(
        [
            idv,
            pa[3:4],
            pb[3:4],
            pg[3:4],
            val_rows,
            jnp.zeros((m_pad - m_sel, l_cap), jnp.float32),
        ],
        axis=0,
    )  # (m_pad, l_cap) chunk-contiguous

    return planes_flat, sel_flat


def _gather_tile_rows(
    all_planes: jnp.ndarray,  # (T+1, R, 3) rows: e0,e1,e2,z, attr..., den
    valid: jnp.ndarray,  # (T+1,)
    ids: jnp.ndarray,  # (n_tiles, K)
    tile_origin: jnp.ndarray,  # (n_tiles, 2)
) -> jnp.ndarray:
    """Gather + tile-rebase -> (n_tiles, R*K, 3) in R blocks of K rows."""
    planes = all_planes[ids]  # (n_tiles, K, R, 3)
    ox = tile_origin[:, 0][:, None, None]
    oy = tile_origin[:, 1][:, None, None]
    gamma = planes[..., 2] + planes[..., 0] * ox + planes[..., 1] * oy
    v = valid[ids]  # (n_tiles, K)
    gamma = gamma.at[..., 0].set(jnp.where(v, gamma[..., 0], _BIG_NEG))
    planes = jnp.concatenate([planes[..., :2], gamma[..., None]], axis=-1)
    n_tiles, k, r, _ = planes.shape
    # Transposed (coef-major) layout: minor dim R*K is lane-aligned. A
    # (rows, 3) minor-dim-3 layout would pad 3 -> 128 lanes in VMEM and
    # inflate the kernel's working set ~42x.
    return planes.transpose(0, 3, 2, 1).reshape(n_tiles, 3, r * k)


def _zattr_tile_xla(
    coeffs: jnp.ndarray,  # (3, R*K) coef-major
    n_attr: int,
    tile_h: int,
    tile_w: int,
    chunk: int,
    dot_precision=jax.lax.Precision.HIGHEST,
):
    """XLA scan version of the fused pass for one tile. Row blocks:
    [e0, e1, e2, z, id, a_0..a_{A-1}, den]. The id block is a constant
    plane (gamma = global triangle id), so ties and winner identification
    flow through the same matmul + min/where machinery — no index vectors.
    """
    r = 5 + n_attr + 1
    k = coeffs.shape[1] // r
    c = min(chunk, k)
    n_chunks = -(-k // c)
    p = tile_h * tile_w

    ly = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 0).reshape(-1) + 0.5
    lx = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 1).reshape(-1) + 0.5
    b_mat = jnp.stack([lx, ly, jnp.ones_like(lx)], axis=0)  # (3, P)

    pad = n_chunks * c - k
    if pad:
        pad_block = edge0_pad_block(r, pad, coeffs.dtype, _BIG_NEG)
        coeffs = jnp.concatenate([coeffs.reshape(3, r, k), pad_block], axis=2)
    else:
        coeffs = coeffs.reshape(3, r, k)

    def body(carry, coeffs_c):
        zbuf, idbuf, vbuf = carry  # (P,), (P,), (A+1, P)
        e = jax.lax.dot_general(
            coeffs_c.reshape(3, r * c), b_mat,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=dot_precision,
        ).reshape(r, c, p)
        z = e[3]
        idrow = e[4]
        cov = (e[0] >= 0) & (e[1] >= 0) & (e[2] >= 0) & (z >= -1.0) & (z <= 1.0)
        zc = jnp.where(cov, z, jnp.inf)
        zmin = jnp.min(zc, axis=0)  # (P,)
        id_cand = jnp.where(zc == zmin[None], idrow, jnp.float32(_BIG_SLOT))
        idmin = jnp.min(id_cand, axis=0)
        winner = (zc == zmin[None]) & (idrow == idmin[None])  # (C, P)
        vals = jnp.sum(jnp.where(winner[None], e[5:], 0.0), axis=1)  # (A+1, P)
        upd = zmin < zbuf
        zbuf = jnp.where(upd, zmin, zbuf)
        idbuf = jnp.where(upd, idmin, idbuf)
        vbuf = jnp.where(upd[None], vals, vbuf)
        return (zbuf, idbuf, vbuf), None

    init = (
        jnp.full((p,), jnp.inf, jnp.float32),
        jnp.full((p,), jnp.float32(_BIG_SLOT), jnp.float32),
        jnp.zeros((n_attr + 1, p), jnp.float32),
    )
    xs = coeffs.reshape(3, r, n_chunks, c).transpose(2, 0, 1, 3)
    (zbuf, idbuf, vbuf), _ = jax.lax.scan(body, init, xs)
    return zbuf, idbuf, vbuf


def _gbuffer_single(
    pos_clip: jnp.ndarray,
    tri: jnp.ndarray,
    v_attr: Optional[jnp.ndarray],
    height: int,
    width: int,
    config: RasterizerConfig,
    tri_attr: Optional[jnp.ndarray] = None,
    uv_mode: bool = False,
):
    from .rasterize import _resolve_backend

    config = config._replace(backend=_resolve_backend(config.backend, True))
    tile_h, tile_w = config.tile_h, config.tile_w
    ph = -(-height // tile_h) * tile_h
    pw = -(-width // tile_w) * tile_w
    n_ty, n_tx = ph // tile_h, pw // tile_w
    t_total = tri.shape[0]
    if uv_mode:
        n_attr = 2
    else:
        n_attr = 0 if v_attr is None else v_attr.shape[-1]

    setup = _triangle_setup(
        pos_clip, tri, width, height, backface_cull=config.backface_cull
    )
    max_per_tile = config.max_tris_per_tile or _auto_cap(t_total, n_ty * n_tx)

    # Constant id plane: evaluating it yields the global triangle id at
    # every pixel (alpha = beta = 0, gamma = id) — winner identity rides
    # the same matmul path instead of a gathered index vector.
    id_plane = jnp.zeros((t_total + 1, 1, 3), jnp.float32)
    id_plane = id_plane.at[:, 0, 2].set(
        jnp.arange(t_total + 1, dtype=jnp.float32)
    )

    if uv_mode:
        a = jnp.broadcast_to(
            jnp.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], jnp.float32)[
                None
            ],
            (t_total, 3, 2),
        )
        attr_planes = _attr_planes(setup, tri, jnp.zeros((1, 2)), a=a)
    elif v_attr is not None:
        a = v_attr[tri_attr] if tri_attr is not None else None
        attr_planes = _attr_planes(setup, tri, v_attr, a=a)  # (T+1, A+1, 3)
    else:
        attr_planes = jnp.zeros((t_total + 1, 1, 3), jnp.float32)
    all_planes = jnp.concatenate([setup.planes, id_plane, attr_planes], axis=1)

    tile_ix = jnp.arange(n_ty * n_tx, dtype=jnp.int32)
    ty0 = (tile_ix // n_tx * tile_h).astype(jnp.float32)
    tx0 = (tile_ix % n_tx * tile_w).astype(jnp.float32)
    origin = jnp.stack([tx0, ty0], axis=-1)

    n_tiles = n_ty * n_tx
    use_flat = (
        config.bin_mode == "sort_pairs"
        and t_total >= config.bin_sort_pairs_min_tris
        and (n_tiles + 1) * t_total < 2**31
    )
    tiny_on = config.bin_tiny_px > 0 and use_flat
    if config.bin_tiny_px > 1.0:
        raise ValueError(
            "bin_tiny_px must be <= 1.0 (a 1 px bbox is the single-"
            "candidate exactness bound)"
        )
    if use_flat:
        flat = _bin_flat(
            setup, width, height, tile_h, tile_w,
            config.bin_span_tiles_y, config.bin_span_tiles_x, config.bin_huge,
            config.bin_flat_cap_factor,
            n_med=config.bin_med, med_span_y=config.bin_med_span_y,
            med_span_x=config.bin_med_span_x,
            tiny_px=config.bin_tiny_px,
            cap_abs=config.bin_flat_cap_abs,
            small_cap=config.bin_small_cap,
            cull_margin=_CULL_MARGIN if config.bin_cull else 0.0,
        )
        coeffs, counts = _gather_tile_rows_flat(
            all_planes, setup.valid, flat, origin, min(max_per_tile, t_total),
            n_tx=n_tx, tile_w=tile_w, tile_h=tile_h,
        )
    else:
        ids, counts = _bin_dispatch(
            setup, width, height, tile_h, tile_w, max_per_tile, config
        )
        coeffs = _gather_tile_rows(all_planes, setup.valid, ids, origin)

    if config.backend == "vpu_pallas":
        from .gbuffer_pallas import zattr_tiles_vpu

        # Exact fp32 broadcast-FMA path — no MXU, no precision knob,
        # no T < 2^16 id limit (see gbuffer_pallas._kernel_vpu).
        z_t, id_t, v_t = zattr_tiles_vpu(
            coeffs, counts, n_attr + 1, tile_h, tile_w, config.chunk,
        )
    elif config.backend == "fused_pallas":
        from .gbuffer_pallas import zattr_tiles_pallas

        prec = config.dot_precision
        if prec == "high":
            prec = "highest"  # Precision.HIGH crashes Mosaic lowering
        if prec == "split_bf16" and t_total >= 2**16:
            prec = "highest"  # id-plane exactness limit
        z_t, id_t, v_t = zattr_tiles_pallas(
            coeffs, counts, n_attr + 1, tile_h, tile_w, config.chunk,
            _PRECISIONS[prec],
        )
    else:
        z_t, id_t, v_t = jax.vmap(
            lambda co: _zattr_tile_xla(
                co, n_attr, tile_h, tile_w, config.chunk,
                _PRECISIONS.get(
                    config.dot_precision
                    if config.dot_precision != "split_bf16" else "highest",
                    jax.lax.Precision.HIGHEST,
                ),
            )
        )(coeffs)
        z_t = z_t.reshape(-1, tile_h, tile_w)
        id_t = id_t.reshape(-1, tile_h, tile_w)
        v_t = v_t.reshape(-1, n_attr + 1, tile_h, tile_w)

    def detile(x):  # (n_tiles, th, tw) -> (H, W)
        return (
            x.reshape(n_ty, n_tx, tile_h, tile_w)
            .transpose(0, 2, 1, 3)
            .reshape(ph, pw)[:height, :width]
        )

    z = detile(z_t)
    tid = detile(id_t)
    vals = None
    if n_attr > 0:
        vals = jax.vmap(detile, in_axes=1, out_axes=0)(v_t)  # (A+1, H, W)

    if tiny_on:
        from .rasterize import _tiny_mask

        rows12 = setup.planes.reshape(t_total + 1, 12).T
        attr_rows = (
            all_planes[:, 5:].reshape(t_total + 1, -1).T
            if n_attr > 0 else None
        )
        bbox4 = setup.bbox.T
        z_tiny, id_tiny, v_tiny = _tiny_images(
            rows12, attr_rows, bbox4,
            _tiny_mask(setup, config.bin_tiny_px), height, width,
            tile_h, tile_w, cap=config.bin_tiny_cap,
        )
        z, tid, vals = _merge_zidvals(z, tid, vals, z_tiny, id_tiny, v_tiny)

    mask = jnp.isfinite(z) & (tid < jnp.float32(_BIG_SLOT))
    z = jnp.where(mask, z, 0.0)
    tri_id = jnp.where(mask, tid.astype(jnp.int32) + 1, 0)

    attr = None
    if n_attr > 0:
        den = vals[-1]
        den = jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)
        attr = jnp.where(
            mask[None], vals[:-1] / den[None], 0.0
        ).transpose(1, 2, 0)  # (H, W, A)
    return mask, z, tri_id, attr


def _gbuffer_dma_batched(
    pos, tri, v_attr, height, width, config, tri_attr=None, uv_mode=False,
    pos_world=None, mvp=None,
):
    """v2 fast path: vmapped host prep (setup/bin/aligned flat lists) + ONE
    batched DMA kernel over the (views, tiles) grid; outputs land directly
    in image layout (no detile pass).

    ``tri_attr``: corner indices for v_attr when the attribute topology
    differs from the position topology (uv_precompute interpolates v_pos
    over t_pos_idx while rasterizing t_tex_idx). ``uv_mode``: emit the
    nvdiffrast (u, v) barycentrics as 2 attribute channels (one-hot corner
    attrs) so ``rasterize`` needs no per-pixel resolve gather."""
    from .gbuffer_pallas import gbuffer_tiles_dma

    tile_h, tile_w = config.tile_h, config.tile_w
    ph = -(-height // tile_h) * tile_h
    pw = -(-width // tile_w) * tile_w
    n_ty, n_tx = ph // tile_h, pw // tile_w
    n_tiles = n_ty * n_tx
    t_total = tri.shape[0]
    if uv_mode:
        n_attr, v_attr = 2, jnp.zeros((1, 2), jnp.float32)
    else:
        n_attr = 0 if v_attr is None else v_attr.shape[-1]
    nv = n_attr + 1 if n_attr > 0 else 1

    # Sub-tile row banding (RasterizerConfig.bin_subtile): bin at
    # band_h = tile_h/sub row granularity so each chunk's entries evaluate
    # against only its band's pixels in the kernel. The bin grid must
    # exactly tile the PADDED output grid (every output tile owns `sub`
    # bins), so the band binning sees height = ph.
    sub = config.bin_subtile
    if sub < 1 or tile_h % sub:
        raise ValueError(
            f"bin_subtile ({sub}) must be >= 1 and divide tile_h ({tile_h})"
        )
    band_h = tile_h // sub
    bin_height = ph if sub > 1 else height
    n_bins = n_tiles * sub

    c = max(128, (config.chunk // 128) * 128)
    k_cap = min(
        config.max_tris_per_tile or _auto_cap(t_total, n_bins), t_total
    )
    cap_factor = config.bin_flat_cap_factor
    span = config.bin_span_tiles_y * config.bin_span_tiles_x
    l_keys = t_total * span + (
        min(config.bin_huge, t_total) * n_bins if config.bin_huge > 0 else 0
    )
    if config.bin_med > 0:
        l_keys += (
            min(config.bin_med, t_total)
            * config.bin_med_span_y * config.bin_med_span_x
        )
    if cap_factor > 0:
        l_keys = min(l_keys, cap_factor * t_total)
    if config.bin_flat_cap_abs > 0:
        l_keys = min(l_keys, config.bin_flat_cap_abs)
    # Upper bound on the sum of c-aligned (capped) segment lengths.
    l_cap = min(l_keys + n_bins * (c - 1), n_bins * (-(-k_cap // c) * c))
    l_cap = -(-l_cap // c) * c
    # Grouped DMA streaming (dma_group): group-align the flat chunk count
    # so the kernel's absolute-index group fetches stay in bounds (the
    # extra <= group-1 chunks are dead sentinel entries).
    grp = (
        config.dma_group
        if (config.bin_subtile == 1 and config.kernel_unroll == 1)
        else 1
    )
    if grp > 1:
        l_cap = -(-l_cap // (c * grp)) * (c * grp)

    # Hoist the triangle-corner gathers out of the view vmap: the indices
    # are view-independent, and gather cost is per-row.
    bsz = pos.shape[0]
    n_vert = pos.shape[1]
    vmajor = tri.T.reshape(-1)
    # When positions and attributes share the corner indices (no foreign
    # attr topology, no uv_mode), ONE (3T, 4+A) row gather feeds both —
    # gather cost is per-row, so the second 3T-row gather was pure floor
    # (traced 2.2 ms/view each at 1M tris, fusion.3/fusion.6).
    fuse_corners = (
        pos_world is not None and mvp is not None
        and not uv_mode and v_attr is not None and tri_attr is None
    )
    if fuse_corners:
        combo = jnp.concatenate(
            [pos_world, jnp.ones_like(pos_world[:, :1]), v_attr], axis=-1
        )[vmajor]  # (3T, 4 + A)
        w4 = combo[:, :4].T  # (4, 3T)
        v_all = jnp.einsum(
            "bij,jt->bit", mvp, w4, precision=jax.lax.Precision.HIGHEST
        ).reshape(bsz, 4, 3, t_total)
        a3 = combo[:, 4:].T.reshape(v_attr.shape[1], 3, t_total)
    elif pos_world is not None and mvp is not None:
        # Fastest: gather WORLD corners once (view-independent, 4 cols),
        # then transform per view with a (4, 4) @ (4, 3T) MXU matmul.
        # The per-view (3T, B*4)-row clip-corner gather this replaces
        # measured 0.87 ms/view at 10k tris on v5e — the single largest
        # fixed cost of the whole render. Same contraction, same HIGHEST
        # precision as get_clip_space_position -> bit-identical clip
        # coordinates.
        w4 = jnp.concatenate(
            [pos_world, jnp.ones_like(pos_world[:, :1])], axis=-1
        )[vmajor].T  # (4, 3T)
        v_all = jnp.einsum(
            "bij,jt->bit", mvp, w4, precision=jax.lax.Precision.HIGHEST
        ).reshape(bsz, 4, 3, t_total)
    else:
        # ONE (3T, B*4) gather replaces B (3T, 4) gathers.
        v_all = (
            pos.transpose(1, 0, 2).reshape(n_vert, bsz * 4)[vmajor]
            .T.reshape(bsz, 4, 3, t_total)
        )
    if fuse_corners:
        pass  # a3 set above
    elif uv_mode:
        a3 = _uv_corner_attrs_t(t_total)
    elif v_attr is not None:
        am = tri_attr.T.reshape(-1) if tri_attr is not None else vmajor
        a3 = v_attr[am].T.reshape(v_attr.shape[1], 3, t_total)
    else:
        a3 = None

    tiny_on = config.bin_tiny_px > 0
    if config.bin_tiny_px > 1.0:
        raise ValueError(
            "bin_tiny_px must be <= 1.0 (a 1 px bbox is the single-"
            "candidate exactness bound)"
        )

    def prep(pos_clip, v4):
        setup = _triangle_setup_t(
            pos_clip, tri, width, height, v4=v4,
            backface_cull=config.backface_cull,
        )
        flat = _bin_flat(
            setup, width, bin_height, band_h, tile_w,
            config.bin_span_tiles_y, config.bin_span_tiles_x,
            config.bin_huge, cap_factor,
            n_med=config.bin_med, med_span_y=config.bin_med_span_y,
            med_span_x=config.bin_med_span_x,
            tiny_px=config.bin_tiny_px,
            cap_abs=config.bin_flat_cap_abs,
            small_cap=config.bin_small_cap,
            cull_margin=_CULL_MARGIN if config.bin_cull else 0.0,
        )
        chunks = _flat_chunks(
            setup, tri, v_attr, flat, k_cap, n_tx, tile_w, band_h, c, l_cap,
            a3=a3, chunk_slice_mode=config.chunk_slice_mode, defer=True,
        )
        if not tiny_on:
            return chunks, (None, None, None)
        from .rasterize import _tiny_mask

        attr_rows = None
        if n_attr > 0:
            attr_rows = _attr_planes_t(setup, tri, v_attr, a3=a3)
        tiny_imgs = _tiny_images(
            setup.planes12, attr_rows, setup.bbox4,
            _tiny_mask(setup, config.bin_tiny_px), height, width,
            tile_h, tile_w, defer=n_attr > 0, cap=config.bin_tiny_cap,
        )
        return chunks, tiny_imgs

    (rtab_t, flat_ids, chunk_tile, start_chunks, n_chunks), tiny_imgs = (
        jax.vmap(prep)(pos, v_all)
    )

    # Both record gathers run OUTSIDE the view vmap over flat 2D tables
    # with per-view global row offsets — see the layout note in
    # _flat_chunks (planar batched-table layout, ~2.2x per row).
    goff = jnp.arange(bsz, dtype=jnp.int32)[:, None] * (t_total + 1)
    r_cols = rtab_t.shape[-1]
    rec = rtab_t.reshape(bsz * (t_total + 1), r_cols)[
        (flat_ids + goff).reshape(-1)
    ]
    rec_t_b = rec.reshape(bsz, l_cap, r_cols).transpose(0, 2, 1)
    planes_flat, sel_flat = jax.vmap(
        functools.partial(
            _flat_chunks_finish, n_tx=n_tx, tile_w=tile_w, tile_h=band_h,
            c=c, sub=sub,
        )
    )(rec_t_b, flat_ids, chunk_tile)

    if tiny_on and n_attr > 0:
        tid_img_b, ttab_b = tiny_imgs  # (V, HW), (V, T+1, m+1)
        trow = jnp.where(tid_img_b == _I32_MAX, t_total, tid_img_b) + goff
        g_b = ttab_b.reshape(bsz * (t_total + 1), ttab_b.shape[-1])[
            trow.reshape(-1)
        ].reshape(bsz, height * width, -1)
        tiny_imgs = jax.vmap(
            functools.partial(
                _tiny_finish, height=height, width=width,
                tile_h=tile_h, tile_w=tile_w,
            )
        )(g_b, tid_img_b)

    prec = config.dot_precision
    if prec == "high":
        prec = "highest"  # Precision.HIGH crashes Mosaic lowering
    if prec == "split_bf16" and config.sel_pack:
        # Pre-split the select rows into stacked bf16 hi/lo AT PREP TIME:
        # the kernel then issues ONE (2*m_pad, c) @ (c, P) select dot per
        # chunk instead of two (the MXU pads both row counts to the same
        # output tile, so the second dot was a whole extra pass set) and
        # skips the per-chunk cast/subtract. NOT bit-identical to the
        # in-kernel split (XLA's f32->bf16 rounding differs from Mosaic's
        # at the last bit, so reconstructed planes differ at the usual
        # split_bf16 noise level and z-ties can flip) — covered by the
        # on-chip precision gate like every split_bf16 path. id hi/lo
        # byte rows are < 256 and bf16-exact under EITHER rounding.
        # lax.reduce_precision, NOT astype round-trips: under
        # --xla_allow_excess_precision XLA elides f32->bf16->f32 convert
        # pairs, which silently turned s_lo into bf16(x - x) = 0 and
        # dropped the whole lo compensation (caught by the on-chip
        # precision gate: p99.9 |dn| jumped 20x).
        hi_f32 = jax.lax.reduce_precision(sel_flat, 8, 7)
        s_hi = hi_f32.astype(jnp.bfloat16)
        s_lo = (sel_flat - hi_f32).astype(jnp.bfloat16)
        sel_flat = jnp.concatenate([s_hi, s_lo], axis=1)
    if t_total >= 2**24:
        # ids ride hi/lo f32 byte rows whose 256*hi + lo merge is only
        # f32-exact below 2^24 — in EVERY precision mode. Silently
        # rounding winner ids would corrupt downstream id lookups.
        raise ValueError(
            f"DMA G-buffer path supports < 2^24 triangles (got {t_total}); "
            "decimate first (meshproc / build_lod_chain)"
        )
    z, idm, vals = gbuffer_tiles_dma(
        planes_flat, sel_flat, start_chunks, n_chunks,
        nv, tile_h, tile_w, n_ty, n_tx, c, _PRECISIONS[prec],
        config.kernel_unroll, config.winner_mode, sub, grp, config.cov_mode,
    )
    z = z[:, :height, :width]
    idm = idm[:, :height, :width]
    vals = vals[:, :, :height, :width] if v_attr is not None else None

    if tiny_on:
        z_t, id_t, v_t = tiny_imgs
        z, idm, vals = _merge_zidvals(z, idm, vals, z_t, id_t, v_t)

    mask = jnp.isfinite(z) & (idm < jnp.float32(_BIG_SLOT))
    z = jnp.where(mask, z, 0.0)
    tri_id = jnp.where(mask, idm.astype(jnp.int32) + 1, 0)

    attr = None
    if v_attr is not None:
        den = vals[:, -1]
        den = jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)
        attr = jnp.where(
            mask[:, None], vals[:, :-1] / den[:, None], 0.0
        ).transpose(0, 2, 3, 1)
    return mask, z, tri_id, attr


def _gbuffer_core(
    pos, tri, v_attr, height, width, config, tri_attr=None, uv_mode=False,
    pos_world=None, mvp=None,
):
    """Batched G-buffer dispatch (unjitted; rasterize's flat path calls
    this from inside its own jit)."""
    from .rasterize import _resolve_backend

    config = config._replace(backend=_resolve_backend(config.backend, True))
    tile_h, tile_w = config.tile_h, config.tile_w
    n_tiles = (-(-height // tile_h)) * (-(-width // tile_w))
    t_total = tri.shape[0]
    # Sort keys are bin * T + tri; band binning (bin_subtile) multiplies
    # the bin count, so the int32 key-space guard must use the BIN grid.
    n_bins = n_tiles * max(config.bin_subtile, 1)
    use_flat = (
        config.bin_mode == "sort_pairs"
        and t_total >= config.bin_sort_pairs_min_tris
        and (n_bins + 1) * t_total < 2**31
    )
    if config.backend == "fused_pallas" and use_flat:
        return _gbuffer_dma_batched(
            pos, tri, v_attr, height, width, config,
            tri_attr=tri_attr, uv_mode=uv_mode,
            pos_world=pos_world, mvp=mvp,
        )
    return jax.vmap(
        lambda p: _gbuffer_single(
            p, tri, v_attr, height, width, config,
            tri_attr=tri_attr, uv_mode=uv_mode,
        )
    )(pos)


@functools.partial(jax.jit, static_argnums=(3, 4))
def _gbuffer_batched(
    pos, tri, v_attr, resolution, config, tri_attr=None,
    pos_world=None, mvp=None,
):
    height, width = resolution
    return _gbuffer_core(
        pos, tri, v_attr, height, width, config, tri_attr=tri_attr,
        pos_world=pos_world, mvp=mvp,
    )


def rasterize_gbuffer(
    pos: jnp.ndarray,
    tri: jnp.ndarray,
    v_attr: Optional[jnp.ndarray],
    resolution: Tuple[int, int],
    config: RasterizerConfig = DEFAULT_CONFIG,
    tri_attr: Optional[jnp.ndarray] = None,
    pos_world: Optional[jnp.ndarray] = None,
    mvp: Optional[jnp.ndarray] = None,
) -> GBufferOutput:
    """Fused rasterization + perspective-correct attribute interpolation.

    pos (B, V, 4) clip positions; tri (T, 3); v_attr (V, A) or None.
    ``tri_attr`` (T, 3): corner indices for v_attr when the attribute
    topology differs from the rasterized one (e.g. interpolating v_pos over
    t_pos_idx while rasterizing the UV atlas over t_tex_idx).
    ``pos_world`` (V, 3) + ``mvp`` (B, 4, 4): when given, the fast path
    gathers world-space corners ONCE and transforms them per view with a
    tiny MXU matmul instead of gathering per-view clip rows — the gather
    was the single largest fixed cost per view (0.87 ms/view at 10k tris).
    Returns mask / z / tri_id / attr — all gather-free on the hot path.
    """
    pos = pos.astype(jnp.float32)
    tri = tri.astype(jnp.int32)
    if v_attr is not None:
        v_attr = v_attr.astype(jnp.float32)
    if tri_attr is not None:
        tri_attr = tri_attr.astype(jnp.int32)
    mask, z, tri_id, attr = _gbuffer_batched(
        pos, tri, v_attr, tuple(resolution), config, tri_attr,
        pos_world, mvp,
    )
    return GBufferOutput(mask=mask, z=z, tri_id=tri_id, attr=attr)

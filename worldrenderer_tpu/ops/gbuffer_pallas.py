"""Pallas kernel for the fused z + attribute G-buffer pass (see gbuffer.py).

Per tile: loop over chunks of C binned triangles; each of the
R = 5 + n_vals row blocks (3 edges, depth, constant-id plane, n_vals
attribute-numerator/denominator planes) evaluates with a (C, 3) @ (3, P)
MXU matmul; coverage, z-min, winner selection and the attribute mask-sums
run on the VPU with everything resident in VMEM. The constant-id plane
makes winner identification gather- and index-vector-free.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tensor import edge0_pad_block

__all__ = ["zattr_tiles_pallas", "zattr_tiles_vpu", "gbuffer_tiles_dma"]

_BIG_Z = 3.0e38
_BIG_SLOT = 2**30
_BIG_NEG = -3.0e38


def _kernel(nchunks_ref, coeffs_ref, z_out, id_out, v_out, *, k, c, n_vals,
            tile_h, tile_w, dot_precision):
    p = tile_h * tile_w
    r = 5 + n_vals
    # Dynamic per-tile trip count (scalar-prefetched): most tiles have far
    # fewer live triangles than K — skip the padded tail entirely.
    n_chunks = nchunks_ref[pl.program_id(0)]

    flat = jax.lax.broadcasted_iota(jnp.int32, (3, p), 1)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (3, p), 0)
    lx = (flat % tile_w).astype(jnp.float32) + 0.5
    ly = (flat // tile_w).astype(jnp.float32) + 0.5
    b_mat = jnp.where(rowid == 0, lx, jnp.where(rowid == 1, ly, 1.0))

    def body(ci, carry):
        zbuf, idbuf, vbuf = carry  # (1,P) f32, (1,P) f32, (n_vals,P) f32
        # Chunk-major layout: all r row-blocks of this chunk are ONE
        # contiguous (3, r*c) slice -> a single MXU matmul per chunk
        # (vs r small dots). r*c is a multiple of 128 (c = 128m).
        a_t = coeffs_ref[0, :, pl.ds(pl.multiple_of(ci * (r * c), 128), r * c)]
        if dot_precision == "split_bf16":
            # bf16 hi/lo split reconstructs near-fp32: the B matrix entries
            # are half-integer pixel coords < 256, which bf16 represents
            # EXACTLY, so splitting only the coefficients suffices:
            #   a @ B = hi @ B + lo @ B   (fp32 accumulation on the MXU).
            # The hi/lo passes are MERGED into one depth-6 contraction
            # against [B; B] — the MXU pads any contraction below 128 to a
            # full pass, so separate dots paid twice. Requires triangle ids
            # < 2^16 for exact id-plane reconstruction (gated by caller).
            a_hi = a_t.astype(jnp.bfloat16)
            a_lo = (a_t - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            b_bf = b_mat.astype(jnp.bfloat16)
            e_all = jax.lax.dot_general(
                jnp.concatenate([a_hi, a_lo], axis=0),
                jnp.concatenate([b_bf, b_bf], axis=0),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (r*c, P)
        else:
            e_all = jax.lax.dot_general(
                a_t, b_mat,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision,
            )  # (r*c, P)

        def plane(block):
            return e_all[block * c : (block + 1) * c]

        e0 = plane(0)
        e1 = plane(1)
        e2 = plane(2)
        z = plane(3)
        idrow = plane(4)
        cov = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0) & (z >= -1.0) & (z <= 1.0)
        zc = jnp.where(cov, z, _BIG_Z)
        zmin = jnp.min(zc, axis=0, keepdims=True)  # (1, P)
        id_cand = jnp.where(zc == zmin, idrow, jnp.float32(_BIG_SLOT))
        idmin = jnp.min(id_cand, axis=0, keepdims=True)
        winner = (zc == zmin) & (idrow == idmin)  # (C, P)

        upd = zmin < zbuf
        zbuf = jnp.where(upd, zmin, zbuf)
        idbuf = jnp.where(upd, idmin, idbuf)

        new_vals = []
        for vi in range(n_vals):
            val = plane(5 + vi)  # (C, P)
            vsel = jnp.sum(jnp.where(winner, val, 0.0), axis=0, keepdims=True)
            new_vals.append(jnp.where(upd, vsel, vbuf[vi : vi + 1]))
        vbuf = jnp.concatenate(new_vals, axis=0)
        return zbuf, idbuf, vbuf

    init = (
        jnp.full((1, p), _BIG_Z, jnp.float32),
        jnp.full((1, p), jnp.float32(_BIG_SLOT), jnp.float32),
        jnp.zeros((n_vals, p), jnp.float32),
    )
    zbuf, idbuf, vbuf = jax.lax.fori_loop(0, n_chunks, body, init)
    z_out[0, :, :] = jnp.where(zbuf >= _BIG_Z, jnp.inf, zbuf)
    id_out[0, :, :] = idbuf
    v_out[0, :, :] = vbuf


def _kernel_vpu(nchunks_ref, coeffs_ref, z_out, id_out, v_out, *, k, c,
                n_vals, tile_h, tile_w, sub_p):
    """VPU formulation: pixels on SUBLANES, the chunk's triangles on LANES.

    The MXU path evaluates planes as (r*c, 3) @ (3, P) dots whose
    contraction dim (3) pads to the full 128-deep systolic array — 3/128
    utilization. Here each plane is two broadcast FMAs on the VPU:
        e[p, t] = lx[p, t] * alpha[1, t] + ly[p, t] * beta[1, t] + gamma[1, t]
    with alpha/beta/gamma read directly as (1, c) lane vectors from the
    coef-major layout (no transpose). Exact fp32 — no split_bf16 passes and
    no T < 2^16 id limit. The constant-id plane needs no evaluation at all:
    its gamma row IS the id lane vector.

    Measured (v5e, 6-view 512^2, 10k tris): ~10x SLOWER than the MXU path —
    Mosaic lowers the broadcast FMA chains far below VPU peak. Kept as an
    exact-fp32 on-chip validation backend (e.g. to check split_bf16 renders
    without a CPU round-trip), not as a performance path.

    Winner selection keeps per-LANE-SLOT running (z, id, attr) buffers
    updated elementwise each chunk; one cross-lane min/min/mask-sum per tile
    at the end. Flat-segment entries ascend by triangle id, so a strict
    z < zbuf update preserves the reference's lowest-id tie-break within a
    slot, and the final cross-lane id-min handles ties across slots.
    """
    p = tile_h * tile_w
    r = 5 + n_vals
    n_chunks = nchunks_ref[pl.program_id(0)]

    z_parts, id_parts, v_parts = [], [], []
    for s in range(p // sub_p):
        pix = jax.lax.broadcasted_iota(jnp.int32, (sub_p, c), 0) + s * sub_p
        lx = (pix % tile_w).astype(jnp.float32) + 0.5
        ly = (pix // tile_w).astype(jnp.float32) + 0.5

        def body(ci, carry):
            zbuf, idbuf, vbuf = carry  # (sub_p, c), (sub_p, c), (sub_p, c*n_vals)
            base = ci * (r * c)

            def ev(b):
                v3 = coeffs_ref[0, :, pl.ds(pl.multiple_of(base + b * c, 128), c)]
                return lx * v3[0:1] + ly * v3[1:2] + v3[2:3]  # (sub_p, c)

            e0 = ev(0)
            e1 = ev(1)
            e2 = ev(2)
            z = ev(3)
            idrow = coeffs_ref[
                0, 2, pl.ds(pl.multiple_of(base + 4 * c, 128), c)
            ].reshape(1, c)
            cov = (
                (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
                & (z >= -1.0) & (z <= 1.0)
            )
            zc = jnp.where(cov, z, _BIG_Z)
            upd = zc < zbuf
            zbuf = jnp.where(upd, zc, zbuf)
            idbuf = jnp.where(upd, jnp.broadcast_to(idrow, (sub_p, c)), idbuf)
            new_v = [
                jnp.where(upd, ev(5 + vi), vbuf[:, vi * c : (vi + 1) * c])
                for vi in range(n_vals)
            ]
            return zbuf, idbuf, jnp.concatenate(new_v, axis=1)

        init = (
            jnp.full((sub_p, c), _BIG_Z, jnp.float32),
            jnp.full((sub_p, c), jnp.float32(_BIG_SLOT), jnp.float32),
            jnp.zeros((sub_p, c * n_vals), jnp.float32),
        )
        zbuf, idbuf, vbuf = jax.lax.fori_loop(0, n_chunks, body, init)

        zmin = jnp.min(zbuf, axis=1, keepdims=True)  # (sub_p, 1)
        idc = jnp.where(zbuf == zmin, idbuf, jnp.float32(_BIG_SLOT))
        idmin = jnp.min(idc, axis=1, keepdims=True)
        winner = (zbuf == zmin) & (idbuf == idmin)
        z_parts.append(jnp.where(zmin >= _BIG_Z, jnp.inf, zmin))
        id_parts.append(idmin)
        v_parts.append(
            jnp.concatenate(
                [
                    jnp.sum(
                        jnp.where(winner, vbuf[:, vi * c : (vi + 1) * c], 0.0),
                        axis=1, keepdims=True,
                    )
                    for vi in range(n_vals)
                ],
                axis=1,
            )
        )

    z_out[0, :, :] = jnp.concatenate(z_parts, axis=0)
    id_out[0, :, :] = jnp.concatenate(id_parts, axis=0)
    v_out[0, :, :] = jnp.concatenate(v_parts, axis=0)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def zattr_tiles_vpu(
    coeffs: jnp.ndarray,  # (n_tiles, 3, R*K) coef-major, R = 5 + n_vals
    counts: jnp.ndarray,  # (n_tiles,) live-entry counts (contiguous prefix)
    n_vals: int,
    tile_h: int,
    tile_w: int,
    chunk: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """VPU-path twin of :func:`zattr_tiles_pallas` (see _kernel_vpu)."""
    n_tiles, _, rk = coeffs.shape
    r = 5 + n_vals
    k = rk // r
    c = max(128, (chunk // 128) * 128)
    pad = (-k) % c
    if pad:
        # Broadcast a bytes-sized template: the zeros().at[].set scatter
        # form constant-folds into an (n_tiles, 3, r, pad) baked literal
        # (see ops/tensor.py:edge0_pad_block).
        pad_block = jnp.broadcast_to(
            edge0_pad_block(r, pad, coeffs.dtype, _BIG_NEG)[None],
            (n_tiles, 3, r, pad),
        )
        coeffs = jnp.concatenate(
            [coeffs.reshape(n_tiles, 3, r, k), pad_block], axis=3
        ).reshape(n_tiles, 3, r * (k + pad))
        k += pad

    n_chunks = jnp.ceil(counts.astype(jnp.float32) / c).astype(jnp.int32)
    nch = k // c
    coeffs = (
        coeffs.reshape(n_tiles, 3, r, nch, c)
        .transpose(0, 1, 3, 2, 4)
        .reshape(n_tiles, 3, r * k)
    )

    p = tile_h * tile_w
    sub_p = min(p, 1024)  # bound the (sub_p, c) running buffers' VMEM
    kernel = functools.partial(
        _kernel_vpu, k=k, c=c, n_vals=n_vals, tile_h=tile_h, tile_w=tile_w,
        sub_p=sub_p,
    )
    interpret = jax.default_backend() not in ("tpu", "axon")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 3, r * k), lambda i, nc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, p, 1), lambda i, nc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 1), lambda i, nc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, n_vals), lambda i, nc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    z, idm, vals = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, p, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, p, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, p, n_vals), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * n_tiles * r * k * p,
            bytes_accessed=n_tiles * (r * k * 3 * 4 + (n_vals + 2) * p * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_chunks, coeffs)
    return (
        z.reshape(n_tiles, tile_h, tile_w),
        idm.reshape(n_tiles, tile_h, tile_w),
        vals.transpose(0, 2, 1).reshape(n_tiles, n_vals, tile_h, tile_w),
    )


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def zattr_tiles_pallas(
    coeffs: jnp.ndarray,  # (n_tiles, 3, R*K) coef-major, R = 5 + n_vals
    counts: jnp.ndarray,  # (n_tiles,) live-entry counts (contiguous prefix)
    n_vals: int,
    tile_h: int,
    tile_w: int,
    chunk: int,
    dot_precision=jax.lax.Precision.HIGHEST,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (z, id (f32 raw, BIG=bg), vals) per tile."""
    n_tiles, _, rk = coeffs.shape
    r = 5 + n_vals
    k = rk // r
    # Lane-dim slicing alignment: chunk and K must be multiples of 128.
    c = max(128, (chunk // 128) * 128)
    pad = (-k) % c
    if pad:
        # Broadcast a bytes-sized template: the zeros().at[].set scatter
        # form constant-folds into an (n_tiles, 3, r, pad) baked literal
        # (see ops/tensor.py:edge0_pad_block).
        pad_block = jnp.broadcast_to(
            edge0_pad_block(r, pad, coeffs.dtype, _BIG_NEG)[None],
            (n_tiles, 3, r, pad),
        )
        coeffs = jnp.concatenate(
            [coeffs.reshape(n_tiles, 3, r, k), pad_block], axis=3
        ).reshape(n_tiles, 3, r * (k + pad))
        k += pad

    n_chunks = jnp.ceil(counts.astype(jnp.float32) / c).astype(jnp.int32)

    # Re-layout block-major (3, r, K) -> chunk-major (3, nch, r, c) so each
    # chunk's rows are contiguous for the fused single-dot kernel.
    # (Emitting chunk-major directly from the gather was measured SLOWER —
    # 12 vmapped dynamic slices per tile lose to one slice + fused transpose.)
    nch = k // c
    coeffs = (
        coeffs.reshape(n_tiles, 3, r, nch, c)
        .transpose(0, 1, 3, 2, 4)
        .reshape(n_tiles, 3, r * k)
    )

    p = tile_h * tile_w
    kernel = functools.partial(
        _kernel, k=k, c=c, n_vals=n_vals, tile_h=tile_h, tile_w=tile_w,
        dot_precision=dot_precision,
    )
    interpret = jax.default_backend() not in ("tpu", "axon")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 3, r * k), lambda i, nc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, p), lambda i, nc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda i, nc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_vals, p), lambda i, nc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    z, idm, vals = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, n_vals, p), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * r * k * 3 * p,
            bytes_accessed=n_tiles * (r * k * 3 * 4 + (n_vals + 2) * p * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_chunks, coeffs)
    return (
        z.reshape(n_tiles, tile_h, tile_w),
        idm.reshape(n_tiles, tile_h, tile_w),
        vals.reshape(n_tiles, n_vals, tile_h, tile_w),
    )


def _kernel_dma(
    start_ref,  # (B, n_tiles) i32 scalar-prefetch: first chunk index per tile
    nch_ref,  # (B, n_tiles) i32 scalar-prefetch: chunk count per tile
    planes_hbm,  # (B, 4, NCH*4c) f32 in HBM: per chunk [e0|e1|e2|z],
    #               coef-major with a zero 4th coef row (DMA tiling pad)
    sel_hbm,  # (B, m_pad, NCH*c) f32 in HBM: per chunk select rows
    z_out,  # (1, th, tw)
    id_out,  # (1, th, tw)
    v_out,  # (1, n_vals, th, tw)
    pbuf,  # VMEM (2, 4, 4c) double-buffered plane coefficients
    sbuf,  # VMEM (2, m_pad, c) double-buffered select rows
    psem,
    ssem,
    *,
    c,
    n_vals,
    m_sel,
    tile_h,
    tile_w,
    dot_precision,
    unroll=1,
    winner_mode="dot",
    sel_packed=False,
    sub=1,
    n_tx=1,
    group=1,
    cov_mode="cmp",
):
    """Fused z/id/attr pass, v2: manual double-buffered DMA of the tile's
    flat 128-aligned coefficient segment + winner-select matmul.

    v1 evaluated every attribute plane at every pixel via (r*c, 3) @ (3, P)
    matmuls whose contraction dim (3) pads to the MXU's full 128 depth —
    42x padding waste that scaled with the attribute count. v2 evaluates
    only the 4 geometry rows (e0, e1, e2, z) per (triangle, pixel), builds
    the unique first-hit winner mask W (C, P), and SELECTS the winning
    triangle's attribute-plane coefficients with one (m_sel, C) @ (C, P)
    matmul — a full-depth contraction — then evaluates the selected planes
    once per pixel on the VPU at tile end. Attribute cost becomes nearly
    independent of the attribute count, and values/ids/depth come out
    fp32-exact (selection is exact; the final eval is an fp32 FMA).

    The first-hit mask (lowest row index among z-ties) equals the
    reference's min-id tie rule because flat segments ascend by triangle
    id; across chunks the strict zmin < zbuf update keeps the earlier
    (lower-id) chunk. Winner uniqueness comes from a lower-triangular
    ones matmul (inclusive prefix count == 1) — also full-depth MXU.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    p = tile_h * tile_w
    band_h = tile_h // sub
    p_eval = band_h * tile_w  # pixels per eval pass (== p when sub == 1)
    n_slots = pbuf.shape[0]

    flat = jax.lax.broadcasted_iota(jnp.int32, (4, p), 1)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (4, p), 0)
    lxf = (flat % tile_w).astype(jnp.float32) + 0.5
    lyf = (flat // tile_w).astype(jnp.float32) + 0.5
    b_mat = jnp.where(
        rowid == 0, lxf,
        jnp.where(rowid == 1, lyf, jnp.where(rowid == 2, 1.0, 0.0)),
    )  # full-tile B; sub > 1 builds per-band B matrices below
    lx = lxf[0:1]  # (1, P)
    ly = lyf[0:1]
    if winner_mode == "dot":
        tri_lower = (
            jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
            >= jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
        ).astype(jnp.bfloat16)

    def pdma(slot, ci):
        return pltpu.make_async_copy(
            planes_hbm.at[b, :, pl.ds(ci * (4 * c), 4 * c)],
            pbuf.at[slot],
            psem.at[slot],
        )

    def sdma(slot, ci):
        return pltpu.make_async_copy(
            sel_hbm.at[b, :, pl.ds(ci * c, c)],
            sbuf.at[slot],
            ssem.at[slot],
        )

    def eval_chunk(slot, b_mat=b_mat, p=p, q=None):
        """One chunk's (zmin, sel): coverage eval + unique-winner select.

        ``q``: sub-chunk index within a grouped DMA fetch (dma_group > 1) —
        the chunk's coefficients live at a 128-aligned lane offset inside
        the group-sized VMEM buffers instead of filling them."""
        if q is None:
            a_t = pbuf[slot]  # (4, 4c); zero 4th coef row pairs with B row 3
            a_s = sbuf[slot]  # (m_pad, c); rows beyond m_sel are zero pad
        else:
            a_t = pbuf[slot, :, pl.ds(pl.multiple_of(q * (4 * c), 128), 4 * c)]
            a_s = sbuf[slot, :, pl.ds(pl.multiple_of(q * c, 128), c)]
        if dot_precision == "split_bf16":
            # hi/lo passes MERGED into one depth-8 contraction against
            # [B; B]: the MXU pads any contraction below 128 to one full
            # pass, so two separate depth-4 dots paid 2x for nothing.
            # fp32 accumulation of the same 8 partial products — same
            # reconstruction, half the coverage-eval MXU work.
            a_hi = a_t.astype(jnp.bfloat16)
            a_lo = (a_t - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            b_bf = b_mat.astype(jnp.bfloat16)
            e_all = jax.lax.dot_general(
                jnp.concatenate([a_hi, a_lo], axis=0),
                jnp.concatenate([b_bf, b_bf], axis=0),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (4c, P)
        else:
            e_all = jax.lax.dot_general(
                a_t, b_mat,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision,
            )

        e0 = e_all[0:c]
        e1 = e_all[c : 2 * c]
        e2 = e_all[2 * c : 3 * c]
        z = e_all[3 * c : 4 * c]
        if cov_mode == "bits":
            # Sign-bit coverage: 4 cmp + 3 and + 1 where (9 VPU passes over
            # (c, P)) become 2 or + 1 and-mask + 2 cmp + 1 and (bitcasts are
            # free re-interpretations). e >= 0 == sign(e0|e1|e2) == 0 and
            # |z| <= 1 == (bits(z) & 0x7fffffff) <= bits(1.0). Exactness:
            # float e >= 0.0 differs from the sign-bit test ONLY at
            # e == -0.0, which no live entry can produce — every edge row
            # has (alpha, beta) != (0, 0) (zero-area triangles are invalid
            # and carry e0 = -BIG), pixel coords are > 0, and an IEEE
            # round-to-nearest sum with any nonzero addend that cancels to
            # zero yields +0.0. NaN z is excluded by both forms (NaN bits
            # compare above bits(1.0)).
            def _bits(v):
                return jax.lax.bitcast_convert_type(v, jnp.int32)

            cov = ((_bits(e0) | _bits(e1) | _bits(e2)) >= 0) & (
                (_bits(z) & jnp.int32(0x7FFFFFFF)) <= jnp.int32(0x3F800000)
            )
        else:
            # (A min-tree + abs "folded" coverage was measured ~5-8% SLOWER
            # than this compare-and chain on v5e — Mosaic fuses predicate
            # chains into mask registers better than value mins.)
            cov = (
                (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
                & (z >= -1.0) & (z <= 1.0)
            )
        zc = jnp.where(cov, z, _BIG_Z)
        zmin = jnp.min(zc, axis=0, keepdims=True)  # (1, P)
        wpb = zc == zmin  # (C, P) bool; ties possible
        if winner_mode == "vpu":
            # Unique first-hit winner via a VPU min-index reduction (same
            # shape/cost class as the zmin reduce just above) instead of
            # the (c, c) @ (c, P) lower-triangular prefix matmul — frees
            # one full-depth MXU pass set per chunk. Flat segments ascend
            # by triangle id, so min row index == min id (the reference's
            # tie rule).
            rowi = jax.lax.broadcasted_iota(jnp.int32, (c, p), 0)
            win_i = jnp.min(
                jnp.where(wpb, rowi, jnp.int32(c)), axis=0, keepdims=True
            )
            # rowi == win_i alone IS the unique winner mask: zmin always
            # has an attaining row (win_i < c), row indices are distinct,
            # and wpb holds at the argmin row by construction — the
            # explicit `& wpb` was a redundant (c, P) pass.
            first = rowi == win_i
        else:
            csum = jax.lax.dot_general(
                tri_lower, wpb.astype(jnp.bfloat16),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # inclusive prefix counts (exact: integers <= C)
            first = wpb & (csum == 1.0)  # unique first-hit winner

        if sel_packed:
            # Prep-split stacked bf16 [s_hi; s_lo] rows: ONE dot, then add
            # the halves (an (m_pad, P) f32 add — trivial next to a pass).
            w_bf = first.astype(jnp.bfloat16)
            out = jax.lax.dot_general(
                a_s, w_bf,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (2*m_half, P)
            m_half = a_s.shape[0] // 2
            sel = out[0:m_half] + out[m_half:]
        elif dot_precision == "split_bf16":
            # Two separate hi/lo dots. An output-dim-stacked single dot
            # ([s_hi; s_lo] @ W, 32 rows in one 128-row MXU tile) measured
            # ~4% SLOWER in interleaved A/B (median ratio 1.041, all pairs
            # >= 1.0) — the concat copy costs more than the second small
            # dot, which Mosaic evidently already pipelines.
            w_bf = first.astype(jnp.bfloat16)
            s_hi = a_s.astype(jnp.bfloat16)
            s_lo = (a_s - s_hi.astype(jnp.float32)).astype(jnp.bfloat16)

            def sel_dot(x):
                return jax.lax.dot_general(
                    x, w_bf,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            sel = sel_dot(s_hi) + sel_dot(s_lo)
        else:
            sel = jax.lax.dot_general(
                a_s, first.astype(jnp.float32),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=dot_precision,
            )
        return zmin, sel

    def merge(carry, zmin, sel):
        zbuf, idbuf, selbuf = carry
        upd = zmin < zbuf
        zbuf = jnp.where(upd, zmin, zbuf)
        # id rides as hi/lo byte rows: each is < 2^16 so the two-pass bf16
        # select reconstructs it exactly for any T < 2^24 (a single id row
        # capped exactness at 2^16 and forced a 3x-costlier fp32 fallback
        # for large meshes).
        idbuf = jnp.where(upd, sel[0:1] * 256.0 + sel[1:2], idbuf)
        selbuf = jnp.where(upd, sel[2:m_sel], selbuf)
        return zbuf, idbuf, selbuf

    init = (
        jnp.full((1, p), _BIG_Z, jnp.float32),
        jnp.full((1, p), jnp.float32(_BIG_SLOT), jnp.float32),
        jnp.zeros((m_sel - 2, p), jnp.float32),
    )

    if sub > 1:
        # Sub-tile row banding (RasterizerConfig.bin_subtile): the tile's
        # `sub` bands were binned separately at band_h-row granularity, so
        # each chunk's entries evaluate against only p_eval = P/sub pixels
        # — the coverage + select MXU pass count per entry divides by sub.
        # All bands stream through ONE continuous double-buffered DMA
        # pipeline (per-tile fixed costs — grid steps, output writes, DMA
        # warmup — do NOT multiply, unlike shrinking tile_h itself, which
        # measured -15%). Bit-identity with sub == 1: the prep rebases
        # constants to the TILE origin and band h evaluates with its true
        # tile-local ly (offset h * band_h), so every pixel sees the same
        # float expressions over the same candidate set in the same order
        # (within a band, segments ascend by triangle id; bands never
        # share pixels).
        binbase = (i // n_tx) * (sub * n_tx) + (i % n_tx)
        bases = [start_ref[b, binbase + h * n_tx] for h in range(sub)]
        nchs = [nch_ref[b, binbase + h * n_tx] for h in range(sub)]
        cum = [jnp.int32(0)]
        for h in range(sub):
            cum.append(cum[-1] + nchs[h])
        total = cum[-1]

        def chunk_abs(ci):
            """Absolute HBM chunk index for loop counter ci."""
            idx = bases[sub - 1] + (ci - cum[sub - 1])
            for h in reversed(range(sub - 1)):
                idx = jnp.where(ci < cum[h + 1], bases[h] + (ci - cum[h]), idx)
            return idx

        def band_of(ci):
            hh = jnp.int32(sub - 1)
            for h in reversed(range(sub - 1)):
                hh = jnp.where(ci < cum[h + 1], jnp.int32(h), hh)
            return hh

        flat_b = jax.lax.broadcasted_iota(jnp.int32, (4, p_eval), 1)
        rowid_b = jax.lax.broadcasted_iota(jnp.int32, (4, p_eval), 0)
        lxb = (flat_b % tile_w).astype(jnp.float32) + 0.5
        lyb0 = (flat_b // tile_w).astype(jnp.float32) + 0.5
        lane_band = (
            jax.lax.broadcasted_iota(jnp.int32, (1, p), 1) // p_eval
        )  # (1, P): which band each output lane belongs to

        def merge_band(carry, zmin, sel, hb):
            zbuf, idbuf, selbuf = carry
            bmask = lane_band == hb  # (1, P)
            zt = jnp.concatenate([zmin] * sub, axis=1)  # (1, P)
            upd = bmask & (zt < zbuf)
            zbuf = jnp.where(upd, zt, zbuf)
            idt = jnp.concatenate(
                [sel[0:1] * 256.0 + sel[1:2]] * sub, axis=1
            )
            idbuf = jnp.where(upd, idt, idbuf)
            st = jnp.concatenate([sel[2:m_sel]] * sub, axis=1)
            selbuf = jnp.where(upd, st, selbuf)
            return zbuf, idbuf, selbuf

        @pl.when(total > 0)
        def _():
            ac0 = chunk_abs(0)
            pdma(0, ac0).start()
            sdma(0, ac0).start()

        def body(ci, carry):
            slot = jax.lax.rem(ci, 2)

            @pl.when(ci + 1 < total)
            def _():
                ac1 = chunk_abs(ci + 1)
                pdma(1 - slot, ac1).start()
                sdma(1 - slot, ac1).start()

            ac = chunk_abs(ci)
            pdma(slot, ac).wait()
            sdma(slot, ac).wait()
            hb = band_of(ci)
            # Band-local B matrix: true tile-local ly = band row + h*band_h
            # (same half-integer values as the full-tile eval -> identical
            # float products; bf16-exact under split_bf16 since ly < 256).
            lyb = lyb0 + hb.astype(jnp.float32) * jnp.float32(band_h)
            bm = jnp.where(
                rowid_b == 0, lxb,
                jnp.where(rowid_b == 1, lyb,
                          jnp.where(rowid_b == 2, 1.0, 0.0)),
            )
            zmin, sel = eval_chunk(slot, b_mat=bm, p=p_eval)
            return merge_band(carry, zmin, sel, hb)

        zbuf, idbuf, selbuf = jax.lax.fori_loop(0, total, body, init)
    elif unroll == 2:
        base = start_ref[b, i]
        nch = nch_ref[b, i]

        # Two-chunk manual unroll (4 DMA slots): the pair's compare/reduce
        # chains are fully independent until the final merge, giving the
        # scheduler a basic block with 2x the ILP; loop and DMA bookkeeping
        # halve. The odd tail runs through a trailing 0/1-trip loop.
        @pl.when(nch > 0)
        def _():
            pdma(0, base).start()
            sdma(0, base).start()

        @pl.when(nch > 1)
        def _():
            pdma(1, base + 1).start()
            sdma(1, base + 1).start()

        def pair_body(pi, carry):
            ci = pi * 2
            sa = jax.lax.rem(ci, n_slots)
            sb = sa + 1

            @pl.when(ci + 2 < nch)
            def _():
                s2 = jax.lax.rem(ci + 2, n_slots)
                pdma(s2, base + ci + 2).start()
                sdma(s2, base + ci + 2).start()

            @pl.when(ci + 3 < nch)
            def _():
                s3 = jax.lax.rem(ci + 3, n_slots)
                pdma(s3, base + ci + 3).start()
                sdma(s3, base + ci + 3).start()

            pdma(sa, base + ci).wait()
            sdma(sa, base + ci).wait()
            pdma(sb, base + ci + 1).wait()
            sdma(sb, base + ci + 1).wait()

            za, sela = eval_chunk(sa)
            zb, selb = eval_chunk(sb)
            # Chunk a holds the lower triangle ids: <= keeps a on z-ties,
            # preserving the reference's min-id tie rule.
            aw = za <= zb
            zp = jnp.where(aw, za, zb)
            sp = jnp.where(aw, sela, selb)
            return merge(carry, zp, sp)

        carry = jax.lax.fori_loop(0, nch // 2, pair_body, init)

        def tail_body(ci, carry):
            slot = jax.lax.rem(ci, n_slots)
            pdma(slot, base + ci).wait()
            sdma(slot, base + ci).wait()
            z1, s1 = eval_chunk(slot)
            return merge(carry, z1, s1)

        zbuf, idbuf, selbuf = jax.lax.fori_loop(
            (nch // 2) * 2, nch, tail_body, carry
        )
    elif group > 1:
        # Grouped DMA streaming (RasterizerConfig.dma_group): fetch `group`
        # consecutive chunks per double-buffered DMA pair instead of one —
        # the per-chunk DMA issue + semaphore-wait fixed cost (a top
        # per-chunk cost at these shapes; transfers themselves are ~100 ns
        # of bandwidth) divides by up to `group`. Groups are aligned to
        # ABSOLUTE chunk indices, so consecutive tiles sharing a group
        # still fetch it once each but a tile's 1-2 chunks usually land in
        # ONE fetch; the caller pads the flat lists to a group multiple so
        # the last group's read stays in bounds. Each chunk evaluates from
        # a 128-aligned lane offset inside the group buffer (bit-identical
        # to group=1: same data, same expressions, same order).
        base = start_ref[b, i]
        nch = nch_ref[b, i]
        g0 = base // group
        glast = (base + nch - 1) // group  # meaningful only when nch > 0

        def pdma_g(slot, g):
            return pltpu.make_async_copy(
                planes_hbm.at[b, :, pl.ds(g * (group * 4 * c), group * 4 * c)],
                pbuf.at[slot],
                psem.at[slot],
            )

        def sdma_g(slot, g):
            return pltpu.make_async_copy(
                sel_hbm.at[b, :, pl.ds(g * (group * c), group * c)],
                sbuf.at[slot],
                ssem.at[slot],
            )

        @pl.when(nch > 0)
        def _():
            s0 = jax.lax.rem(g0, 2)
            pdma_g(s0, g0).start()
            sdma_g(s0, g0).start()

        def body(ci, carry):
            absi = base + ci
            g = absi // group
            q = jax.lax.rem(absi, group)
            slot = jax.lax.rem(g, 2)
            entering = (ci == 0) | (q == 0)

            @pl.when(entering)
            def _():
                pdma_g(slot, g).wait()
                sdma_g(slot, g).wait()

            # Prefetch g+1 into the other slot at group entry: that slot's
            # last read was during group g-1 (already complete), and the
            # transfer overlaps this whole group's compute.
            @pl.when(entering & (g < glast))
            def _():
                pdma_g(1 - slot, g + 1).start()
                sdma_g(1 - slot, g + 1).start()

            zmin, sel = eval_chunk(slot, q=q)
            return merge(carry, zmin, sel)

        zbuf, idbuf, selbuf = jax.lax.fori_loop(0, nch, body, init)
    else:
        base = start_ref[b, i]
        nch = nch_ref[b, i]

        @pl.when(nch > 0)
        def _():
            pdma(0, base).start()
            sdma(0, base).start()

        def body(ci, carry):
            slot = jax.lax.rem(ci, 2)

            @pl.when(ci + 1 < nch)
            def _():
                pdma(1 - slot, base + ci + 1).start()
                sdma(1 - slot, base + ci + 1).start()

            pdma(slot, base + ci).wait()
            sdma(slot, base + ci).wait()
            zmin, sel = eval_chunk(slot)
            return merge(carry, zmin, sel)

        zbuf, idbuf, selbuf = jax.lax.fori_loop(0, nch, body, init)

    covered = zbuf < _BIG_Z
    zv = selbuf[0:1] * lx + selbuf[1:2] * ly + selbuf[2:3]  # fp32 winner z
    z_out[0, :, :] = jnp.where(covered, zv, jnp.inf).reshape(tile_h, tile_w)
    id_out[0, :, :] = idbuf.reshape(tile_h, tile_w)
    for vi in range(n_vals):
        row = (
            selbuf[3 + 3 * vi : 4 + 3 * vi] * lx
            + selbuf[4 + 3 * vi : 5 + 3 * vi] * ly
            + selbuf[5 + 3 * vi : 6 + 3 * vi]
        )
        v_out[0, vi, :, :] = row.reshape(tile_h, tile_w)


@functools.partial(
    jax.jit, static_argnums=(4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
)
def gbuffer_tiles_dma(
    planes_flat: jnp.ndarray,  # (B, 4, NCH*4c) chunk-major plane coefficients
    #   (4th coefficient row is zero padding for the DMA sublane tiling)
    sel_flat: jnp.ndarray,  # (B, m_sel, NCH*c) chunk-major select rows
    start_chunks: jnp.ndarray,  # (B, sub*n_tiles) i32 (band-major rows)
    n_chunks: jnp.ndarray,  # (B, sub*n_tiles) i32
    n_vals: int,
    tile_h: int,
    tile_w: int,
    n_ty: int,
    n_tx: int,
    c: int,
    dot_precision=jax.lax.Precision.HIGHEST,
    unroll: int = 1,
    winner_mode: str = "dot",
    sub: int = 1,
    group: int = 1,
    cov_mode: str = "cmp",
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched v2 G-buffer kernel over an (views, tiles) grid. The flat
    coefficient lists stay in HBM; each tile's 128-aligned segment is
    streamed into VMEM with double-buffered DMA (no dense per-tile
    expansion in HBM at all). Outputs are written directly in image layout:
    (B, H, W) z and id, (B, n_vals, H, W) raw attribute values.

    ``sub`` > 1 (RasterizerConfig.bin_subtile): the chunk lists were binned
    at (tile_h / sub)-row band granularity; the scalar-prefetch arrays hold
    one (start, count) pair per BAND in band-row-major order, and each
    chunk evaluates against only its band's pixels (the output grid stays
    at tile granularity)."""
    bsz, n_bins = start_chunks.shape
    assert n_bins == sub * n_ty * n_tx, (n_bins, sub, n_ty, n_tx)
    n_tiles = n_ty * n_tx
    m_sel = 5 + 3 * n_vals
    m_pad = -(-m_sel // 8) * 8
    sel_packed = sel_flat.dtype == jnp.bfloat16
    sel_rows = 2 * m_pad if sel_packed else m_pad
    assert sel_flat.shape[1] == sel_rows, (sel_flat.shape, sel_rows)
    ph, pw = n_ty * tile_h, n_tx * tile_w
    p = tile_h * tile_w
    if sub > 1 and unroll == 2:
        unroll = 1  # the banded pipeline is single-stream (measured-neutral
        # unroll=2 is not worth a second banded variant)
    if cov_mode not in ("cmp", "bits"):
        raise ValueError(f"unknown cov_mode {cov_mode!r}")
    if sub > 1 or unroll == 2:
        group = 1  # grouped DMA is only built for the default pipeline
    if group > 1:
        nch_total = planes_flat.shape[2] // (4 * c)
        if nch_total % group:
            raise ValueError(
                f"dma_group ({group}) requires the flat chunk count "
                f"({nch_total}) to be a group multiple (caller pads l_cap)"
            )

    kernel = functools.partial(
        _kernel_dma, c=c, n_vals=n_vals, m_sel=m_sel, tile_h=tile_h,
        tile_w=tile_w, dot_precision=dot_precision, unroll=unroll,
        winner_mode=winner_mode, sel_packed=sel_packed, sub=sub, n_tx=n_tx,
        group=group, cov_mode=cov_mode,
    )
    n_slots = 4 if unroll == 2 else 2
    interpret = jax.default_backend() not in ("tpu", "axon")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, tile_h, tile_w),
                lambda b, i, s, n: (b, i // n_tx, i % n_tx),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_h, tile_w),
                lambda b, i, s, n: (b, i // n_tx, i % n_tx),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, n_vals, tile_h, tile_w),
                lambda b, i, s, n: (b, 0, i // n_tx, i % n_tx),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((n_slots, 4, group * 4 * c), jnp.float32),
            pltpu.VMEM((n_slots, sel_rows, group * c), sel_flat.dtype),
            pltpu.SemaphoreType.DMA((n_slots,)),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ],
    )
    z, idm, vals = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bsz, ph, pw), jnp.float32),
            jax.ShapeDtypeStruct((bsz, ph, pw), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n_vals, ph, pw), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n_tiles * 2 * (4 * c + 2 * m_sel + c) * p,
            bytes_accessed=int(
                planes_flat.size * 4
                + sel_flat.size * sel_flat.dtype.itemsize
                + bsz * (n_vals + 2) * ph * pw * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(start_chunks, n_chunks, planes_flat, sel_flat)
    return z, idm, vals

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

__all__ = ["zattr_tiles_pallas"]

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
            # Two bf16 passes reconstruct near-fp32: the B matrix entries are
            # half-integer pixel coords < 256, which bf16 represents EXACTLY,
            # so splitting only the coefficients (hi + lo) suffices:
            #   a @ B = hi @ B + lo @ B   (fp32 accumulation on the MXU).
            # ~3x cheaper than the 6-pass fp32 path. Requires triangle ids
            # < 2^16 for exact id-plane reconstruction (gated by caller).
            a_hi = a_t.astype(jnp.bfloat16)
            a_lo = (a_t - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            b_bf = b_mat.astype(jnp.bfloat16)

            def bf_dot(x):
                return jax.lax.dot_general(
                    x, b_bf,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            e_all = bf_dot(a_hi) + bf_dot(a_lo)  # (r*c, P)
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
        pad_block = jnp.zeros((n_tiles, 3, r, pad), coeffs.dtype)
        pad_block = pad_block.at[:, 2, 0, :].set(_BIG_NEG)
        coeffs = jnp.concatenate(
            [coeffs.reshape(n_tiles, 3, r, k), pad_block], axis=3
        ).reshape(n_tiles, 3, r * (k + pad))
        k += pad

    n_chunks = jnp.ceil(counts.astype(jnp.float32) / c).astype(jnp.int32)

    # Re-layout block-major (3, r, K) -> chunk-major (3, nch, r, c) so each
    # chunk's rows are contiguous for the fused single-dot kernel.
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

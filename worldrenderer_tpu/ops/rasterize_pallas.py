"""Pallas TPU kernel for the rasterizer's z/id pass.

One kernel instance owns one screen tile. Per chunk of C binned triangles it
evaluates all edge/depth planes with (C, 3) @ (3, P) matmuls on the MXU and
keeps the running z-buffer in VMEM — the chunk intermediates never touch
HBM, unlike the XLA scan path where each (4C, P) plane tensor round-trips
through memory.

Two gather-free tricks keep the kernel pure vector/matrix code:
  * triangle validity is folded into the edge-0 plane constant (-BIG for
    invalid/padded slots) by the caller, so coverage needs no mask input;
  * the winner is tracked as its *slot* (position in the tile's binned
    list, generated with iota) via a min-reduction over
    ``where(z == zmin, slot, BIG)``; the caller converts slots to global
    triangle ids with one cheap XLA gather. Ties break to the smallest
    slot = earliest in list, matching the XLA path's argmin rule.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .tensor import edge0_pad_block

__all__ = ["raster_zid_tiles_pallas"]

_BIG_Z = 3.0e38
_BIG_SLOT = 2**30


def _kernel(nchunks_ref, coeffs_ref, z_out_ref, slot_out_ref, *, k, c, tile_h,
            tile_w):
    p = tile_h * tile_w
    # Dynamic per-tile trip count (scalar-prefetched).
    n_chunks = nchunks_ref[pl.program_id(0)]

    # B matrix: rows [lx + 0.5, ly + 0.5, 1] over the flattened tile.
    flat = jax.lax.broadcasted_iota(jnp.int32, (3, p), 1)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (3, p), 0)
    lx = (flat % tile_w).astype(jnp.float32) + 0.5
    ly = (flat // tile_w).astype(jnp.float32) + 0.5
    b_mat = jnp.where(rowid == 0, lx, jnp.where(rowid == 1, ly, 1.0))

    def body(ci, carry):
        zbuf, slotbuf = carry  # (1, P) f32, (1, P) i32
        c0 = ci * c

        def plane(block):
            # (3, C); lane-dim slice offsets are 128-aligned by construction.
            a_t = coeffs_ref[0, :, pl.ds(pl.multiple_of(block * k + c0, 128), c)]
            return jax.lax.dot_general(
                a_t, b_mat,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        e0 = plane(0)
        e1 = plane(1)
        e2 = plane(2)
        z = plane(3)  # (C, P)

        cov = (
            (e0 >= 0.0)
            & (e1 >= 0.0)
            & (e2 >= 0.0)
            & (z >= -1.0)
            & (z <= 1.0)
        )
        z = jnp.where(cov, z, _BIG_Z)
        zmin = jnp.min(z, axis=0, keepdims=True)  # (1, P)
        slots = jax.lax.broadcasted_iota(jnp.int32, (c, p), 0) + c0
        slot_cand = jnp.where(z == zmin, slots, _BIG_SLOT)
        slotmin = jnp.min(slot_cand, axis=0, keepdims=True)  # (1, P)

        upd = zmin < zbuf
        zbuf = jnp.where(upd, zmin, zbuf)
        slotbuf = jnp.where(upd, slotmin, slotbuf)
        return zbuf, slotbuf

    init = (
        jnp.full((1, p), _BIG_Z, jnp.float32),
        jnp.full((1, p), _BIG_SLOT, jnp.int32),
    )
    zbuf, slotbuf = jax.lax.fori_loop(0, n_chunks, body, init)
    z_out_ref[0, :, :] = jnp.where(zbuf >= _BIG_Z, jnp.inf, zbuf)
    slot_out_ref[0, :, :] = slotbuf


@functools.partial(jax.jit, static_argnums=(3, 4, 5))
def raster_zid_tiles_pallas(
    coeffs: jnp.ndarray,  # (n_tiles, 3, 4K) coef-major tile-rebased planes
    ids: jnp.ndarray,  # (n_tiles, K) int32 (padded slots may be anything)
    counts: jnp.ndarray,  # (n_tiles,) live-entry counts (contiguous prefix)
    tile_h: int,
    tile_w: int,
    chunk: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (z (n_tiles, th, tw) f32, id+1 map (n_tiles, th, tw) i32)."""
    n_tiles, _, four_k = coeffs.shape
    k = four_k // 4
    # Lane-dim slicing alignment: chunk and K must be multiples of 128.
    c = max(128, (chunk // 128) * 128)
    pad = (-k) % c
    if pad:
        # Padded slots: edge-0 constant -BIG -> never covered. Broadcast a
        # bytes-sized template instead of scattering into a (n_tiles, ...)
        # zeros constant — XLA's scatter folder bakes the scatter form into
        # a 37 MB literal at 4096²-atlas tile counts (ops/tensor.py).
        pad_block = jnp.broadcast_to(
            edge0_pad_block(4, pad, coeffs.dtype, -_BIG_Z)[None],
            (n_tiles, 3, 4, pad),
        )
        coeffs = jnp.concatenate(
            [coeffs.reshape(n_tiles, 3, 4, k), pad_block], axis=3
        ).reshape(n_tiles, 3, 4 * (k + pad))
        k += pad

    p = tile_h * tile_w
    n_chunks = jnp.ceil(counts.astype(jnp.float32) / c).astype(jnp.int32)
    kernel = functools.partial(_kernel, k=k, c=c, tile_h=tile_h, tile_w=tile_w)
    # Interpret mode keeps the kernel testable on the CPU golden-test mesh.
    interpret = jax.default_backend() not in ("tpu", "axon")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 3, 4 * k), lambda i, nc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, p), lambda i, nc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda i, nc: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    z, slot = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, p), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_tiles * 4 * k * 3 * p,
            bytes_accessed=n_tiles * (4 * k * 3 * 4 + 2 * p * 4),
            transcendentals=0,
        ),
        interpret=interpret,
    )(n_chunks, coeffs)

    z = z.reshape(n_tiles, tile_h, tile_w)
    slot = slot.reshape(n_tiles, tile_h, tile_w)
    covered = slot < _BIG_SLOT
    slot_safe = jnp.where(covered, slot, 0)
    gid = jnp.take_along_axis(
        ids, slot_safe.reshape(n_tiles, -1), axis=1
    ).reshape(n_tiles, tile_h, tile_w)
    idmap = jnp.where(covered, gid + 1, 0)
    return z, idmap

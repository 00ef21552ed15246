"""Homogeneous / clip-space point transforms (pure jnp, jittable).

Reference contracts: mvadapter/utils/mesh_utils/utils.py:127-139.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_clip_space_position(pos: jnp.ndarray, mvp_mtx: jnp.ndarray) -> jnp.ndarray:
    """Transform (V, 3) world positions by a batch of (N, 4, 4) MVP matrices.

    Returns (N, V, 4) clip-space positions (reference utils.py:127-129).
    """
    pos_homo = jnp.concatenate([pos, jnp.ones_like(pos[..., :1])], axis=-1)
    return jnp.einsum("vj,nij->nvi", pos_homo, mvp_mtx,
                      precision=jax.lax.Precision.HIGHEST)


def transform_points_homo(pos: jnp.ndarray, mtx: jnp.ndarray) -> jnp.ndarray:
    """Transform batched points (N, ..., 3) by (N, 4, 4) matrices, returning
    the first 3 components (reference utils.py:132-139). Correct for affine
    matrices (w row [0,0,0,1])."""
    batch = pos.shape[0]
    inner = pos.shape[1:-1]
    flat = pos.reshape(batch, -1, 3)
    flat_homo = jnp.concatenate([flat, jnp.ones_like(flat[..., :1])], axis=-1)
    out = jnp.einsum("nvj,nij->nvi", flat_homo, mtx,
                     precision=jax.lax.Precision.HIGHEST)[..., :3]
    return out.reshape((batch,) + inner + (3,))


def dot(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sum-product over the last axis, keepdims (reference mesh.py:20-21)."""
    return jnp.sum(x * y, axis=-1, keepdims=True)

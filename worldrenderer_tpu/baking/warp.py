"""Differentiable grid-mesh image warp: align input photos to rendered views.

Reference contract: mvadapter/utils/mesh_utils/warp.py:38-285 — a regular
(n_grid x n_grid) NDC grid whose interior vertices are optimized (Adam,
coarse-to-fine) to minimize photometric L2 against the rendered target plus
an edge-length regularizer; the converged grid then warps the source image.

TPU-first rewrite:
  * the per-image Python loop (warp.py:118) becomes ``vmap`` over views;
  * the Adam loop becomes optax + ``lax.scan`` (one compiled program per
    resolution instead of 20 eager steps x kernel launches);
  * the grid's per-pixel (face id, barycentric) map is analytic for a regular
    grid — no rasterizer needed (the reference calls dr.rasterize each round,
    warp.py:131, warp.py:251);
  * the reference's regularizer has an endpoint typo (warp.py:196 uses an
    optimized endpoint inside the "unoptimized" length); we implement the
    intended rest-length regularizer.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.grid_sample import grid_sample

__all__ = ["construct_grid_mesh", "compute_warp_field"]


def construct_grid_mesh(n_grid: int):
    """(n_grid+1)^2-vertex NDC grid in [-1, 1]^2 with z=0, clockwise-split
    quads and the interior-vertex index list (reference warp.py:38-75)."""
    ii, jj = np.meshgrid(np.arange(n_grid + 1), np.arange(n_grid + 1), indexing="xy")
    verts = np.stack(
        [ii / n_grid, jj / n_grid, np.full_like(ii, 0.5, dtype=np.float64)], axis=-1
    ).reshape(-1, 3)
    verts = 2.0 * verts - 1.0
    movable = ((ii > 0) & (ii < n_grid) & (jj > 0) & (jj < n_grid)).reshape(-1)

    idx = np.arange((n_grid + 1) ** 2).reshape(n_grid + 1, n_grid + 1)
    f0 = np.stack([idx[:-1, :-1], idx[:-1, 1:], idx[1:, :-1]], axis=-1)
    f1 = np.stack([idx[:-1, 1:], idx[1:, 1:], idx[1:, :-1]], axis=-1)
    faces = np.concatenate([f0.reshape(-1, 3), f1.reshape(-1, 3)], axis=0)

    # Unique undirected edges.
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]], axis=0)
    e = np.sort(e, axis=1)
    edges = np.unique(e, axis=0)
    return verts, faces.astype(np.int64), edges.astype(np.int64), movable


def _grid_pixel_coords(
    verts_xy: jnp.ndarray, n_grid: int, res: int
) -> jnp.ndarray:
    """Per-pixel warped NDC coordinates by bilinear interpolation of the grid
    vertex positions (exact for a regular quad grid: barycentric interpolation
    over its two triangles equals bilinear interpolation of the quad corners
    along the split diagonal; since the optimized field is piecewise-linear
    either way, we interpolate within the containing triangle).

    verts_xy: ((n+1)^2, 2) grid vertex NDC positions.
    Returns (res, res, 2)."""
    v = verts_xy.reshape(n_grid + 1, n_grid + 1, 2)  # [row=j (y), col=i (x)]
    # Pixel centers in grid units.
    px = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res * n_grid
    py = (jnp.arange(res, dtype=jnp.float32) + 0.5) / res * n_grid
    gx, gy = jnp.meshgrid(px, py, indexing="xy")  # (res, res)
    i0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, n_grid - 1)
    j0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, n_grid - 1)
    fx = gx - i0.astype(jnp.float32)
    fy = gy - j0.astype(jnp.float32)

    v00 = v[j0, i0]
    v10 = v[j0, i0 + 1]
    v01 = v[j0 + 1, i0]
    v11 = v[j0 + 1, i0 + 1]
    # Triangle split matches reference faces: (v00, v10, v01) & (v10, v11, v01).
    lower = fx + fy <= 1.0
    tri_lower = v00 + fx[..., None] * (v10 - v00) + fy[..., None] * (v01 - v00)
    tri_upper = (
        v11
        + (1.0 - fx)[..., None] * (v01 - v11)
        + (1.0 - fy)[..., None] * (v10 - v11)
    )
    return jnp.where(lower[..., None], tri_lower, tri_upper)


def _resize(img: jnp.ndarray, res: int) -> jnp.ndarray:
    """Anti-aliased bilinear resize of (H, W, C) to (res, res, C)
    (torch F.interpolate(..., antialias=True) analog)."""
    return jax.image.resize(
        img, (res, res, img.shape[-1]), method="linear", antialias=True
    )


def compute_warp_field(
    src_images: jnp.ndarray,
    tgt_images: jnp.ndarray,
    n_grid: int = 10,
    optim_res: Sequence[int] = (64, 128),
    optim_step_per_res: int = 20,
    lambda_reg: float = 2.0,
    lr: float = 0.02,
) -> jnp.ndarray:
    """Warp each src image toward its tgt image. (Nv, H, W, C) -> same shape.

    All views optimize in parallel (vmap); each resolution stage is one
    compiled scan of ``optim_step_per_res`` Adam steps.
    """
    src_images = jnp.asarray(src_images, jnp.float32)
    tgt_images = jnp.asarray(tgt_images, jnp.float32)
    verts_np, _faces, edges_np, movable_np = construct_grid_mesh(n_grid)
    verts0 = jnp.asarray(verts_np[:, :2], jnp.float32)  # ((n+1)^2, 2)
    edges = jnp.asarray(edges_np, jnp.int32)
    movable = jnp.asarray(movable_np, jnp.float32)[:, None]

    rest_len = jnp.linalg.norm(
        verts0[edges[:, 0]] - verts0[edges[:, 1]], axis=-1
    )

    def warp_one(src, tgt):
        delta0 = jnp.zeros_like(verts0)

        def stage(delta, res, steps):
            src_r = _resize(src[..., :3], res)[None]
            tgt_r = _resize(tgt[..., :3], res)[None]
            opt = optax.adam(lr)
            state = opt.init(delta)

            def loss_fn(d):
                verts = verts0 + movable * d
                coords = _grid_pixel_coords(verts, n_grid, res)[None]
                warped = grid_sample(src_r, coords, mode="bilinear")
                img_loss = jnp.mean((warped - tgt_r) ** 2)
                el = jnp.linalg.norm(
                    verts[edges[:, 0]] - verts[edges[:, 1]], axis=-1
                )
                reg = jnp.mean((el - rest_len) ** 2)
                return img_loss + lambda_reg * reg

            def step(carry, _):
                d, s = carry
                g = jax.grad(loss_fn)(d)
                upd, s = opt.update(g, s, d)
                return (optax.apply_updates(d, upd), s), None

            (delta, _), _ = jax.lax.scan(step, (delta, state), None, length=steps)
            return delta

        for res in optim_res:
            delta = stage(delta0, int(res), optim_step_per_res)
            delta0 = delta

        # Final full-resolution warp, bicubic as in the reference
        # (warp.py:249-280, F.grid_sample mode="bicubic").
        res_full = src.shape[0]
        verts = verts0 + movable * delta0
        coords = _grid_pixel_coords(verts, n_grid, res_full)[None]
        warped = grid_sample(src[None], coords, mode="bicubic")[0]
        return jnp.clip(warped, 0.0, 1.0)

    return jax.vmap(warp_one)(src_images, tgt_images)

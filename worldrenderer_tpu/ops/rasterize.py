"""Tile-based z-buffered triangle rasterizer (the nvdiffrast-rasterize
equivalent, TPU-native).

Contract matches ``dr.rasterize`` as wrapped by the reference
(mvadapter/utils/mesh_utils/render.py:39-62):

    rasterize(pos_clip (B, V, 4) f32, tri (T, 3) i32, (H, W))
        -> rast (B, H, W, 4) f32 with channels (u, v, z/w, triangle_id + 1)

``triangle_id + 1`` is 0 for background pixels.  (u, v) are the
perspective-correct barycentric weights of vertices 1 and 2 of the winning
triangle, so ``attr = a0 * (1 - u - v) + a1 * u + a2 * v`` reproduces
nvdiffrast's ``interpolate``.  z/w is the screen-affine interpolated NDC
depth of the winning triangle.

Design (TPU-first, not a CUDA translation):
  * Screen is split into VPU-friendly tiles (default 32 x 128 pixels).
  * A jnp binning pass computes, per tile, a padded list of triangles whose
    bbox overlaps the tile (stable order = input order).
  * The z/id pass scans binned triangles in chunks per tile: edge functions
    are evaluated vertex-relative (good fp32 conditioning), coverage is
    ``all(e_i >= 0)`` after orientation normalization at setup, and the
    z-buffer update is a running masked min — no atomics, fully vectorized
    over the tile's pixels.
  * A final resolve pass gathers the winning triangle's coefficients per
    pixel and computes perspective-correct (u, v) once, instead of carrying
    them through the scan.

Limitations vs nvdiffrast (documented, revisit later): no near-plane
polygon clipping — triangles with any vertex at w <= eps are culled whole;
no image-space derivative output (grad_db is accepted and ignored).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["rasterize", "RasterizerConfig"]

_W_EPS = 1e-8


class RasterizerConfig(NamedTuple):
    """Static tuning knobs for the rasterizer."""

    tile_h: int = 32
    tile_w: int = 128
    chunk: int = 32
    # Max binned triangles per tile. None = no binning cap (K = T), always
    # correct. Smaller values trade worst-case correctness for speed.
    max_tris_per_tile: Optional[int] = None
    backend: str = "xla"  # "xla" | "pallas"


DEFAULT_CONFIG = RasterizerConfig()


class _TriSetup(NamedTuple):
    """Per-triangle screen-space coefficients (one view).

    All arrays have a trailing padded slot at index T (valid=False) so that
    binned id lists can safely pad with T.
    """

    ax: jnp.ndarray  # (T+1, 3) per-edge anchor x (edge i anchored at vertex (i+1)%3)
    ay: jnp.ndarray  # (T+1, 3) per-edge anchor y
    dxs: jnp.ndarray  # (T+1, 3) edge x-delta, orientation-normalized
    dys: jnp.ndarray  # (T+1, 3) edge y-delta, orientation-normalized
    zc: jnp.ndarray  # (T+1, 3) z/w per vertex scaled by 1/|area|  (z = sum e_i * zc_i)
    inv_w: jnp.ndarray  # (T+1, 3) 1/w per vertex
    inv_area: jnp.ndarray  # (T+1,) 1/|area|
    valid: jnp.ndarray  # (T+1,) bool
    bbox: jnp.ndarray  # (T+1, 4) xmin, xmax, ymin, ymax in pixel units


def _triangle_setup(pos_clip: jnp.ndarray, tri: jnp.ndarray, width: int, height: int) -> _TriSetup:
    """Per-view triangle setup. pos_clip (V, 4), tri (T, 3)."""
    v = pos_clip[tri]  # (T, 3, 4)
    w = v[..., 3]
    valid_w = jnp.all(w > _W_EPS, axis=-1)
    w_safe = jnp.where(jnp.abs(w) < _W_EPS, _W_EPS, w)
    inv_w = 1.0 / w_safe
    # Screen coords in pixel units; pixel (ix, iy) center sits at (ix+0.5, iy+0.5).
    x = (v[..., 0] * inv_w + 1.0) * (width * 0.5)  # (T, 3)
    y = (v[..., 1] * inv_w + 1.0) * (height * 0.5)
    zw = v[..., 2] * inv_w

    # Edge i runs from vertex (i+1)%3 to (i+2)%3; e_i is the barycentric
    # numerator of vertex i.
    nxt = jnp.array([1, 2, 0])
    prv = jnp.array([2, 0, 1])
    ax = x[:, nxt]
    ay = y[:, nxt]
    dx = x[:, prv] - ax  # (T, 3)
    dy = y[:, prv] - ay
    # Signed 2*area = e_2 evaluated at vertex 2 == cross(v1-v0, v2-v0).
    area = (x[:, 1] - x[:, 0]) * (y[:, 2] - y[:, 0]) - (y[:, 1] - y[:, 0]) * (
        x[:, 2] - x[:, 0]
    )
    sgn = jnp.where(area < 0, -1.0, 1.0)
    area_abs = jnp.abs(area)
    valid = valid_w & (area_abs > 0)
    inv_area = jnp.where(valid, 1.0 / jnp.maximum(area_abs, 1e-30), 0.0)
    dxs = dx * sgn[:, None]
    dys = dy * sgn[:, None]
    zc = zw * inv_area[:, None]

    bbox = jnp.stack(
        [x.min(axis=1), x.max(axis=1), y.min(axis=1), y.max(axis=1)], axis=-1
    )

    def pad(a, fill=0.0):
        cfg = [(0, 1)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, cfg, constant_values=fill)

    return _TriSetup(
        ax=pad(ax),
        ay=pad(ay),
        dxs=pad(dxs),
        dys=pad(dys),
        zc=pad(zc),
        inv_w=pad(inv_w),
        inv_area=pad(inv_area),
        valid=pad(valid, False),
        bbox=pad(bbox),
    )


def _bin_triangles(
    setup: _TriSetup,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    max_per_tile: int,
) -> jnp.ndarray:
    """Per-tile padded triangle id lists, (n_tiles, K) int32, padded with T
    (the invalid slot). Order within a tile = input triangle order."""
    n_ty = -(-height // tile_h)
    n_tx = -(-width // tile_w)
    n_tiles = n_ty * n_tx
    t_total = setup.valid.shape[0] - 1

    bbox = setup.bbox[:-1]
    # Tile index ranges covered by each triangle's bbox (inclusive).
    tx0 = jnp.clip(jnp.floor((bbox[:, 0] - 0.5) / tile_w), 0, n_tx - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((bbox[:, 1] + 0.5) / tile_w), 0, n_tx - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((bbox[:, 2] - 0.5) / tile_h), 0, n_ty - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((bbox[:, 3] + 0.5) / tile_h), 0, n_ty - 1).astype(jnp.int32)
    # Cull triangles entirely off screen.
    on_screen = (
        (bbox[:, 1] >= 0)
        & (bbox[:, 0] <= width)
        & (bbox[:, 3] >= 0)
        & (bbox[:, 2] <= height)
        & setup.valid[:-1]
    )

    tile_ix = jnp.arange(n_tiles, dtype=jnp.int32)
    tyi = tile_ix // n_tx  # (n_tiles,)
    txi = tile_ix % n_tx
    # overlap (T, n_tiles)
    overlap = (
        (txi[None, :] >= tx0[:, None])
        & (txi[None, :] <= tx1[:, None])
        & (tyi[None, :] >= ty0[:, None])
        & (tyi[None, :] <= ty1[:, None])
        & on_screen[:, None]
    )
    # Stable compaction: argsort of (not overlap) along T keeps covered
    # triangles first in original order.
    order = jnp.argsort(~overlap, axis=0, stable=True)  # (T, n_tiles)
    k = min(max_per_tile, t_total)
    ids = order[:k].T.astype(jnp.int32)  # (n_tiles, K)
    counts = overlap.sum(axis=0)  # (n_tiles,)
    keep = jnp.arange(k, dtype=jnp.int32)[None, :] < counts[:, None]
    return jnp.where(keep, ids, t_total)


def _raster_zid_tile(
    setup: _TriSetup,
    ids: jnp.ndarray,  # (K,) binned ids for this tile
    tile_y0: jnp.ndarray,
    tile_x0: jnp.ndarray,
    tile_h: int,
    tile_w: int,
    chunk: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """z/id pass for one tile. Returns (z (th, tw), id (th, tw))."""
    k = ids.shape[0]
    n_chunks = -(-k // chunk)
    pad = n_chunks * chunk - k
    t_total = setup.valid.shape[0] - 1
    ids = jnp.pad(ids, (0, pad), constant_values=t_total).reshape(n_chunks, chunk)

    # Tile-local pixel centers (flattened P = th * tw).
    ly = (
        jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 0).reshape(-1) + 0.5
    )
    lx = (
        jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 1).reshape(-1) + 0.5
    )
    px = lx + tile_x0  # (P,)
    py = ly + tile_y0

    def body(carry, ids_c):
        zbuf, idbuf = carry
        ax = setup.ax[ids_c]  # (C, 3)
        ay = setup.ay[ids_c]
        dxs = setup.dxs[ids_c]
        dys = setup.dys[ids_c]
        zc = setup.zc[ids_c]
        valid = setup.valid[ids_c]  # (C,)

        # e_i(p) = dxs_i * (py - ay_i) - dys_i * (px - ax_i)   -> (C, 3, P)
        rel_x = px[None, None, :] - ax[..., None]
        rel_y = py[None, None, :] - ay[..., None]
        e = dxs[..., None] * rel_y - dys[..., None] * rel_x
        cov = jnp.all(e >= 0, axis=1) & valid[:, None]  # (C, P)
        z = jnp.sum(e * zc[..., None], axis=1)  # (C, P)
        cov &= (z >= -1.0) & (z <= 1.0)
        z = jnp.where(cov, z, jnp.inf)

        slot = jnp.argmin(z, axis=0)  # (P,) ties -> earliest
        zmin = jnp.take_along_axis(z, slot[None], axis=0)[0]
        gid = ids_c[slot]
        upd = zmin < zbuf
        zbuf = jnp.where(upd, zmin, zbuf)
        idbuf = jnp.where(upd, gid + 1, idbuf)
        return (zbuf, idbuf), None

    p = tile_h * tile_w
    init = (jnp.full((p,), jnp.inf, jnp.float32), jnp.zeros((p,), jnp.int32))
    (zbuf, idbuf), _ = jax.lax.scan(body, init, ids)
    return zbuf.reshape(tile_h, tile_w), idbuf.reshape(tile_h, tile_w)


def _resolve_uv(
    setup: _TriSetup, idmap: jnp.ndarray, zmap: jnp.ndarray
) -> jnp.ndarray:
    """Gather winning-triangle coefficients per pixel and compute
    perspective-correct (u, v). idmap (H, W) int32 (0 = bg)."""
    h, w = idmap.shape
    t = jnp.maximum(idmap - 1, 0)
    px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5

    ax = setup.ax[t]  # (H, W, 3)
    ay = setup.ay[t]
    dxs = setup.dxs[t]
    dys = setup.dys[t]
    inv_w = setup.inv_w[t]
    inv_area = setup.inv_area[t]

    e = dxs * (py[..., None] - ay) - dys * (px[..., None] - ax)  # (H, W, 3)
    b = e * inv_area[..., None]
    pw = b * inv_w  # (H, W, 3)
    denom = jnp.sum(pw, axis=-1)
    denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    u = pw[..., 1] / denom
    v = pw[..., 2] / denom
    mask = idmap > 0
    u = jnp.where(mask, u, 0.0)
    v = jnp.where(mask, v, 0.0)
    zout = jnp.where(mask, zmap, 0.0)
    return jnp.stack([u, v, zout, idmap.astype(jnp.float32)], axis=-1)


def _rasterize_single(
    pos_clip: jnp.ndarray,
    tri: jnp.ndarray,
    height: int,
    width: int,
    config: RasterizerConfig,
) -> jnp.ndarray:
    """One view: pos_clip (V, 4) -> rast (H, W, 4)."""
    tile_h, tile_w = config.tile_h, config.tile_w
    # Pad resolution up to tile multiples; crop at the end.
    ph = -(-height // tile_h) * tile_h
    pw = -(-width // tile_w) * tile_w
    n_ty, n_tx = ph // tile_h, pw // tile_w
    t_total = tri.shape[0]

    setup = _triangle_setup(pos_clip, tri, width, height)
    max_per_tile = config.max_tris_per_tile or t_total
    ids = _bin_triangles(setup, width, height, tile_h, tile_w, max_per_tile)

    tile_ix = jnp.arange(n_ty * n_tx, dtype=jnp.int32)
    ty0 = (tile_ix // n_tx * tile_h).astype(jnp.float32)
    tx0 = (tile_ix % n_tx * tile_w).astype(jnp.float32)

    zid = jax.vmap(
        lambda i, y0, x0: _raster_zid_tile(
            setup, i, y0, x0, tile_h, tile_w, config.chunk
        )
    )(ids, ty0, tx0)
    z_tiles, id_tiles = zid  # (n_tiles, th, tw)
    zmap = (
        z_tiles.reshape(n_ty, n_tx, tile_h, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(ph, pw)[:height, :width]
    )
    idmap = (
        id_tiles.reshape(n_ty, n_tx, tile_h, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(ph, pw)[:height, :width]
    )
    return _resolve_uv(setup, idmap, zmap)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _rasterize_batched(pos, tri, resolution, config):
    height, width = resolution
    return jax.vmap(lambda p: _rasterize_single(p, tri, height, width, config))(pos)


def rasterize(
    pos: jnp.ndarray,
    tri: jnp.ndarray,
    resolution: Tuple[int, int],
    config: RasterizerConfig = DEFAULT_CONFIG,
    grad_db: bool = True,  # accepted for API parity; derivatives not produced
) -> jnp.ndarray:
    """Rasterize triangles. pos (B, V, 4) f32, tri (T, 3) i32.

    Returns (B, H, W, 4) with channels (u, v, z/w, tri_id + 1); 0 = background.
    """
    del grad_db
    if pos.ndim != 3:
        raise ValueError("pos must be (B, V, 4) — range mode is not supported")
    pos = pos.astype(jnp.float32)
    tri = tri.astype(jnp.int32)
    if config.backend == "pallas":
        from .rasterize_pallas import rasterize_pallas

        return rasterize_pallas(pos, tri, resolution, config)
    return _rasterize_batched(pos, tri, tuple(resolution), config)

"""Analytic silhouette-edge antialiasing (nvdiffrast-antialias equivalent).

Contract: mvadapter/utils/mesh_utils/render.py:122-149 — ``antialias(color,
rast, pos, tri)`` blends attribute values across silhouette edges with
weights from the EXACT sub-pixel edge crossing position. Only used behind
the default-off ``antialias_attr`` flag in the reference (render.py:232,
render.py:270).

TPU-native formulation: the rasterizer's per-triangle edge functions are
screen-affine planes, so for a horizontally adjacent pixel pair the plane
value at the neighbor center is just ``e + alpha`` (``e + beta``
vertically) — one per-pixel gather of the winner's 3 edge planes and the
whole pass is dense elementwise math, no per-edge geometry walks:

  * For each adjacent pair with differing ids, the front (inside) pixel's
    triangle has all e_i >= 0 at its own center; the edge crossing the
    segment toward the outside pixel sits at
    ``t = min_i e_in_i / (e_in_i - e_out_i)`` over edges with e_out_i < 0
    — exactly nvdiffrast's crossing parameter.
  * ``t > 0.5``: the triangle covers part of the outside pixel — blend the
    outside pixel toward the inside color by ``t - 0.5``. ``t <= 0.5``:
    the inside pixel is partially uncovered — blend it outward by
    ``0.5 - t``.
  * nvdiffrast gates interior (topologically shared) edges via a vertex-
    index topology hash; here the gate is geometric — background on one
    side or a relative depth discontinuity — which selects the same
    occlusion silhouettes without a hash table.

Without ``pos``/``tri`` a screen-space 0.5-coverage approximation is used
(legacy fallback, same gate).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["antialias"]


def _shift(x: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift (B, H, W, ...) by (dy, dx) with edge replication."""
    if dy:
        pad = [(0, 0), (max(dy, 0), max(-dy, 0)), (0, 0)] + [(0, 0)] * (x.ndim - 3)
        x = jnp.pad(x, pad, mode="edge")
        x = x[:, : x.shape[1] - abs(dy)] if dy > 0 else x[:, abs(dy):]
    if dx:
        pad = [(0, 0), (0, 0), (max(dx, 0), max(-dx, 0))] + [(0, 0)] * (x.ndim - 3)
        x = jnp.pad(x, pad, mode="edge")
        x = x[:, :, : x.shape[2] - abs(dx)] if dx > 0 else x[:, :, abs(dx):]
    return x


def _silhouette(tid, tid_n, z, z_n):
    """Gate: id differs AND (background on one side OR relative depth
    jump). Matches the occlusion-silhouette set nvdiffrast selects via its
    vertex topology hash, without the hash."""
    diff_id = tid_n != tid
    bg_edge = (tid == 0) | (tid_n == 0)
    scale = jnp.maximum(jnp.maximum(jnp.abs(z), jnp.abs(z_n)), 1e-3)
    depth_jump = jnp.abs(z_n - z) > 0.01 * scale
    return diff_id & (bg_edge | depth_jump)


def _antialias_analytic(color, rast, pos, tri):
    """Analytic edge-crossing blend, batched over views."""
    from .rasterize import _triangle_setup

    b, h, w, _ = color.shape
    tid = rast[..., 3].astype(jnp.int32)  # (B, H, W), 0 = bg
    z = rast[..., 2]

    def per_view(pos_v, tid_v, z_v, col_v):
        setup = _triangle_setup(pos_v, tri, w, h)
        planes = setup.planes[jnp.maximum(tid_v - 1, 0), :3]  # (H, W, 3, 3)
        px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
        py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
        e_own = (
            planes[..., 0] * px[..., None]
            + planes[..., 1] * py[..., None]
            + planes[..., 2]
        )  # (H, W, 3) own winner's edge values at own center
        delta = jnp.zeros_like(col_v)

        for axis, coef in ((1, 0), (0, 1)):  # x pairs use alpha, y use beta
            sl_p = [slice(None)] * 2
            sl_q = [slice(None)] * 2
            sl_p[axis] = slice(0, -1)
            sl_q[axis] = slice(1, None)
            sl_p, sl_q = tuple(sl_p), tuple(sl_q)

            tid_p, tid_q = tid_v[sl_p], tid_v[sl_q]
            z_p, z_q = z_v[sl_p], z_v[sl_q]
            sil = _silhouette(tid_p, tid_q, z_p, z_q)
            # Inside pixel = the front one (bg never wins).
            p_in = (tid_p > 0) & ((tid_q == 0) | (z_p <= z_q))

            # Inside triangle's edge values at the inside and outside pixel
            # centers: neighbor value = e_own +/- the plane's px/py coef.
            step_p = planes[sl_p][..., coef]  # (.., 3) inside=p: q is +1
            step_q = planes[sl_q][..., coef]
            e_in = jnp.where(p_in[..., None], e_own[sl_p], e_own[sl_q])
            e_out = jnp.where(
                p_in[..., None],
                e_own[sl_p] + step_p,
                e_own[sl_q] - step_q,
            )
            # First exit crossing along the unit segment. Finite sentinel
            # (2.0 > any real crossing t in [0, 1)) instead of inf, and a
            # double-where guarded division: inf/NaN in an unselected where
            # branch poisons the VERTEX-POSITION gradients this pass
            # produces (the silhouette term of rasterize_diff's model).
            crossing = (e_out < 0) & (e_in >= 0)
            denom = jnp.where(crossing, e_in - e_out, 1.0)
            t_i = jnp.where(crossing, e_in / jnp.maximum(denom, 1e-20), 2.0)
            t = jnp.min(t_i, axis=-1)
            ok = sil & (t <= 1.0)

            c_in = jnp.where(p_in[..., None], col_v[sl_p], col_v[sl_q])
            c_out = jnp.where(p_in[..., None], col_v[sl_q], col_v[sl_p])
            w_out = jnp.where(ok, jnp.maximum(t - 0.5, 0.0), 0.0)
            w_in = jnp.where(ok, jnp.maximum(0.5 - t, 0.0), 0.0)
            d_out = (c_in - c_out) * w_out[..., None]
            d_in = (c_out - c_in) * w_in[..., None]
            # Route the deltas back to p/q slots.
            d_p = jnp.where(p_in[..., None], d_in, d_out)
            d_q = jnp.where(p_in[..., None], d_out, d_in)
            pad_p = [(0, 0)] * 2
            pad_q = [(0, 0)] * 2
            pad_p[axis] = (0, 1)
            pad_q[axis] = (1, 0)
            delta = delta + jnp.pad(d_p, pad_p + [(0, 0)])
            delta = delta + jnp.pad(d_q, pad_q + [(0, 0)])
        return col_v + delta

    return jax.vmap(per_view)(pos, tid, z, color)


def antialias(
    color: jnp.ndarray,
    rast: jnp.ndarray,
    pos: Optional[jnp.ndarray] = None,
    tri: Optional[jnp.ndarray] = None,
    topology_hash=None,
    pos_gradient_boost: float = 1.0,
    strength: float = 0.5,
) -> jnp.ndarray:
    """Antialias ``color`` (B, H, W, C) along silhouette edges of ``rast``
    (B, H, W, 4, from :func:`..rasterize`).

    With ``pos`` (B, V, 4) and ``tri`` (T, 3): analytic edge-crossing
    weights (nvdiffrast semantics; ``topology_hash`` and
    ``pos_gradient_boost`` accepted for API parity). Without them: a
    screen-space approximation blending silhouette pixels ``strength``/2
    toward the neighbor across the edge (0.5-coverage assumption).
    """
    del topology_hash, pos_gradient_boost  # parity args
    if pos is not None and tri is not None:
        return _antialias_analytic(
            color, rast, pos.astype(jnp.float32), tri.astype(jnp.int32)
        )

    tid = rast[..., 3].astype(jnp.int32)
    z = rast[..., 2]

    total_w = jnp.ones_like(z)
    accum = color
    for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        tid_n = _shift(tid, dy, dx)
        z_n = _shift(z, dy, dx)
        col_n = _shift(color, dy, dx)
        sil = _silhouette(tid, tid_n, z, z_n)
        w_ = sil.astype(color.dtype) * strength * 0.25
        accum = accum + col_n * w_[..., None]
        total_w = total_w + w_
    return accum / total_w[..., None]

"""Level-of-detail chains: the forward rasterizer's answer to sub-pixel
triangle floods.

Forward rasterization pays per (binned triangle, tile pixel): a 1M-triangle
mesh at 512^2 puts ~150k sub-pixel triangles in every tile and the fused
kernel tests each against all 2048 pixels — an inherent cliff (measured 5.2
views/s). The reference dodges it by decimating every mesh to <= 50k faces
before rendering (mesh_process.py:168-220 — invoked unconditionally from
its processing chain); this module automates the same answer per view: a
QEM decimation chain precomputed host-side at load, with the level chosen
from the projected screen coverage so rendered triangles stay above a
target pixel area.

Level selection is a HOST-side pre-dispatch decision (like the reference's
decimate-first): each level is a different static shape, so it must pick
the program, not branch inside jit.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np

from .mesh import TexturedMesh

__all__ = ["LODChain", "build_lod_chain", "select_lod_level"]


class LODChain:
    """Decimation pyramid over a base mesh. levels[0] is the full-detail
    mesh; levels[i] targets ``num_faces / factors[i]`` faces."""

    def __init__(
        self,
        levels: List[TexturedMesh],
        factors: Sequence[int],
        bbox: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    ):
        self.levels = levels
        self.factors = tuple(factors)
        # Host-side bbox of the base mesh, cached at build time: select()
        # must not pull the full device-resident vertex buffer per call.
        if bbox is None:
            v = np.asarray(levels[0].v_pos)
            bbox = (v.min(0), v.max(0))
        self.bbox = bbox

    def __len__(self) -> int:
        return len(self.levels)

    def select(
        self,
        cam,
        height: int,
        width: int,
        target_px_per_tri: float = 2.0,
    ) -> int:
        """Pick the finest level whose expected screen-space triangle area
        stays >= target_px_per_tri (host-side; see select_lod_level)."""
        return select_lod_level(
            self, cam, height, width, target_px_per_tri=target_px_per_tri
        )

    def mesh_for(self, cam, height: int, width: int, **kw) -> TexturedMesh:
        return self.levels[self.select(cam, height, width, **kw)]


def _unify_uv_topology(
    mesh: TexturedMesh,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Seam-cut unified indexing: one vertex per unique (pos_idx, tex_idx)
    corner pair (the representation process_raw exports; what
    decimate_with_texture expects)."""
    pos_idx = np.asarray(mesh.t_pos_idx).reshape(-1)
    tex_idx = np.asarray(mesh.t_tex_idx).reshape(-1)
    key = pos_idx.astype(np.int64) << 32 | tex_idx.astype(np.int64)
    uniq, first, inverse = np.unique(key, return_index=True, return_inverse=True)
    v_pos = np.asarray(mesh.v_pos)[pos_idx[first]]
    v_tex = np.asarray(mesh.v_tex)[tex_idx[first]]
    faces = inverse.reshape(-1, 3)
    return v_pos, v_tex, faces


def build_lod_chain(
    mesh: TexturedMesh,
    factors: Sequence[int] = (1, 4, 16, 64),
    min_faces: int = 512,
) -> LODChain:
    """Precompute a QEM decimation chain (host-side, native meshproc).

    factors: per-level face-count divisors relative to the base mesh;
    factor 1 is the base mesh itself. Levels whose target would fall below
    ``min_faces`` are dropped. Textured meshes decimate through the 5D
    (pos + UV) quadrics with seam constraints (decimate_with_texture), so
    every level keeps a usable atlas.
    """
    import jax.numpy as jnp

    from . import meshproc

    t_total = int(mesh.num_faces)
    textured = mesh.v_tex is not None and mesh.t_tex_idx is not None
    levels: List[TexturedMesh] = [mesh]
    used: List[int] = [1]
    # Pull the base geometry to the HOST exactly once and iterate in numpy:
    # a device-resident base mesh would otherwise be re-fetched per level
    # (tunnel device->host is ~2 MB/s — a 1M-triangle chain build measured
    # 404 s dominated by transfers vs ~10 s of actual decimation).
    if textured:
        prev_pos, prev_tex, prev_faces = _unify_uv_topology(mesh)
    else:
        prev_pos = np.asarray(mesh.v_pos, np.float64)
        prev_tex = None
        prev_faces = np.asarray(mesh.t_pos_idx, np.int64)
    bbox = (prev_pos.min(0), prev_pos.max(0))
    for f in sorted(set(factors)):
        if f <= 1:
            continue
        target = t_total // f
        if target < min_faces:
            break
        # Progressive: decimate from the PREVIOUS level, not the base —
        # deep levels cost O(prev) instead of O(base) heap work (matters at
        # the 1M-triangle scale this exists for).
        if textured:
            prev_pos, prev_tex, prev_faces = meshproc.decimate_with_texture(
                prev_pos, prev_tex, prev_faces, target_faces=target
            )
            levels.append(
                TexturedMesh(
                    v_pos=jnp.asarray(prev_pos, jnp.float32),
                    t_pos_idx=jnp.asarray(prev_faces, jnp.int32),
                    v_tex=jnp.asarray(prev_tex, jnp.float32),
                    t_tex_idx=jnp.asarray(prev_faces, jnp.int32),
                    texture=mesh.texture,
                )
            )
        else:
            prev_pos, prev_faces = meshproc.decimate(
                prev_pos, prev_faces, target_faces=target
            )
            levels.append(
                TexturedMesh(
                    v_pos=jnp.asarray(prev_pos, jnp.float32),
                    t_pos_idx=jnp.asarray(prev_faces, jnp.int32),
                )
            )
        used.append(f)
    return LODChain(levels, used, bbox=bbox)


def _screen_area_estimate(bbox, cam, height: int, width: int):
    """Expected covered pixels per view: project the mesh bbox corners and
    take half the clipped 2D-bbox area (the 0.5 factor approximates a
    roundish object inside its bbox). (n_views,) numpy."""
    lo, hi = bbox
    corners = np.array(
        [[x, y, z, 1.0] for x in (lo[0], hi[0]) for y in (lo[1], hi[1])
         for z in (lo[2], hi[2])],
        np.float32,
    )  # (8, 4)
    mvp = np.asarray(cam.mvp_mtx)  # (B, 4, 4)
    clip = np.einsum("bij,cj->bci", mvp, corners)
    w = np.maximum(clip[..., 3], 1e-6)
    x = (clip[..., 0] / w * 0.5 + 0.5) * width
    y = (clip[..., 1] / w * 0.5 + 0.5) * height
    x = np.clip(x, 0, width)
    y = np.clip(y, 0, height)
    return 0.5 * np.maximum(x.max(1) - x.min(1), 0.0) * np.maximum(
        y.max(1) - y.min(1), 0.0
    )


def select_lod_level(
    chain: LODChain,
    cam,
    height: int,
    width: int,
    target_px_per_tri: float = 2.0,
) -> int:
    """Finest level (lowest index) whose expected pixels-per-triangle meet
    the target, maximized over the view batch (one level per batched
    dispatch — static shapes). Falls back to the coarsest level when even
    it is sub-pixel dense."""
    area = float(np.max(_screen_area_estimate(chain.bbox, cam, height, width)))
    for li, mesh in enumerate(chain.levels):
        if area / max(int(mesh.num_faces), 1) >= target_px_per_tri:
            return li
    return len(chain.levels) - 1

"""Camera math: orbit look-at construction, projection matrices, Camera pytree.

TPU-native re-implementation of the reference camera system
(reference: mvadapter/utils/mesh_utils/camera.py:23-223). All functions are pure
jnp and jittable; ``Camera`` is a NamedTuple pytree so it threads through
``jax.jit`` / ``vmap`` / ``pjit`` without any host round-trips.

Conventions (identical to the reference so every downstream image matches):
  * World is Z-up; orbit cameras look at the origin
    (reference camera.py:44-64).
  * The perspective projection has a **negated Y row**
    (reference camera.py:83) compensating the rasterizer's OpenGL-style
    bottom-up framebuffer so that image row 0 is the top of the image.
  * The orthographic projection likewise negates Y
    (reference camera.py:104).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

ArrayLike = Union[jnp.ndarray, np.ndarray, Sequence[float], float, int]


def _as_f32(x: ArrayLike) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.float32)


def normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize along ``axis`` (torch.nn.functional.normalize semantics:
    divide by max(norm, eps))."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def get_c2w(
    elevation_deg: ArrayLike,
    distance: ArrayLike,
    azimuth_deg: Optional[ArrayLike] = None,
    num_views: Optional[int] = 1,
) -> jnp.ndarray:
    """Orbit camera-to-world matrices, Z-up look-at targeting the origin.

    Matches reference camera.py:23-65: camera position from spherical
    (elevation, azimuth, distance); basis columns are [right, up, -lookat].

    Returns (N, 4, 4) float32.
    """
    if azimuth_deg is None:
        assert num_views is not None, "num_views required when azimuth_deg is None"
        azimuth_deg = jnp.linspace(0.0, 360.0, num_views + 1, dtype=jnp.float32)[:-1]
    azimuth_deg = jnp.atleast_1d(_as_f32(azimuth_deg))
    elevation_deg = jnp.atleast_1d(_as_f32(elevation_deg))
    dist = jnp.atleast_1d(_as_f32(distance))
    n = azimuth_deg.shape[0]
    elevation_deg = jnp.broadcast_to(elevation_deg, (n,))
    dist = jnp.broadcast_to(dist, (n,))

    elev = elevation_deg * (math.pi / 180.0)
    azim = azimuth_deg * (math.pi / 180.0)
    cam_pos = jnp.stack(
        [
            dist * jnp.cos(elev) * jnp.cos(azim),
            dist * jnp.cos(elev) * jnp.sin(azim),
            dist * jnp.sin(elev),
        ],
        axis=-1,
    )  # (N, 3)

    up_world = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), (n, 3))
    lookat = normalize(-cam_pos)
    right = normalize(jnp.cross(lookat, up_world))
    up = normalize(jnp.cross(right, lookat))
    rot = jnp.stack([right, up, -lookat], axis=-1)  # (N, 3, 3) columns
    c2w = jnp.concatenate([rot, cam_pos[:, :, None]], axis=-1)  # (N, 3, 4)
    bottom = jnp.broadcast_to(jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32), (n, 1, 4))
    return jnp.concatenate([c2w, bottom], axis=1)


def get_projection_matrix(
    fovy_deg: ArrayLike,
    aspect_wh: float = 1.0,
    near: float = 0.1,
    far: float = 100.0,
) -> jnp.ndarray:
    """OpenGL-style perspective projection with negated Y row
    (reference camera.py:68-87). Returns (N, 4, 4) float32."""
    fovy_deg = jnp.atleast_1d(_as_f32(fovy_deg))
    n = fovy_deg.shape[0]
    fovy = fovy_deg * (math.pi / 180.0)
    t = jnp.tan(fovy / 2.0)
    zero = jnp.zeros((n,), jnp.float32)
    one = jnp.ones((n,), jnp.float32)
    row0 = jnp.stack([1.0 / (aspect_wh * t), zero, zero, zero], axis=-1)
    row1 = jnp.stack([zero, -1.0 / t, zero, zero], axis=-1)
    row2 = jnp.stack(
        [
            zero,
            zero,
            jnp.full((n,), -(far + near) / (far - near), jnp.float32),
            jnp.full((n,), -2.0 * far * near / (far - near), jnp.float32),
        ],
        axis=-1,
    )
    row3 = jnp.stack([zero, zero, -one, zero], axis=-1)
    return jnp.stack([row0, row1, row2, row3], axis=1)


def get_orthogonal_projection_matrix(
    batch_size: int,
    left: float,
    right: float,
    bottom: float,
    top: float,
    near: float = 0.1,
    far: float = 100.0,
) -> jnp.ndarray:
    """Orthographic projection with negated Y row (reference camera.py:90-110)."""
    proj = np.zeros((batch_size, 4, 4), dtype=np.float32)
    proj[:, 0, 0] = 2.0 / (right - left)
    proj[:, 1, 1] = -2.0 / (top - bottom)
    proj[:, 2, 2] = -2.0 / (far - near)
    proj[:, 0, 3] = -(right + left) / (right - left)
    proj[:, 1, 3] = -(top + bottom) / (top - bottom)
    proj[:, 2, 3] = -(far + near) / (far - near)
    proj[:, 3, 3] = 1.0
    return jnp.asarray(proj)


class Camera(NamedTuple):
    """Batch-of-views camera pytree (reference camera.py:113-149).

    All fields are (N, 4, 4) except cam_pos (N, 3). ``c2w``/``cam_pos`` may be
    None when constructed from a bare w2c.
    """

    c2w: Optional[jnp.ndarray]
    w2c: jnp.ndarray
    proj_mtx: jnp.ndarray
    mvp_mtx: jnp.ndarray
    cam_pos: Optional[jnp.ndarray]

    def __getitem__(self, index):
        if isinstance(index, int):
            index = slice(index, index + 1)
        if isinstance(index, list):
            index = jnp.asarray(index)
        return Camera(
            c2w=self.c2w[index] if self.c2w is not None else None,
            w2c=self.w2c[index],
            proj_mtx=self.proj_mtx[index],
            mvp_mtx=self.mvp_mtx[index],
            cam_pos=self.cam_pos[index] if self.cam_pos is not None else None,
        )

    def __len__(self) -> int:
        return self.w2c.shape[0]


def _camera_replace(self: Camera, **kwargs) -> Camera:
    return Camera(**{f: kwargs.get(f, getattr(self, f)) for f in Camera._fields})


# Camera.__getitem__/__len__ give view-batch semantics (reference
# camera.py:121-137), which hijacks Python's sequence protocol: iteration
# would walk views, so NamedTuple._replace (which maps over `self`) breaks.
# Restore field-level iteration and an explicit _replace. (Assigned after
# class creation — the NamedTuple metaclass forbids overrides in the body.)
Camera.__iter__ = tuple.__iter__
Camera._replace = _camera_replace


def rigid_inverse(mat: jnp.ndarray) -> jnp.ndarray:
    """Analytic inverse of a batch of rigid 4x4 transforms (R^T, -R^T t).

    Exact ONLY for orthonormal rotation blocks — our own orbit cameras.
    External camera matrices (e.g. Blender exports, whose parenting bakes
    a uniform scale into matrix_world — the reference's committed
    camera_path.json carries 0.6) need :func:`affine_inverse`.
    """
    rot = mat[..., :3, :3]
    t = mat[..., :3, 3]
    rot_t = jnp.swapaxes(rot, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", rot_t, t,
                        precision=jax.lax.Precision.HIGHEST)
    inv = jnp.concatenate([rot_t, t_inv[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], mat.dtype), inv.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([inv, bottom], axis=-2)


def affine_inverse(mat: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of batched affine 4x4 transforms [A | t; 0 1]
    via the 3x3 cofactor adjugate — exact for scaled / sheared camera
    matrices, jit-friendly (no LU), and equivalent to the reference's
    torch.linalg.inv(c2w) (camera.py:180) on the matrices cameras produce.
    """
    a = mat[..., :3, :3].astype(jnp.float32)
    t = mat[..., :3, 3].astype(jnp.float32)

    def m(i, j):
        return a[..., i, j]

    c00 = m(1, 1) * m(2, 2) - m(1, 2) * m(2, 1)
    c01 = m(1, 2) * m(2, 0) - m(1, 0) * m(2, 2)
    c02 = m(1, 0) * m(2, 1) - m(1, 1) * m(2, 0)
    det = m(0, 0) * c00 + m(0, 1) * c01 + m(0, 2) * c02
    det = jnp.where(jnp.abs(det) < 1e-30, 1e-30, det)
    adj = jnp.stack(
        [
            jnp.stack([c00,
                       m(0, 2) * m(2, 1) - m(0, 1) * m(2, 2),
                       m(0, 1) * m(1, 2) - m(0, 2) * m(1, 1)], axis=-1),
            jnp.stack([c01,
                       m(0, 0) * m(2, 2) - m(0, 2) * m(2, 0),
                       m(0, 2) * m(1, 0) - m(0, 0) * m(1, 2)], axis=-1),
            jnp.stack([c02,
                       m(0, 1) * m(2, 0) - m(0, 0) * m(2, 1),
                       m(0, 0) * m(1, 1) - m(0, 1) * m(1, 0)], axis=-1),
        ],
        axis=-2,
    )
    inv3 = adj / det[..., None, None]
    t_inv = -jnp.einsum("...ij,...j->...i", inv3, t,
                        precision=jax.lax.Precision.HIGHEST)
    inv = jnp.concatenate([inv3, t_inv[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32),
        inv.shape[:-2] + (1, 4),
    )
    return jnp.concatenate([inv, bottom], axis=-2)


def get_camera(
    elevation_deg: Optional[ArrayLike] = None,
    distance: Optional[ArrayLike] = None,
    fovy_deg: Optional[ArrayLike] = None,
    azimuth_deg: Optional[ArrayLike] = None,
    num_views: Optional[int] = 1,
    c2w: Optional[jnp.ndarray] = None,
    w2c: Optional[jnp.ndarray] = None,
    proj_mtx: Optional[jnp.ndarray] = None,
    aspect_wh: float = 1.0,
    near: float = 0.1,
    far: float = 100.0,
    perturb_camera_position: float = 0.0,
    key: Optional[jnp.ndarray] = None,
) -> Camera:
    """Build a perspective Camera batch (reference camera.py:152-191).

    ``perturb_camera_position`` jitters camera positions by uniform noise in
    [-p, p] (reference camera.py:170-178); pass ``key`` for reproducibility
    (defaults to a fixed seed — functional JAX randomness).
    """
    if w2c is None:
        if c2w is None:
            c2w = get_c2w(elevation_deg, distance, azimuth_deg, num_views)
        c2w = _as_f32(c2w)
        if perturb_camera_position > 0.0:
            if key is None:
                key = jax.random.PRNGKey(0)
            noise = jax.random.uniform(
                key,
                c2w[:, :3, 3].shape,
                minval=-perturb_camera_position,
                maxval=perturb_camera_position,
            )
            c2w = c2w.at[:, :3, 3].add(noise)
        cam_pos = c2w[:, :3, 3]
        # affine_inverse, not rigid_inverse: externally supplied c2w (e.g.
        # Blender matrix_world) may carry scale — the transpose-inverse
        # silently produced a wrong w2c/mvp for the reference's own
        # camera_path.json fixture (uniform 0.6 scale).
        w2c = affine_inverse(c2w)
    else:
        w2c = _as_f32(w2c)
        cam_pos = None
        c2w = None
    if proj_mtx is None:
        proj_mtx = get_projection_matrix(fovy_deg, aspect_wh=aspect_wh, near=near, far=far)
    proj_mtx = _as_f32(proj_mtx)
    if proj_mtx.shape[0] == 1 and w2c.shape[0] > 1:
        proj_mtx = jnp.broadcast_to(proj_mtx, (w2c.shape[0], 4, 4))
    mvp_mtx = jnp.matmul(proj_mtx, w2c, precision=jax.lax.Precision.HIGHEST)
    return Camera(c2w=c2w, w2c=w2c, proj_mtx=proj_mtx, mvp_mtx=mvp_mtx, cam_pos=cam_pos)


def get_orthogonal_camera(
    elevation_deg: ArrayLike,
    distance: ArrayLike,
    left: float,
    right: float,
    bottom: float,
    top: float,
    azimuth_deg: Optional[ArrayLike] = None,
    num_views: Optional[int] = 1,
    near: float = 0.1,
    far: float = 100.0,
) -> Camera:
    """Build an orthographic Camera batch (reference camera.py:194-223)."""
    c2w = get_c2w(elevation_deg, distance, azimuth_deg, num_views)
    cam_pos = c2w[:, :3, 3]
    w2c = rigid_inverse(c2w)
    proj_mtx = get_orthogonal_projection_matrix(
        batch_size=c2w.shape[0], left=left, right=right, bottom=bottom, top=top,
        near=near, far=far,
    )
    mvp_mtx = jnp.matmul(proj_mtx, w2c, precision=jax.lax.Precision.HIGHEST)
    return Camera(c2w=c2w, w2c=w2c, proj_mtx=proj_mtx, mvp_mtx=mvp_mtx, cam_pos=cam_pos)

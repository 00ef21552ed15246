"""Ray / Plücker / depth-backprojection geometry (pure jnp, jittable).

Reference contracts: mvadapter/utils/geometry.py:8-253.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .camera import normalize


def get_position_map_from_depth(
    depth: jnp.ndarray,
    mask: jnp.ndarray,
    intrinsics: jnp.ndarray,
    extrinsics: jnp.ndarray,
    image_wh: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Back-project (B, H, W, 1) depth maps to (B, H, W, 3) world positions
    using pinhole intrinsics (B, 3, 3) and c2w extrinsics (B, 4, 4).
    Reference geometry.py:8-60."""
    if image_wh is None:
        image_wh = depth.shape[2], depth.shape[1]
    b, h, w, _ = depth.shape
    depth = depth[..., 0]
    u = jnp.arange(image_wh[0], dtype=depth.dtype)[None, None, :]
    v = jnp.arange(image_wh[1], dtype=depth.dtype)[None, :, None]
    fx = intrinsics[:, 0, 0][:, None, None]
    fy = intrinsics[:, 1, 1][:, None, None]
    cx = intrinsics[:, 0, 2][:, None, None]
    cy = intrinsics[:, 1, 2][:, None, None]
    x = (u - cx) * depth / fx
    y = (v - cy) * depth / fy
    cam = jnp.stack([x, y, depth], axis=-1)
    cam_h = jnp.concatenate([cam, jnp.ones_like(cam[..., :1])], axis=-1)
    world = jnp.einsum("bhwj,bij->bhwi", cam_h, extrinsics,
                       precision=jax.lax.Precision.HIGHEST)
    return world[..., :3] * mask


def get_position_map_from_depth_ortho(
    depth: jnp.ndarray,
    mask: jnp.ndarray,
    extrinsics: jnp.ndarray,
    ortho_scale: jnp.ndarray,
    image_wh: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """Orthographic variant of :func:`get_position_map_from_depth`.
    Reference geometry.py:63-111."""
    if image_wh is None:
        image_wh = depth.shape[2], depth.shape[1]
    depth = depth[..., 0]
    u = jnp.arange(image_wh[0], dtype=depth.dtype)[None, None, :]
    v = jnp.arange(image_wh[1], dtype=depth.dtype)[None, :, None]
    ortho = jnp.asarray(ortho_scale, depth.dtype).reshape(-1, 1, 1)
    x = (u - image_wh[0] / 2.0) * ortho / image_wh[0]
    y = (v - image_wh[1] / 2.0) * ortho / image_wh[1]
    x = jnp.broadcast_to(x, depth.shape)
    y = jnp.broadcast_to(y, depth.shape)
    cam = jnp.stack([x, y, depth], axis=-1)
    cam_h = jnp.concatenate([cam, jnp.ones_like(cam[..., :1])], axis=-1)
    world = jnp.einsum("bhwj,bij->bhwi", cam_h, extrinsics,
                       precision=jax.lax.Precision.HIGHEST)
    return world[..., :3] * mask


def get_ray_directions(
    height: int,
    width: int,
    focal: float,
    principal: Optional[Tuple[float, float]] = None,
    use_pixel_centers: bool = True,
) -> jnp.ndarray:
    """(H, W, 3) normalized camera-frame ray directions, -z forward.
    Reference geometry.py:139-163."""
    center = 0.5 if use_pixel_centers else 0.0
    cx, cy = (width / 2.0, height / 2.0) if principal is None else principal
    i = jnp.arange(width, dtype=jnp.float32)[None, :] + center
    j = jnp.arange(height, dtype=jnp.float32)[:, None] + center
    i = jnp.broadcast_to(i, (height, width))
    j = jnp.broadcast_to(j, (height, width))
    dirs = jnp.stack(
        [(i - cx) / focal, -(j - cy) / focal, -jnp.ones_like(i)], axis=-1
    )
    return normalize(dirs)


def get_rays(directions: jnp.ndarray, c2w: jnp.ndarray):
    """Rotate camera-frame ray dirs into the world; origins from c2w.
    Reference geometry.py:166-180."""
    rays_d = directions @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def compute_plucker_embed(
    c2w: jnp.ndarray, image_width: int, image_height: int, focal: float
) -> jnp.ndarray:
    """(6, H, W) Plücker embedding of the camera's ray bundle.
    Reference geometry.py:183-201."""
    directions = get_ray_directions(image_height, image_width, focal)
    rays_o, rays_d = get_rays(directions, c2w)
    cross = jnp.cross(rays_o, rays_d)
    plucker = jnp.concatenate([rays_d, cross], axis=-1)
    return jnp.transpose(plucker, (2, 0, 1))


def get_opencv_from_blender(
    matrix_world: jnp.ndarray,
    fov: Optional[float] = None,
    image_size: Optional[int] = None,
):
    """Blender camera world matrix -> OpenCV extrinsics (and intrinsics when
    perspective). Reference geometry.py:114-137: invert, then negate the Y
    and Z camera rows (OpenGL -> OpenCV camera axes)."""
    w2c = jnp.linalg.inv(matrix_world)
    w2c = w2c.at[1, :].multiply(-1.0).at[2, :].multiply(-1.0)
    rot, trans = w2c[:3, :3], w2c[:3, 3]
    if fov is None:  # orthographic camera
        return rot, trans
    import math

    focal = 1.0 / math.tan(fov / 2.0)
    intr = jnp.diag(jnp.array([focal, focal, 1.0], jnp.float32))[None]
    intr = intr.at[:, :2, -1].add(image_size / 2.0)
    intr = intr.at[:, 0, 0].multiply(image_size / 2.0)
    intr = intr.at[:, 1, 1].multiply(image_size / 2.0)
    return rot[None], trans[None], intr


def get_plucker_embeds_from_cameras(
    c2w, fov, image_size: int
) -> jnp.ndarray:
    """(B, 6, H, W) Plücker embeddings for perspective cameras
    (reference geometry.py:204-221)."""
    import math

    embeds = [
        compute_plucker_embed(
            jnp.asarray(m), image_size, image_size,
            0.5 * image_size / math.tan(0.5 * float(f)),
        )
        for m, f in zip(c2w, fov)
    ]
    return jnp.stack(embeds)


def get_plucker_embeds_from_cameras_ortho(
    c2w, ortho_scale, image_size: int
) -> jnp.ndarray:
    """(B, 6, H, W) constant Plücker embeddings for orthographic cameras
    (reference geometry.py:224-253): per-camera [view_dir, normalized
    position] broadcast over the image."""
    embeds = []
    for m, _scale in zip(c2w, ortho_scale):
        rot, trans = get_opencv_from_blender(jnp.asarray(m))
        cam_pos = -rot.T @ trans
        view_dir = rot.T @ jnp.array([0.0, 0.0, 1.0], jnp.float32)
        cam_pos = normalize(cam_pos, axis=0)
        plucker = jnp.concatenate([view_dir, cam_pos])  # (6,)
        embeds.append(
            jnp.broadcast_to(plucker[:, None, None], (6, image_size, image_size))
        )
    return jnp.stack(embeds)

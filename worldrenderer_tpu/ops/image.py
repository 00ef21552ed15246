"""Image-space ops: Sobel gradients, morphology, iterative inpaint.

TPU-native replacements for the reference's CV-CUDA calls
(mvadapter/utils/mesh_utils/cv_ops.py:11-93) and the Sobel/max-pool stack in
uv_render_geometry (mvadapter/utils/mesh_utils/uv.py:122-141). Morphology is
``lax.reduce_window`` min/max pooling; inpaint is an iterative masked
neighbor-diffusion (push-style) fill — all static shapes, all fused by XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "sobel_grad_magnitude",
    "max_pool2d",
    "batch_dilate",
    "batch_erode",
    "inpaint",
    "batch_inpaint",
]


def sobel_grad_magnitude(img: jnp.ndarray) -> jnp.ndarray:
    """Sobel gradient magnitude of (B, H, W) maps with zero padding
    (uv.py:122-134 semantics: 3x3 Sobel x/y then sqrt(gx^2+gy^2))."""
    kx = jnp.array(
        [[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]], jnp.float32
    )
    ky = jnp.array(
        [[1.0, 2.0, 1.0], [0.0, 0.0, 0.0], [-1.0, -2.0, -1.0]], jnp.float32
    )
    x = img[:, None, :, :]  # NCHW
    k = jnp.stack([kx, ky])[:, None]  # (2, 1, 3, 3)
    g = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.sqrt(g[:, 0] ** 2 + g[:, 1] ** 2)


def max_pool2d(x: jnp.ndarray, kernel_size: int, padding: int = None) -> jnp.ndarray:
    """Stride-1 max pool of (B, H, W) maps; padding defaults to
    ``kernel_size // 2`` (torch F.max_pool2d semantics used at uv.py:135-140;
    note even kernels then shift by half a pixel, as in torch)."""
    if kernel_size <= 1:
        return x
    if padding is None:
        padding = kernel_size // 2
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel_size, kernel_size),
        window_strides=(1, 1, 1),
        padding=((0, 0), (padding, padding), (padding, padding)),
    )


def batch_dilate(masks: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Binary dilation of (B, H, W) masks (cv_ops.py:72-93 equivalent)."""
    m = masks.astype(jnp.float32)
    out = max_pool2d(m, kernel_size, padding=kernel_size // 2)
    return (out > 0).astype(masks.dtype)


def batch_erode(masks: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Binary erosion of (B, H, W) masks (cv_ops.py:52-69 equivalent)."""
    m = masks.astype(jnp.float32)
    pad = kernel_size // 2
    out = -jax.lax.reduce_window(
        -m,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, kernel_size, kernel_size),
        window_strides=(1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad)),
    )
    return (out > 0.5).astype(masks.dtype)


def _diffuse_step(carry, _):
    """One masked neighbor-average propagation step. carry = (attr, known)
    with attr (H, W, C), known (H, W) float {0,1}."""
    attr, known = carry
    k = jnp.array(
        [[0.0, 1.0, 0.0], [1.0, 0.0, 1.0], [0.0, 1.0, 0.0]], jnp.float32
    )

    def conv2(x):  # (H, W, C) -> neighbor sum per channel
        xt = jnp.moveaxis(x, -1, 0)[:, None]  # (C,1,H,W)
        out = jax.lax.conv_general_dilated(
            xt, k[None, None], (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.moveaxis(out[:, 0], 0, -1)

    nb_sum = conv2(attr * known[..., None])
    nb_cnt = conv2(jnp.broadcast_to(known[..., None], known.shape + (1,)))
    filled = nb_sum / jnp.maximum(nb_cnt, 1.0)
    newly = (known == 0.0) & (nb_cnt[..., 0] > 0.0)
    attr = jnp.where(newly[..., None], filled, attr)
    known = jnp.where(newly, 1.0, known)
    return (attr, known), None


@functools.partial(jax.jit, static_argnums=(2,))
def inpaint(image: jnp.ndarray, mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Fill ``mask`` pixels of (H, W, C) ``image`` by diffusing known
    neighbors outward ``radius`` steps (replaces cvcuda.inpaint for UV gutter
    padding, cv_ops.py:11-35; also the reference's only use — uv.py:373-382).
    Pixels further than ``radius`` from known content stay untouched."""
    known = 1.0 - mask.astype(jnp.float32)
    known = (known > 0.5).astype(jnp.float32)
    (out, _), _ = jax.lax.scan(
        _diffuse_step, (image.astype(jnp.float32), known), None, length=radius
    )
    return out


def batch_inpaint(images: jnp.ndarray, masks: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Batched :func:`inpaint` over a leading view axis (cv_ops.py:38-51)."""
    return jax.vmap(lambda i, m: inpaint(i, m, radius))(images, masks)

"""Poisson (seamless-clone) blending: Jacobi iterations on the 2D grid.

Replaces the reference's three backends — the inline CUDA kernel
(mvadapter/utils/mesh_utils/blend.py:51-103, 1000 kernel launches each with a
cudaDeviceSynchronize), the Triton kernel (blend.py:116-148), and the
torch-native gather (blend.py:208-216).

TPU-first redesign: instead of flattening masked pixels into a dynamic-size
(N, 4) gather system (blend.py:294-312 — dynamic shapes are hostile to XLA),
the Jacobi sweep runs directly on the (H, W, C) grid as a 4-neighbor stencil
under one fused ``lax.scan``: the same math (non-mask neighbors contribute 0,
boundary values enter through the RHS), fully static shapes, no gathers, one
compiled program for all 1000 sweeps.

Math identical to blend.py:221-324:
    B       = lap(src-or-mixed) + neighbor_sum(tgt * ~mask)
    X_{t+1} = (neighbor_sum(X_t * mask) + B) / 4   at mask pixels
    out     = where(mask, clip(X_final, 0, 1), tgt)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["poisson_blend", "PoissonBlendingSolver"]


def _neighbor_sum(x: jnp.ndarray) -> jnp.ndarray:
    """Sum of the 4 axis neighbors with zero boundary. x: (H, W, C) or (H, W)."""
    up = jnp.pad(x[1:], [(0, 1)] + [(0, 0)] * (x.ndim - 1))
    down = jnp.pad(x[:-1], [(1, 0)] + [(0, 0)] * (x.ndim - 1))
    left = jnp.pad(x[:, 1:], [(0, 0), (0, 1)] + [(0, 0)] * (x.ndim - 2))
    right = jnp.pad(x[:, :-1], [(0, 0), (1, 0)] + [(0, 0)] * (x.ndim - 2))
    return up + down + left + right


def _laplacian(x: jnp.ndarray) -> jnp.ndarray:
    """4 * x - neighbor_sum(x), zero-padded boundary (blend.py lap_kernel)."""
    return 4.0 * x - _neighbor_sum(x)


def _directional_laps(x: jnp.ndarray) -> jnp.ndarray:
    """The 4 one-sided differences (x - neighbor), stacked on axis 0
    (blend.py lap_kernel4: up, down, left, right). x: (H, W, C) -> (4, H, W, C).
    Zero padding at the image border (matches F.conv2d padding=1)."""
    up = x - jnp.pad(x[1:], [(0, 1)] + [(0, 0)] * (x.ndim - 1))
    down = x - jnp.pad(x[:-1], [(1, 0)] + [(0, 0)] * (x.ndim - 1))
    left = x - jnp.pad(x[:, 1:], [(0, 0), (0, 1)] + [(0, 0)] * (x.ndim - 2))
    right = x - jnp.pad(x[:, :-1], [(0, 0), (1, 0)] + [(0, 0)] * (x.ndim - 2))
    return jnp.stack([up, down, left, right])


@functools.partial(jax.jit, static_argnames=("num_iters", "grad_mode"))
def poisson_blend(
    src: jnp.ndarray,
    mask: jnp.ndarray,
    tgt: jnp.ndarray,
    num_iters: int = 1000,
    grad_mode: str = "src",
) -> jnp.ndarray:
    """Seamlessly clone ``src`` into ``tgt`` over ``mask``.

    src, tgt: (H, W, C) float; mask: (H, W) bool or float (>0.5 = inside).
    grad_mode: 'src' | 'max' | 'avg' guidance gradients (blend.py:252-286).
    """
    src = src.astype(jnp.float32)
    tgt = tgt.astype(jnp.float32)
    if mask.ndim == 3:
        mask = mask.mean(-1) > 0.5
    else:
        mask = mask > 0.5
    # Clear the one-pixel border (blend.py:243-246).
    h, w = mask.shape
    border = jnp.zeros_like(mask)
    border = border.at[1:-1, 1:-1].set(True)
    mask = mask & border
    maskf = mask.astype(jnp.float32)[..., None]

    if grad_mode == "src":
        lap = _laplacian(src)
    elif grad_mode == "max":
        sl = _directional_laps(src)
        tl = _directional_laps(tgt)
        lap = jnp.where(jnp.abs(sl) > jnp.abs(tl), sl, tl).sum(0)
    elif grad_mode == "avg":
        lap = 0.5 * (_directional_laps(src) + _directional_laps(tgt)).sum(0)
    else:
        raise ValueError(f"unknown grad_mode {grad_mode!r}")

    # Dirichlet boundary flux: neighbor sum of tgt outside the mask
    # (blend.py:288-292 fq_star with tgt_masked).
    fq_star = _neighbor_sum(tgt * (1.0 - maskf))
    b = lap + fq_star

    x0 = tgt * maskf

    def body(x, _):
        x = maskf * (_neighbor_sum(x) + b) * 0.25
        return x, None

    x, _ = jax.lax.scan(body, x0, None, length=num_iters)
    return jnp.where(mask[..., None], jnp.clip(x, 0.0, 1.0), tgt)


class PoissonBlendingSolver:
    """API-parity shim over :func:`poisson_blend` (blend.py:191-324). The
    reference selects CUDA/Triton/torch backends by string; on TPU there is
    one fused XLA program, so ``backend`` is accepted and ignored."""

    def __init__(self, backend: str = "xla", device: str = "tpu"):
        del backend, device

    def __call__(
        self,
        src,
        mask,
        tgt,
        num_iters: int,
        inplace: bool = True,
        grad_mode: str = "src",
    ):
        del inplace  # functional: always returns a new array
        return poisson_blend(
            jnp.asarray(src), jnp.asarray(mask), jnp.asarray(tgt),
            num_iters=num_iters, grad_mode=grad_mode,
        )

"""Sharded multi-view render sweeps and the differentiable texture-fit
training step.

The view axis (the reference's per-view Python loop,
mvadapter/test/pipeline.py:194-219) becomes a sharded batch axis over the
device mesh: each chip rasterizes its view shard, and gradient reductions
for texture optimization ride ICI as XLA-inserted psums.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..camera import Camera
from ..mesh import TexturedMesh, with_normals
from ..render import RenderOutput, render

__all__ = ["render_views_sharded", "texture_fit_step", "make_texture_fit_step"]


def _shard_camera(cam: Camera, sharding: NamedSharding) -> Camera:
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if x is not None else None, cam
    )


def render_views_sharded(
    mesh: TexturedMesh,
    cam: Camera,
    height: int,
    width: int,
    device_mesh: Mesh,
    **render_kwargs,
) -> RenderOutput:
    """Render a view batch with the leading view axis sharded across the
    device mesh's first axis. Geometry and texture are replicated; per-view
    G-buffers come back sharded (no gather unless the host reads them)."""
    axis = device_mesh.axis_names[0]
    view_shard = NamedSharding(device_mesh, P(axis))
    repl = NamedSharding(device_mesh, P())

    mesh = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl) if x is not None else None, mesh
    )
    cam = _shard_camera(cam, view_shard)

    fn = functools.partial(render, height=height, width=width, **render_kwargs)
    return jax.jit(fn)(mesh, cam)


def texture_fit_loss(
    texture: jnp.ndarray,
    mesh: TexturedMesh,
    cam: Camera,
    target: jnp.ndarray,
    height: int,
    width: int,
    attr_background: float = 0.5,
) -> jnp.ndarray:
    """L2 photometric loss of rendered textured views vs target images.

    This is the differentiable inverse-rendering objective the framework
    trains: the texture sampling chain (interpolate -> texture gather ->
    composite) is differentiable w.r.t. the texture image even though the
    z-buffered rasterization itself is piecewise-constant in geometry."""
    out = render(
        mesh,
        cam,
        height=height,
        width=width,
        render_attr=True,
        render_depth=False,
        render_normal=False,
        texture_override=texture,
        attr_background=attr_background,
    )
    return jnp.mean((out.attr - target) ** 2)


def make_texture_fit_step(
    optimizer: optax.GradientTransformation,
    height: int,
    width: int,
    attr_background: float = 0.5,
):
    """Build a jittable (texture, opt_state, mesh, cam, target) -> update step.

    Under a sharded view axis XLA inserts the cross-chip gradient psum —
    this is the framework's data-parallel "training step"."""

    @jax.jit
    def step(texture, opt_state, mesh, cam, target):
        loss, grads = jax.value_and_grad(texture_fit_loss)(
            texture, mesh, cam, target, height, width, attr_background
        )
        updates, opt_state = optimizer.update(grads, opt_state, texture)
        texture = optax.apply_updates(texture, updates)
        return texture, opt_state, loss

    return step


def texture_fit_step(
    texture: jnp.ndarray,
    opt_state,
    mesh: TexturedMesh,
    cam: Camera,
    target: jnp.ndarray,
    optimizer: optax.GradientTransformation,
    height: int,
    width: int,
):
    """One optimization step (convenience, non-cached jit)."""
    step = make_texture_fit_step(optimizer, height, width)
    return step(texture, opt_state, mesh, cam, target)

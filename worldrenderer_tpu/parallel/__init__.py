"""Multi-chip parallelism: device meshes, sharded render sweeps, collectives.

The reference has no live multi-device path (SURVEY.md §2b) — its parallelism
model is the view/batch axis on one GPU plus vestigial torch.distributed
shims (mvadapter/utils/misc.py:129-145). Here the view axis is a first-class
sharded axis over a `jax.sharding.Mesh`, and dataset-scale sweeps shard over
chips with XLA collectives riding ICI.
"""

from .bake import sharded_camera_projection
from .device_mesh import make_device_mesh, view_sharding, replicated_sharding
from .sweep import render_views_sharded, texture_fit_step, make_texture_fit_step
from .dist import (
    initialize_distributed,
    process_index,
    is_main_process,
    barrier,
    broadcast_from_main,
)

__all__ = [
    "make_device_mesh",
    "sharded_camera_projection",
    "view_sharding",
    "replicated_sharding",
    "render_views_sharded",
    "texture_fit_step",
    "make_texture_fit_step",
    "initialize_distributed",
    "process_index",
    "is_main_process",
    "barrier",
    "broadcast_from_main",
]

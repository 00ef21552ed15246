"""Device-mesh construction and sharding helpers.

TPU-native replacement for the reference's single-GPU device selection
(mvadapter/utils/misc.py:32-33): instead of `cuda:{rank}`, computation is laid
out over a `jax.sharding.Mesh` and XLA inserts the collectives.

Axis convention:
  * ``views`` — the batch-of-views axis (the reference's leading Nv axis,
    e.g. mvadapter/utils/mesh_utils/projection.py:86). Sharding it is the
    TPU analog of the reference's per-view loop parallelism.
  * ``data`` — outer jobs axis for dataset-scale sweeps (many meshes/scenes).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_device_mesh", "view_sharding", "replicated_sharding"]


def make_device_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("views",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a device mesh. Default: 1-D mesh over all local devices with a
    single ``views`` axis. ``shape`` must multiply to the device count."""
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),)
        axis_names = tuple(axis_names)[:1]
    n = int(np.prod(shape))
    if n != len(devices):
        devices = devices[:n]
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))


def view_sharding(mesh: Mesh, axis: str = "views") -> NamedSharding:
    """Sharding that splits the leading (view) axis across ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (for mesh geometry / textures / cameras that
    every chip needs)."""
    return NamedSharding(mesh, P())

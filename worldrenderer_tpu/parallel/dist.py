"""Multi-host process coordination — the TPU-native replacement for the
reference's torch.distributed shims (mvadapter/utils/misc.py:129-145,
mvadapter/utils/core.py:8-29).

rank-zero pattern -> ``jax.process_index() == 0``; barrier -> a tiny psum
across all devices; broadcast -> host-0 value replicated through the same
psum trick (every other process contributes zero).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "initialize_distributed",
    "process_index",
    "is_main_process",
    "barrier",
    "broadcast_from_main",
]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX. No-op in single-process settings (the
    common case under test / single-slice runs).

    Must run before the first backend use. On the CPU backend (tests, local
    multi-process rehearsal) cross-process collectives need the Gloo
    implementation selected before the client is built; this is a no-op for
    TPU backends, which bring their own collectives."""
    if num_processes is None or num_processes <= 1:
        return
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # pragma: no cover - older jaxlib without gloo
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_index() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    """Reference rank-zero gating (core.py:27-29) in JAX terms."""
    return jax.process_index() == 0


def barrier() -> None:
    """Global barrier. Matches the semantics of the reference's guarded
    ``barrier()`` (misc.py:129-136): no-op when only one device participates.
    Multi-process uses a cross-host sync (an allgather over every global
    device); single-process keeps the cheap local psum."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("worldrenderer_tpu_barrier")
        return
    n = jax.local_device_count()
    if n <= 1:
        return
    x = jnp.ones((n,))
    jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x).block_until_ready()


def broadcast_from_main(value: np.ndarray) -> np.ndarray:
    """Broadcast a host value from process 0 to all processes
    (reference misc.py:139-145)."""
    if jax.process_count() <= 1:
        return np.asarray(value)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.broadcast_one_to_all(np.asarray(value)))

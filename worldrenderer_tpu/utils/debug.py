"""Numerics debugging and device-trace profiling helpers.

Reference analogs (SURVEY.md §5.1-5.2): torch anomaly-mode finite checks
(mvadapter/utils/mesh_utils/mesh.py:116-117) -> ``check_finite`` /
``debug_nans``; the TimeRecorder + cuda-synchronize profiling
(misc.py:153-202) gets a device-trace sibling here via ``jax.profiler``.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional

import jax
import jax.numpy as jnp

__all__ = ["check_finite", "debug_nans", "trace", "annotate"]


def check_finite(x, name: str = "tensor"):
    """Raise (under jit: propagate an error value) when x has NaN/Inf.
    Enable globally with ``debug_nans()`` instead for zero overhead."""
    from jax.experimental import checkify

    def _chk(v):
        checkify.check(jnp.all(jnp.isfinite(v)), f"{name} has non-finite values")
        return v

    return jax.tree_util.tree_map(_chk, x)


@contextlib.contextmanager
def debug_nans(enabled: bool = True) -> Iterator[None]:
    """Scope with jax_debug_nans enabled — the TPU analog of
    torch.autograd.set_detect_anomaly."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enabled)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace") -> Iterator[None]:
    """Capture a device profile viewable in TensorBoard/XProf."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span that shows up inside device traces."""
    return jax.profiler.TraceAnnotation(name)

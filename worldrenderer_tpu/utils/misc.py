"""Runtime misc: rank discovery, span profiler, scalar schedules, checkpoint
IO, device memory reporting, dynamic class lookup.

Reference contracts: mvadapter/utils/misc.py (get_rank:21-29, C:85-106,
TimeRecorder:153-212, show_vram_usage:215-220, load_module_weights:36-82)
and mvadapter/utils/core.py:15-21 (find). CUDA synchronize becomes
``jax.block_until_ready``; VRAM queries become the PJRT device memory stats.
"""

from __future__ import annotations

import importlib
import os
import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Any, Dict, Optional, Tuple

import numpy as np

from .logging import get_logger

logger = get_logger(__name__)

__all__ = [
    "get_rank",
    "find",
    "cleanup",
    "C",
    "TimeRecorder",
    "time_recorder",
    "time_recorder_enabled",
    "device_memory_stats",
    "show_device_memory",
    "save_checkpoint",
    "load_checkpoint",
    "load_module_weights",
]


def get_rank() -> int:
    """Env-var rank discovery, SLURM included (reference misc.py:21-29);
    falls through to ``jax.process_index()`` when nothing is set."""
    rank_keys = ("RANK", "LOCAL_RANK", "SLURM_PROCID", "JSM_NAMESPACE_RANK")
    for key in rank_keys:
        rank = os.environ.get(key)
        if rank is not None:
            return int(rank)
    try:
        import jax

        return jax.process_index()
    except Exception:
        return 0


def find(cls_string: str):
    """Dynamic 'pkg.module.Class' import (reference core.py:15-21)."""
    module_string = ".".join(cls_string.split(".")[:-1])
    cls_name = cls_string.split(".")[-1]
    module = importlib.import_module(module_string, package=None)
    return getattr(module, cls_name)


def cleanup() -> None:
    """Free cached compiled programs + host garbage (reference misc.py:109-117
    torch.cuda.empty_cache analog). Device buffers free with their refs."""
    import gc

    gc.collect()
    try:
        import jax

        jax.clear_caches()
    except Exception:
        pass


def C(value: Any, epoch: int, global_step: int) -> float:
    """Scalar schedule: number, or [start_step, start_value, end_value,
    end_step] linear interpolation; float end_step keys on epoch
    (reference misc.py:85-106)."""
    if isinstance(value, (int, float)):
        return value
    if not isinstance(value, (list, tuple)):
        raise TypeError(f"Scalar specification only supports list, got {type(value)}")
    value = list(value)
    if len(value) == 3:
        value = [0] + value
    assert len(value) == 4
    start_step, start_value, end_value, end_step = value
    current = epoch if isinstance(end_step, float) else global_step
    frac = max(min(1.0, (current - start_step) / (end_step - start_step)), 0.0)
    return start_value + (end_value - start_value) * frac


class TimeRecorder:
    """Singleton span profiler with device-sync-accurate timings
    (reference misc.py:153-202). ``jax.block_until_ready`` on given arrays
    (or a trivial device op) replaces torch.cuda.synchronize."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
            cls._instance.items = {}
            cls._instance.accumulations = defaultdict(list)
            cls._instance.time_scale = 1000.0
            cls._instance.time_unit = "ms"
            cls._instance.enabled = False
        return cls._instance

    def enable(self, enabled: bool) -> None:
        self.enabled = enabled

    def _sync(self, block_on=None) -> None:
        if block_on is not None:
            import jax

            jax.block_until_ready(block_on)

    def start(self, name: str, block_on=None) -> None:
        if not self.enabled:
            return
        self._sync(block_on)
        self.items[name] = time.perf_counter()

    def end(self, name: str, accumulate: bool = False, block_on=None) -> Optional[float]:
        if not self.enabled or name not in self.items:
            return None
        self._sync(block_on)
        delta = time.perf_counter() - self.items.pop(name)
        if accumulate:
            self.accumulations[name].append(delta)
        t = delta * self.time_scale
        logger.info(f"{name}: {t:.2f}{self.time_unit}")
        return t

    def get_accumulation(self, name: str, average: bool = False) -> Optional[float]:
        if not self.enabled or name not in self.accumulations:
            return None
        acc = self.accumulations.pop(name)
        total = sum(acc)
        t = (total / len(acc) if average else total) * self.time_scale
        logger.info(f"{name} for {len(acc)} times: {t:.2f}{self.time_unit}")
        return t


time_recorder = TimeRecorder()


@contextmanager
def time_recorder_enabled():
    prev = time_recorder.enabled
    time_recorder.enable(True)
    try:
        yield time_recorder
    finally:
        time_recorder.enable(prev)


def device_memory_stats() -> Dict[str, int]:
    """Per-device memory stats (reference show_vram_usage, misc.py:215-220)."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        stats = {}
    return stats


def show_device_memory(name: str) -> None:
    stats = device_memory_stats()
    used = stats.get("bytes_in_use", 0)
    limit = stats.get("bytes_limit", 0)
    try:
        import psutil

        rss = psutil.Process(os.getpid()).memory_info().rss
    except Exception:
        rss = 0
    logger.info(
        f"{name}: device {used / 1024**2:.1f}MB / {limit / 1024**2:.1f}MB, "
        f"host rss {rss / 1024**2:.1f}MB"
    )


# --------------------------------------------------------------------------
# Checkpointing (reference misc.py:36-82 / saving.py:461-464, orbax/npz based)
# --------------------------------------------------------------------------


def save_checkpoint(path: str, state: dict, epoch: int = 0, global_step: int = 0) -> None:
    """Save a flat pytree-of-arrays state dict + counters as npz."""
    import jax

    flat = {}

    def flatten(prefix, obj):
        if isinstance(obj, dict):
            for k, v in obj.items():
                flatten(f"{prefix}{k}." if False else (prefix + k + "."), v)
        else:
            flat[prefix[:-1]] = np.asarray(obj)

    flatten("", jax.tree_util.tree_map(np.asarray, state))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(
        path,
        __epoch__=np.asarray(epoch),
        __global_step__=np.asarray(global_step),
        **flat,
    )


def load_checkpoint(path: str) -> Tuple[dict, int, int]:
    """Load an npz checkpoint back into a nested dict + counters."""
    data = np.load(path, allow_pickle=False)
    epoch = int(data["__epoch__"])
    global_step = int(data["__global_step__"])
    state: dict = {}
    for k in data.files:
        if k.startswith("__"):
            continue
        cur = state
        parts = k.split(".")
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = data[k]
    return state, epoch, global_step


def load_module_weights(
    path: str,
    module_name: Optional[str] = None,
    ignore_modules=None,
    mapping=None,
) -> Tuple[dict, int, int]:
    """Checkpoint loading with submodule selection / ignore / key remapping
    (reference misc.py:36-82), over flat dotted keys."""
    if module_name is not None and ignore_modules is not None:
        raise ValueError("module_name and ignore_modules cannot be both set")
    state, epoch, global_step = load_checkpoint(path)

    def flatten(d, prefix=""):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out.update(flatten(v, prefix + k + "."))
            else:
                out[prefix + k] = v
        return out

    flat = flatten(state)

    if mapping is not None:
        remapped = {
            k: v
            for k, v in flat.items()
            if not any(k.startswith(m["to"]) for m in mapping)
        }
        for k, v in flat.items():
            for m in mapping:
                if k.startswith(m["from"]):
                    remapped[k.replace(m["from"], m["to"], 1)] = v
        flat = remapped

    if ignore_modules is not None:
        flat = {
            k: v
            for k, v in flat.items()
            if not any(k.startswith(ig + ".") for ig in ignore_modules)
        }

    if module_name is not None:
        prefix = module_name + "."
        flat = {k[len(prefix):]: v for k, v in flat.items() if k.startswith(prefix)}

    return flat, epoch, global_step

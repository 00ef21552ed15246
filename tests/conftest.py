"""Test configuration: force an 8-device virtual CPU mesh so multi-chip
sharding logic is exercised without TPU hardware (SURVEY.md §4c).

Note: the environment may auto-register an external TPU PJRT plugin through
sitecustomize and force ``jax_platforms`` — the explicit config update below
wins it back for deterministic CPU golden tests.
"""

import os

# Must be set before the CPU backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_runtest_teardown(item):
    """Guard against XLA-CPU JIT memory-map exhaustion (found round 4):
    every compiled executable holds ~code+guard mappings that mostly
    outlive the executable, and a single-process full-suite run
    deterministically SEGFAULTS inside backend_compile once the process
    crosses vm.max_map_count (65530) — observed at the 171st test
    regardless of which test sat there. Clearing jax's caches releases
    roughly half the mappings; do it whenever the process nears the
    wall. For full-lane runs prefer ``pytest -n 4`` (xdist): worker
    processes bound the per-process map count by construction (and run
    ~3x faster).
    """
    try:
        n_maps = sum(1 for _ in open("/proc/self/maps"))
    except OSError:
        return
    if n_maps > 30000:
        import jax

        jax.clear_caches()

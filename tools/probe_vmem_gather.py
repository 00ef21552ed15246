"""On-chip probe: cost of Mosaic's in-kernel dynamic gathers
(``tpu.dynamic_gather`` via ``jnp.take_along_axis`` on 2-D VMEM arrays)
vs the XLA HBM row gather that dominates config4 (CLAUDE.md: texture
gather ~51% of the 1024^2 frame; all XLA-level lowerings measured
neutral-or-worse in tools/ab_gather_mode.py).

Three measurements, each a Pallas kernel running T reps of the op under
a fori_loop with iteration-dependent indices (defeats hoisting):

  sublane: y = take_along_axis(x (R,128), idx (R,128), axis=0)
           — cross-sublane gather per lane; the candidate primitive for
             a windowed texture sampler (R window rows -> R pixels/op).
  lane:    axis=1 — in-row lane shuffle.
  xla:     baseline jnp row gather of P random rows from the flat
             (N, 12) quad table (the current texture path's shape).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_vmem_gather.py
"""

from __future__ import annotations

import time

import numpy as np

R = 2048  # rows per gather op (window rows == gathered elements per op)
T = 400   # in-kernel reps


def probe_pallas(axis: int):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(x_ref, idx_ref, out_ref):
        x = x_ref[...]
        idx0 = idx_ref[...]

        def body(i, acc):
            idx = jnp.remainder(idx0 + i, R if axis == 0 else 128)
            y = jnp.take_along_axis(x, idx, axis=axis)
            return acc + y

        acc = jax.lax.fori_loop(0, T, body, jnp.zeros_like(x))
        out_ref[...] = acc

    @jax.jit
    def run(x, idx):
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        )(x, idx)
        return jnp.sum(out)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((R, 128)), jnp.float32)
    idx = jnp.asarray(
        rng.integers(0, R if axis == 0 else 128, (R, 128)), jnp.int32
    )
    t0 = time.perf_counter()
    float(run(x, idx))
    print(f"axis={axis}: compiled+first {time.perf_counter()-t0:.1f}s",
          flush=True)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(x, idx))
        times.append(time.perf_counter() - t0)
    dt = np.median(times)
    per_op = dt / T
    per_elem = per_op / (R * 128)
    print(
        f"axis={axis}: {per_op*1e6:8.2f} us/op ({R}x128), "
        f"{per_elem*1e9:6.3f} ns/elem, {per_op/R*1e9:7.2f} ns/gathered-row-of-128",
        flush=True,
    )
    return per_op


def probe_xla_rowgather(n_rows=1024 * 1024, width=12, p=8192):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.random((n_rows, width)), jnp.float32)
    idx0 = jnp.asarray(rng.integers(0, n_rows, (p,)), jnp.int32)

    @jax.jit
    def run(table, idx0):
        def body(i, acc):
            idx = jnp.remainder(idx0 + i, n_rows)
            return acc + jnp.sum(table[idx])

        return jax.lax.fori_loop(0, 50, body, jnp.float32(0))

    t0 = time.perf_counter()
    float(run(table, idx0))
    print(f"xla: compiled+first {time.perf_counter()-t0:.1f}s", flush=True)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(run(table, idx0))
        times.append(time.perf_counter() - t0)
    per_op = np.median(times) / 50
    print(
        f"xla rowgather: {per_op*1e6:8.2f} us for {p} rows of {width} "
        f"-> {per_op/p*1e9:6.2f} ns/row",
        flush=True,
    )


def main():
    for axis in (1, 0):
        try:
            probe_pallas(axis=axis)
        except Exception as e:  # noqa: BLE001 - report and move on
            msg = str(e).splitlines()[0][:160]
            print(f"axis={axis}: FAILED ({msg})", flush=True)
    probe_xla_rowgather()


if __name__ == "__main__":
    main()

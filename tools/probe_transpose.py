"""Probe big (R, N) -> (N, R) transposes on-chip.

The raw-1M trace (2026-08, tools/trace_stress1m.py) showed ~24% of the
frame inside XLA's loop-materialized transposes: the flat record tables
are built coef-major (R, T+1) and the deferred row gathers need
(V*(T+1), R) row-major, and XLA lowers that transpose+reshape to paired
'wide.body' while loops pushing 576 MB at ~18 GB/s (dynamic-update-slice
.876-.883 + dynamic-slice_reduce fusions, ~10 ms/view).

Variants (each loops REPS times on-device under one dispatch, input
perturbed per iteration so nothing hoists; an on-device checksum forces
execution — block_until_ready lies on the tunneled backend):
  xla3d    y = x3.transpose(0, 2, 1).reshape(V*N, R)   (the exact shape)
  dot      y = dot(x3, I_R, contract R) on the MXU (HIGHEST precision)
  stack    y = jnp.stack([x3[:, i] for i in range(R)], axis=-1)
  pallas   tiled Pallas kernel: (R, B) blocks in, in-kernel dot-transpose
           against an identity, (B, R) blocks out

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_transpose.py
"""

from __future__ import annotations

import functools
import time

import numpy as np

REPS = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    V, N, R = 6, 999_699, 24
    key = np.random.default_rng(0)
    x3_h = key.standard_normal((V, R, N)).astype(np.float32)

    def checksum(y):
        # Touch both ends + a stride so layout games can't cheat.
        return jnp.sum(y[::797]) + jnp.sum(y[-3:]) + y[123, 7]

    def timed(body):
        def run(x3):
            def step(i, acc):
                x = x3 + jnp.float32(i) * 1e-12  # defeat hoisting/CSE
                return acc + body(x)

            return jax.lax.fori_loop(0, REPS, step, jnp.float32(0.0))

        return jax.jit(run)

    def b_xla3d(x3):
        return checksum(x3.transpose(0, 2, 1).reshape(V * N, R))

    eye = np.eye(R, dtype=np.float32)

    def b_dot(x3):
        y = jax.lax.dot_general(
            x3, jnp.asarray(eye),
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # (V, N, R)
        return checksum(y.reshape(V * N, R))

    def b_stack(x3):
        y = jnp.stack([x3[:, i, :] for i in range(R)], axis=-1)
        return checksum(y.reshape(V * N, R))

    B = 2048
    npad = -(-N // B) * B

    def _tr_kernel(x_ref, o_ref, *, r):
        blk = x_ref[0]  # (R, B)
        i0 = jax.lax.broadcasted_iota(jnp.int32, (r, r), 0)
        i1 = jax.lax.broadcasted_iota(jnp.int32, (r, r), 1)
        ident = (i0 == i1).astype(jnp.float32)
        o_ref[0] = jax.lax.dot_general(
            blk, ident,
            dimension_numbers=(((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # (B, R)

    nb = npad // B

    def b_pallas(x3):
        xp = jnp.pad(x3, ((0, 0), (0, 0), (0, npad - N)))
        y = pl.pallas_call(
            functools.partial(_tr_kernel, r=R),
            grid=(V, nb),
            in_specs=[
                pl.BlockSpec(
                    (1, R, B), lambda v, i: (v, 0, i),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, B, R), lambda v, i: (v * nb + i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((V * nb, B, R), jnp.float32),
        )(xp)
        y = y.reshape(V, npad, R)[:, :N].reshape(V * N, R)
        return checksum(y)

    bodies = {
        "xla3d": b_xla3d,
        "dot": b_dot,
        "stack": b_stack,
        "pallas": b_pallas,
    }
    fns = {}
    x3 = jnp.asarray(x3_h)

    ref = None
    for name, body in bodies.items():
        try:
            f = timed(body)
            v = float(f(x3)) / REPS
        except Exception as e:
            print(f"{name:8s} FAILED: {type(e).__name__}: {e}")
            continue
        if ref is None:
            ref = v
        print(f"{name:8s} checksum {v:.6f} (ref delta {v - ref:.3e})",
              flush=True)
        fns[name] = f

    gb = V * N * R * 4 * 2 / 1e9
    for rnd in range(3):
        for name, f in fns.items():
            t0 = time.perf_counter()
            float(f(x3))
            dt = (time.perf_counter() - t0) / REPS
            print(
                f"round {rnd} {name:8s} {dt * 1e3:8.2f} ms/transpose "
                f"({gb / dt:6.1f} GB/s rw)", flush=True,
            )


if __name__ == "__main__":
    main()

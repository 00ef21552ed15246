"""Probe the big-table record-gather strategies behind the raw-1M frame's
fusion.13/.14 (gbuffer.py:499 / :252): the on-chip trace shows 40.7 / 29.8
ns/row — ~8x over the 4-6 ns/row floor the c4 texture gathers hit. The HLO
shows the (V, T+1, C) batched tables get a PLANAR layout {1,2,0} (each row
read = C transactions, 4MB apart). Variants:

  a. batched3d   — vmapped t[ids] over views (what vmap produces today)
  b. flat2d      — ONE 2D (V*(T+1), C) table + global ids
  c. flat2d_12x2 — two 12-col flat gathers over the same ids
  d. flat2d_cols — flat2d at 12 cols (fusion.14's shape)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_bigtable_gather.py
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    v, t1 = 6, 999_699
    rows = 278_400
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(v, t1, 24)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, t1, size=(v, rows)).astype(np.int32))
    n_iter = 20

    def timed(name, fn, *args):
        f = jax.jit(fn)
        float(f(*args))  # compile + warm
        t0 = time.perf_counter()
        s = float(f(*args))
        dt = time.perf_counter() - t0
        per_row = dt / (n_iter * v * rows) * 1e9
        print(f"{name:14s} {dt*1e3:8.2f} ms  {per_row:7.2f} ns/row  (chk {s:.3e})",
              flush=True)
        return per_row

    def scan_sum(body):
        def fn(table, ids):
            def step(acc, k):
                idk = (ids + k) % t1
                return acc + body(table, idk), None
            acc, _ = jax.lax.scan(
                step, jnp.float32(0), jnp.arange(n_iter, dtype=jnp.int32)
            )
            return acc
        return fn

    # a. batched 3D (vmap semantics)
    timed("batched3d_24", scan_sum(
        lambda tb, idk: jnp.sum(jax.vmap(lambda tv, iv: tv[iv])(tb, idk))
    ), table, ids)

    # b. flat 2D, global ids
    flat = table.reshape(v * t1, 24)
    off = (jnp.arange(v, dtype=jnp.int32) * t1)[:, None]

    timed("flat2d_24", scan_sum(
        lambda tb, idk: jnp.sum(tb[(idk + off).reshape(-1)])
    ), flat, ids)

    # c. two 12-col flat gathers
    f12a = flat[:, :12].copy()
    f12b = flat[:, 12:].copy()

    def two12(tb, idk):
        g = (idk + off).reshape(-1)
        return jnp.sum(tb[0][g]) + jnp.sum(tb[1][g])

    timed("flat2d_12x2", scan_sum(two12), (f12a, f12b), ids)

    # d. flat 2D at 12 cols (fusion.14 shape analog)
    timed("flat2d_12", scan_sum(
        lambda tb, idk: jnp.sum(tb[(idk + off).reshape(-1)])
    ), f12a, ids)

    # e. batched 3D at 12 cols (fusion.14 today)
    timed("batched3d_12", scan_sum(
        lambda tb, idk: jnp.sum(jax.vmap(lambda tv, iv: tv[iv])(tb, idk))
    ), table[:, :, :12].copy(), ids)


if __name__ == "__main__":
    main()

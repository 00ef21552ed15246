"""On-chip probe: per-row cost of the texture row gather vs a per-tile
WINDOWED formulation (pure XLA, no Mosaic).

The u8-packed A/B showed the gather cost is mostly a per-row floor
(12 f32 -> 3 u32 columns only bought 1.14x end-to-end), so the next
lever is the emitter regime: gather each screen tile's rows from a
small per-tile WINDOW (dynamic-sliced out of the big table at an
aligned per-tile origin) instead of from the full R~1M-row table.

Modes (all produce identical outputs; asserted):
  flat     — one gather of (P,) rows from the (R, C) table (current path).
  window   — windows (T, W, C) built by vmapped aligned dynamic_slice,
             then a batched per-tile gather with local indices.
  window_nomat — same gather but windows prebuilt outside the timed fn
             (isolates gather cost from window materialization).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_windowed_gather.py
       [--rows 1048576] [--cols 3] [--pix 1048576] [--tile 1024] [--win 4096]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1048576)
    ap.add_argument("--cols", type=int, default=3)
    ap.add_argument("--pix", type=int, default=1048576)
    ap.add_argument("--tile", type=int, default=1024)
    ap.add_argument("--win", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    r, c, p = args.rows, args.cols, args.pix
    tile, win = args.tile, args.win
    n_tiles = p // tile
    rng = np.random.default_rng(0)

    table = jnp.asarray(
        rng.integers(0, 2**31, size=(r, c), dtype=np.int64), jnp.uint32
    )
    # Coherent indices: tile t's pixels live in a contiguous-ish region
    # around t * (r / n_tiles), plus ±win/8 jitter — mimics screen-tile UV
    # locality. Window origin = aligned region start; all local indices
    # fit [0, win) by construction.
    base = (np.arange(n_tiles) * ((r - win) // max(n_tiles - 1, 1))).astype(
        np.int64
    )
    base = (base // 128) * 128
    local = rng.integers(0, win, size=(n_tiles, tile), dtype=np.int64)
    # add coherence: sort half of each tile's indices
    local[:, : tile // 2] = np.sort(local[:, : tile // 2], axis=1)
    flat_idx = jnp.asarray(base[:, None] + local, jnp.int32)  # (T, tile)
    local_idx = jnp.asarray(local, jnp.int32)
    offs = jnp.asarray(base, jnp.int32)

    @jax.jit
    def run_flat(table, offs, local_idx):
        def body(i, acc):
            idx = offs[:, None] + (local_idx + i) % win
            rows = table[idx.reshape(-1)]
            return acc + jnp.sum(rows, dtype=jnp.uint32)

        return jax.lax.fori_loop(0, 4, body, jnp.uint32(0))

    def windows_of(table, offs):
        return jax.vmap(
            lambda o: jax.lax.dynamic_slice(table, (o, 0), (win, c))
        )(offs)

    @jax.jit
    def run_window(table, offs, local_idx):
        def body(i, acc):
            wins = windows_of(table, offs)  # (T, win, C)
            rows = jnp.take_along_axis(
                wins, ((local_idx + i) % win)[..., None], axis=1
            )
            return acc + jnp.sum(rows, dtype=jnp.uint32)

        return jax.lax.fori_loop(0, 4, body, jnp.uint32(0))

    @jax.jit
    def run_window_nomat(wins, local_idx):
        def body(i, acc):
            rows = jnp.take_along_axis(
                wins, ((local_idx + i) % win)[..., None], axis=1
            )
            return acc + jnp.sum(rows, dtype=jnp.uint32)

        return jax.lax.fori_loop(0, 4, body, jnp.uint32(0))

    wins_pre = jax.jit(windows_of)(table, offs)
    wins_pre.block_until_ready()

    runs = {
        "flat": lambda: run_flat(table, offs, local_idx),
        "window": lambda: run_window(table, offs, local_idx),
        "window_nomat": lambda: run_window_nomat(wins_pre, local_idx),
    }
    checks = {}
    for name, fn in runs.items():
        t0 = time.perf_counter()
        checks[name] = int(fn())
        print(f"{name}: compiled+first {time.perf_counter()-t0:.1f}s",
              flush=True)
    assert checks["flat"] == checks["window"] == checks["window_nomat"], checks

    for name, fn in runs.items():
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(args.reps):
                int(fn())
            times.append((time.perf_counter() - t0) / args.reps)
        per_iter = np.median(times) / 4  # fori_loop trip count
        print(
            f"{name:13s}: {per_iter*1e3:8.3f} ms per {p} rows "
            f"-> {per_iter/p*1e9:6.2f} ns/row",
            flush=True,
        )


if __name__ == "__main__":
    main()

"""Probe: is the flat-chunk record gather's 24-col row width past the
gather fusion-root layout cliff (docs/PERF.md: between 16 and 28 columns
the per-row write cost jumped ~6x on the uv2048 projection trace)?

Times, at the EXACT stress1m shapes (table 6*(1M+1) rows, 1.18M gathered
rows), one 24-col gather vs two 12-col gathers vs 16+8 over the same
indices — scan-wrapped, checksum-forced, interleaved.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_split24.py
"""

from __future__ import annotations

import time

import numpy as np

ROWS = 6 * (999_698 + 1)
N_IDX = 1_178_880
COLS = 24
R_INNER = 8
PAIRS = 4


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.standard_normal((ROWS, COLS)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, ROWS, N_IDX), jnp.int32)

    def make(splits):
        @jax.jit
        def run(table, idx, seed):
            def body(acc, i):
                j = (idx + i.astype(jnp.int32)) % ROWS
                s = jnp.float32(0)
                lo = 0
                for w in splits:
                    part = table[:, lo:lo + w][j]
                    s = s + jnp.sum(part[:, 0]) + jnp.sum(part[:, -1])
                    lo += w
                return acc + s, None

            acc, _ = jax.lax.scan(
                body, jnp.float32(0), jnp.arange(R_INNER) + seed
            )
            return acc

        return run

    variants = {
        "one24": make([24]),
        "split12": make([12, 12]),
        "split16_8": make([16, 8]),
    }
    for name, run in variants.items():
        v = float(run(table, idx, jnp.float32(0)))
        assert np.isfinite(v)

    results = {n: [] for n in variants}
    for p in range(PAIRS):
        for name, run in variants.items():
            t0 = time.perf_counter()
            float(run(table, idx, jnp.float32(p + 1)))
            dt = time.perf_counter() - t0
            ns_row = dt / R_INNER / N_IDX * 1e9
            results[name].append(ns_row)
        print(
            f"pair {p}: "
            + "  ".join(f"{n} {results[n][-1]:.1f}ns/row" for n in results)
        )
    for n, v in results.items():
        v = sorted(v)
        print(f"{n}: median {v[len(v)//2]:.1f} ns/row  (all {['%.1f'%x for x in v]})")


if __name__ == "__main__":
    main()

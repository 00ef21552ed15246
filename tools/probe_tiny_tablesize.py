"""Probe: does shrinking the tiny record-gather TABLE (6*(T+1) rows ->
6*cap rows) cut its per-row cost? (The gather emitter's per-row cost
rises with table size — PERF.md / trace_config2; the tiny path's winner
gather reads 13 cols from a 6M-row table at a traced 27 ns/row.)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_tiny_tablesize.py
"""
from __future__ import annotations
import time
import numpy as np

N_IDX = 6 * 262_144   # hw rows x 6 views (the winner-image gather)
COLS = 13
BIG = 6 * (999_698 + 1)
SMALL = 6 * 196_608
R_INNER = 8
PAIRS = 4

def main():
    import jax, jax.numpy as jnp
    rng = np.random.default_rng(0)
    tb = jnp.asarray(rng.standard_normal((BIG, COLS)), jnp.float32)
    ts = jnp.asarray(rng.standard_normal((SMALL, COLS)), jnp.float32)
    idx_b = jnp.asarray(rng.integers(0, BIG, N_IDX), jnp.int32)
    idx_s = jnp.asarray(rng.integers(0, SMALL, N_IDX), jnp.int32)

    def make(rows):
        @jax.jit
        def run(table, idx, seed):
            def body(acc, i):
                j = (idx + i.astype(jnp.int32)) % rows
                part = table[j]
                return acc + jnp.sum(part[:, 0]) + jnp.sum(part[:, -1]), None
            acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(R_INNER) + seed)
            return acc
        return run

    variants = {"big6M": (make(BIG), tb, idx_b), "small1.2M": (make(SMALL), ts, idx_s)}
    for name, (run, t, i) in variants.items():
        assert np.isfinite(float(run(t, i, jnp.float32(0))))
    results = {n: [] for n in variants}
    for p in range(PAIRS):
        for name, (run, t, i) in variants.items():
            t0 = time.perf_counter()
            float(run(t, i, jnp.float32(p + 1)))
            results[name].append((time.perf_counter() - t0) / R_INNER / N_IDX * 1e9)
        print(f"pair {p}: " + "  ".join(f"{n} {results[n][-1]:.1f}ns/row" for n in results))
    for n, v in results.items():
        v = sorted(v)
        print(f"{n}: median {v[len(v)//2]:.1f} ns/row")

if __name__ == "__main__":
    main()

"""Pre-compile the big bench programs into the persistent compile cache.

The flagship 4096^2 bake compiles >15 min COLD on the remote TPU compiler
(two driver-visible 580/900 s timeouts in round-3 session 4); its 7.78 s
e2e figure rides a warm cache. Run this ONCE on a fresh machine (outside
any timed window) and every later `bench.py bake4k` / driver run hits the
cache (~10 s recompiles). Each target is just the corresponding bench
program executed once with no deadline — the compile cache key is the
exact program, so the only way to warm it is to build the real shapes.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/warm_cache.py \
        [bake4k] [headline] [secondary] [projection] [config1..5] [all]

Default target set: bake4k headline secondary (the driver-visible
programs). `all` = every bench subcommand.
"""

from __future__ import annotations

import os
import sys
import time


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    targets = sys.argv[1:] or ["bake4k", "headline", "secondary"]
    fns = {
        "headline": bench.bench_headline,
        "secondary": bench.bench_secondary,  # no deadline -> never skips
        "config1": bench.bench_config1,
        "config2": bench.bench_config2,
        "config3": bench.bench_config3,
        "config4": bench.bench_config4,
        "config5": bench.bench_config5,
        "town": bench.bench_town,
        "stress1m": bench.bench_stress1m,
        "stress1m_closed": bench._stress1m_closed_metric,
        "projection": bench.bench_projection,
        "projection_full": bench.bench_projection_full,
        "bake4k": bench.bench_bake4k,
    }
    if targets == ["all"]:
        targets = list(fns)
    unknown = [t for t in targets if t not in fns]
    if unknown:
        raise SystemExit(f"unknown targets {unknown}; choose from {list(fns)}")

    # The headline warm run must not recurse into the secondaries (they
    # are their own target here) and must never deadline-skip.
    os.environ.setdefault("WR_BENCH_SECONDARY", "0")

    for t in targets:
        t0 = time.time()
        print(f"[warm_cache] {t}: compiling + one execution ...", flush=True)
        fns[t]()
        print(f"[warm_cache] {t}: done in {time.time() - t0:.1f} s", flush=True)


if __name__ == "__main__":
    main()

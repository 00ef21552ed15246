"""Scripted on-chip precision check (run on the real TPU).

Thin CLI over :func:`worldrenderer_tpu.utils.validate.precision_gate` —
the same gate bench.py stamps into the driver-captured JSON line every
round. See that module for the methodology (split_bf16 fast path vs the
exact-fp32 vpu_pallas backend; p99.9 bounds + budgeted winner flips).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/check_precision.py
Prints one PASS/FAIL line per scene and exits nonzero on failure.
"""

from __future__ import annotations

import sys


def main():
    from worldrenderer_tpu.utils.validate import precision_gate

    out = precision_gate()
    if not out["ok"]:
        sys.exit(1)
    print("precision check: ALL PASS")


if __name__ == "__main__":
    main()

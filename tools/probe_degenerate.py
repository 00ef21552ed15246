"""On-chip degenerate-camera probes (run per round after kernel or binning
changes): elevation-90 (degenerate up vector), fully off-screen mesh, and
camera inside a sphere (near-plane crossings everywhere; clipless path +
auto budgets must give full interior coverage).

Thin CLI over :func:`worldrenderer_tpu.utils.validate.degenerate_probes` —
the same probes bench.py stamps into the driver-captured JSON line.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_degenerate.py
Last run (v5e): elev90 cov 0.515, offscreen cov 0.0, inside-sphere cov 1.0.
"""

from __future__ import annotations

import sys


def main():
    from worldrenderer_tpu.utils.validate import degenerate_probes

    out = degenerate_probes()
    if not out["ok"]:
        sys.exit(1)
    print("ALL PROBES OK")


if __name__ == "__main__":
    main()

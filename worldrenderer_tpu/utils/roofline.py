"""Roofline / MFU accounting for the fused rasterizer kernel (VERDICT r4
item 3: convert the PERF.md §8 MXU-pass ledger + device-trace timings into
achieved-vs-peak utilization figures, so "stop tuning the kernel" is a
defensible roofline statement and every BENCH record carries a
``kernel_mfu``).

Three numbers, from least to most charitable (derivation in PERF.md §10):

* ``mfu_useful`` — algorithmically useful FLOPs / time / hardware peak.
  Useful = what the rasterization formulation itself needs: 4 affine
  plane evaluations (3 edges + z) per live (entry, pixel) pair at 4 FLOP
  each (2 mul + 2 add). This is the honest hardware-MFU number and it is
  intrinsically small: plane eval is a depth-3 contraction on a 128-deep
  systolic array.
* ``mxu_occupancy`` — MXU-pass-model FLOPs / time / hardware peak. The
  pass model (PERF.md §8 ledger) charges every issued 128x128 output
  tile a full 128-deep pass (the MXU pads sub-128 contractions): 64
  coverage + 16 select tiles per chunk trip at c=128, P=2048. This
  measures how well Mosaic keeps the MXU busy GIVEN the formulation.
* ``floor_ratio`` — measured kernel time / pass-model light-speed time.
  1.0 = the kernel runs exactly at its formulation floor.

Hardware peaks are the public TPU v5e figures (197 TFLOP/s bf16 dense,
819 GB/s HBM).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import tempfile

import numpy as np

__all__ = [
    "V5E_PEAK_BF16_FLOPS",
    "V5E_HBM_BYTES_PER_S",
    "exclusive_times",
    "kernel_counts",
    "kernel_flops",
    "measure_kernel_mfu",
]

V5E_PEAK_BF16_FLOPS = 197e12  # public v5e spec, dense bf16
V5E_HBM_BYTES_PER_S = 819e9  # public v5e spec

_FLOPS_PER_PASS = 2 * 128**3  # one padded 128-deep MXU output tile
# Useful FLOPs per live (entry, pixel): 4 planes x (2 mul + 2 add).
_USEFUL_FLOPS_PER_ENTRY_PIXEL = 16


def _passes_per_chunk(chunk, pixels_per_tile):
    """MXU 128x128 output tiles issued per kernel chunk trip (PERF.md §8
    "updated light-speed ledger"): coverage dot (4c, P) -> ceil(4c/128) *
    ceil(P/128) tiles (A is (4c, 8) hi/lo-merged plane rows, B (8, P)),
    select dot (s<=128 stacked hi/lo rows, P) -> 1 * ceil(P/128) tiles.
    = 80 at the default c=128, P=2048."""
    col_tiles = -(-pixels_per_tile // 128)
    cov_row_tiles = -(-4 * chunk // 128)
    return (cov_row_tiles + 1) * col_tiles


def exclusive_times(trace_path):
    """Per-op exclusive device time from a tensorboard trace.json.gz:
    {op_name: seconds} summed over device-track events, each event's
    exclusive time = duration minus direct children (stack sweep per
    (pid, tid) lane)."""
    with gzip.open(trace_path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "/device:" in name.lower() or "Device" in name
    }
    lanes = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        lanes[(e.get("pid"), e.get("tid"))].append(e)

    excl = collections.Counter()
    for lane in lanes.values():
        lane.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []
        for e in lane:
            ts, dur = e["ts"], e["dur"]
            e["_children"] = 0.0
            while stack and stack[-1][0] <= ts:
                _, node = stack.pop()
                excl[node.get("name", "?")] += (
                    node["dur"] - node["_children"]
                ) / 1e6
            if stack:
                stack[-1][1]["_children"] += dur
            stack.append((ts + dur, e))
        while stack:
            _, node = stack.pop()
            excl[node.get("name", "?")] += (
                node["dur"] - node["_children"]
            ) / 1e6
    return excl


def kernel_counts(pos_clip, tri, resolution, config):
    """Exact per-frame kernel work counts for a batch of views: live
    (tile, tri) entries and kernel chunk trips, from the same _bin_flat
    the render performs (host-cheap; no rasterization)."""
    from ..ops.rasterize import _CULL_MARGIN, _bin_flat, _triangle_setup

    height, width = resolution
    entries = trips = 0
    for v in range(pos_clip.shape[0]):
        setup = _triangle_setup(
            pos_clip[v], tri, width, height, config.backface_cull
        )
        flat = _bin_flat(
            setup, width, height, config.tile_h, config.tile_w,
            config.bin_span_tiles_y, config.bin_span_tiles_x,
            config.bin_huge, config.bin_flat_cap_factor,
            n_med=config.bin_med, med_span_y=config.bin_med_span_y,
            med_span_x=config.bin_med_span_x, tiny_px=config.bin_tiny_px,
            cap_abs=config.bin_flat_cap_abs, small_cap=config.bin_small_cap,
            cull_margin=_CULL_MARGIN if config.bin_cull else 0.0,
        )
        counts = np.asarray(flat[3])
        entries += int(counts.sum())
        trips += int(np.ceil(counts / config.chunk).sum())
    return {
        "live_entries": entries,
        "chunk_trips": trips,
        "pixels_per_tile": config.tile_h * config.tile_w,
        "chunk": config.chunk,
    }


def kernel_flops(counts):
    """(useful_flops, pass_model_flops) per frame from kernel_counts."""
    useful = (
        counts["live_entries"] * counts["pixels_per_tile"]
        * _USEFUL_FLOPS_PER_ENTRY_PIXEL
    )
    issued = (
        counts["chunk_trips"]
        * _passes_per_chunk(counts["chunk"], counts["pixels_per_tile"])
        * _FLOPS_PER_PASS
    )
    return useful, issued


def measure_kernel_mfu(
    frame_fn, counts, n_frames=8, logdir=None,
    kernel_substrings=("gbuffer_tiles", "zattr_tiles"),
):
    """Trace ``float(frame_fn(i))`` for ``n_frames`` iterations, pull the
    Pallas kernel's exclusive device time, and convert the kernel_counts
    work model into achieved-vs-peak figures. ``frame_fn`` must be a
    compiled one-frame closure returning an on-device scalar (checksum-
    forced, like every timing in this repo). Returns a dict or None when
    no kernel op shows in the trace (e.g. CPU backend)."""
    import jax

    if logdir is None:
        # Fresh dir per run: a reused path would glob a PREVIOUS run's
        # trace if this one fails to be written, silently reporting
        # stale kernel timings into the driver record.
        logdir = tempfile.mkdtemp(prefix="wr_mfu_trace_")
    float(frame_fn(0))  # ensure compiled before the traced window
    with jax.profiler.trace(logdir):
        for i in range(n_frames):
            float(frame_fn(i + 1))
    paths = sorted(glob.glob(logdir + "/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return None
    ex = exclusive_times(paths[-1])
    kernel_s = sum(
        s for name, s in ex.items()
        if any(k in name for k in kernel_substrings)
    )
    if kernel_s <= 0:
        return None
    kernel_s_per_frame = kernel_s / n_frames
    useful, issued = kernel_flops(counts)
    floor_s = issued / V5E_PEAK_BF16_FLOPS
    return {
        "kernel_ms_per_frame": kernel_s_per_frame * 1e3,
        "useful_gflop_per_frame": useful / 1e9,
        "pass_model_gflop_per_frame": issued / 1e9,
        "mfu_useful": useful / kernel_s_per_frame / V5E_PEAK_BF16_FLOPS,
        "mxu_occupancy": issued / kernel_s_per_frame / V5E_PEAK_BF16_FLOPS,
        "floor_ratio": kernel_s_per_frame / floor_s,
        "trace": paths[-1],
    }

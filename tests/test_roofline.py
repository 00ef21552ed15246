"""utils/roofline.py: the trace parser's exclusive-time attribution and
the kernel work/FLOP model that back the bench's kernel_mfu fields
(VERDICT r4 item 3)."""

import gzip
import json

import jax.numpy as jnp
import numpy as np

from worldrenderer_tpu.utils.roofline import (
    _FLOPS_PER_PASS,
    _passes_per_chunk,
    exclusive_times,
    kernel_counts,
    kernel_flops,
)


def test_exclusive_times_stack_sweep(tmp_path):
    """Nested device events: the parent's exclusive time excludes the
    child; events still open at lane end are drained, not dropped."""
    events = [
        {"ph": "M", "name": "process_name", "pid": 1,
         "args": {"name": "/device:TPU:0"}},
        # parent 0..100us with child 10..40us, plus a sibling 50..60us
        {"ph": "X", "pid": 1, "tid": 1, "name": "parent", "ts": 0,
         "dur": 100},
        {"ph": "X", "pid": 1, "tid": 1, "name": "child", "ts": 10, "dur": 30},
        {"ph": "X", "pid": 1, "tid": 1, "name": "child2", "ts": 50,
         "dur": 10},
        # host-side event on another pid: must be ignored
        {"ph": "M", "name": "process_name", "pid": 2,
         "args": {"name": "python host"}},
        {"ph": "X", "pid": 2, "tid": 1, "name": "host_op", "ts": 0,
         "dur": 500},
    ]
    p = tmp_path / "t.trace.json.gz"
    with gzip.open(p, "wt") as f:
        json.dump({"traceEvents": events}, f)
    ex = exclusive_times(str(p))
    np.testing.assert_allclose(ex["parent"], 60e-6, rtol=1e-9)
    np.testing.assert_allclose(ex["child"], 30e-6, rtol=1e-9)
    np.testing.assert_allclose(ex["child2"], 10e-6, rtol=1e-9)
    assert "host_op" not in ex


def test_kernel_counts_and_flops():
    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh
    from worldrenderer_tpu.ops.rasterize import auto_fast_config
    from worldrenderer_tpu.transforms import get_clip_space_position

    verts, faces = make_grid_mesh(
        48, extent=1.0,
        height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y),
    )
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    )
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0, num_views=2,
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    cfg = auto_fast_config(pos_clip, mesh.t_pos_idx, (128, 128))
    counts = kernel_counts(pos_clip, mesh.t_pos_idx, (128, 128), cfg)
    assert counts["pixels_per_tile"] == cfg.tile_h * cfg.tile_w
    assert counts["live_entries"] > 0
    # Every chunk trip serves at most `chunk` entries, at least one.
    assert counts["chunk_trips"] <= counts["live_entries"]
    assert counts["chunk_trips"] * cfg.chunk >= counts["live_entries"]

    useful, issued = kernel_flops(counts)
    assert useful == counts["live_entries"] * counts["pixels_per_tile"] * 16
    passes = _passes_per_chunk(cfg.chunk, counts["pixels_per_tile"])
    assert issued == counts["chunk_trips"] * passes * _FLOPS_PER_PASS
    # The §8 ledger figure at the default shape.
    assert _passes_per_chunk(128, 2048) == 80
    # The pass model always dominates the useful count (padding).
    assert issued > useful

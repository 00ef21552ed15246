"""Dump optimized HLO for the raw-1M tinysort frame (CPU-compiled is fine
for identifying fusion contents; op names match the on-chip trace only when
compiled for TPU, so compile for the axon device).

Usage: PYTHONPATH=/root/repo:/root/repo/tools:/root/.axon_site \
       python tools/dump_hlo_stress1m.py [cpu]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax

    if "cpu" in sys.argv[1:]:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import bench as _bench
    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh, with_normals
    from worldrenderer_tpu.ops.rasterize import auto_fast_config
    from worldrenderer_tpu.render import render
    from worldrenderer_tpu.transforms import get_clip_space_position

    n = 708
    verts, faces = make_grid_mesh(
        n, extent=1.0,
        height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y),
    )
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    )
    mesh = with_normals(mesh)
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0, num_views=6,
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    cfg = auto_fast_config(
        pos_clip, mesh.t_pos_idx, (512, 512),
        base=_bench._fast_cfg()._replace(bin_tiny_px=1.0),
    )

    def frame(mesh, cam, seed):
        out = render(
            mesh, cam._replace(mvp_mtx=cam.mvp_mtx + seed * 1e-6),
            512, 512, render_attr=False, render_depth=False,
            render_normal=True, raster_config=cfg,
        )
        return jnp.sum(out.mask) + jnp.sum(jnp.abs(out.normal))

    t0 = time.perf_counter()
    txt = (
        jax.jit(frame)
        .lower(mesh, cam, jnp.float32(0))
        .compile()
        .as_text()
    )
    print(f"compiled in {time.perf_counter()-t0:.1f}s, {len(txt)} chars")
    out = "/tmp/hlo_s1m.txt"
    with open(out, "w") as f:
        f.write(txt)
    print("wrote", out)


if __name__ == "__main__":
    main()

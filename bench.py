"""Headline benchmark: views/sec/chip for 6-view 512x512 position+normal
G-buffers of a ~10k-triangle mesh (BASELINE.md north-star: >1000 on v5p).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

TARGET = 1000.0  # views/sec/chip north-star (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh
    from worldrenderer_tpu.render import render

    # ~10k-triangle heightfield: (72-1)^2 * 2 = 10082 tris.
    verts, faces = make_grid_mesh(
        72, extent=1.0, height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y)
    )
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    )

    n_views, height, width = 6, 512, 512
    cam = get_camera(
        elevation_deg=35.0,
        distance=3.0,
        fovy_deg=50.0,
        num_views=n_views,
        near=0.1,
        far=10.0,
    )

    fn = jax.jit(
        functools.partial(
            render,
            height=height,
            width=width,
            render_attr=False,
            render_depth=False,
            render_normal=True,
        )
    )

    # Warmup / compile.
    out = fn(mesh, cam)
    jax.block_until_ready(out)

    # Timed: repeat until >= 1s of work.
    reps = 5
    while True:
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(mesh, cam)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        if dt > 1.0 or reps >= 640:
            break
        reps *= 4

    views_per_sec = n_views * reps / dt
    print(
        json.dumps(
            {
                "metric": "views_per_sec_per_chip_6view_512_posnormal_10ktri",
                "value": round(views_per_sec, 2),
                "unit": "views/s",
                "vs_baseline": round(views_per_sec / TARGET, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

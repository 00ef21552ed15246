"""Diagnose the on-chip capped-vs-uncapped tiny-path divergence: render the
raw-1M scene one view both ways, pull the (z, id) images back, and localize
the differences. Also counts covered candidates on-chip.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_tiny_cap.py
"""

from __future__ import annotations

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh, with_normals
    from worldrenderer_tpu.ops.gbuffer import rasterize_gbuffer, _tiny_candidates
    from worldrenderer_tpu.ops.rasterize import (
        FAST_TPU_CONFIG,
        _tiny_mask,
        _triangle_setup_t,
        auto_fast_config,
        binning_stats,
    )
    from worldrenderer_tpu.transforms import get_clip_space_position

    verts, faces = make_grid_mesh(
        708, extent=1.0,
        height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y),
    )
    mesh = with_normals(TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    ))
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0,
        num_views=6, near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    auto = auto_fast_config(
        pos_clip, mesh.t_pos_idx, (512, 512),
        base=FAST_TPU_CONFIG._replace(bin_tiny_px=1.0),
    )
    st = binning_stats(pos_clip, mesh.t_pos_idx, (512, 512), auto)
    print("tiny_cap", auto.bin_tiny_cap, "n_tiny_cov", st["n_tiny_cov"],
          flush=True)

    # On-chip covered-candidate count per view through the SAME setup the
    # stats use (no v4).
    @jax.jit
    def covcount(pos_clip):
        def pv(pc):
            setup = _triangle_setup_t(pc, mesh.t_pos_idx, 512, 512)
            pix, _ = _tiny_candidates(
                setup.planes12, setup.bbox4,
                _tiny_mask(setup, 1.0), 512, 512, 16, 128,
            )
            return jnp.sum(pix < 512 * 512)

        return jax.vmap(pv)(pos_clip)

    print("cov per view (stats setup):", np.asarray(covcount(pos_clip)),
          flush=True)

    attr = mesh.v_nrm
    out_u = rasterize_gbuffer(
        pos_clip, mesh.t_pos_idx, attr, (512, 512),
        config=auto._replace(bin_tiny_cap=0),
    )
    out_c = rasterize_gbuffer(
        pos_clip, mesh.t_pos_idx, attr, (512, 512), config=auto,
    )
    tid_u = np.asarray(out_u.tri_id[0])
    tid_c = np.asarray(out_c.tri_id[0])
    z_u = np.asarray(out_u.z[0])
    z_c = np.asarray(out_c.z[0])
    diff = tid_u != tid_c
    print("view0: fg_u", (tid_u > 0).sum(), "fg_c", (tid_c > 0).sum(),
          "tid diffs", diff.sum(), flush=True)
    if diff.any():
        du = tid_u[diff][:20]
        dc = tid_c[diff][:20]
        print("sample uncapped ids:", du)
        print("sample   capped ids:", dc)
        print("uncapped diff-id range:", tid_u[diff].min(), tid_u[diff].max())
        print("capped   diff-id range:", tid_c[diff].min(), tid_c[diff].max())
        print("capped bg at diff px:", (tid_c[diff] == 0).sum(),
              "uncapped bg at diff px:", (tid_u[diff] == 0).sum())
        zd = np.abs(z_u[diff] - z_c[diff])
        print("z |diff| at diff px: max", zd.max(), "median", np.median(zd))


def main2():
    """Stage 2: reproduce the A/B structure (render() under a scan with
    perturbed MVPs) and localize which view/seed diverges."""
    import functools

    import jax
    import jax.numpy as jnp

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh, with_normals
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG, auto_fast_config
    from worldrenderer_tpu.render import render
    from worldrenderer_tpu.transforms import get_clip_space_position

    verts, faces = make_grid_mesh(
        708, extent=1.0,
        height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y),
    )
    mesh = with_normals(TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    ))
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0,
        num_views=6, near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    auto = auto_fast_config(
        pos_clip, mesh.t_pos_idx, (512, 512),
        base=FAST_TPU_CONFIG._replace(bin_tiny_px=1.0),
    )

    for name, cfg in (("uncapped", auto._replace(bin_tiny_cap=0)),
                      ("compacted", auto)):
        render_fn = functools.partial(
            render, height=512, width=512, render_attr=False,
            render_depth=False, render_normal=True, raster_config=cfg,
        )

        @jax.jit
        def per_view_sums(mesh, cam, seed, render_fn=render_fn):
            c = cam._replace(mvp_mtx=cam.mvp_mtx + seed * 1e-6)
            out = render_fn(mesh, c)
            return (jnp.sum(out.mask, axis=(1, 2)),
                    jnp.sum(jnp.abs(out.normal), axis=(1, 2, 3)))

        for seed in (0.0, 1.0):
            m, n = per_view_sums(mesh, cam, jnp.float32(seed))
            print(f"{name} seed={seed}: mask {np.asarray(m)} "
                  f"norm {np.asarray(n)}", flush=True)




def main3():
    """Stage 3: the exact A/B scan checksum, plus its per-iteration
    breakdown, run TWICE per variant (determinism check)."""
    import functools

    import jax
    import jax.numpy as jnp

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh, with_normals
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG, auto_fast_config
    from worldrenderer_tpu.render import render
    from worldrenderer_tpu.transforms import get_clip_space_position

    verts, faces = make_grid_mesh(
        708, extent=1.0,
        height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y),
    )
    mesh = with_normals(TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    ))
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0,
        num_views=6, near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    auto = auto_fast_config(
        pos_clip, mesh.t_pos_idx, (512, 512),
        base=FAST_TPU_CONFIG._replace(bin_tiny_px=1.0),
    )

    for name, cfg in (("uncapped", auto._replace(bin_tiny_cap=0)),
                      ("compacted", auto)):
        render_fn = functools.partial(
            render, height=512, width=512, render_attr=False,
            render_depth=False, render_normal=True, raster_config=cfg,
        )

        @jax.jit
        def run(mesh, cam, seed, render_fn=render_fn):
            def body(acc, i):
                c = cam._replace(
                    mvp_mtx=cam.mvp_mtx + (seed + i).astype(jnp.float32) * 1e-6
                )
                out = render_fn(mesh, c)
                step = jnp.sum(jnp.abs(out.normal)) + jnp.sum(out.mask)
                return acc + step, step

            acc, steps = jax.lax.scan(body, jnp.float32(0), jnp.arange(4))
            return acc, steps

        for rep in range(2):
            acc, steps = run(mesh, cam, jnp.float32(0))
            print(f"{name} rep{rep}: acc {float(acc):.1f} steps "
                  f"{np.asarray(steps)}", flush=True)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "2":
        main2()
    elif len(sys.argv) > 1 and sys.argv[1] == "3":
        main3()
    else:
        main()

"""Print the compiled-HLO structure of the config4 frame: what each big
fusion contains, and any sequential while loops (the round-4 _flat_chunks
pathology class). Pairs with tools/trace_config4.py — the trace gives
per-op time, this maps op names back to HLO bodies.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/dump_hlo_config4.py
       [--res 1024] [--views 4] [--ops fusion.5,fusion.33]
"""

from __future__ import annotations

import argparse
import re

import numpy as np


def build_frame(res, views, no_attr=False):
    import jax
    import jax.numpy as jnp

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG, auto_fast_config
    from worldrenderer_tpu.render import render
    from worldrenderer_tpu.transforms import get_clip_space_position

    verts, faces = make_grid_mesh(
        72, extent=1.0,
        height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y),
    )
    uv = (verts[:, :2] - verts[:, :2].min(0)) / np.ptp(verts[:, :2], 0)
    t = (np.indices((1024, 1024)).sum(0) // 64 % 2).astype(np.float32)
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.stack([t, 1 - t, t * 0 + 0.5], -1),
    )
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0, num_views=views,
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    cfg = auto_fast_config(
        pos_clip, mesh.t_pos_idx, (res, res), base=FAST_TPU_CONFIG
    )

    def frame(mesh, cam, seed):
        out = render(
            mesh, cam._replace(mvp_mtx=cam.mvp_mtx + seed * 1e-6),
            res, res,
            render_attr=not no_attr, render_depth=True,
            render_normal=True, raster_config=cfg,
        )
        acc = jnp.sum(out.mask) + jnp.sum(jnp.abs(out.normal))
        if not no_attr:
            acc = acc + jnp.sum(jnp.abs(out.attr))
        return acc

    return jax.jit(frame), (mesh, cam, jnp.float32(0))


def summarize_computation(name, body_lines):
    """Histogram of op kinds + the tensor shapes of the largest ops."""
    kinds = {}
    notable = []
    for ln in body_lines:
        m = re.match(r"\s*(?:ROOT\s+)?%?[\w.\-]+ = (\S+?)\[?[\s(]", ln)
        if not m:
            continue
        shape_m = re.match(r"\s*(?:ROOT\s+)?%?[\w.\-]+ = (\S+\[[\d,]*\])", ln)
        kind = ln.split("=", 1)[1].strip().split("(", 1)[0].strip()
        kind_op = kind.split()[-1] if " " in kind else kind
        op = re.sub(r"\[.*", "", kind_op)
        kinds[op] = kinds.get(op, 0) + 1
        if any(k in ln for k in ("gather", "while", "dynamic-slice", "dot",
                                 "scatter", "sort", "custom-call")):
            notable.append(ln.strip()[:240])
    print(f"\n### {name}: {sum(kinds.values())} ops")
    for k, v in sorted(kinds.items(), key=lambda kv: -kv[1])[:14]:
        print(f"  {v:4d}  {k}")
    for ln in notable[:20]:
        print(f"  ! {ln}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--views", type=int, default=4)
    ap.add_argument("--no-attr", action="store_true")
    ap.add_argument("--ops", default="",
                    help="comma-separated fusion names to expand")
    args = ap.parse_args()

    fn, ex = build_frame(args.res, args.views, args.no_attr)
    txt = fn.lower(*ex).compile().as_text()
    print(f"HLO text: {len(txt)/1e6:.1f} MB")

    # Top-level computations and their sizes.
    comps = re.split(r"\n(?=%?[\w.\-]+ \([^)]*\) -> )", txt)
    wanted = set(filter(None, args.ops.split(",")))

    # Entry computation: find ops named fusion.N / while / big gathers.
    entry = max(comps, key=len)
    big = []
    for ln in entry.splitlines():
        if re.search(r"= \S*(while|gather|sort|custom-call|dot)\S*\(", ln) \
           or re.search(r"%?(fusion[.\d]*) =", ln):
            big.append(ln.strip())
    print(f"\n=== entry computation: {len(big)} notable ops ===")
    for ln in big[:60]:
        print("  " + ln[:260])

    # Expand requested fusions (match "%fusion.5 =" call line to find the
    # called computation name, then print that computation's body).
    for want in wanted:
        call = re.search(
            rf"%?{re.escape(want)} = [^\n]*calls=%?([\w.\-]+)", txt
        )
        if not call:
            print(f"\n### {want}: call line not found")
            continue
        comp_name = call.group(1)
        comp = re.search(
            rf"\n%?{re.escape(comp_name)} [^\n]*\{{\n(.*?)\n\}}", txt, re.S
        )
        if comp:
            summarize_computation(f"{want} -> {comp_name}",
                                  comp.group(1).splitlines())
        else:
            print(f"\n### {want}: computation {comp_name} body not found")

    # All while loops anywhere.
    whiles = re.findall(r"[^\n]*= \S*while\S*\([^\n]*", txt)
    print(f"\n=== {len(whiles)} while ops ===")
    for ln in whiles[:10]:
        print("  " + ln.strip()[:260])


if __name__ == "__main__":
    main()

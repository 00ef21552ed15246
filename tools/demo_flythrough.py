"""Flythrough demo: render a full camera trajectory over a procedural town
— the reference's hero use case (mvadapter/test/pipeline.py renders 100
frames of town.blend along camera_path.json) driven through this stack.

Uses the REFERENCE'S committed trajectory when available (100 real
Blender-exported frames, whose matrix_world carries a 0.6 uniform scale —
the case that motivated affine_inverse), over a procedural box-town built
around the trajectory envelope. Renders depth + normal + mask for every
frame with scene-auto-tuned fast kernels and reports views/s.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python tools/demo_flythrough.py \
      [--camera-json PATH] [--out /tmp/flythrough] [--res 480x720]
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np

REFERENCE_JSON = Path("/root/reference/mvadapter/test/camera_path.json")


def build_town(rng, cam_xy, ground_x=(-6.0, 16.0), ground_y=(-9.0, 17.0),
               n_boxes=260, clearance=1.3):
    """Ground heightfield + scattered box buildings, keeping a clear
    corridor around the camera path (no box center within ``clearance``
    of any camera xy). Returns (verts, faces)."""
    verts = []
    faces = []

    def add_box(cx, cy, w, d, h, z0=0.0):
        base = len(verts)
        for dz in (z0, z0 + h):
            for dx, dy in ((-w, -d), (w, -d), (w, d), (-w, d)):
                verts.append((cx + dx, cy + dy, dz))
        quads = [
            (0, 1, 2, 3), (7, 6, 5, 4), (0, 4, 5, 1),
            (1, 5, 6, 2), (2, 6, 7, 3), (3, 7, 4, 0),
        ]
        for a, b, c, d4 in quads:
            faces.append((base + a, base + b, base + c))
            faces.append((base + a, base + c, base + d4))

    # Ground: subdivided plane (gentle noise so normals vary).
    gx = np.linspace(*ground_x, 48)
    gy = np.linspace(*ground_y, 56)
    gxx, gyy = np.meshgrid(gx, gy, indexing="ij")
    gz = 0.05 * np.sin(gxx * 0.9) * np.cos(gyy * 0.7)
    base = len(verts)
    for i in range(len(gx)):
        for j in range(len(gy)):
            verts.append((gxx[i, j], gyy[i, j], gz[i, j]))
    for i in range(len(gx) - 1):
        for j in range(len(gy) - 1):
            a = base + i * len(gy) + j
            b, c, d = a + 1, a + len(gy), a + len(gy) + 1
            faces.append((a, d, b))  # upward-facing winding
            faces.append((a, c, d))

    placed = 0
    while placed < n_boxes:
        cx = rng.uniform(*ground_x)
        cy = rng.uniform(*ground_y)
        if np.min(np.hypot(cam_xy[:, 0] - cx, cam_xy[:, 1] - cy)) < clearance:
            continue
        w, d = rng.uniform(0.25, 0.8), rng.uniform(0.25, 0.8)
        h = rng.uniform(0.4, 2.8)
        add_box(cx, cy, w, d, h)
        placed += 1

    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--camera-json", default=str(REFERENCE_JSON))
    ap.add_argument("--out", default="/tmp/flythrough")
    ap.add_argument("--res", default="480x720")
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument(
        "--fixture", action="store_true",
        help="use the COMMITTED real-scene fixture (tests/data/town.glb + "
        "its 100-frame camera path) instead of the procedural town + "
        "reference trajectory — the multi-material / seamed-UV / "
        "non-unit-scale GLB path real exports take",
    )
    args = ap.parse_args()
    h, w = (int(v) for v in args.res.split("x"))

    import jax
    import jax.numpy as jnp

    from worldrenderer_tpu.mesh import TexturedMesh
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG, auto_fast_config
    from worldrenderer_tpu.render import render
    from worldrenderer_tpu.scene.camera_json import load_camera_from_json
    from worldrenderer_tpu.transforms import get_clip_space_position

    if args.fixture:
        repo = Path(__file__).resolve().parent.parent
        args.camera_json = str(repo / "tests" / "data" / "town_camera_path.json")

    cam, near, far = load_camera_from_json(args.camera_json, height=h, width=w)
    n = len(cam)
    print(f"{n} frames from {args.camera_json} (near={near:g} far={far:g})")

    if args.fixture:
        from worldrenderer_tpu.mesh import load_mesh

        repo = Path(__file__).resolve().parent.parent
        mesh = load_mesh(str(repo / "tests" / "data" / "town.glb"), flip_uv=True)
    else:
        rng = np.random.default_rng(0)
        cam_xy = np.asarray(cam.c2w)[:, :2, 3]
        verts, faces = build_town(rng, cam_xy)
        mesh = TexturedMesh(
            v_pos=jnp.asarray(verts), t_pos_idx=jnp.asarray(faces)
        )
    print(f"town: {mesh.t_pos_idx.shape[0]} triangles")

    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    cfg = auto_fast_config(pos_clip, mesh.t_pos_idx, (h, w), base=FAST_TPU_CONFIG)
    print("auto config: med", cfg.bin_med, "huge", cfg.bin_huge,
          "k", cfg.max_tris_per_tile)

    with_attr = args.fixture and mesh.texture is not None

    @jax.jit
    def render_chunk(mesh, c):
        out = render(mesh, c, h, w, render_attr=with_attr, render_depth=True,
                     render_normal=True, raster_config=cfg,
                     attr_background=0.12)
        return (
            out.attr if with_attr else out.normal, out.depth, out.mask
        )

    # Warmup compile on the first chunk shape.
    ck = args.chunk
    _ = jax.block_until_ready(render_chunk(mesh, cam[0:ck]))
    t0 = time.perf_counter()
    normals, depths, masks = [], [], []
    done = 0
    while done < n:
        j = min(done + ck, n)
        c = cam[done:j] if j - done == ck else cam[n - ck:n]
        nm, dp, mk = render_chunk(mesh, c)
        # keep only the frames we asked for when the tail chunk overlaps
        off = ck - (j - done)
        normals.append(np.asarray(nm)[off:])
        depths.append(np.asarray(dp)[off:])
        masks.append(np.asarray(mk)[off:])
        done = j
    dt = time.perf_counter() - t0
    print(f"rendered {n} frames {w}x{h} in {dt:.2f} s "
          f"({n/dt:.1f} views/s incl. host transfer)")

    normals = np.concatenate(normals)
    masks = np.concatenate(masks)
    cov = masks.mean()
    print(f"mean coverage: {cov:.3f}")
    assert np.isfinite(normals).all()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    try:
        from PIL import Image

        kind = "attr" if with_attr else "normal"
        for i in (0, n // 2, n - 1):
            img = (
                np.where(masks[i][..., None], normals[i], 0.12)
                if with_attr
                else np.where(masks[i][..., None], normals[i] * 0.5 + 0.5, 0.12)
            )
            Image.fromarray(
                (np.clip(img, 0, 1) * 255).astype(np.uint8)
            ).save(out / f"frame_{i:03d}_{kind}.png")
        print(f"sample frames -> {out}")
    except ImportError:
        pass


if __name__ == "__main__":
    main()

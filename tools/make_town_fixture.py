"""Generate the committed real-scene fixture: a town.blend-class GLB +
100-frame camera path (VERDICT r3 item 5).

The reference's de-facto integration fixture is town.blend +
camera_path.json (reference test/README.md:15-91) — a multi-material,
seam-heavy, non-unit-scale scene with a Blender-exported flythrough. No
Blender exists in this environment, so this script CONSTRUCTS a GLB with
the same load-bearing properties and commits it under tests/data/:

  * 3 materials as separate glTF primitives (ground / walls / roofs),
    each with its own baseColor PNG — exercises load_glb's multi-material
    atlas packing;
  * seamed UVs: every box face is its own UV island with duplicated
    corner vertices (what real exporters emit) — exercises the
    merge_duplicate_vertices stitched-normal path and unify flow;
  * non-unit scale: geometry authored in ~26 world units with a 0.6
    uniform node scale (glTF node matrix), like the reference's exported
    matrices (|R| ~ 0.6);
  * a 100-frame look-ahead flythrough through the streets, saved in the
    SAME {frame, fov_deg, clip_start, clip_end, matrix_world} schema as
    the reference's camera_path.json, with the 0.6 Blender-style scale
    baked into the rotation part (the loader must cope, and does).

Deterministic (seeded); re-running reproduces the committed bytes'
content (PNG encoding is deterministic through PIL).

Usage: python tools/make_town_fixture.py [outdir=tests/data]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

SCALE = 0.6  # authored-units -> world (baked into the glTF node matrix)
N_FRAMES = 100
FOV_DEG = 60.0


def _tex_ground(n=256):
    rng = np.random.default_rng(11)
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    base = np.stack(
        [0.23 + 0 * xx, 0.27 + 0 * xx, 0.20 + 0 * xx], -1
    ).astype(np.float32)
    # Paving stripes + speckle.
    stripes = (((xx // 16) + (yy // 16)) % 2)[..., None] * 0.06
    speckle = rng.uniform(-0.03, 0.03, (n, n, 1))
    return np.clip(base + stripes + speckle, 0, 1).astype(np.float32)


def _tex_wall(n=256):
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    wall = np.full((n, n, 3), (0.62, 0.55, 0.45), np.float32)
    # Window grid: dark rectangles with lit offsets.
    wy = (yy % 64 > 18) & (yy % 64 < 46)
    wx = (xx % 52 > 14) & (xx % 52 < 40)
    win = wy & wx
    wall[win] = (0.15, 0.2, 0.3)
    lit = win & ((xx // 52 + yy // 64) % 3 == 0)
    wall[lit] = (0.9, 0.8, 0.4)
    return wall


def _tex_roof(n=256):
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    roof = np.full((n, n, 3), (0.45, 0.2, 0.15), np.float32)
    roof[(yy % 24 < 3)] = (0.3, 0.12, 0.1)
    roof[(xx % 48 < 2)] = (0.35, 0.15, 0.11)
    return roof


def build_primitives(rng):
    """Ground + walls + roofs primitives (authored units, z-up)."""
    # --- ground: 48x48 grid over [-10, 16] x [-12, 16], mild undulation.
    n = 49
    gx = np.linspace(-10.0, 16.0, n)
    gy = np.linspace(-12.0, 16.0, n)
    xx, yy = np.meshgrid(gx, gy, indexing="xy")
    zz = 0.04 * np.sin(0.7 * xx) * np.cos(0.5 * yy)
    gverts = np.stack([xx, yy, zz], -1).reshape(-1, 3).astype(np.float32)
    idx = np.arange(n * n).reshape(n, n)
    f0 = np.stack([idx[:-1, :-1], idx[:-1, 1:], idx[1:, :-1]], -1)
    f1 = np.stack([idx[:-1, 1:], idx[1:, 1:], idx[1:, :-1]], -1)
    gfaces = np.concatenate([f0.reshape(-1, 3), f1.reshape(-1, 3)], 0)
    guv = np.stack(
        [(xx - gx[0]) / (gx[-1] - gx[0]), (yy - gy[0]) / (gy[-1] - gy[0])], -1
    ).reshape(-1, 2).astype(np.float32)
    ground = {
        "vertices": gverts, "faces": gfaces.astype(np.uint32), "uv": guv,
        "texture": _tex_ground(), "name": "ground",
    }

    # --- buildings: boxes on a jittered grid, streets kept clear.
    wall_v, wall_f, wall_uv = [], [], []
    roof_v, roof_f, roof_uv = [], [], []

    def add_face(store_v, store_f, store_uv, quad, uv_quad):
        base = sum(len(v) for v in store_v)
        store_v.append(np.asarray(quad, np.float32))
        store_uv.append(np.asarray(uv_quad, np.float32))
        store_f.append(np.array(
            [[base, base + 1, base + 2], [base, base + 2, base + 3]], np.uint32
        ))

    def add_box(cx, cy, w, d, h, z0):
        x0, x1 = cx - w / 2, cx + w / 2
        y0, y1 = cy - d / 2, cy + d / 2
        z1 = z0 + h
        # 4 wall faces, each its OWN UV island (seams everywhere, like a
        # real box-unwrap export). u spans the face width in ~2-unit tiles
        # clamped to [0,1] (atlas cells don't tile).
        for (a, b) in (((x0, y0), (x1, y0)), ((x1, y0), (x1, y1)),
                       ((x1, y1), (x0, y1)), ((x0, y1), (x0, y0))):
            quad = [(a[0], a[1], z0), (b[0], b[1], z0),
                    (b[0], b[1], z1), (a[0], a[1], z1)]
            uw = min(1.0, np.hypot(b[0] - a[0], b[1] - a[1]) / 4.0)
            vh = min(1.0, h / 4.0)
            add_face(wall_v, wall_f, wall_uv, quad,
                     [(0, vh), (uw, vh), (uw, 0), (0, 0)])
        # roof quad -> roof primitive.
        add_face(
            roof_v, roof_f, roof_uv,
            [(x0, y0, z1), (x1, y0, z1), (x1, y1, z1), (x0, y1, z1)],
            [(0, 0), (1, 0), (1, 1), (0, 1)],
        )

    for bx in range(-8, 15, 3):
        for by in range(-10, 15, 3):
            # Streets on multiples of 3; blocks sit between them.
            cx = bx + 1.5 + rng.uniform(-0.2, 0.2)
            cy = by + 1.5 + rng.uniform(-0.2, 0.2)
            if rng.random() < 0.15:
                continue  # empty lot
            w = rng.uniform(1.2, 2.2)
            d = rng.uniform(1.2, 2.2)
            h = rng.uniform(1.0, 6.0) if rng.random() < 0.8 else rng.uniform(6, 10)
            add_box(cx, cy, w, d, h, 0.0)
            if rng.random() < 0.3:  # stacked setback tower
                add_box(cx, cy, w * 0.6, d * 0.6, h * 0.5, h)

    walls = {
        "vertices": np.concatenate(wall_v), "faces": np.concatenate(wall_f),
        "uv": np.concatenate(wall_uv), "texture": _tex_wall(), "name": "walls",
    }
    roofs = {
        "vertices": np.concatenate(roof_v), "faces": np.concatenate(roof_f),
        "uv": np.concatenate(roof_uv), "texture": _tex_roof(), "name": "roofs",
    }
    return [ground, walls, roofs]


def camera_path():
    """100-frame street-level flythrough (world = authored * SCALE),
    c2w with the SCALE baked into the rotation columns (Blender-style)."""
    t = np.linspace(0.0, 1.0, N_FRAMES)
    # Aerial circuit above the roofline (tallest stacked tower ~15
    # authored units), swooping between 13 and 19, looking down-ahead at
    # the streets — guaranteed clear of geometry at every frame.
    ang = 2 * np.pi * t
    ex = 3.0 + 11.0 * np.cos(ang) + 0.6 * np.sin(3 * ang)
    ey = 2.0 + 12.0 * np.sin(ang) + 0.6 * np.cos(2 * ang)
    ez = 21.0 + 3.0 * np.sin(2 * ang + 1.0)  # towers top out at 15
    eye = np.stack([ex, ey, ez], -1) * SCALE

    # Target: a ground point ahead along the orbit, pulled toward center.
    la = np.roll(np.stack([ex, ey, 0 * ez], -1), -10, axis=0) * SCALE
    center = np.array([3.0, 2.0, 1.0]) * SCALE
    target = 0.55 * la + 0.45 * center

    up = np.array([0.0, 0.0, 1.0])
    c2w = np.zeros((N_FRAMES, 4, 4), np.float64)
    for i in range(N_FRAMES):
        fwd = target[i] - eye[i]
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, up)
        right /= np.linalg.norm(right)
        u = np.cross(right, fwd)
        # Camera looks down -Z (glTF/Blender camera convention).
        rot = np.stack([right, u, -fwd], axis=1)
        c2w[i, :3, :3] = rot * SCALE  # exported-scene scale on the rotation
        c2w[i, :3, 3] = eye[i]
        c2w[i, 3, 3] = 1.0
    return c2w


def main():
    outdir = Path(sys.argv[1]) if len(sys.argv) > 1 else (
        Path(__file__).resolve().parent.parent / "tests" / "data"
    )
    outdir.mkdir(parents=True, exist_ok=True)
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

    from worldrenderer_tpu.scene.camera_json import save_camera_json
    from worldrenderer_tpu.scene.gltf import load_glb, save_glb_scene

    rng = np.random.default_rng(42)
    prims = build_primitives(rng)
    # Author in the glTF y-up frame (what every real exporter writes):
    # world (x, y, z-up) -> glTF (x, z, -y). load_mesh's default
    # up=+y/front=+x change-of-basis inverts this back to the authored
    # world, which is the frame the camera path below lives in.
    for p in prims:
        v = p["vertices"]
        p["vertices"] = np.stack([v[:, 0], v[:, 2], -v[:, 1]], -1)
    xform = np.diag([SCALE, SCALE, SCALE, 1.0])
    glb_path = outdir / "town.glb"
    save_glb_scene(glb_path, prims, node_transform=xform)

    c2w = camera_path()
    save_camera_json(
        outdir / "town_camera_path.json", c2w, FOV_DEG,
        clip_start=0.05, clip_end=500.0,
    )

    parsed = load_glb(glb_path)
    n_tris = len(parsed["faces"])
    ext = parsed["vertices"].max(0) - parsed["vertices"].min(0)
    print(f"town.glb: {n_tris} tris, {len(parsed['vertices'])} verts, "
          f"extent {np.round(ext, 2)} world units, "
          f"atlas {None if parsed['texture'] is None else parsed['texture'].shape}")
    print(f"camera path: {N_FRAMES} frames, fov {FOV_DEG}")


if __name__ == "__main__":
    main()

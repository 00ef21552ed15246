"""Backface culling (RasterizerConfig.backface_cull) + mesh.is_watertight.

Semantics under test (reference parity note: nvdiffrast DRAWS backfaces —
reference render.py:30-62 — and z-buffering hides them on closed meshes;
our opt-in cull must therefore be visibly exact on watertight meshes
viewed from outside, and is allowed to differ only on shared-edge tie
pixels where a culled backface used to win the min-id rule).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import worldrenderer_tpu as wr
from worldrenderer_tpu.mesh import (
    TexturedMesh, icosphere, is_watertight, make_grid_mesh,
)
from worldrenderer_tpu.ops.gbuffer import rasterize_gbuffer
from worldrenderer_tpu.ops.rasterize import (
    FAST_TPU_CONFIG, RasterizerConfig, auto_fast_config, binning_stats,
)
from worldrenderer_tpu.transforms import get_clip_space_position

H = W = 128


def _sphere_scene(subdiv=3, n_views=2):
    verts, faces = icosphere(subdiv)
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    )
    cam = wr.get_camera(
        elevation_deg=[20.0, -35.0][:n_views],
        distance=[2.7] * n_views,
        fovy_deg=[40.0] * n_views,
        azimuth_deg=[30.0, 200.0][:n_views],
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    return mesh, cam, pos_clip


def test_is_watertight():
    _, faces = icosphere(2)
    assert is_watertight(faces)
    # Remove a face -> open.
    assert not is_watertight(faces[:-1])
    # Flip one face's winding -> inconsistent orientation.
    flipped = np.asarray(faces).copy()
    flipped[0] = flipped[0, ::-1]
    assert not is_watertight(flipped)
    # Heightfield grid -> open sheet.
    _, gfaces = make_grid_mesh(8)
    assert not is_watertight(gfaces)
    assert not is_watertight(np.zeros((0, 3), np.int32))
    # Degenerate face with a repeated vertex: its self-loop edge is its
    # own reverse and must not fool the pairing test.
    assert not is_watertight(np.array([[0, 0, 1]], np.int32))


@pytest.mark.parametrize("backend", ["fused_xla", "fused_pallas"])
def test_backface_cull_closed_mesh_visible_identity(backend):
    """On a watertight mesh viewed from outside, culling backfaces must
    leave coverage and depth intact; tri_id may flip only on z-tie pixels
    (shared silhouette edges where the backface used to win min-id)."""
    mesh, cam, pos_clip = _sphere_scene()
    base = RasterizerConfig(backend=backend, dot_precision="highest")
    g0 = rasterize_gbuffer(pos_clip, mesh.t_pos_idx, None, (H, W), base)
    g1 = rasterize_gbuffer(
        pos_clip, mesh.t_pos_idx, None, (H, W),
        base._replace(backface_cull=-1),
    )
    m0 = np.asarray(g0.mask)
    m1 = np.asarray(g1.mask)
    fg = int(m0.sum())
    assert fg > 1000
    # Coverage: identical up to a handful of exact-silhouette-grazing
    # pixels (edge-eval rounding differs between the two adjacent
    # triangles' planes).
    mask_flips = int((m0 != m1).sum())
    assert mask_flips <= max(2, fg // 2000), mask_flips
    both = m0 & m1
    flips2d = (np.asarray(g0.tri_id) != np.asarray(g1.tri_id)) & both
    # Where the winner id is unchanged, z must be BIT-identical.
    same = both & ~flips2d
    assert np.array_equal(np.asarray(g0.z)[same], np.asarray(g1.z)[same])
    # Id flips are rare and confined to the SILHOUETTE (within 2 px of the
    # mask boundary): an edge-on backface covers a center within coverage-
    # rounding slop and its near-degenerate z plane extrapolates there —
    # the culled value was a steep-plane artifact, so no z tolerance is
    # meaningful at flips; locality is the contract (matches the on-chip
    # check in tools/ab_backface.py).
    assert flips2d.sum() <= max(2, fg // 500), int(flips2d.sum())
    near_bg = ~m0
    for _ in range(2):
        p = np.pad(near_bg, ((0, 0), (1, 1), (1, 1)))
        near_bg = np.zeros_like(near_bg)
        h, w = near_bg.shape[1:]
        for dy in range(3):
            for dx in range(3):
                near_bg |= p[:, dy:dy + h, dx:dx + w]
    assert int((flips2d & ~near_bg).sum()) == 0


def test_backface_cull_single_triangle_sign():
    """+1 culls screen-CW (area < 0) triangles, -1 screen-CCW; an
    outward-CCW-wound front face has area < 0 in this pipeline (negated-Y
    projection), so backface culling for standard meshes is -1."""
    mesh, cam, pos_clip = _sphere_scene(subdiv=0, n_views=1)
    cfg = RasterizerConfig(backend="fused_xla")
    cov = {}
    for bc in (0, -1, +1):
        g = rasterize_gbuffer(
            pos_clip, mesh.t_pos_idx, None, (H, W),
            cfg._replace(backface_cull=bc),
        )
        cov[bc] = int(np.asarray(g.mask).sum())
    assert cov[0] > 0
    # -1 keeps the visible front faces.
    assert cov[-1] == cov[0]
    # +1 culls every front face; only interior backfaces remain, and they
    # cover (roughly) the same silhouette — so coverage stays nonzero but
    # the nearest-z winners all changed. Check via depth instead: the
    # interior is strictly farther everywhere it is covered.
    g_front = rasterize_gbuffer(
        pos_clip, mesh.t_pos_idx, None, (H, W), cfg._replace(backface_cull=-1)
    )
    g_back = rasterize_gbuffer(
        pos_clip, mesh.t_pos_idx, None, (H, W), cfg._replace(backface_cull=+1)
    )
    both = np.asarray(g_front.mask) & np.asarray(g_back.mask)
    assert both.sum() > 100
    assert (
        np.asarray(g_back.z)[both] > np.asarray(g_front.z)[both]
    ).all()


def test_backface_cull_crossing_exempt():
    """Near-plane-crossing triangles are never culled (their cofactor
    orientation is not the screen winding): a crossing triangle renders
    identically with the cull on."""
    cam = wr.get_camera(
        elevation_deg=[10.0], distance=[2.0], fovy_deg=[60.0],
        azimuth_deg=[0.0], near=0.1, far=10.0,
    )
    # One big triangle with a vertex strictly behind the camera: put it at
    # 2x the camera position (on the camera->origin ray, past the camera).
    c2w = np.linalg.inv(np.asarray(cam.w2c)[0])
    cam_pos = c2w[:3, 3]
    v = np.array(
        [[-2.0, -1.0, 0.0], [2.0, -1.0, 0.0], 2.0 * cam_pos], np.float32
    )
    tri = np.array([[0, 1, 2]], np.int32)
    mesh = TexturedMesh(
        v_pos=jnp.asarray(v), t_pos_idx=jnp.asarray(tri)
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    w = np.asarray(pos_clip)[0, :, 3]
    assert (w > 0).any() and (w <= 0).any(), w  # genuinely crossing
    cfg = RasterizerConfig(backend="fused_xla")
    outs = [
        rasterize_gbuffer(
            pos_clip, mesh.t_pos_idx, None, (H, W),
            cfg._replace(backface_cull=bc),
        )
        for bc in (0, -1, +1)
    ]
    ref = np.asarray(outs[0].mask)
    assert ref.sum() > 0
    for g in outs[1:]:
        assert np.array_equal(ref, np.asarray(g.mask))
        assert np.array_equal(np.asarray(outs[0].z), np.asarray(g.z))


def test_backface_cull_halves_binned_entries():
    """binning_stats (and therefore auto_fast_config budgets) see the
    culled triangle set: a closed mesh bins ~half the live entries."""
    verts, faces = icosphere(4)  # 5120 faces
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    )
    cam = wr.get_camera(
        elevation_deg=[20.0], distance=[2.7], fovy_deg=[40.0],
        azimuth_deg=[30.0], near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    s0 = binning_stats(pos_clip, mesh.t_pos_idx, (256, 256), FAST_TPU_CONFIG)
    cfg = auto_fast_config(
        pos_clip, mesh.t_pos_idx, (256, 256), backface_cull=-1
    )
    assert cfg.backface_cull == -1
    s1 = binning_stats(pos_clip, mesh.t_pos_idx, (256, 256), cfg)
    assert s1["ok"]
    assert s1["live_entries"] < 0.62 * s0["live_entries"], (
        s0["live_entries"], s1["live_entries"],
    )


def test_backface_cull_tiny_path():
    """The sub-pixel sort tier shares setup.valid, so tiny backfaces are
    culled too — z image identical, candidate counts drop."""
    verts, faces = icosphere(5)  # 20480 faces, sub-pixel at 64^2
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    )
    cam = wr.get_camera(
        elevation_deg=[15.0], distance=[2.7], fovy_deg=[40.0],
        azimuth_deg=[10.0], near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    res = (64, 64)
    base = FAST_TPU_CONFIG._replace(
        bin_tiny_px=1.0, backend="fused_xla", dot_precision="highest"
    )
    g0 = rasterize_gbuffer(pos_clip, mesh.t_pos_idx, None, res, base)
    g1 = rasterize_gbuffer(
        pos_clip, mesh.t_pos_idx, None, res, base._replace(backface_cull=-1)
    )
    m0, m1 = np.asarray(g0.mask), np.asarray(g1.mask)
    fg = int(m0.sum())
    assert fg > 300
    assert int((m0 != m1).sum()) <= max(2, fg // 500)
    both = m0 & m1
    same = np.asarray(g0.tri_id)[both] == np.asarray(g1.tri_id)[both]
    assert np.array_equal(
        np.asarray(g0.z)[both][same], np.asarray(g1.z)[both][same]
    )
    s0 = binning_stats(pos_clip, mesh.t_pos_idx, res, base)
    s1 = binning_stats(
        pos_clip, mesh.t_pos_idx, res, base._replace(backface_cull=-1)
    )
    assert s1["n_tiny_cov"] < 0.7 * s0["n_tiny_cov"]

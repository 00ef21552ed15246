"""Fused gather-free G-buffer rasterization vs the classic
rasterize+interpolate pipeline (both XLA-scan and Pallas-interpret)."""

import jax.numpy as jnp
import numpy as np
import pytest

from worldrenderer_tpu import get_camera
from worldrenderer_tpu.mesh import TexturedMesh, icosphere, with_normals
from worldrenderer_tpu.ops import interpolate, rasterize
from worldrenderer_tpu.ops.gbuffer import rasterize_gbuffer
from worldrenderer_tpu.ops.rasterize import RasterizerConfig
from worldrenderer_tpu.transforms import get_clip_space_position

H, W = 64, 128


@pytest.fixture(scope="module")
def scene():
    verts, faces = icosphere(2)
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    )
    mesh = with_normals(mesh)
    cam = get_camera(
        elevation_deg=20.0, distance=3.0, fovy_deg=45.0, num_views=2,
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
    return mesh, pos_clip


@pytest.mark.parametrize("backend", ["fused_xla", "fused_pallas", "vpu_pallas"])
def test_gbuffer_matches_classic(scene, backend):
    mesh, pos_clip = scene
    tri = mesh.t_pos_idx
    v_attr = jnp.concatenate([mesh.v_pos, mesh.v_nrm], axis=-1)  # (V, 6)

    cfg = RasterizerConfig(backend=backend)
    out = rasterize_gbuffer(pos_clip, tri, v_attr, (H, W), cfg)

    rast = rasterize(pos_clip, tri, (H, W))
    mask_ref = np.asarray(rast[..., 3] > 0)
    np.testing.assert_array_equal(np.asarray(out.mask), mask_ref)
    np.testing.assert_array_equal(
        np.asarray(out.tri_id), np.asarray(rast[..., 3]).astype(np.int32)
    )
    np.testing.assert_allclose(
        np.asarray(out.z)[mask_ref], np.asarray(rast[..., 2])[mask_ref],
        atol=1e-5,
    )

    pos_ref = interpolate(mesh.v_pos[None], rast, tri)
    nrm_ref = interpolate(mesh.v_nrm[None], rast, tri)
    np.testing.assert_allclose(
        np.asarray(out.attr[..., :3])[mask_ref],
        np.asarray(pos_ref)[mask_ref],
        atol=5e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out.attr[..., 3:])[mask_ref],
        np.asarray(nrm_ref)[mask_ref],
        atol=5e-4,
    )


def test_gbuffer_no_attr(scene):
    mesh, pos_clip = scene
    out = rasterize_gbuffer(
        pos_clip, mesh.t_pos_idx, None, (H, W), RasterizerConfig(backend="fused_xla")
    )
    assert out.attr is None
    rast = rasterize(pos_clip, mesh.t_pos_idx, (H, W))
    np.testing.assert_array_equal(
        np.asarray(out.mask), np.asarray(rast[..., 3] > 0)
    )


@pytest.mark.parametrize("backend", ["fused_xla", "fused_pallas", "vpu_pallas"])
def test_render_fused_matches_classic(backend):
    from worldrenderer_tpu.mesh import uv_sphere_mesh
    from worldrenderer_tpu.render import render

    verts, faces, uv = uv_sphere_mesh(17, 33)
    tex = np.linspace(0, 1, 32 * 32 * 3, dtype=np.float32).reshape(32, 32, 3)
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.asarray(tex),
    )
    cam = get_camera(
        elevation_deg=20.0, distance=3.0, fovy_deg=45.0, num_views=2,
        near=0.1, far=10.0,
    )
    a = render(mesh, cam, H, W, render_attr=True, render_depth=True,
               render_normal=True)
    b = render(mesh, cam, H, W, render_attr=True, render_depth=True,
               render_normal=True,
               raster_config=RasterizerConfig(backend=backend))
    m = np.asarray(a.mask)
    np.testing.assert_array_equal(m, np.asarray(b.mask))
    np.testing.assert_allclose(
        np.asarray(a.pos)[m], np.asarray(b.pos)[m], atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(a.depth)[m], np.asarray(b.depth)[m], atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(a.normal)[m], np.asarray(b.normal)[m], atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(a.attr)[m], np.asarray(b.attr)[m], atol=2e-2
    )


@pytest.mark.slow
@pytest.mark.parametrize("backend", ["fused_xla", "fused_pallas", "vpu_pallas"])
def test_fused_flat_binning_large_mesh(backend):
    """Meshes above the sort_pairs threshold route through the flat
    contiguous-slice gather — must match the classic exact path."""
    from worldrenderer_tpu.mesh import make_grid_mesh
    from worldrenderer_tpu.render import render

    verts, faces = make_grid_mesh(72)  # 10082 tris
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    )
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0, num_views=2,
        near=0.1, far=10.0,
    )
    a = render(mesh, cam, 128, 128, render_attr=False, render_depth=True,
               render_normal=True)
    b = render(
        mesh, cam, 128, 128, render_attr=False, render_depth=True,
        render_normal=True,
        raster_config=RasterizerConfig(backend=backend),
    )
    m = np.asarray(a.mask)
    np.testing.assert_array_equal(m, np.asarray(b.mask))
    np.testing.assert_allclose(np.asarray(a.pos)[m], np.asarray(b.pos)[m], atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(a.normal)[m], np.asarray(b.normal)[m], atol=2e-3
    )


def test_world_corner_transform_matches_clip_gather():
    """rasterize_gbuffer(pos_world, mvp) — world corners gathered once then
    MVP-transformed on the MXU — must equal the per-view clip-corner gather
    it replaces (same contraction at HIGHEST precision)."""
    from worldrenderer_tpu.mesh import make_grid_mesh
    from worldrenderer_tpu.ops.gbuffer import rasterize_gbuffer
    from worldrenderer_tpu.transforms import get_clip_space_position

    verts, faces = make_grid_mesh(72)  # above the sort_pairs threshold
    v_pos = jnp.asarray(verts, jnp.float32)
    tri = jnp.asarray(faces, jnp.int32)
    cam = get_camera(
        elevation_deg=30.0, distance=3.0, fovy_deg=50.0, num_views=3,
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(v_pos, cam.mvp_mtx)
    v_nrm = jnp.ones((v_pos.shape[0], 3), jnp.float32)
    cfg = RasterizerConfig(backend="fused_pallas")
    a = rasterize_gbuffer(pos_clip, tri, v_nrm, (128, 128), cfg)
    b = rasterize_gbuffer(
        pos_clip, tri, v_nrm, (128, 128), cfg,
        pos_world=v_pos, mvp=cam.mvp_mtx,
    )
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
    np.testing.assert_array_equal(np.asarray(a.tri_id), np.asarray(b.tri_id))
    # On TPU the two contraction orders are bit-identical (verified on-chip:
    # max |dz| = 0); CPU einsums reassociate, so allow last-bit clip-coord
    # noise amplified through the 1/area plane constants.
    np.testing.assert_allclose(np.asarray(a.z), np.asarray(b.z), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(a.attr), np.asarray(b.attr), atol=1e-3
    )


@pytest.mark.slow
def test_split_bf16_exact_ids_beyond_2_16():
    """The DMA kernel's hi/lo id rows keep split_bf16 ids exact past the
    old 2^16 fallback threshold (70k-tri mesh: ids up to ~70000)."""
    from worldrenderer_tpu.mesh import make_grid_mesh
    from worldrenderer_tpu.ops.gbuffer import rasterize_gbuffer
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG
    from worldrenderer_tpu.transforms import get_clip_space_position

    verts, faces = make_grid_mesh(188)  # 69938 tris > 2^16
    assert faces.shape[0] > 2**16
    v_pos = jnp.asarray(verts, jnp.float32)
    tri = jnp.asarray(faces, jnp.int32)
    cam = get_camera(
        elevation_deg=40.0, distance=3.0, fovy_deg=50.0, num_views=1,
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(v_pos, cam.mvp_mtx)
    cfg = FAST_TPU_CONFIG._replace(max_tris_per_tile=None, bin_med=0)
    fast = rasterize_gbuffer(pos_clip, tri, None, (128, 128), cfg)
    exact = rasterize_gbuffer(
        pos_clip, tri, None, (128, 128),
        cfg._replace(dot_precision="highest"),
    )
    np.testing.assert_array_equal(np.asarray(fast.mask), np.asarray(exact.mask))
    idf, ide = np.asarray(fast.tri_id), np.asarray(exact.tri_id)
    # High ids (> 2^16) must round-trip exactly through the bf16 select.
    assert ide.max() > 2**16
    mism = (idf != ide).mean()
    assert mism < 5e-3, mism  # split_bf16 z-ordering flips only
    big = ide > 2**16
    assert (idf[big] == ide[big]).mean() > 0.995


@pytest.mark.slow  # ~25-28 s per precision mode; full-lane only
@pytest.mark.parametrize("prec", ["split_bf16", "highest"])
def test_kernel_unroll2_bit_identical(prec):
    """kernel_unroll=2 (paired chunks, independent compare chains, odd tail)
    reorders only the winner MERGES, whose min/tie-break semantics are
    associative with the <=/< split — outputs must be BIT-identical to the
    classic unroll=1 loop."""
    from worldrenderer_tpu.mesh import make_grid_mesh
    from worldrenderer_tpu.ops.gbuffer import rasterize_gbuffer
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG
    from worldrenderer_tpu.transforms import get_clip_space_position

    verts, faces = make_grid_mesh(72)  # 10082 tris, above sort_pairs min
    v_pos = jnp.asarray(verts, jnp.float32)
    tri = jnp.asarray(faces, jnp.int32)
    cam = get_camera(
        elevation_deg=35.0, distance=2.2, fovy_deg=50.0, num_views=2,
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(v_pos, cam.mvp_mtx)
    v_nrm = jnp.ones((v_pos.shape[0], 3), jnp.float32)
    cfg = FAST_TPU_CONFIG._replace(dot_precision=prec)
    a = rasterize_gbuffer(pos_clip, tri, v_nrm, (160, 160), cfg)
    b = rasterize_gbuffer(
        pos_clip, tri, v_nrm, (160, 160), cfg._replace(kernel_unroll=2)
    )
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
    np.testing.assert_array_equal(np.asarray(a.tri_id), np.asarray(b.tri_id))
    np.testing.assert_array_equal(np.asarray(a.z), np.asarray(b.z))
    np.testing.assert_array_equal(np.asarray(a.attr), np.asarray(b.attr))


def test_chunk_slice_modes_bit_identical():
    """The three chunk-window readers (sequential dynamic slices, windowed
    gather, aligned-row-gather + barrel shift) must agree exactly — "shift"
    is the default after winning the on-chip A/B by 16%."""
    from worldrenderer_tpu.mesh import make_grid_mesh
    from worldrenderer_tpu.ops.gbuffer import _chunk_windows, rasterize_gbuffer
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG
    from worldrenderer_tpu.transforms import get_clip_space_position

    rng = np.random.default_rng(0)
    s = jnp.asarray(rng.integers(0, 10000, 20292), jnp.int32)
    csrc = jnp.asarray(
        np.concatenate([rng.integers(0, 20292 - 128, 64),
                        [0, 20292 - 128, 1, 127, 128, 255]]), jnp.int32
    )
    ref = np.asarray(_chunk_windows(s, csrc, 128, "dynamic"))
    for m in ("shift", "gather"):
        np.testing.assert_array_equal(
            ref, np.asarray(_chunk_windows(s, csrc, 128, m))
        )

    verts, faces = make_grid_mesh(72)
    v_pos = jnp.asarray(verts, jnp.float32)
    tri = jnp.asarray(faces, jnp.int32)
    cam = get_camera(
        elevation_deg=35.0, distance=2.5, fovy_deg=50.0, num_views=2,
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(v_pos, cam.mvp_mtx)
    v_nrm = jnp.ones((v_pos.shape[0], 3), jnp.float32)
    a = rasterize_gbuffer(
        pos_clip, tri, v_nrm, (160, 160),
        FAST_TPU_CONFIG._replace(chunk_slice_mode="dynamic"),
    )
    b = rasterize_gbuffer(
        pos_clip, tri, v_nrm, (160, 160),
        FAST_TPU_CONFIG._replace(chunk_slice_mode="shift"),
    )
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
    np.testing.assert_array_equal(np.asarray(a.tri_id), np.asarray(b.tri_id))
    np.testing.assert_array_equal(np.asarray(a.z), np.asarray(b.z))
    np.testing.assert_array_equal(np.asarray(a.attr), np.asarray(b.attr))


@pytest.mark.parametrize("prec", ["highest", "split_bf16"])
@pytest.mark.parametrize("sub", [2, 4])
def test_bin_subtile_bit_identical(prec, sub):
    """bin_subtile=s (band-granular binning, in-kernel banded eval) must be
    BIT-identical to the classic full-tile eval in every precision mode:
    the rebase stays at the tile origin and each band evaluates with its
    true tile-local ly, so every pixel sees the same float expressions over
    the same candidate set in the same tie order. 152 rows exercises the
    padded band grid (height not a multiple of tile_h)."""
    from worldrenderer_tpu.mesh import make_grid_mesh
    from worldrenderer_tpu.ops.rasterize import (
        FAST_TPU_CONFIG, auto_fast_config, binning_stats,
    )

    verts, faces = make_grid_mesh(72)  # 10082 tris, above sort_pairs min
    v_pos = jnp.asarray(verts, jnp.float32)
    tri = jnp.asarray(faces, jnp.int32)
    cam = get_camera(
        elevation_deg=35.0, distance=2.2, fovy_deg=50.0, num_views=2,
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(v_pos, cam.mvp_mtx)
    v_nrm = jnp.ones((v_pos.shape[0], 3), jnp.float32)
    res = (152, 160)
    base = FAST_TPU_CONFIG._replace(dot_precision=prec)
    # Budgets must be lossless for BOTH grids or the candidate sets differ
    # by dropped triangles; auto_fast_config validates via the band-aware
    # binning_stats.
    cfg1 = auto_fast_config(pos_clip, tri, res, base=base)
    cfgs = auto_fast_config(
        pos_clip, tri, res, base=base._replace(bin_subtile=sub)
    )
    assert binning_stats(pos_clip, tri, res, cfgs)["ok"]
    a = rasterize_gbuffer(pos_clip, tri, v_nrm, res, cfg1)
    b = rasterize_gbuffer(pos_clip, tri, v_nrm, res, cfgs)
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
    np.testing.assert_array_equal(np.asarray(a.tri_id), np.asarray(b.tri_id))
    np.testing.assert_array_equal(np.asarray(a.z), np.asarray(b.z))
    np.testing.assert_array_equal(np.asarray(a.attr), np.asarray(b.attr))


@pytest.mark.parametrize("prec", ["highest", "split_bf16"])
def test_dma_group_and_cov_bits_bit_identical(prec):
    """dma_group=g (grouped chunk DMA streaming) must be BIT-identical to
    the per-chunk pipeline (same data at 128-aligned lane offsets, same
    expressions, same order), and cov_mode='bits' (sign-bit coverage) must
    match the float compare chain (divergence requires e == -0.0, which no
    live entry can produce — every valid edge row has (alpha, beta) != 0
    and RN sums that cancel to zero yield +0.0). 152 rows exercises the
    padded tile grid; group 8 exceeds most tiles' chunk counts so the
    group-aligned l_cap padding and absolute-index fetches are covered."""
    from worldrenderer_tpu.mesh import make_grid_mesh
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG

    verts, faces = make_grid_mesh(72)  # 10368 tris, above sort_pairs min
    v_pos = jnp.asarray(verts, jnp.float32)
    tri = jnp.asarray(faces, jnp.int32)
    cam = get_camera(
        elevation_deg=35.0, distance=2.2, fovy_deg=50.0, num_views=2,
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(v_pos, cam.mvp_mtx)
    v_nrm = jnp.ones((v_pos.shape[0], 3), jnp.float32)
    res = (152, 160)
    base = FAST_TPU_CONFIG._replace(dot_precision=prec)
    a = rasterize_gbuffer(pos_clip, tri, v_nrm, res, base)
    for variant in (
        base._replace(dma_group=4),
        base._replace(dma_group=8),
        base._replace(cov_mode="bits"),
        base._replace(dma_group=4, cov_mode="bits"),
    ):
        b = rasterize_gbuffer(pos_clip, tri, v_nrm, res, variant)
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
        np.testing.assert_array_equal(
            np.asarray(a.tri_id), np.asarray(b.tri_id)
        )
        np.testing.assert_array_equal(np.asarray(a.z), np.asarray(b.z))
        np.testing.assert_array_equal(np.asarray(a.attr), np.asarray(b.attr))


def test_bin_subtile_validates():
    from worldrenderer_tpu.mesh import make_grid_mesh
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG

    verts, faces = make_grid_mesh(72)  # above bin_sort_pairs_min_tris
    v_pos = jnp.asarray(verts, jnp.float32)
    tri = jnp.asarray(faces, jnp.int32)
    cam = get_camera(
        elevation_deg=10.0, distance=3.0, fovy_deg=45.0, num_views=1,
        near=0.1, far=10.0,
    )
    pos_clip = get_clip_space_position(v_pos, cam.mvp_mtx)
    with pytest.raises(ValueError, match="bin_subtile"):
        rasterize_gbuffer(
            pos_clip, tri, None, (64, 128),
            FAST_TPU_CONFIG._replace(bin_subtile=3),  # does not divide 16
        )


def _split_uv_grid(n=16):
    """Grid mesh with a genuine UV seam: the middle vertex column is
    duplicated in UV space (right-half faces index a shifted copy), so
    v_tex has its own topology (v_tex.shape[0] != v_pos.shape[0]) like a
    real atlas-packed GLB."""
    from worldrenderer_tpu.mesh import make_grid_mesh

    verts, faces = make_grid_mesh(
        n, extent=1.0, height_fn=lambda x, y: 0.25 * np.sin(2 * x + y)
    )
    uv = (verts[:, :2] - verts[:, :2].min(0)) / np.ptp(verts[:, :2], 0)
    uv = uv * 0.45 + 0.05
    mid = n // 2
    col = np.arange(n * n) % n
    mid_vtx = np.where(col == mid)[0]
    alt_uv = uv[mid_vtx] + np.array([0.5, 0.0])
    v_tex = np.concatenate([uv, alt_uv], axis=0)
    alt_index = {int(v): n * n + i for i, v in enumerate(mid_vtx)}
    t_tex = faces.copy()
    face_cols = col[faces]
    right = face_cols.max(axis=1) > mid  # faces touching the right half
    for fi in np.where(right)[0]:
        for k in range(3):
            t_tex[fi, k] = alt_index.get(int(faces[fi, k]), int(faces[fi, k]))
    assert not np.array_equal(t_tex, faces)
    tex = np.linspace(0, 1, 64 * 64 * 3, dtype=np.float32).reshape(64, 64, 3)
    return TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(v_tex, jnp.float32),
        t_tex_idx=jnp.asarray(t_tex, jnp.int32),
        texture=jnp.asarray(tex),
    )


def test_unify_mesh_uv_preserves_classic_render():
    """unify_mesh_uv is semantics-preserving: the classic pipeline renders
    the seam-cut mesh identically to the original split-UV mesh — exact
    coverage (same triangles, same winners) and ULP-close float channels
    (the duplicated/reordered vertex tables compile to differently-tiled
    einsums, so FMA association differs; the per-face corner VALUES are
    bit-equal). Stitched normal semantics are baked into the mapped v_nrm,
    so seams stay smooth."""
    from worldrenderer_tpu.mesh import unify_mesh_uv
    from worldrenderer_tpu.render import render

    split = _split_uv_grid()
    unified = unify_mesh_uv(split)
    assert unified.v_tex.shape[0] == unified.v_pos.shape[0]
    assert unified.v_pos.shape[0] > split.v_pos.shape[0]  # seam duplicated
    # Already-unified meshes pass through untouched.
    assert unify_mesh_uv(unified) is unified

    cam = get_camera(
        elevation_deg=35.0, distance=2.8, fovy_deg=45.0, num_views=2,
        near=0.1, far=10.0,
    )
    cfg = RasterizerConfig(backend="xla")
    a = render(split, cam, H, W, render_attr=True, render_depth=True,
               render_normal=True, raster_config=cfg)
    b = render(unified, cam, H, W, render_attr=True, render_depth=True,
               render_normal=True, raster_config=cfg)
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
    for f in ("attr", "depth", "normal", "pos"):
        np.testing.assert_allclose(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
            atol=1e-5, err_msg=f,
        )


def test_render_auto_unifies_split_uv():
    """backend='auto' seam-cuts concrete split-UV meshes on the fly and
    takes the fused fast path (VERDICT r2 #2): output must bit-match an
    explicit fused render of the unified mesh, and stay within the usual
    fused-vs-classic tolerance of the split mesh's classic render."""
    from worldrenderer_tpu.mesh import unify_mesh_uv
    from worldrenderer_tpu.render import render

    split = _split_uv_grid()
    cam = get_camera(
        elevation_deg=35.0, distance=2.8, fovy_deg=45.0, num_views=2,
        near=0.1, far=10.0,
    )
    auto = render(split, cam, H, W, render_attr=True, render_depth=True,
                  render_normal=True)
    fused = render(unify_mesh_uv(split), cam, H, W, render_attr=True,
                   render_depth=True, render_normal=True,
                   raster_config=RasterizerConfig(backend="fused_xla"))
    for f in ("mask", "attr", "depth", "normal", "pos"):
        np.testing.assert_array_equal(
            np.asarray(getattr(auto, f)), np.asarray(getattr(fused, f)),
            err_msg=f,
        )

    classic = render(split, cam, H, W, render_attr=True, render_depth=True,
                     render_normal=True,
                     raster_config=RasterizerConfig(backend="xla"))
    m = np.asarray(classic.mask)
    np.testing.assert_array_equal(m, np.asarray(auto.mask))
    np.testing.assert_allclose(
        np.asarray(auto.normal)[m], np.asarray(classic.normal)[m], atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(auto.attr)[m], np.asarray(classic.attr)[m], atol=2e-2
    )

    # Traced split meshes cannot be cut host-side: auto must still produce
    # a defined (classic-path) render under jit.
    import jax

    jit_out = jax.jit(
        lambda m_, c_: render(m_, c_, H, W, render_attr=True,
                              render_depth=False, render_normal=False)
    )(split, cam)
    np.testing.assert_array_equal(np.asarray(jit_out.mask), m)


def test_render_view_chunk_matches_whole_batch():
    """render(view_chunk=N) lax.maps the view batch in chunks (gather
    tables scale with batch size on TPU, see bench config2); per-view
    outputs are independent, so results must match the whole-batch render
    (exact coverage, ULP float channels)."""
    from worldrenderer_tpu.mesh import uv_sphere_mesh
    from worldrenderer_tpu.render import render

    verts, faces, uv = uv_sphere_mesh(17, 33)
    tex = np.linspace(0, 1, 32 * 32 * 3, dtype=np.float32).reshape(32, 32, 3)
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.asarray(tex),
    )
    cam = get_camera(
        elevation_deg=20.0, distance=3.0, fovy_deg=45.0, num_views=8,
        near=0.1, far=10.0,
    )
    whole = render(mesh, cam, H, W, render_attr=True, render_depth=True,
                   render_normal=True)
    chunked = render(mesh, cam, H, W, render_attr=True, render_depth=True,
                     render_normal=True, view_chunk=2)
    np.testing.assert_array_equal(
        np.asarray(whole.mask), np.asarray(chunked.mask)
    )
    for f in ("attr", "depth", "normal", "pos"):
        np.testing.assert_allclose(
            np.asarray(getattr(whole, f)), np.asarray(getattr(chunked, f)),
            atol=1e-5, err_msg=f,
        )
    # view_chunk >= batch is a no-op path; non-dividing chunk raises.
    same = render(mesh, cam, H, W, render_attr=True, view_chunk=8)
    np.testing.assert_array_equal(
        np.asarray(whole.mask), np.asarray(same.mask)
    )
    with pytest.raises(ValueError, match="divide"):
        render(mesh, cam, H, W, render_attr=True, view_chunk=3)


def test_no_large_baked_constants_in_padded_programs():
    """The plane-coefficient pad blocks must not constant-fold into big
    baked literals: ``zeros((n_tiles, ...)).at[].set(BIG_NEG)`` lowers to
    a scatter that XLA's constant folder materializes wholesale (37 MB of
    HLO constant at 4096²-atlas tile counts), inflating remote-compile
    requests and folding time. ops/tensor.py:edge0_pad_block broadcasts a
    bytes-sized template instead; this pins the property on a compiled
    atlas-raster program (uv_precompute exercises the padded
    raster_zid_tiles_pallas path at a real tile count)."""
    import re

    import jax

    from worldrenderer_tpu.baking.uv import uv_precompute
    from worldrenderer_tpu.mesh import uv_sphere_mesh

    verts, faces, uv = uv_sphere_mesh(17, 33)
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
    )
    comp = (
        jax.jit(
            lambda m: uv_precompute(m, height=512, width=512).uv_mask
        )
        .lower(mesh)
        .compile()
    )
    txt = comp.runtime_executable().hlo_modules()[0].to_string()
    worst = 0
    for m in re.finditer(r"constant[.\d]*\s*=\s*\w+\[([\d,]*)\]", txt):
        n = 1
        for d in m.group(1).split(","):
            if d:
                n *= int(d)
        worst = max(worst, n)
    assert worst < (1 << 16), f"large baked constant: {worst} elements"

"""UV baking layer: precompute properties + end-to-end projection roundtrip.

Strategy (SURVEY.md §4): render views of a mesh with a known texture, project
those views back into UV space, and check the baked texture reproduces the
original where the views saw the surface.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from worldrenderer_tpu import get_camera
from worldrenderer_tpu.baking import (
    SimpleUVValidityStrategy,
    camera_projection,
    uv_precompute,
    uv_render_attr,
    uv_render_geometry,
    uv_blend,
)
from worldrenderer_tpu.mesh import TexturedMesh, uv_sphere_mesh
from worldrenderer_tpu.render import render

UV_SIZE = 128
VIEW_RES = 128
N_VIEWS = 6


@pytest.fixture(scope="module")
def sphere_mesh():
    verts, faces, uv = uv_sphere_mesh(33, 65)
    # Checkerboard texture so projection errors are visible.
    yy, xx = np.meshgrid(np.arange(UV_SIZE), np.arange(UV_SIZE), indexing="ij")
    checker = (((yy // 16) + (xx // 16)) % 2).astype(np.float32)
    tex = np.stack([checker, 1.0 - checker, np.full_like(checker, 0.5)], axis=-1)
    return TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.asarray(tex),
    )


@pytest.fixture(scope="module")
def cameras():
    return get_camera(
        elevation_deg=15.0,
        distance=3.0,
        fovy_deg=45.0,
        num_views=N_VIEWS,
        near=0.1,
        far=10.0,
    )


@pytest.fixture(scope="module")
def pre(sphere_mesh):
    return uv_precompute(sphere_mesh, height=UV_SIZE, width=UV_SIZE)


def test_uv_precompute_coverage(pre):
    mask = np.asarray(pre.uv_mask)
    # The UV sphere parameterization covers nearly the full UV square.
    assert mask.mean() > 0.9
    pos = np.asarray(pre.uv_pos)
    r = np.linalg.norm(pos[mask], axis=-1)
    # Covered texels lie on the unit sphere (within triangle flatness error).
    assert np.percentile(np.abs(r - 1.0), 95) < 0.02


def test_uv_render_geometry_consistency(sphere_mesh, cameras, pre):
    geo = uv_render_geometry(
        sphere_mesh,
        cameras,
        view_height=VIEW_RES,
        view_width=VIEW_RES,
        uv_precompute_output=pre,
        compute_depth_grad=True,
        depth_grad_dilation=3,
    )
    # Visible-from-front texels should have tiny reprojection error
    # (uv.py:162 semantics). Check against validity strategy output.
    valid = SimpleUVValidityStrategy(pos_error_eps=2e-2, aoi_cos_thresh=0.3)(
        pre, geo, None
    )
    valid = np.asarray(valid)
    assert valid.shape == (N_VIEWS, UV_SIZE, UV_SIZE)
    # Each view sees a meaningful chunk of the sphere's UV area...
    assert valid.any(axis=(1, 2)).all()
    # ...and together the views cover most of the chart (polar texels with
    # grazing aoi are legitimately excluded by the 0.3 cos threshold).
    coverage = valid.any(axis=0).mean() / np.asarray(pre.uv_mask).mean()
    assert coverage > 0.65
    # aoi cos within [0, 1]
    aoi = np.asarray(geo.uv_aoi_cos)
    assert aoi.min() >= 0.0 and aoi.max() <= 1.0 + 1e-6


@pytest.mark.slow
def test_projection_roundtrip(sphere_mesh, cameras):
    """Render views with the known texture, bake them back, compare."""
    views = render(
        sphere_mesh,
        cameras,
        VIEW_RES,
        VIEW_RES,
        render_attr=True,
        render_depth=False,
        render_normal=False,
        attr_background=0.0,
    )
    out = camera_projection(
        images=views.attr,
        masks=views.mask.astype(jnp.float32),
        mesh=sphere_mesh,
        cam=cameras,
        uv_size=UV_SIZE,
        poisson_blending=False,
        iou_rejection_threshold=0.99,  # rendered masks match exactly
        aoi_cos_valid_threshold=0.4,
        depth_grad_threshold=None,
        uv_padding=True,
    )
    assert out is not None
    baked = np.asarray(out.uv_proj)
    orig = np.asarray(sphere_mesh.texture)
    m = np.asarray(out.uv_proj_mask)
    assert m.mean() > 0.3
    err = np.abs(baked - orig)[m]
    # Median error small; mean bounded (checker edges blur under resampling).
    assert np.median(err) < 0.06
    assert err.mean() < 0.15


@pytest.mark.slow  # ~30-65 s compile-bound; full-lane only
def test_iou_rejection(sphere_mesh, cameras):
    views = render(
        sphere_mesh, cameras, VIEW_RES, VIEW_RES,
        render_attr=True, render_depth=False, render_normal=False,
    )
    bad_masks = jnp.zeros((N_VIEWS, VIEW_RES, VIEW_RES), jnp.float32)
    bad_masks = bad_masks.at[:, :8, :8].set(1.0)
    out = camera_projection(
        images=views.attr,
        masks=bad_masks,
        mesh=sphere_mesh,
        cam=cameras,
        uv_size=UV_SIZE,
        poisson_blending=False,
        iou_rejection_threshold=0.8,
    )
    assert out is None


def test_uv_blend_without_attr(sphere_mesh, cameras, pre):
    geo = uv_render_geometry(
        sphere_mesh, cameras, VIEW_RES, VIEW_RES, uv_precompute_output=pre
    )
    out = uv_blend(pre, geo, None)
    assert out.uv_attr_blend is None
    w = np.asarray(out.uv_blend_weight)
    # Linear normalization: weights sum to ~1 where any view valid, 0 elsewhere.
    s = w.sum(axis=0)
    anyv = np.asarray(out.uv_valid_mask_blend)
    np.testing.assert_allclose(s[anyv], 1.0, atol=1e-3)


@pytest.mark.parametrize("pb_solver", ["jacobi", "multigrid", "cropped"])
def test_uv_blend_pb_solver_variants(sphere_mesh, cameras, pb_solver):
    """Poisson seam blending through each solver backend produces a finite
    texture close to the exact-jacobi result."""
    views = render(
        sphere_mesh, cameras, VIEW_RES, VIEW_RES, render_attr=True,
        render_depth=False, render_normal=False, attr_background=0.0,
    )
    pre = uv_precompute(sphere_mesh, UV_SIZE, UV_SIZE)
    geo = uv_render_geometry(sphere_mesh, cameras, VIEW_RES, VIEW_RES, pre)
    attr = uv_render_attr(views.attr, geo)
    kwargs = dict(
        uv_precompute_output=pre,
        uv_render_geometry_output=geo,
        uv_render_attr_output=attr,
        poisson_blending=True,
        pb_num_iters=60,
    )
    ref = uv_blend(pb_solver="jacobi", **kwargs).uv_attr_blend
    out = uv_blend(pb_solver=pb_solver, **kwargs).uv_attr_blend
    assert np.isfinite(np.asarray(out)).all()
    if pb_solver == "cropped":
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    else:
        assert np.abs(np.asarray(out) - np.asarray(ref)).mean() < 0.05


@pytest.mark.slow
def test_uv_precompute_fast_path_matches_classic():
    """At atlas scale (T >= sort_pairs threshold) uv_precompute routes
    through the fused G-buffer (v_pos interpolated over t_pos_idx via
    tri_attr, no per-pixel gathers); it must match the classic
    rasterize+interpolate route."""
    import numpy as np

    from worldrenderer_tpu.baking import uv_precompute
    from worldrenderer_tpu.mesh import TexturedMesh, uv_sphere_mesh
    from worldrenderer_tpu.ops.rasterize import RasterizerConfig

    verts, faces, uv = uv_sphere_mesh(65, 129)  # 16k tris
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.zeros((64, 64, 3), jnp.float32),
    )
    fast = uv_precompute(mesh, 128, 128)
    classic = uv_precompute(
        mesh, 128, 128, raster_config=RasterizerConfig(bin_mode="argsort")
    )
    m_f = np.asarray(fast.uv_mask)
    m_c = np.asarray(classic.uv_mask)
    assert (m_f != m_c).mean() < 0.002  # edge tie-breaks only
    both = m_f & m_c
    err = np.abs(np.asarray(fast.uv_pos)[both] - np.asarray(classic.uv_pos)[both]).max()
    assert err < 1e-4, err


def test_projection_validates_lossy_binning(sphere_mesh, cameras):
    """A config whose budgets are too small for the scene fails loudly
    instead of silently dropping triangles (VERDICT r1 item 4)."""
    from worldrenderer_tpu.ops.rasterize import RasterizerConfig

    views = render(
        sphere_mesh, cameras, VIEW_RES, VIEW_RES,
        render_attr=True, render_depth=False, render_normal=False,
    )
    bad = RasterizerConfig(
        max_tris_per_tile=8, bin_huge=1, bin_flat_cap_factor=1,
        bin_sort_pairs_min_tris=1,
    )
    with pytest.raises(ValueError, match="binning budgets are lossy"):
        camera_projection(
            images=views.attr, mesh=sphere_mesh, cam=cameras,
            uv_size=UV_SIZE, poisson_blending=False,
            iou_rejection_threshold=None, raster_config=bad,
        )
    # validate_binning=False accepts the lossy config (runs through).
    out = camera_projection(
        images=views.attr, mesh=sphere_mesh, cam=cameras,
        uv_size=UV_SIZE, poisson_blending=False,
        iou_rejection_threshold=None, raster_config=bad,
        validate_binning=False, uv_padding=False,
    )
    assert out is not None


def test_projection_auto_pack_bit_identical_for_quantized_images():
    """camera_projection's images_pack_mode='auto' byte-packs the view->UV
    gather for 255-quantized inputs; the baked texture must be bit-identical
    to the unpacked path (file-sourced frames are k/255 by construction)."""
    import numpy as np

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.baking.projection import camera_projection
    from worldrenderer_tpu.mesh import TexturedMesh, uv_sphere_mesh

    rng = np.random.default_rng(11)
    verts, faces, uv = uv_sphere_mesh(17, 33)
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.full((64, 64, 3), 0.25, jnp.float32),
    )
    cam = get_camera(
        elevation_deg=[15.0] * 3, distance=[2.5] * 3, fovy_deg=[45.0] * 3,
        azimuth_deg=[0.0, 120.0, 240.0],
    )
    frames = (
        rng.integers(0, 256, size=(3, 64, 64, 3)).astype(np.float32) / 255.0
    )
    kw = dict(
        uv_size=64, poisson_blending=False, iou_rejection_threshold=None,
        uv_padding=False,
    )
    base = camera_projection(
        jnp.asarray(frames), mesh, cam, images_pack_mode="none", **kw
    )
    auto = camera_projection(
        jnp.asarray(frames), mesh, cam, images_pack_mode="auto", **kw
    )
    np.testing.assert_array_equal(
        np.asarray(auto.uv_proj), np.asarray(base.uv_proj)
    )
    # Non-quantized images must auto-fall back to the unpacked gather.
    frames_f = rng.random((3, 64, 64, 3)).astype(np.float32)
    base_f = camera_projection(
        jnp.asarray(frames_f), mesh, cam, images_pack_mode="none", **kw
    )
    auto_f = camera_projection(
        jnp.asarray(frames_f), mesh, cam, images_pack_mode="auto", **kw
    )
    np.testing.assert_array_equal(
        np.asarray(auto_f.uv_proj), np.asarray(base_f.uv_proj)
    )


def test_fused_geo_attr_gather_bit_identical():
    """uv_render_geometry(sample_images=...) fuses the attr gather into the
    geometry row gather (the projection's dominant cost); outputs must be
    bit-identical to a separate uv_render_attr call — for f32 and packed
    images, with and without masks."""
    import numpy as np

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.baking.uv import (
        uv_precompute, uv_render_attr, uv_render_geometry,
    )
    from worldrenderer_tpu.mesh import TexturedMesh, uv_sphere_mesh

    rng = np.random.default_rng(5)
    verts, faces, uv = uv_sphere_mesh(17, 33)
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.full((32, 32, 3), 0.5, jnp.float32),
    )
    cam = get_camera(
        elevation_deg=[20.0] * 2, distance=[2.6] * 2, fovy_deg=[45.0] * 2,
        azimuth_deg=[30.0, 200.0],
    )
    pre = uv_precompute(mesh, 48, 48)
    imgs_q = jnp.asarray(
        rng.integers(0, 256, size=(2, 40, 40, 3)).astype(np.float32) / 255.0
    )
    masks = jnp.asarray((rng.random((2, 40, 40)) > 0.3).astype(np.float32))

    for pack in ("none", "u8"):
        for m in (None, masks):
            geo = uv_render_geometry(
                mesh, cam, 40, 40, pre, compute_depth_grad=True,
                depth_grad_dilation=3,
            )
            attr = uv_render_attr(
                imgs_q, geo, masks=m,
                pack_mode=pack if m is None else "none",
            )
            fused = uv_render_geometry(
                mesh, cam, 40, 40, pre, compute_depth_grad=True,
                depth_grad_dilation=3, sample_images=imgs_q,
                sample_masks=m, images_pack_mode=pack,
            )
            np.testing.assert_array_equal(
                np.asarray(fused.uv_pos_proj), np.asarray(geo.uv_pos_proj)
            )
            np.testing.assert_array_equal(
                np.asarray(fused.uv_aoi_cos), np.asarray(geo.uv_aoi_cos)
            )
            np.testing.assert_array_equal(
                np.asarray(fused.uv_depth_grad), np.asarray(geo.uv_depth_grad)
            )
            np.testing.assert_array_equal(
                np.asarray(fused.uv_attr_proj), np.asarray(attr.uv_attr_proj)
            )
            if m is not None:
                np.testing.assert_array_equal(
                    np.asarray(fused.uv_mask_proj),
                    np.asarray(attr.uv_mask_proj),
                )


def test_uv_blend_textureless_mesh_uses_empty_value():
    """A texture-less mesh (uv_attr None) must blend cleanly: unseen
    texels take empty_value instead of crashing on None arithmetic."""
    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.baking.uv import (
        uv_blend, uv_precompute, uv_render_attr, uv_render_geometry,
    )
    from worldrenderer_tpu.mesh import TexturedMesh, uv_sphere_mesh

    verts, faces, uv = uv_sphere_mesh(17, 33)
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=None,
    )
    cam = get_camera(
        elevation_deg=[20.0], distance=[2.6], fovy_deg=[45.0],
        azimuth_deg=[40.0],
    )
    pre = uv_precompute(mesh, 48, 48)
    geo = uv_render_geometry(mesh, cam, 40, 40, pre)
    views = jnp.full((1, 40, 40, 3), 0.75, jnp.float32)
    attr = uv_render_attr(views, geo)
    out = uv_blend(pre, geo, attr, do_uv_padding=False, empty_value=0.25)
    a = np.asarray(out.uv_attr_blend)
    assert np.isfinite(a).all()
    unseen = ~np.asarray(out.uv_valid_mask_blend)
    assert unseen.any() and np.allclose(a[unseen], 0.25)


def test_uv_render_geometry_masks_without_images():
    """sample_masks without sample_images must still produce uv_mask_proj
    (previously silently dropped)."""
    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.baking.uv import uv_precompute, uv_render_geometry
    from worldrenderer_tpu.mesh import TexturedMesh, uv_sphere_mesh

    verts, faces, uv = uv_sphere_mesh(17, 33)
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.full((48, 48, 3), 0.5, jnp.float32),
    )
    cam = get_camera(
        elevation_deg=[20.0], distance=[2.6], fovy_deg=[45.0],
        azimuth_deg=[40.0],
    )
    pre = uv_precompute(mesh, 48, 48)
    masks = jnp.ones((1, 40, 40), jnp.float32)
    geo = uv_render_geometry(mesh, cam, 40, 40, pre, sample_masks=masks)
    assert geo.uv_mask_proj is not None
    assert geo.uv_mask_proj.shape == (1, 48, 48)
    assert float(geo.uv_mask_proj.max()) == 1.0


def test_iou_rejection_defined_under_jit():
    """jax.jit(camera_projection with masks) must have defined behavior:
    the IoU rejection is a host decision, so under tracing it is skipped
    with a warning instead of crashing with a TracerError (VERDICT r2 #7).
    Eagerly, the same garbage masks still reject (return None)."""
    import jax

    verts, faces, uv = uv_sphere_mesh(17, 33)
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.full((32, 32, 3), 0.5, jnp.float32),
    )
    cam = get_camera(
        elevation_deg=[20.0, 20.0], distance=[2.6, 2.6],
        fovy_deg=[45.0, 45.0], azimuth_deg=[0.0, 180.0],
    )
    frames = jnp.full((2, 32, 32, 3), 0.25, jnp.float32)
    # Masks that disagree completely with the silhouettes -> eager reject.
    bad_masks = jnp.zeros((2, 32, 32), jnp.float32)
    kw = dict(
        uv_size=32, poisson_blending=False, uv_padding=False,
        iou_rejection_threshold=0.8,
    )
    assert camera_projection(frames, mesh, cam, masks=bad_masks, **kw) is None

    # Under jit the rejection is skipped (warning) and a texture comes back.
    def fn(imgs, msks):
        out = camera_projection(imgs, mesh, cam, masks=msks, **kw)
        return out.uv_proj

    baked = jax.jit(fn)(frames, bad_masks)
    assert baked.shape == (32, 32, 3)
    assert bool(jnp.isfinite(baked).all())


def test_auto_validity_bounds_scale_invariant():
    """pos_error_eps / depth_grad_threshold are WORLD-unit bounds; 'auto'
    scales them to each view's pixel footprint, so a uniformly scaled
    scene (positions, camera distance, clip planes x10) must bake the
    IDENTICAL texel mask — while the reference-parity constants, tuned
    for unit-normalized meshes, collapse at native scales."""
    from worldrenderer_tpu.baking.projection import camera_projection
    from worldrenderer_tpu.mesh import uv_sphere_mesh

    verts, faces, uv = uv_sphere_mesh(17, 33)
    tex = np.full((64, 64, 3), 0.25, np.float32)

    def scene(scale):
        mesh = TexturedMesh(
            v_pos=jnp.asarray(verts * scale, jnp.float32),
            t_pos_idx=jnp.asarray(faces, jnp.int32),
            v_tex=jnp.asarray(uv, jnp.float32),
            t_tex_idx=jnp.asarray(faces, jnp.int32),
            texture=jnp.asarray(tex),
        )
        cam = get_camera(
            elevation_deg=[15.0] * 4, distance=[2.6 * scale] * 4,
            fovy_deg=[45.0] * 4, azimuth_deg=[0.0, 90.0, 180.0, 270.0],
            near=0.1 * scale, far=10.0 * scale,
        )
        return mesh, cam

    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, size=(4, 48, 48, 3)).astype(np.float32) / 255.0
    kw = dict(uv_size=64, poisson_blending=False, iou_rejection_threshold=None,
              pos_error_eps="auto", depth_grad_threshold="auto")
    masks = {}
    for s in (1.0, 10.0):
        mesh, cam = scene(s)
        out = camera_projection(frames, mesh, cam, **kw)
        masks[s] = np.asarray(out.uv_proj_mask)
    assert masks[1.0].mean() > 0.2
    # Not bit-equal: scaling positions x10 perturbs fp rounding, so a few
    # borderline texels flip; agreement must still be essentially total.
    agree = (masks[1.0] == masks[10.0]).mean()
    assert agree > 0.995, agree

    # The absolute default at 10x scale rejects everything — the hazard
    # 'auto' exists for.
    mesh, cam = scene(10.0)
    out = camera_projection(
        frames, mesh, cam, uv_size=64, poisson_blending=False,
        iou_rejection_threshold=None,
    )
    assert np.asarray(out.uv_proj_mask).mean() < 0.01

    # The texel-sharded bake resolves 'auto' INSIDE the sharded program
    # (from the replicated view render) — same bounds, same mask, same
    # texture as the eager path, at native (10x) scale where the absolute
    # defaults reject everything (VERDICT r4 item 4).
    from worldrenderer_tpu.parallel import make_device_mesh

    eager = camera_projection(frames, mesh, cam, **kw)
    sharded = camera_projection(
        frames, mesh, cam, device_mesh=make_device_mesh(axis_names=("uv",)),
        **kw,
    )
    np.testing.assert_array_equal(
        np.asarray(sharded.uv_proj_mask), np.asarray(eager.uv_proj_mask)
    )
    np.testing.assert_allclose(
        np.asarray(sharded.uv_proj), np.asarray(eager.uv_proj), atol=1e-5
    )
    assert np.asarray(sharded.uv_proj_mask).mean() > 0.2

    # Anything that is neither float nor 'auto' (e.g. a per-view array)
    # fails loudly BEFORE reaching the lru_cache'd builder.
    with pytest.raises(ValueError, match="pos_error_eps"):
        camera_projection(
            frames, mesh, cam,
            device_mesh=make_device_mesh(axis_names=("uv",)),
            uv_size=64, poisson_blending=False, iou_rejection_threshold=None,
            pos_error_eps=jnp.ones((4, 1, 1)),
        )

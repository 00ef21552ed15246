"""The committed real-scene fixture (VERDICT r3 missing #3): a
town.blend-class GLB — multiple materials, seamed UVs, non-unit scale —
plus a 100-frame flythrough camera path in the reference's
camera_path.json schema (reference test/README.md:15-91). Every other
mesh fixture in this suite is synthetic and unified-topology by
construction; this one exercises the load path real exported scenes take.

Regenerate with tools/make_town_fixture.py (deterministic).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldrenderer_tpu.mesh import load_mesh
from worldrenderer_tpu.render import render
from worldrenderer_tpu.scene.camera_json import load_camera_from_json

DATA = Path(__file__).parent / "data"
GLB = DATA / "town.glb"
CAM_JSON = DATA / "town_camera_path.json"


def test_town_fixture_properties():
    """The fixture has the load-bearing town.blend properties and the
    loader handles them: multi-material -> strip atlas, seam-duplicated
    vertices, non-unit world scale, 100 scaled-rotation camera frames."""
    from worldrenderer_tpu.scene.gltf import load_glb, parse_glb

    gltf = parse_glb(GLB).gltf
    assert len(gltf["materials"]) >= 3
    assert len(gltf["meshes"][0]["primitives"]) >= 3
    assert "matrix" in gltf["nodes"][0]  # non-identity node transform

    parsed = load_glb(GLB)
    # Strip atlas packs the 3 material textures side by side.
    assert parsed["texture"] is not None
    h, w, _ = parsed["texture"].shape
    assert w == 3 * 256 and h == 256
    # Seams: box-unwrapped faces duplicate corner positions.
    uniq = np.unique(np.round(parsed["vertices"], 6), axis=0)
    assert len(uniq) < 0.8 * len(parsed["vertices"])
    # Non-unit scale: the scene spans >> a unit cube.
    ext = parsed["vertices"].max(0) - parsed["vertices"].min(0)
    assert ext.max() > 10.0

    cam, near, far = load_camera_from_json(CAM_JSON, 120, 180)
    assert cam.c2w.shape[0] == 100
    assert 0 < near < far
    # Blender-style exported scale on the rotation part (|R col| ~ 0.6).
    rot = np.asarray(cam.c2w)[:, :3, :3]
    scale = np.linalg.norm(rot[:, :, 0], axis=-1)
    assert np.allclose(scale, 0.6, atol=1e-3)
    # w2c really inverts c2w despite the scale.
    ident = np.einsum("nij,njk->nik", np.asarray(cam.w2c), np.asarray(cam.c2w))
    np.testing.assert_allclose(
        ident, np.broadcast_to(np.eye(4), ident.shape), atol=1e-4
    )


def test_town_fixture_renders():
    """A few path frames render with sane coverage and finite buffers
    (the seam-cut + atlas-sampling path real GLBs take)."""
    mesh = load_mesh(str(GLB), flip_uv=True)
    assert mesh.texture is not None and mesh.v_tex is not None
    cam, _, _ = load_camera_from_json(CAM_JSON, 120, 180)
    sel = jax.tree_util.tree_map(lambda x: x[::25], cam)
    out = render(
        mesh, sel, 120, 180, render_attr=True, render_depth=True,
        attr_background=0.7,
    )
    cov = np.asarray(out.mask).mean(axis=(1, 2))
    assert (cov > 0.15).all() and (cov < 0.95).all(), cov
    assert np.isfinite(np.asarray(out.attr)).all()
    assert np.isfinite(np.asarray(out.depth)).all()
    # The atlas cells actually show: wall tan, roof red, lit windows —
    # attr must span a real color range, not one cell's constant.
    a = np.asarray(out.attr)
    fg = np.asarray(out.mask)[..., None] & np.ones_like(a, bool)
    assert a[fg].std() > 0.1


def test_town_fixture_backface_cull_invariance():
    """The driver's town bench metric renders with backface_cull=-1
    (bench.py bench_town). The fixture is NOT watertight (open parts),
    so the documented opt-in contract rests on an empirical property:
    along the committed camera path no open part is ever seen from
    behind. Pin it — anyone regenerating the fixture with a back-visible
    open part (a billboard, an inverted roof) must fail HERE, not
    silently corrupt the every-round driver number. Budget: mask
    identical; id flips (shared-edge silhouette ties) under 0.05% of
    common foreground; z close elsewhere."""
    import functools

    from worldrenderer_tpu.ops.gbuffer import rasterize_gbuffer
    from worldrenderer_tpu.ops.rasterize import auto_fast_config
    from worldrenderer_tpu.transforms import get_clip_space_position

    res_h, res_w = 120, 180
    mesh = load_mesh(str(GLB), flip_uv=True)
    cam, _, _ = load_camera_from_json(CAM_JSON, res_h, res_w)
    sel = jax.tree_util.tree_map(lambda x: x[::20], cam)  # 5 frames
    pos_clip = get_clip_space_position(mesh.v_pos, sel.mvp_mtx)
    outs = {}
    for bf in (0, -1):
        cfg = auto_fast_config(
            pos_clip, mesh.t_pos_idx, (res_h, res_w), backface_cull=bf
        )
        outs[bf] = jax.jit(functools.partial(
            rasterize_gbuffer, resolution=(res_h, res_w),
            config=cfg._replace(dot_precision="highest"),
        ))(pos_clip, mesh.t_pos_idx, None)
    a, b = outs[0], outs[-1]
    assert int((a.mask != b.mask).sum()) == 0, "cull changed coverage"
    both = np.asarray(a.mask & b.mask)
    flips = int(((np.asarray(a.tri_id) != np.asarray(b.tri_id)) & both).sum())
    fg = int(both.sum())
    assert flips <= max(16, fg // 2000), (flips, fg)
    same = both & (np.asarray(a.tri_id) == np.asarray(b.tri_id))
    zdiff = np.abs(np.asarray(a.z) - np.asarray(b.z))[same]
    assert zdiff.max() < 1e-5, zdiff.max()


@pytest.mark.slow
def test_town_fixture_bake_roundtrip(tmp_path):
    """The full pipeline loop on the fixture: keyframe-extract views from
    the 100-frame path, render them from the original multi-material
    atlas, RE-UV the scene with the native uvatlas parameterizer (shared
    atlas cells are many-faces-per-texel — exactly why real pipelines
    unwrap first; reference mesh_process.py uv_unwarp), bake the views
    onto the fresh chart atlas, re-render, compare."""
    from worldrenderer_tpu.baking.projection import camera_projection
    from worldrenderer_tpu.meshproc import uv_parameterize_uvatlas
    from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG, auto_fast_config
    from worldrenderer_tpu.scene.keyframe import get_keyframes
    from worldrenderer_tpu.transforms import get_clip_space_position

    res_h, res_w = 144, 216
    uv_size = 256
    mesh = load_mesh(str(GLB), flip_uv=True)
    cam, _, _ = load_camera_from_json(CAM_JSON, res_h, res_w)
    keys = get_keyframes(CAM_JSON, num_views=100, t_position=2.0, t_rotation=12.0)
    assert 3 <= len(keys) <= 24, keys
    sel = jax.tree_util.tree_map(lambda x: x[np.asarray(keys)], cam)

    views = render(
        mesh, sel, res_h, res_w, render_attr=True, attr_background=0.0,
    )

    # Fresh per-corner chart UVs (split topology, like every unwrap).
    corner_uv = uv_parameterize_uvatlas(
        np.asarray(mesh.v_pos, np.float64), np.asarray(mesh.t_pos_idx),
        size=uv_size,
    )
    n_f = corner_uv.shape[0]
    mesh2 = mesh._replace(
        v_tex=jnp.asarray(corner_uv.reshape(-1, 2), jnp.float32),
        t_tex_idx=jnp.asarray(
            np.arange(n_f * 3, dtype=np.int32).reshape(n_f, 3)
        ),
        texture=jnp.zeros((uv_size, uv_size, 3), jnp.float32),
    )

    # Budgets sized for BOTH rasterizations (bench._projection_auto_cfg
    # pattern): the chart-atlas pass and the view renders.
    pos_clip = get_clip_space_position(mesh2.v_pos, sel.mvp_mtx)
    uv_clip = mesh2.v_tex * 2.0 - 1.0
    uv_clip4 = jnp.concatenate(
        [uv_clip, jnp.zeros_like(uv_clip[..., :1]),
         jnp.ones_like(uv_clip[..., :1])], axis=-1,
    )[None]
    cfg = auto_fast_config(
        uv_clip4, mesh2.t_tex_idx, (uv_size, uv_size), base=FAST_TPU_CONFIG,
        extra_probes=[(pos_clip, mesh2.t_pos_idx, (res_h, res_w))],
    )

    # pos_error_eps / depth_grad_threshold are in WORLD units: the
    # defaults (1e-3 / 0.1) assume the reference's unit-cube load
    # normalization; this scene keeps its real ~15-unit scale, so size
    # both to the view-pixel world footprint (depth ~13 * 2 tan(30) /
    # 144 rows ~ 0.1 world units per pixel): ~1.5 footprints for the
    # reprojection bound, ~10 for the discontinuity cut (real occlusion
    # edges here jump by meters).
    out = camera_projection(
        views.attr, mesh2, sel,
        uv_size=uv_size, poisson_blending=False,
        iou_rejection_threshold=None, from_scratch=True, uv_padding=True,
        raster_config=cfg, pos_error_eps=0.15, depth_grad_threshold=1.0,
        depth_grad_dilation=1,  # 5 px of edge margin erases a 15-px house
    )
    assert out is not None and np.isfinite(np.asarray(out.uv_proj)).all()
    # A real share of the CHART texels got painted (the atlas is ~40%
    # occupied; aerial keyframes can never see away-facing walls, so the
    # meaningful ratio is painted/occupied).
    from worldrenderer_tpu.baking import uv_precompute

    occupancy = float(
        np.asarray(uv_precompute(mesh2, uv_size, uv_size).uv_mask).mean()
    )
    painted = float(np.asarray(out.uv_proj_mask).mean())
    assert painted > 0.2 * occupancy, (painted, occupancy)

    # Re-render with the baked chart atlas and compare — but only where
    # the surface texel was actually painted (a render of the bake mask
    # itself gives per-pixel bakedness; unpainted texels hold the empty
    # value and would drown the comparison).
    baked = mesh2._replace(texture=out.uv_proj)
    re = render(baked, sel, res_h, res_w, render_attr=True, attr_background=0.0)
    bakedness = render(
        mesh2._replace(
            texture=jnp.repeat(
                np.asarray(out.uv_proj_mask, np.float32)[..., None], 3, -1
            )
        ),
        sel, res_h, res_w, render_attr=True, attr_background=0.0,
        texture_filter_mode="nearest",
    ).attr[..., 0]
    m = (
        np.asarray(views.mask) & np.asarray(re.mask)
        & (np.asarray(bakedness) > 0.5)
    )
    assert m.mean() > 0.02, m.mean()
    diff = np.abs(np.asarray(re.attr) - np.asarray(views.attr))[m]
    assert diff.mean() < 0.15, diff.mean()


@pytest.mark.slow
def test_project_render_cli_on_fixture(tmp_path):
    """The main application CLI (reference pipeline.py / pipeline_opt.py)
    driven end-to-end on the committed real-scene fixture: footage mp4 +
    Blender-schema camera path -> keyframe selection -> native re-UV ->
    texture bake -> trajectory re-render. pos_error_eps='auto' is the
    load-bearing option: the scene keeps its ~15-world-unit scale."""
    cv2 = pytest.importorskip("cv2")
    from worldrenderer_tpu.pipelines.project_render import project_and_render

    res_h, res_w = 120, 180
    n_frames = 8
    mesh = load_mesh(str(GLB), flip_uv=True)
    cam, _, _ = load_camera_from_json(CAM_JSON, res_h, res_w)
    sel = jax.tree_util.tree_map(lambda x: x[:n_frames], cam)
    frames = np.asarray(
        render(mesh, sel, res_h, res_w, render_attr=True,
               attr_background=0.0).attr
    )
    video = tmp_path / "footage.mp4"
    writer = cv2.VideoWriter(
        str(video), cv2.VideoWriter_fourcc(*"mp4v"), 10, (res_w, res_h)
    )
    for f in frames:
        writer.write(cv2.cvtColor(
            (np.clip(f, 0, 1) * 255).astype(np.uint8), cv2.COLOR_RGB2BGR
        ))
    writer.release()

    out_dir = tmp_path / "out"
    project_and_render(
        mesh_path=GLB,
        video_path=video,
        output_dir=out_dir,
        height=res_h, width=res_w,
        uv_size=128,
        max_frames=n_frames,
        camera_json=CAM_JSON,
        uv_unwarp=False,  # native re-UV covered by the roundtrip test
        keyframe_selection=True,
        keyframe_t_position=1.0, keyframe_t_rotation=8.0,
        debug=True,
        pos_error_eps="auto",
    )
    assert (out_dir / "rgb" / "rgb_00000.png").exists()
    assert (out_dir / "mask" / "mask_00000.png").exists()
    assert (out_dir / "debug" / "uv_proj.png").exists()
    from PIL import Image

    rgb = np.asarray(
        Image.open(out_dir / "rgb" / "rgb_00000.png"), np.float32
    ) / 255.0
    mask = np.asarray(Image.open(out_dir / "mask" / "mask_00000.png")) > 0
    assert mask.mean() > 0.2
    err = np.abs(rgb - frames[0])[mask]
    assert np.median(err) < 0.15, np.median(err)

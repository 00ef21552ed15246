"""Contract tests for the three pluggable neural-model hooks (VERDICT r3
missing #2): the SmartPainter inpainter, the TexturePipeline upscaler, and
the camera_projection background segmenter. The reference plugs real
networks into these seams (reference smart_paint.py:272-276,
test/utils/pipeline_texture.py:140-161, seg.py:18-38); here deterministic
fakes RECORD what they are handed and return contract-shaped outputs, so
any drift in the (Nv, H, W, C) / mask dataflow surfaces in CI instead of
when a user first loads real weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from worldrenderer_tpu import get_camera
from worldrenderer_tpu.baking.projection import camera_projection
from worldrenderer_tpu.baking.seg import SegmentationModel
from worldrenderer_tpu.baking.smart_paint import SmartPainter
from worldrenderer_tpu.mesh import TexturedMesh, uv_sphere_mesh
from worldrenderer_tpu.render import render

RES = 96
UV = 64
N_VIEWS = 4


@pytest.fixture(scope="module")
def sphere_scene():
    verts, faces, uv = uv_sphere_mesh(17, 33)
    yy, xx = np.meshgrid(np.arange(UV), np.arange(UV), indexing="ij")
    tex = np.stack(
        [
            ((yy // 8 + xx // 8) % 2).astype(np.float32),
            (xx / UV).astype(np.float32),
            (yy / UV).astype(np.float32),
        ],
        axis=-1,
    )
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.asarray(tex),
    )
    cam = get_camera(
        elevation_deg=10.0, distance=3.0, fovy_deg=45.0, num_views=N_VIEWS,
        near=0.1, far=10.0,
    )
    views = render(
        mesh, cam, RES, RES, render_attr=True, attr_background=0.0,
    )
    return mesh, cam, views


# -- segmenter hook ----------------------------------------------------------


class _FakeSegmenter(SegmentationModel):
    """Deterministic matte: foreground = pixels that differ from the 0.0
    render background. Records every call's input contract."""

    def __init__(self):
        self.calls = []

    def __call__(self, images):
        images = jnp.asarray(images)
        self.calls.append(
            {"shape": tuple(images.shape), "dtype": str(images.dtype),
             "min": float(images.min()), "max": float(images.max())}
        )
        assert images.ndim == 4 and images.shape[-1] == 3
        fg = (jnp.abs(images).sum(-1) > 1e-4).astype(jnp.float32)
        return fg[..., None]  # (Nv, H, W, 1) — the documented matte shape


def test_segmenter_hook_contract(sphere_scene):
    mesh, cam, views = sphere_scene
    seg = _FakeSegmenter()
    out = camera_projection(
        views.attr, mesh, cam,
        remove_bg=True, bg_remover=seg,
        iou_rejection_threshold=0.8,
        poisson_blending=False, uv_size=UV,
    )
    # The hook ran once, on float images in [0, 1], full view batch.
    assert len(seg.calls) == 1
    c = seg.calls[0]
    assert c["shape"] == (N_VIEWS, RES, RES, 3)
    assert "float32" in c["dtype"]
    assert 0.0 <= c["min"] and c["max"] <= 1.0 + 1e-6
    # The matte agreed with the rendered silhouettes -> IoU accepts and the
    # bake is produced.
    assert out is not None and out.uv_proj is not None
    assert out.uv_proj.shape == (UV, UV, 3)
    assert np.isfinite(np.asarray(out.uv_proj)).all()


class _WrongSegmenter(SegmentationModel):
    """Matte that disagrees with the silhouettes (all-foreground)."""

    def __call__(self, images):
        return jnp.ones(jnp.asarray(images).shape[:3] + (1,), jnp.float32)


def test_segmenter_iou_rejection(sphere_scene):
    """Failure-detection dataflow: a matte that disagrees with the rendered
    silhouettes trips the IoU rejection and the projection returns None
    (reference projection.py IoU contract)."""
    mesh, cam, views = sphere_scene
    out = camera_projection(
        views.attr, mesh, cam,
        remove_bg=True, bg_remover=_WrongSegmenter(),
        iou_rejection_threshold=0.8,
        poisson_blending=False, uv_size=UV,
    )
    assert out is None


# -- upscaler hook -----------------------------------------------------------


def test_upscaler_hook_contract_unit():
    """TexturePipeline.maybe_upscale_image hands the hook the raw (Nv, H,
    W, C) view batch and trusts its output shape (the spandrel contract:
    reference pipeline_texture.py:140-161 feeds view images through the
    network and continues with the enlarged frames)."""
    from worldrenderer_tpu.pipelines.texture_pipeline import TexturePipeline

    calls = []

    def fake_upscaler(images):
        calls.append((tuple(images.shape), str(images.dtype)))
        return jax.image.resize(
            images, (images.shape[0], images.shape[1] * 2,
                     images.shape[2] * 2, images.shape[3]),
            method="bilinear",
        )

    tp = TexturePipeline(upscaler=fake_upscaler)
    x = jnp.linspace(0, 1, 4 * 16 * 16 * 3, dtype=jnp.float32).reshape(
        4, 16, 16, 3
    )
    y = tp.maybe_upscale_image(x, upscale=True, factor=2)
    assert calls == [((4, 16, 16, 3), "float32")]
    assert y.shape == (4, 32, 32, 3)
    # upscale=False bypasses the hook entirely.
    y2 = tp.maybe_upscale_image(x, upscale=False, factor=2)
    assert y2 is x and len(calls) == 1
    # Default (no hook): weightless resize fallback, same contract shape.
    y3 = TexturePipeline().maybe_upscale_image(x, upscale=True, factor=2)
    assert y3.shape == (4, 32, 32, 3)


@pytest.mark.slow
def test_upscaler_hook_e2e(tmp_path):
    """The view_upscale config path drives the hook inside the full
    pipeline and the bake consumes the enlarged views."""
    from worldrenderer_tpu.pipelines import ModProcessConfig, TexturePipeline
    from worldrenderer_tpu.scene.camera_json import save_camera_json
    from worldrenderer_tpu.scene.gltf import save_glb
    from worldrenderer_tpu.mesh import load_mesh

    verts, faces, uv = uv_sphere_mesh(17, 33)
    tex = np.full((UV, UV, 3), 0.5, np.float32)
    glb = tmp_path / "scene.glb"
    save_glb(glb, verts.astype(np.float32), faces.astype(np.uint32),
             uv=uv, texture=tex)
    cam = get_camera(
        elevation_deg=10.0, distance=3.0, fovy_deg=45.0, num_views=N_VIEWS,
        near=0.1, far=10.0,
    )
    cam_json = tmp_path / "camera.json"
    save_camera_json(cam_json, np.asarray(cam.c2w), 45.0, 0.1, 10.0)
    mesh = load_mesh(str(glb), flip_uv=True)
    views = render(mesh, cam, RES, RES, render_attr=True, attr_background=0.0)

    calls = []

    def fake_upscaler(images):
        calls.append(tuple(images.shape))
        return jnp.repeat(jnp.repeat(images, 2, axis=1), 2, axis=2)

    tp = TexturePipeline(upscaler=fake_upscaler)
    out = tp(
        mesh_path=str(glb),
        save_dir=str(tmp_path),
        save_name="upscale_e2e",
        uv_size=UV,
        rgb_tensor=views.attr,
        rgb_process_config=ModProcessConfig(
            inpaint_mode="uv", view_upscale=True, view_upscale_factor=2,
        ),
        camera_projection_type="CUSTOM",
        custom_camera_json=str(cam_json),
    )
    assert calls and calls[0] == (N_VIEWS, RES, RES, 3)
    assert out.uv_proj_rgb is not None
    assert np.isfinite(np.asarray(out.uv_proj_rgb)).all()


# -- inpainter hook ----------------------------------------------------------


def test_inpainter_hook_contract(sphere_scene):
    """SmartPainter hands the hook ((H, W, C) image, (H, W) float mask) at
    inpaint_render_size and projects its output back (reference
    smart_paint.py:272-276). A thresh of 0 can never be reached, so the
    loop must exit at max_rounds — pinning the runaway-exit behavior."""
    mesh, cam, _ = sphere_scene
    tex = np.full((UV, UV, 3), 0.6, np.float32)
    inpaint_mask = np.zeros((UV, UV), bool)
    inpaint_mask[24:40, 24:40] = True
    tex[inpaint_mask] = 0.0

    calls = []

    def fake_inpaint(image, mask):
        calls.append(
            {"image": tuple(image.shape), "mask": tuple(mask.shape),
             "mask_dtype": str(mask.dtype),
             "mask_frac": float(jnp.asarray(mask).mean())}
        )
        # Paint the masked region a constant color.
        return jnp.where(
            jnp.asarray(mask)[..., None] > 0.5,
            jnp.float32(0.25),
            jnp.asarray(image),
        )

    painter = SmartPainter()
    size = 128
    out_tex, covered = painter(
        mesh._replace(texture=jnp.asarray(tex)),
        fake_inpaint,
        jnp.asarray(tex),
        jnp.asarray(inpaint_mask),
        max_view_score_thresh=0.0,  # unreachable -> exits at max_rounds
        min_rounds=1,
        max_rounds=2,
        uv_padding_end=False,
        score_render_size=64,
        inpaint_render_size=size,
    )
    assert len(calls) == 2  # max_rounds exit, not runaway
    for c in calls:
        assert c["image"] == (size, size, 3)
        assert c["mask"] == (size, size)
        assert "float" in c["mask_dtype"]
    assert out_tex.shape == (UV, UV, 3)
    assert np.isfinite(np.asarray(out_tex)).all()
    assert covered.shape == (UV, UV)

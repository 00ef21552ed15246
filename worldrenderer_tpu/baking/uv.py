"""UV-space rasterization + view->UV projection + multi-view blending.

Reference contracts: mvadapter/utils/mesh_utils/uv.py (uv_precompute:24-53,
uv_render_geometry:72-184, uv_render_attr:193-222, validity/weight
strategies:233-370, uv_blend:385-468). Strategy classes become NamedTuple
closures (hashable, jit-friendly); in-place torch mutations become
``jnp.where``; grid_sample becomes the pure-jnp gather in ops/grid_sample.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..camera import Camera, normalize
from ..mesh import TexturedMesh, with_normals
from ..ops import grid_sample, interpolate, rasterize
from ..ops.image import inpaint, max_pool2d, sobel_grad_magnitude
from ..ops.poisson import (
    poisson_blend,
    poisson_blend_cropped,
    poisson_blend_multigrid,
)
from ..ops.rasterize import DEFAULT_CONFIG, RasterizerConfig
from ..render import SimpleNormalization, render
from ..transforms import get_clip_space_position

__all__ = [
    "UVPrecomputeOutput",
    "UVRenderGeometryOutput",
    "UVRenderAttrOutput",
    "UVBlendOutput",
    "SimpleUVValidityStrategy",
    "ExponentialBlend",
    "RandomChoiceBlend",
    "uv_precompute",
    "uv_render_geometry",
    "UVViewGeometry",
    "uv_view_geometry",
    "uv_gather_geometry",
    "uv_render_attr",
    "uv_blend",
    "uv_blend_sum",
    "uv_blend_post",
    "uv_padding",
]


class UVPrecomputeOutput(NamedTuple):
    height: int
    width: int
    uv_attr: Optional[jnp.ndarray]  # (Huv, Wuv, C) current texture
    uv_mask: jnp.ndarray  # (Huv, Wuv) bool — inside a UV chart
    uv_pos: jnp.ndarray  # (Huv, Wuv, 3) world position per texel


def uv_precompute(
    mesh: TexturedMesh,
    height: int,
    width: int,
    raster_config: RasterizerConfig = DEFAULT_CONFIG,
) -> UVPrecomputeOutput:
    """Rasterize the mesh in UV space: UV coords as clip positions
    (reference uv.py:24-53) -> per-texel world position + chart mask."""
    if raster_config.backface_cull:
        # Backface culling is a 3D-facing concept; a UV chart's pixel-space
        # winding is set by the unwrap (and UV charts never pass through
        # the negated-Y projection), so a caller's watertight-scene cull
        # flag would silently erase charts from the atlas here. The atlas
        # pass always rasterizes both windings.
        raster_config = raster_config._replace(backface_cull=0)
    uv_clip = mesh.v_tex * 2.0 - 1.0
    uv_clip4 = jnp.concatenate(
        [
            uv_clip,
            jnp.zeros_like(uv_clip[..., :1]),
            jnp.ones_like(uv_clip[..., :1]),
        ],
        axis=-1,
    )
    if (
        raster_config.bin_mode == "sort_pairs"
        and mesh.t_tex_idx.shape[0] >= raster_config.bin_sort_pairs_min_tris
    ):
        # Atlas-scale fast path: ONE fused G-buffer pass interpolates v_pos
        # (over the t_pos_idx topology, tri_attr) while rasterizing the UV
        # atlas — no per-pixel plane/attribute gathers at uv_size 2048-4096.
        from ..ops.gbuffer import rasterize_gbuffer

        gb = rasterize_gbuffer(
            uv_clip4[None], mesh.t_tex_idx, mesh.v_pos, (height, width),
            raster_config, tri_attr=mesh.t_pos_idx,
        )
        uv_mask = gb.mask[0]
        uv_pos = gb.attr[0]
    else:
        rast = rasterize(
            uv_clip4[None], mesh.t_tex_idx, (height, width), raster_config
        )
        uv_mask = rast[0, :, :, 3] > 0
        uv_pos = interpolate(mesh.v_pos[None], rast, mesh.t_pos_idx)[0]
    return UVPrecomputeOutput(
        height=height,
        width=width,
        uv_attr=mesh.texture,
        uv_mask=uv_mask,
        uv_pos=uv_pos,
    )


class UVRenderGeometryOutput(NamedTuple):
    uv_pos_proj: jnp.ndarray  # (Nv, Huv, Wuv, 3) view positions sampled at texels
    uv_pos_error: jnp.ndarray  # (Nv, Huv, Wuv) reprojection error (occlusion test)
    uv_aoi_cos: jnp.ndarray  # (Nv, Huv, Wuv) angle-of-incidence cosine
    uv_pos_ndc: jnp.ndarray  # (Nv, Huv, Wuv, 2) NDC of each texel in each view
    view_mask: jnp.ndarray  # (Nv, H, W)
    view_normal: jnp.ndarray  # (Nv, H, W, 3)
    view_aoi_cos: jnp.ndarray  # (Nv, H, W)
    view_position: jnp.ndarray  # (Nv, H, W, 3)
    view_depth: jnp.ndarray  # (Nv, H, W)
    view_depth_grad: Optional[jnp.ndarray] = None
    uv_depth_grad: Optional[jnp.ndarray] = None
    view_attr: Optional[jnp.ndarray] = None
    # Filled when ``sample_images`` is given: the view->UV attribute gather
    # fused into THIS call's row gather (see uv_render_geometry docstring).
    uv_attr_proj: Optional[jnp.ndarray] = None
    uv_mask_proj: Optional[jnp.ndarray] = None


class UVViewGeometry(NamedTuple):
    """View-space half of :func:`uv_render_geometry` (texel-free): the
    rendered per-view maps every texel gathers from. Compute once, gather
    many — the texel-sharded/chunked bake hoists this out of its band loop
    so views are not re-rendered per texel chunk."""

    view_mask: jnp.ndarray
    view_normal: jnp.ndarray
    view_aoi_cos: jnp.ndarray
    view_position: jnp.ndarray
    view_depth: jnp.ndarray
    view_depth_grad: Optional[jnp.ndarray] = None
    view_attr: Optional[jnp.ndarray] = None


def uv_view_geometry(
    mesh: TexturedMesh,
    cam: Camera,
    view_height: int,
    view_width: int,
    compute_depth_grad: bool = False,
    depth_grad_dilation: int = 1,
    render_attr: bool = False,
    raster_config: RasterizerConfig = DEFAULT_CONFIG,
) -> UVViewGeometry:
    """Render the per-view G-buffers + derived maps (aoi-cos in camera
    space, dilated depth-gradient) that :func:`uv_gather_geometry` samples
    per texel. Reference uv.py:86-130."""
    mesh = with_normals(mesh)
    out = render(
        mesh,
        cam,
        view_height,
        view_width,
        render_attr=render_attr,
        render_depth=True,
        render_normal=True,
        depth_normalization_strategy=SimpleNormalization(
            scale=1.0, offset=0.0, clamp=False, bg_value=1e2
        ),
        raster_config=raster_config,
    )
    view_position = out.pos
    view_mask = out.mask
    view_normal = out.normal

    # Rotate normals into camera space; the torch row-broadcast at
    # uv.py:107-110 is normal @ R^T with R = w2c[:3, :3].
    view_normal_cs = jnp.einsum(
        "bhwj,bij->bhwi", view_normal, cam.w2c[:, :3, :3],
        precision=jax.lax.Precision.HIGHEST,
    )
    view_normal_cs = normalize(view_normal_cs)
    view_normal_cs = jnp.where(view_mask[..., None], view_normal_cs, view_normal)
    view_aoi_cos = jnp.clip(view_normal_cs[..., 2], 0.0, 1.0)

    view_depth = out.depth
    view_depth_grad = None
    if compute_depth_grad:
        view_depth_grad = sobel_grad_magnitude(view_depth)
        view_depth_grad = max_pool2d(view_depth_grad, depth_grad_dilation)

    return UVViewGeometry(
        view_mask=view_mask,
        view_normal=view_normal,
        view_aoi_cos=view_aoi_cos,
        view_position=view_position,
        view_depth=view_depth,
        view_depth_grad=view_depth_grad,
        view_attr=out.attr if render_attr else None,
    )


def uv_gather_geometry(
    view_geo: UVViewGeometry,
    cam: Camera,
    uv_precompute_output: UVPrecomputeOutput,
    grid_sample_mode: str = "bilinear",
    sample_images: Optional[jnp.ndarray] = None,
    sample_masks: Optional[jnp.ndarray] = None,
    images_pack_mode: str = "none",
) -> UVRenderGeometryOutput:
    """Texel-space half of :func:`uv_render_geometry`: project each texel's
    world position into every view and gather the view maps (and optional
    images/masks) at those coordinates. Row-local in the UV image — this is
    the piece the multi-chip bake shards / the chunked bake scans."""
    pre = uv_precompute_output
    batch_size = len(cam)
    height, width, _ = pre.uv_pos.shape
    compute_depth_grad = view_geo.view_depth_grad is not None

    uv_pos_clip = get_clip_space_position(
        pre.uv_pos.reshape(-1, 3), cam.mvp_mtx
    ).reshape(batch_size, height, width, 4)
    uv_pos_ndc = uv_pos_clip[..., :2] / uv_pos_clip[..., 3:4]

    # All view maps sample at the SAME ndc coords — fuse them into ONE
    # grid_sample call (gathers are row-count bound on TPU: one 4/5-channel
    # gather costs ~the same as one 1-channel gather, so separate calls pay
    # 3x the rows for nothing). sample_images/sample_masks ride the same
    # row gather as extra table columns (grid_sample_parts).
    stack = [view_geo.view_position, view_geo.view_aoi_cos[..., None]]
    if compute_depth_grad:
        stack.append(view_geo.view_depth_grad[..., None])
    n_geo = sum(s.shape[-1] for s in stack)
    parts = [(jnp.concatenate(stack, axis=-1), "none")]
    uv_attr_proj = None
    uv_mask_proj = None
    uv_depth_grad = None
    if sample_masks is not None and sample_masks.ndim == 4:
        sample_masks = sample_masks.mean(-1)
    if sample_images is not None:
        parts.append((sample_images, images_pack_mode))
    if sample_masks is not None:
        # masks ride the shared gather even without images (a silent drop
        # here would skip the validity strategy's mask test downstream)
        parts.append((sample_masks[..., None], "none"))
    if grid_sample_mode == "bilinear":
        from ..ops.grid_sample import grid_sample_parts

        sampled = grid_sample_parts(parts, uv_pos_ndc)
    else:
        sampled = jnp.concatenate(
            [grid_sample(im, uv_pos_ndc, mode=grid_sample_mode)
             for im, _ in parts],
            axis=-1,
        )
    uv_pos_proj = sampled[..., :3]
    uv_aoi_cos = sampled[..., 3]
    if compute_depth_grad:
        uv_depth_grad = sampled[..., 4]
    at = n_geo
    if sample_images is not None:
        nc = sample_images.shape[-1]
        uv_attr_proj = sampled[..., at : at + nc]
        at += nc
    if sample_masks is not None:
        uv_mask_proj = sampled[..., at]
    uv_pos_error = jnp.sqrt(
        jnp.sum((uv_pos_proj - pre.uv_pos[None]) ** 2, axis=-1)
    )

    return UVRenderGeometryOutput(
        uv_pos_proj=uv_pos_proj,
        uv_pos_error=uv_pos_error,
        uv_aoi_cos=uv_aoi_cos,
        uv_pos_ndc=uv_pos_ndc,
        view_mask=view_geo.view_mask,
        view_position=view_geo.view_position,
        view_normal=view_geo.view_normal,
        view_aoi_cos=view_geo.view_aoi_cos,
        view_depth=view_geo.view_depth,
        view_depth_grad=view_geo.view_depth_grad,
        uv_depth_grad=uv_depth_grad,
        view_attr=view_geo.view_attr,
        uv_attr_proj=uv_attr_proj,
        uv_mask_proj=uv_mask_proj,
    )


def uv_render_geometry(
    mesh: TexturedMesh,
    cam: Camera,
    view_height: int,
    view_width: int,
    uv_precompute_output: UVPrecomputeOutput,
    grid_sample_mode: str = "bilinear",
    compute_depth_grad: bool = False,
    depth_grad_dilation: int = 1,
    render_attr: bool = False,
    raster_config: RasterizerConfig = DEFAULT_CONFIG,
    sample_images: Optional[jnp.ndarray] = None,
    sample_masks: Optional[jnp.ndarray] = None,
    images_pack_mode: str = "none",
) -> UVRenderGeometryOutput:
    """Per-view geometric correspondence for every texel (reference
    uv.py:72-184): project texel world-pos into each view, render view
    G-buffers, compute aoi-cos, occlusion-boundary depth gradient, and sample
    the view maps back to UV space. Composition of :func:`uv_view_geometry`
    (view-space, texel-free) and :func:`uv_gather_geometry` (texel-space,
    row-local) — use the pieces directly to hoist view rendering out of
    texel-sharded/chunked loops.

    ``sample_images`` (Nv, H, W, C): also gather these view images into UV
    space IN THE SAME row gather (outputs land in ``uv_attr_proj`` /
    ``uv_mask_proj``). The view->UV gathers dominate the projection's
    device time (two ~25M-row gathers at the TPU emitter's per-row floor
    were 83% of the traced bake), and both sample at identical NDC coords,
    so fusing halves the projection's gather rows; results are
    bit-identical to a separate :func:`uv_render_attr` call.
    ``images_pack_mode='u8'`` additionally byte-packs the image columns
    (exact for 255-quantized frames)."""
    view_geo = uv_view_geometry(
        mesh, cam, view_height, view_width,
        compute_depth_grad=compute_depth_grad,
        depth_grad_dilation=depth_grad_dilation,
        render_attr=render_attr,
        raster_config=raster_config,
    )
    return uv_gather_geometry(
        view_geo, cam, uv_precompute_output,
        grid_sample_mode=grid_sample_mode,
        sample_images=sample_images,
        sample_masks=sample_masks,
        images_pack_mode=images_pack_mode,
    )


class UVRenderAttrOutput(NamedTuple):
    uv_attr_proj: jnp.ndarray  # (Nv, Huv, Wuv, C)
    uv_mask_proj: Optional[jnp.ndarray]  # (Nv, Huv, Wuv)


def uv_render_attr(
    images: jnp.ndarray,
    uv_render_geometry_output: UVRenderGeometryOutput,
    masks: Optional[jnp.ndarray] = None,
    grid_sample_mode: str = "bilinear",
    pack_mode: str = "none",
) -> UVRenderAttrOutput:
    """grid_sample view images (and optional masks) into UV space
    (reference uv.py:193-222).

    pack_mode='u8' gathers the bilinear taps byte-packed — exact when
    the view images are 255-quantized (video frames / PNGs), which is
    the reference pipeline's input by construction. Leave 'none' for
    continuous-valued inputs (e.g. float renders)."""
    ndc = uv_render_geometry_output.uv_pos_ndc
    images = jnp.asarray(images, jnp.float32)
    uv_mask_proj = None
    if masks is not None:
        masks = jnp.asarray(masks, jnp.float32)
        if masks.ndim == 4:
            masks = masks.mean(-1)
        # One fused row gather for images + mask (same coords, see
        # uv_render_geometry); the image columns honor pack_mode while the
        # (possibly continuous-valued) mask rides unpacked f32 columns.
        if grid_sample_mode == "bilinear":
            from ..ops.grid_sample import grid_sample_parts

            sampled = grid_sample_parts(
                [(images, pack_mode), (masks[..., None], "none")], ndc
            )
        else:
            sampled = grid_sample(
                jnp.concatenate([images, masks[..., None]], axis=-1),
                ndc, mode=grid_sample_mode,
            )
        uv_attr_proj = sampled[..., :-1]
        uv_mask_proj = sampled[..., -1]
    else:
        uv_attr_proj = grid_sample(
            images, ndc, mode=grid_sample_mode, pack_mode=pack_mode
        )
    return UVRenderAttrOutput(uv_attr_proj=uv_attr_proj, uv_mask_proj=uv_mask_proj)


# ---------------------------------------------------------------------------
# Validity / blend-weight strategies (reference uv.py:233-370), as NamedTuple
# closures so they stay hashable and jit-stable.
# ---------------------------------------------------------------------------


class SimpleUVValidityStrategy(NamedTuple):
    """Per-texel per-view validity (reference uv.py:248-298): reprojection
    error < eps AND aoi-cos > thresh AND (optional) depth-grad < thresh AND
    inside chart AND (optional) view-mask > thresh."""

    pos_error_eps: float = 1e-3
    aoi_cos_thresh: float = 0.1
    mask_thresh: float = 0.9
    depth_grad_thresh: Optional[float] = None
    first_view_dominate: bool = False

    def __call__(
        self,
        uv_precompute_output: UVPrecomputeOutput,
        uv_render_geometry_output: UVRenderGeometryOutput,
        uv_render_attr_output: Optional[UVRenderAttrOutput],
    ) -> jnp.ndarray:
        geo = uv_render_geometry_output
        valid = (geo.uv_pos_error < self.pos_error_eps) & (
            geo.uv_aoi_cos > self.aoi_cos_thresh
        )
        if self.depth_grad_thresh is not None and geo.uv_depth_grad is not None:
            valid &= geo.uv_depth_grad < self.depth_grad_thresh
        valid &= uv_precompute_output.uv_mask[None]
        if (
            uv_render_attr_output is not None
            and uv_render_attr_output.uv_mask_proj is not None
        ):
            valid &= uv_render_attr_output.uv_mask_proj > self.mask_thresh
        if self.first_view_dominate:
            # Views 1.. lose wherever view 0 is valid (uv.py:292-295).
            rest = valid[1:] & ~valid[0:1]
            valid = jnp.concatenate([valid[0:1], rest], axis=0)
        return valid


class ExponentialBlend(NamedTuple):
    """aoi-cos^alpha blend weights, linear or softmax normalized over views
    (reference uv.py:317-348)."""

    alpha: float = 1.0
    normalization: str = "linear"
    view_weight: Optional[jnp.ndarray] = None  # (Nv,)

    def __call__(
        self,
        uv_precompute_output: UVPrecomputeOutput,
        uv_render_geometry_output: UVRenderGeometryOutput,
        uv_render_attr_output: Optional[UVRenderAttrOutput],
        uv_valid_mask: jnp.ndarray,
    ) -> jnp.ndarray:
        weight = uv_render_geometry_output.uv_aoi_cos * uv_valid_mask.astype(
            jnp.float32
        )
        if self.view_weight is not None:
            weight = weight ** (self.alpha / self.view_weight[:, None, None])
        else:
            weight = weight**self.alpha
        if self.normalization == "linear":
            return jnp.clip(
                weight / jnp.maximum(weight.sum(axis=0, keepdims=True), 1e-5),
                0.0,
                1.0,
            )
        if self.normalization == "softmax":
            weight = jnp.where(uv_valid_mask, weight, -1e5)
            return jax.nn.softmax(weight, axis=0)
        raise ValueError(f"unknown normalization {self.normalization!r}")


class RandomChoiceBlend(NamedTuple):
    """One-hot weights choosing a random valid view per texel
    (reference uv.py:351-370). Needs an explicit PRNG key (functional JAX
    randomness instead of torch.rand_like)."""

    key: jax.Array
    alpha: float = 1.0  # accepted for parity; unused (as in the reference)

    def __call__(
        self,
        uv_precompute_output: UVPrecomputeOutput,
        uv_render_geometry_output: UVRenderGeometryOutput,
        uv_render_attr_output: Optional[UVRenderAttrOutput],
        uv_valid_mask: jnp.ndarray,
    ) -> jnp.ndarray:
        weight = uv_render_geometry_output.uv_aoi_cos * uv_valid_mask.astype(
            jnp.float32
        )
        rand = jax.random.uniform(self.key, weight.shape)
        weight = jnp.where(weight > 0, rand, weight)
        choice = jnp.argmax(weight, axis=0)  # (Huv, Wuv)
        return jax.nn.one_hot(choice, weight.shape[0], axis=0)


def uv_padding(
    attr: jnp.ndarray, inside_mask: jnp.ndarray, radius: int
) -> jnp.ndarray:
    """Pad UV gutters by inpainting outside ``inside_mask``
    (reference uv.py:373-382 via cvcuda.inpaint)."""
    return inpaint(jnp.clip(attr, 0.0, 1.0), ~inside_mask, radius)


class UVBlendOutput(NamedTuple):
    uv_attr_blend: Optional[jnp.ndarray]
    uv_valid_mask: jnp.ndarray
    uv_valid_mask_blend: jnp.ndarray
    uv_blend_weight: jnp.ndarray


def uv_blend(
    uv_precompute_output: UVPrecomputeOutput,
    uv_render_geometry_output: UVRenderGeometryOutput,
    uv_render_attr_output: Optional[UVRenderAttrOutput],
    uv_validity_strategy=SimpleUVValidityStrategy(),
    uv_blend_weight_strategy=ExponentialBlend(),
    empty_value: float = 0.0,  # fill for texture-less meshes (see below)
    do_uv_padding: bool = True,
    uv_padding_radius: int = 3,
    pad_unseen_area: bool = False,
    poisson_blending: bool = False,
    pb_num_iters: int = 1000,
    pb_keep_original_border: bool = True,
    pb_grad_mode: str = "src",
    pb_solver: str = "jacobi",
) -> UVBlendOutput:
    """Weighted multi-view blend into one texture, with optional Poisson
    seam blending and UV gutter padding (reference uv.py:385-468).

    pb_solver: 'jacobi' (exact reference math, blend.py:90-99), 'multigrid'
    (coarse-to-fine cascade, visually equivalent — pb_num_iters then counts
    sweeps PER LEVEL, typical 60-100), or 'cropped' (solve only the mask
    bounding box; requires concrete host-driven arrays)."""
    out = uv_blend_sum(
        uv_precompute_output,
        uv_render_geometry_output,
        uv_render_attr_output,
        uv_validity_strategy=uv_validity_strategy,
        uv_blend_weight_strategy=uv_blend_weight_strategy,
    )
    if out.uv_attr_blend is None:
        return out
    uv_attr_blend = uv_blend_post(
        uv_precompute_output,
        out.uv_attr_blend,
        out.uv_valid_mask_blend,
        empty_value=empty_value,
        do_uv_padding=do_uv_padding,
        uv_padding_radius=uv_padding_radius,
        pad_unseen_area=pad_unseen_area,
        poisson_blending=poisson_blending,
        pb_num_iters=pb_num_iters,
        pb_keep_original_border=pb_keep_original_border,
        pb_grad_mode=pb_grad_mode,
        pb_solver=pb_solver,
    )
    return out._replace(uv_attr_blend=uv_attr_blend)


def uv_blend_sum(
    uv_precompute_output: UVPrecomputeOutput,
    uv_render_geometry_output: UVRenderGeometryOutput,
    uv_render_attr_output: Optional[UVRenderAttrOutput],
    uv_validity_strategy=SimpleUVValidityStrategy(),
    uv_blend_weight_strategy=ExponentialBlend(),
) -> UVBlendOutput:
    """The per-texel half of :func:`uv_blend`: validity, blend weights, and
    the weighted view sum — every output is row-local in the UV image, so
    this is the piece that shards over the texel axis across chips
    (parallel/bake.py). ``uv_attr_blend`` here is the RAW weighted sum
    (no stitching against the original texture, no padding/Poisson — see
    :func:`uv_blend_post`)."""
    pre = uv_precompute_output
    uv_valid_mask = uv_validity_strategy(
        pre, uv_render_geometry_output, uv_render_attr_output
    )
    uv_blend_weight = uv_blend_weight_strategy(
        pre, uv_render_geometry_output, uv_render_attr_output, uv_valid_mask
    )
    uv_valid_mask_blend = uv_valid_mask.any(axis=0)

    if uv_render_attr_output is None:
        return UVBlendOutput(
            uv_attr_blend=None,
            uv_valid_mask=uv_valid_mask,
            uv_valid_mask_blend=uv_valid_mask_blend,
            uv_blend_weight=uv_blend_weight,
        )

    uv_attr_blend = (
        uv_render_attr_output.uv_attr_proj * uv_blend_weight[..., None]
    ).sum(axis=0)
    return UVBlendOutput(
        uv_attr_blend=uv_attr_blend,
        uv_valid_mask=uv_valid_mask,
        uv_valid_mask_blend=uv_valid_mask_blend,
        uv_blend_weight=uv_blend_weight,
    )


def uv_blend_post(
    uv_precompute_output: UVPrecomputeOutput,
    uv_attr_blend: jnp.ndarray,
    uv_valid_mask_blend: jnp.ndarray,
    empty_value: float = 0.0,
    do_uv_padding: bool = True,
    uv_padding_radius: int = 3,
    pad_unseen_area: bool = False,
    poisson_blending: bool = False,
    pb_num_iters: int = 1000,
    pb_keep_original_border: bool = True,
    pb_grad_mode: str = "src",
    pb_solver: str = "jacobi",
) -> jnp.ndarray:
    """The whole-image half of :func:`uv_blend`: stitch the raw weighted sum
    against the original texture, then optional Poisson seam blending and UV
    gutter padding. These are 2-D stencil passes over the (small, Nv-free)
    blended image, so the sharded bake runs them once on the stitched result
    rather than inside the texel-sharded region."""
    pre = uv_precompute_output

    if pre.uv_attr is not None and pre.uv_attr.shape[:2] != (
        pre.height,
        pre.width,
    ):
        raise ValueError(
            f"mesh.texture is {pre.uv_attr.shape[:2]} but uv_size is "
            f"({pre.height}, {pre.width}) — they must match (the blend "
            "stitches against the original texture, reference uv.py:453-457)"
        )

    if pre.uv_attr is None:
        # No original texture to stitch/Poisson against (texture-less
        # mesh): unseen texels take empty_value, same role the original
        # texture plays below (from-scratch bake).
        pre = pre._replace(
            uv_attr=jnp.full_like(uv_attr_blend, empty_value)
        )

    if poisson_blending:
        assert do_uv_padding, "poisson blending requires uv padding"
        blend_f = uv_valid_mask_blend[..., None].astype(jnp.float32)
        uv_attr_blend_padded = uv_padding(
            uv_attr_blend, uv_valid_mask_blend, uv_padding_radius
        )
        if pb_keep_original_border:
            pb_tgt = pre.uv_attr
        else:
            hard_stitch = uv_attr_blend * blend_f + pre.uv_attr * (1.0 - blend_f)
            pb_tgt = uv_padding(hard_stitch, pre.uv_mask, uv_padding_radius)
        if pb_solver == "jacobi":
            pb_fn = poisson_blend
        elif pb_solver == "multigrid":
            pb_fn = poisson_blend_multigrid
        elif pb_solver == "cropped":
            pb_fn = poisson_blend_cropped
        else:
            raise ValueError(f"unknown pb_solver {pb_solver!r}")
        uv_attr_blend = pb_fn(
            uv_attr_blend_padded,
            uv_valid_mask_blend,
            pb_tgt,
            num_iters=pb_num_iters,
            grad_mode=pb_grad_mode,
        )
    else:
        blend_f = uv_valid_mask_blend[..., None].astype(jnp.float32)
        uv_attr_blend = uv_attr_blend * blend_f + pre.uv_attr * (1.0 - blend_f)

    if do_uv_padding:
        content_mask = uv_valid_mask_blend if pad_unseen_area else pre.uv_mask
        uv_attr_blend = uv_padding(uv_attr_blend, content_mask, uv_padding_radius)

    return uv_attr_blend

"""CameraProjection — the full inverse-render orchestrator:
multi-view images (+ optional masks) -> baked UV texture.

Reference contract: mvadapter/utils/mesh_utils/projection.py:33-204
(uv_precompute -> uv_render_geometry -> IoU rejection -> [warp] ->
uv_render_attr -> uv_blend). The per-call CUDA context object disappears;
everything below the IoU host decision is traced into one XLA program.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import Camera, get_camera
from ..mesh import TexturedMesh
from ..ops.rasterize import DEFAULT_CONFIG, RasterizerConfig, binning_stats
from ..render import render
from ..transforms import get_clip_space_position
from .uv import (
    ExponentialBlend,
    SimpleUVValidityStrategy,
    UVRenderAttrOutput,
    uv_blend,
    uv_precompute,
    uv_render_attr,
    uv_render_geometry,
)

__all__ = ["CameraProjection", "CameraProjectionOutput", "camera_projection"]

# 'auto' validity bounds in units of the per-view pixel footprint
# (_auto_footprint). pos_error: 1.5 footprints — covers the depth-
# interpolation error of a correctly visible texel while still rejecting
# occlusion (a surface-to-surface gap, usually many footprints).
# depth_grad: 20 footprints — keeps steep-but-real slopes (up to
# ~tan^-1(20) from facing) and cuts true discontinuities. Shared with the
# sharded bake (parallel/bake.py) so both paths resolve identically.
_AUTO_POS_EPS_FOOTPRINTS = 1.5
_AUTO_DEPTH_GRAD_FOOTPRINTS = 20.0


class CameraProjectionOutput(NamedTuple):
    uv_proj: Optional[jnp.ndarray]
    uv_proj_mask: Optional[jnp.ndarray]
    uv_depth_grad: Optional[jnp.ndarray]
    uv_aoi_cos: Optional[jnp.ndarray]


def _validate_binning_budgets(
    mesh: TexturedMesh,
    cam: Camera,
    height: int,
    width: int,
    uv_size: int,
    config: RasterizerConfig,
) -> None:
    """Fail loudly when the config's lossy binning budgets would silently
    drop triangles for THIS scene — in either of the projection's two
    rasterizations (view-space render of t_pos_idx; UV-atlas rasterization
    of t_tex_idx). binning_stats is exact and cheap (no rasterization)."""
    # Each check carries a structured is_uv_atlas flag (NOT derived from the
    # display name: a drifting label must not silently change which checks
    # model the cull-forced-off atlas triangle set).
    checks = []
    if mesh.t_pos_idx.shape[0] >= config.bin_sort_pairs_min_tris:
        pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
        checks.append(
            ("view-space render", pos_clip, mesh.t_pos_idx, (height, width),
             False)
        )
    if (
        mesh.v_tex is not None
        and mesh.t_tex_idx.shape[0] >= config.bin_sort_pairs_min_tris
    ):
        uv_clip = mesh.v_tex * 2.0 - 1.0
        uv_clip4 = jnp.concatenate(
            [
                uv_clip,
                jnp.zeros_like(uv_clip[..., :1]),
                jnp.ones_like(uv_clip[..., :1]),
            ],
            axis=-1,
        )[None]
        checks.append(
            ("UV-atlas rasterization", uv_clip4, mesh.t_tex_idx,
             (uv_size, uv_size), True)
        )
    if config.bin_mode != "sort_pairs":
        checks = []
    for name, pos, tri, resolution, is_uv_atlas in checks:
        if is_uv_atlas and config.backface_cull:
            # uv_precompute rasterizes the atlas with the cull forced OFF
            # (chart winding is not 3D facing); the guard must model the
            # same triangle set or it would under-count live entries.
            stats = binning_stats(
                pos, tri, resolution, config._replace(backface_cull=0)
            )
        else:
            stats = binning_stats(pos, tri, resolution, config)
        if not stats["ok"]:
            raise ValueError(
                f"camera_projection: rasterizer binning budgets are lossy "
                f"for this scene's {name} at {resolution}: {stats}. Raise "
                f"the failing budget (max_tris_per_tile >= max_per_tile, "
                f"bin_huge >= n_huge, bin_flat_cap_factor * T >= "
                f"live_entries) in the RasterizerConfig, or pass "
                f"validate_binning=False to accept dropped triangles."
            )


def _auto_footprint(cam: Camera, view_mask, view_depth, height: int):
    """Per-view world-space pixel footprint, (Nv, 1, 1) — the scale factor
    behind the 'auto' validity bounds (median foreground depth *
    2 tan(fovy/2) / rows; background rides a far sentinel, hence the fg
    median). tan(fovy/2) = 1/|p11| (|.| because this codebase's projection
    carries the negated-Y row). Orthographic views (proj[3,3] == 1, e.g.
    TexturePipeline's default ORTHO rig) have a depth-INDEPENDENT footprint
    of 2/(|p11| * rows) — scaling it by depth would loosen the bound
    ~depth-fold. All traced ops (works under jit / inside shard_map); a
    no-foreground view yields NaN -> validity comparisons False -> that
    view contributes no texels."""
    inv_f = 1.0 / jnp.abs(cam.proj_mtx[:, 1, 1])
    is_persp = jnp.abs(cam.proj_mtx[:, 3, 3]) < 0.5
    depth_fg = jnp.where(view_mask, view_depth, jnp.nan)
    med = jnp.nanmedian(depth_fg.reshape(depth_fg.shape[0], -1), axis=1)
    return (jnp.where(is_persp, med, 1.0) * 2.0 * inv_f / height)[:, None, None]


def _check_validity_bound(name: str, v):
    """Normalize a validity bound to 'auto' or a plain Python float, with a
    descriptive error for everything else (a jnp array would otherwise die
    inside the lru_cache'd sharded-bake builder as an opaque
    unhashable-type error)."""
    if isinstance(v, str):
        if v != "auto":
            raise ValueError(f"{name}: float or 'auto', got {v!r}")
        return v
    try:
        return float(v)
    except (TypeError, ValueError) as e:
        raise ValueError(
            f"{name}: float or 'auto', got {type(v).__name__} ({v!r}) — "
            f"per-view arrays are not supported on the sharded bake; pass "
            f"'auto' to get per-view footprint scaling"
        ) from e


def camera_projection(
    images: jnp.ndarray,
    mesh: TexturedMesh,
    cam: Optional[Camera] = None,
    fovy_deg=None,
    masks: Optional[jnp.ndarray] = None,
    bg_remover=None,
    remove_bg: bool = False,
    c2w: Optional[jnp.ndarray] = None,
    elevation_deg=None,
    distance=None,
    azimuth_deg=None,
    num_views: Optional[int] = None,
    uv_size: int = 2048,
    warp_images: bool = False,
    images_background: Optional[float] = None,
    iou_rejection_threshold: Optional[float] = 0.8,
    aoi_cos_valid_threshold: float = 0.3,
    # Per-texel reprojection-error validity bound, in WORLD units (the
    # reference's constant, uv.py:248-298, assumes its load-time
    # unit-cube normalization). For scenes kept at native scale (e.g. a
    # multi-meter town) size it to the view-pixel world footprint:
    # ~ scene_depth * tan(fov/2) * 2 / view_height — or pass "auto",
    # which computes exactly that per view (1.5 x median foreground
    # depth x 2 tan(fovy/2) / rows, a traced scalar), making validity
    # SCALE-INVARIANT (tests assert a 10x-scaled scene bakes the
    # identical mask). Works on both the eager and the sharded
    # (device_mesh) paths.
    pos_error_eps=1e-3,
    depth_grad_dilation: int = 5,
    # Like pos_error_eps: WORLD-unit bound (reference default 0.1 assumes
    # unit-cube normalization); accepts "auto" for footprint scaling.
    depth_grad_threshold=0.1,
    uv_exp_blend_alpha: float = 6,
    uv_exp_blend_view_weight: Optional[jnp.ndarray] = None,
    poisson_blending: bool = True,
    pb_num_iters: int = 1000,
    pb_keep_original_border: bool = True,
    from_scratch: bool = False,
    uv_padding: bool = True,
    raster_config: RasterizerConfig = DEFAULT_CONFIG,
    verbose: bool = False,
    validate_binning: bool = True,
    images_pack_mode: str = "auto",
    device_mesh=None,
    device_mesh_axis: str = "uv",
    texel_chunks: int = 1,
) -> Optional[CameraProjectionOutput]:
    """Project multi-view images onto the mesh's UV texture.

    ``device_mesh``: a ``jax.sharding.Mesh`` to shard the UV texel axis
    across chips (SURVEY §5.7 — big 2048–4096² bakes whose per-view texel
    maps exceed one chip's HBM). Routes to
    :func:`..parallel.bake.sharded_camera_projection`; see its docstring
    for the few keyword differences (warp/bg-removal run beforehand).

    Returns None when the given masks disagree with the rendered silhouettes
    by more than ``iou_rejection_threshold`` (projection.py:126-138) — a host
    decision on two reduced scalars, so it costs one tiny device->host sync.

    ``validate_binning``: check the rasterizer's lossy binning budgets
    (per-tile cap / flat-list cap / huge-list size) against this exact
    scene+cameras before projecting, and fail loudly instead of silently
    dropping triangles (the budgets are per-scene knobs; see
    ops.rasterize.binning_stats). Skipped automatically under jit tracing.
    """
    if device_mesh is not None:
        if warp_images or remove_bg or bg_remover is not None:
            raise ValueError(
                "device_mesh bakes take pre-warped / pre-matted images: run "
                "compute_warp_field / the bg remover on the views first "
                "(both are view-space, orthogonal to texel sharding)"
            )
        # 'auto' or plain floats only (the sharded builder caches on these;
        # 'auto' resolves to the per-view footprint INSIDE the sharded
        # program, bit-identical to the eager path's resolution).
        pos_error_eps = _check_validity_bound("pos_error_eps", pos_error_eps)
        depth_grad_threshold = _check_validity_bound(
            "depth_grad_threshold", depth_grad_threshold
        )
        from ..parallel.bake import sharded_camera_projection

        return sharded_camera_projection(
            images, mesh, cam,
            device_mesh=device_mesh,
            axis_name=device_mesh_axis,
            masks=masks,
            fovy_deg=fovy_deg,
            c2w=c2w,
            elevation_deg=elevation_deg,
            distance=distance,
            azimuth_deg=azimuth_deg,
            num_views=num_views,
            uv_size=uv_size,
            iou_rejection_threshold=iou_rejection_threshold,
            aoi_cos_valid_threshold=aoi_cos_valid_threshold,
            pos_error_eps=pos_error_eps,
            depth_grad_dilation=depth_grad_dilation,
            depth_grad_threshold=depth_grad_threshold,
            uv_exp_blend_alpha=uv_exp_blend_alpha,
            uv_exp_blend_view_weight=uv_exp_blend_view_weight,
            poisson_blending=poisson_blending,
            pb_num_iters=pb_num_iters,
            pb_keep_original_border=pb_keep_original_border,
            from_scratch=from_scratch,
            uv_padding=uv_padding,
            raster_config=raster_config,
            verbose=verbose,
            validate_binning=validate_binning,
            images_pack_mode=images_pack_mode,
            texel_chunks=texel_chunks,
        )

    if images_pack_mode == "auto":
        # Byte-pack the view->UV gather when the images are 255-quantized
        # (file-sourced frames are k/255 by construction — then the packed
        # taps are bit-identical and the gather rows shrink 4x in element
        # count). The check runs ONLY on host-resident numpy input, BEFORE
        # any device conversion: pulling a device array back through the
        # tunnel (~2 MB/s) would cost far more than the packing saves.
        images_pack_mode = "none"
        if isinstance(images, np.ndarray) and images.size:
            a = images.astype(np.float32, copy=False)
            if a.min() >= 0.0 and a.max() <= 1.0:
                r = a * 255.0
                if np.abs(r - np.round(r)).max() <= 1e-4:
                    images_pack_mode = "u8"

    images = jnp.asarray(images, jnp.float32)
    assert images.ndim == 4, "images must be (Nv, H, W, C)"
    n_views, height, width, _ = images.shape

    masks_pt = None
    if masks is not None:
        masks_pt = jnp.asarray(masks, jnp.float32)
    elif remove_bg:
        assert bg_remover is not None, "remove_bg requires a bg_remover"
        masks_pt = bg_remover(images)
    if masks_pt is not None and masks_pt.ndim == 4:
        masks_pt = masks_pt.mean(-1)

    if cam is None:
        cam = get_camera(
            elevation_deg=elevation_deg,
            distance=distance,
            fovy_deg=fovy_deg,
            azimuth_deg=azimuth_deg,
            num_views=num_views,
            c2w=c2w,
            aspect_wh=width / height,
        )

    if validate_binning and not isinstance(images, jax.core.Tracer):
        _validate_binning_budgets(
            mesh, cam, height, width, uv_size, raster_config
        )

    pre = uv_precompute(mesh, height=uv_size, width=uv_size, raster_config=raster_config)
    # NOTE on fusing the attr gather into the geometry gather
    # (uv_render_geometry(sample_images=...)): it halves the gather rows
    # bit-identically, but XLA's TPU gather emitter has a COLUMN CLIFF —
    # fusion roots get a transposed planar layout and a >16-column gather
    # writes ~6x slower per row (traced: 2x181 ms separate vs 1119 ms
    # fused at 28 cols, 895 ms with byte-packed image columns at ~23).
    # Until the emitter changes, separate <=16-col gathers are faster, so
    # fusing stays OFF; the machinery + bit-identity tests remain.
    fuse_attr = False
    geo = uv_render_geometry(
        mesh,
        cam,
        view_height=height,
        view_width=width,
        uv_precompute_output=pre,
        compute_depth_grad=True,
        depth_grad_dilation=depth_grad_dilation,
        raster_config=raster_config,
        sample_images=images if fuse_attr else None,
        sample_masks=masks_pt if fuse_attr else None,
        images_pack_mode=images_pack_mode if fuse_attr else "none",
    )

    if masks_pt is not None and iou_rejection_threshold is not None:
        if isinstance(masks_pt, jax.core.Tracer) or isinstance(
            geo.view_mask, jax.core.Tracer
        ):
            # IoU rejection is a HOST decision (return None / proceed) on a
            # data-dependent scalar — impossible under jit tracing. Mirror
            # validate_binning's Tracer guard: skip with a warning instead
            # of crashing with a TracerError. Callers who need rejection
            # must call eagerly; callers who jit should pass
            # iou_rejection_threshold=None to silence this.
            from ..utils.logging import get_logger

            get_logger(__name__).warning(
                "camera_projection: skipping IoU mask rejection under jit "
                "tracing (host decision on a traced value); call eagerly "
                "for rejection or pass iou_rejection_threshold=None."
            )
            iou_min = None
        else:
            given = (masks_pt > 0.5).astype(jnp.float32)
            rendered = geo.view_mask.astype(jnp.float32)
            inter = given * rendered
            union = given + rendered - inter
            iou = inter.sum((1, 2)) / union.sum((1, 2))
            iou_min = float(iou.min())
        if iou_min is not None:
            if verbose:
                print(f"Per-view IoU: {np.asarray(iou).tolist()}")
            if iou_min < iou_rejection_threshold:
                if verbose:
                    print(
                        f"Minimum view IoU {iou_min} below threshold "
                        f"{iou_rejection_threshold}, skipping camera "
                        f"projection"
                    )
                return None

    if warp_images:
        assert images_background is not None
        render_attr = render(
            mesh,
            cam,
            height=height,
            width=width,
            render_attr=True,
            render_depth=False,
            render_normal=False,
            attr_background=images_background,
            raster_config=raster_config,
        ).attr
        from .warp import compute_warp_field

        images = compute_warp_field(
            images,
            render_attr,
            n_grid=10,
            optim_res=(64, 128),
            optim_step_per_res=20,
            lambda_reg=2.0,
        )

    if fuse_attr:
        attr = UVRenderAttrOutput(
            uv_attr_proj=geo.uv_attr_proj, uv_mask_proj=geo.uv_mask_proj
        )
    else:
        attr = uv_render_attr(
            images=images, masks=masks_pt, uv_render_geometry_output=geo,
            pack_mode=images_pack_mode,
        )
    if isinstance(pos_error_eps, str) or isinstance(depth_grad_threshold, str):
        # "auto": scale the WORLD-unit validity bounds to each view's
        # pixel footprint (median foreground depth * 2 tan(fovy/2) /
        # rows; background rides a far sentinel, hence the fg median).
        # pos_error: 1.5 footprints — covers the depth-interpolation
        # error of a correctly visible texel while still rejecting
        # occlusion (a surface-to-surface gap, usually many footprints).
        # depth_grad: 20 footprints — keeps steep-but-real slopes (up to
        # ~tan^-1(20) from facing) and cuts true discontinuities. All
        # traced ops — works under jit; a no-foreground view yields NaN
        # -> comparisons False -> contributes no texels. This makes
        # validity SCALE-INVARIANT (tested: a 10x-scaled scene bakes
        # the identical mask).
        for name, v in (("pos_error_eps", pos_error_eps),
                        ("depth_grad_threshold", depth_grad_threshold)):
            if isinstance(v, str) and v != "auto":
                raise ValueError(f"{name}: float or 'auto', got {v!r}")
        footprint = _auto_footprint(cam, geo.view_mask, geo.view_depth, height)
        if isinstance(pos_error_eps, str):
            # broadcasts vs (Nv, Huv, Wuv)
            pos_error_eps = _AUTO_POS_EPS_FOOTPRINTS * footprint
        if isinstance(depth_grad_threshold, str):
            depth_grad_threshold = _AUTO_DEPTH_GRAD_FOOTPRINTS * footprint
    blend = uv_blend(
        pre,
        geo,
        attr,
        uv_validity_strategy=SimpleUVValidityStrategy(
            pos_error_eps=pos_error_eps,
            aoi_cos_thresh=aoi_cos_valid_threshold,
            depth_grad_thresh=depth_grad_threshold,
        ),
        uv_blend_weight_strategy=ExponentialBlend(
            alpha=uv_exp_blend_alpha, view_weight=uv_exp_blend_view_weight
        ),
        empty_value=1.0,
        do_uv_padding=uv_padding,
        pad_unseen_area=from_scratch,
        poisson_blending=poisson_blending,
        pb_num_iters=pb_num_iters,
        pb_keep_original_border=pb_keep_original_border,
    )

    return CameraProjectionOutput(
        uv_proj=blend.uv_attr_blend,
        uv_proj_mask=blend.uv_valid_mask_blend,
        uv_depth_grad=geo.uv_depth_grad,
        uv_aoi_cos=geo.uv_aoi_cos,
    )


class CameraProjection:
    """API-parity class wrapper (reference projection.py:41-56). The
    reference constructs a Poisson solver + raster context per instance; on
    TPU both are stateless compiled functions, so this only carries defaults."""

    def __init__(
        self,
        pb_backend: str = "xla",
        bg_remover=None,
        device: str = "tpu",
        context_type: str = "xla",
        raster_config: RasterizerConfig = DEFAULT_CONFIG,
    ) -> None:
        del pb_backend, device, context_type
        self.bg_remover = bg_remover
        self.raster_config = raster_config

    def __call__(self, images, mesh, **kwargs):
        return_dict = kwargs.pop("return_dict", False)
        return_mask = kwargs.pop("return_uv_projection_mask", False)
        kwargs.setdefault("raster_config", self.raster_config)
        kwargs.setdefault("bg_remover", self.bg_remover)
        out = camera_projection(images, mesh, **kwargs)
        if out is None:
            return None
        if return_dict:
            return out
        if return_mask:
            return out.uv_proj, out.uv_proj_mask
        return out.uv_proj

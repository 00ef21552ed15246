"""Texel-sharded UV baking: camera_projection over a device mesh.

SURVEY §5.7 names TWO long axes the reference scales (view count and UV
resolution, up to 4096² — reference test/pipeline_texture.py:206,
test/README.md:73). The view axis shards via parallel/sweep.py; this module
shards the OTHER axis — the UV image itself — in row bands across chips, so
a 4096² bake's dominant intermediates, the per-view-per-texel maps of
``uv_render_geometry`` / ``uv_render_attr`` / ``uv_blend_sum``
((Nv, Huv, Wuv, ~12) f32 ≈ 4.8 GB at Nv=6, 4096²), drop to 1/n_chips per
chip instead of replicating.

Design (TPU-first, bit-identical by construction):

* The bake core from ``uv_render_geometry`` through the weighted view sum is
  ROW-LOCAL in the UV image — every texel's gathers, validity tests, and
  blend weights depend only on that texel. It runs under ``shard_map`` with
  the UV rows split over the mesh axis; each device gathers only its band.
* The atlas rasterization (``uv_precompute``) and the per-view G-buffer
  renders are Nv-free / texel-free respectively and CHEAP relative to the
  gather stages; they execute replicated (identical program, identical
  values on every chip — no cross-band rasterization seams to reconcile).
* The stencil post-passes (gutter inpainting, Poisson seam blending) act on
  the stitched (Huv, Wuv, C) image — Nv-free, ~200 MB at 4096² — AFTER the
  sharded region, where XLA is free to repartition them.

No collectives are needed inside the sharded region at all: the band
outputs concatenate into the full texture by the out_specs alone (the ICI
cost of this bake is one row-band all-gather at the very end, inserted by
XLA where the post-passes consume the stitched image).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map as _shard_map_new

    def _shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_new(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def _shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )

from ..baking.projection import (
    CameraProjectionOutput,
    _auto_footprint,
    _check_validity_bound,
    _validate_binning_budgets,
)
from ..baking.uv import (
    ExponentialBlend,
    SimpleUVValidityStrategy,
    UVPrecomputeOutput,
    uv_blend_post,
    uv_blend_sum,
    uv_gather_geometry,
    uv_precompute,
    uv_render_attr,
    uv_view_geometry,
)
from ..camera import Camera, get_camera
from ..mesh import TexturedMesh
from ..ops.rasterize import DEFAULT_CONFIG, RasterizerConfig
from ..render import render

__all__ = ["sharded_camera_projection"]


def sharded_camera_projection(
    images,
    mesh: TexturedMesh,
    cam: Optional[Camera] = None,
    device_mesh: Optional[Mesh] = None,
    axis_name: str = "uv",
    masks=None,
    fovy_deg=None,
    c2w=None,
    elevation_deg=None,
    distance=None,
    azimuth_deg=None,
    num_views: Optional[int] = None,
    uv_size: int = 2048,
    iou_rejection_threshold: Optional[float] = 0.8,
    aoi_cos_valid_threshold: float = 0.3,
    # Both validity bounds accept "auto" exactly like camera_projection:
    # the per-view footprint resolves INSIDE the sharded program from the
    # replicated view render (identical values on every chip — no
    # collective), so sharded-vs-single bakes stay bit-identical under
    # scale-invariant validity too.
    pos_error_eps=1e-3,
    depth_grad_dilation: int = 5,
    depth_grad_threshold=0.1,
    uv_exp_blend_alpha: float = 6,
    uv_exp_blend_view_weight=None,
    poisson_blending: bool = True,
    pb_num_iters: int = 1000,
    pb_keep_original_border: bool = True,
    from_scratch: bool = False,
    uv_padding: bool = True,
    raster_config: RasterizerConfig = DEFAULT_CONFIG,
    verbose: bool = False,
    validate_binning: bool = True,
    images_pack_mode: str = "auto",
    texel_chunks: int = 1,
) -> Optional[CameraProjectionOutput]:
    """:func:`..baking.projection.camera_projection` with the UV texel axis
    sharded across ``device_mesh`` (default: a 1-D mesh over all local
    devices). Matches the single-device function's outputs (the sharded
    region is arithmetically identical — same programs on row bands).

    ``texel_chunks``: additionally process each device's band in this many
    sequential row chunks (``lax.map``), dividing per-chip HBM for the
    texel maps by the chunk count at ~no throughput cost (the view renders
    hoist out of the loop). This is how ONE chip runs a 4096² bake whose
    (Nv, 4096, 4096, ·) intermediates (~5 GB at Nv=6 before gather temps)
    exceed HBM in one shot.

    ``uv_size`` must divide evenly by the mesh size. The mesh geometry,
    cameras, and view images are replicated (views are small next to a
    2048–4096² atlas); per-texel intermediates are sharded; the returned
    arrays carry a row-sharded ``NamedSharding`` so downstream sharded
    consumers keep the layout (callers that want host copies just
    ``np.asarray`` them).

    Not carried over from the eager function: ``warp_images``/``bg_remover``
    (run :func:`..baking.warp.compute_warp_field` / the remover on the view
    images beforehand — both are view-space, orthogonal to texel sharding).
    """
    if device_mesh is None:
        device_mesh = Mesh(np.asarray(jax.devices()), (axis_name,))
    n_shards = device_mesh.shape[axis_name]
    if texel_chunks < 1 or uv_size % (n_shards * texel_chunks) != 0:
        raise ValueError(
            f"uv_size {uv_size} must divide by mesh axis '{axis_name}' size "
            f"{n_shards} x texel_chunks {texel_chunks}"
        )

    if images_pack_mode == "auto":
        # Same host-only quantization check as camera_projection (never
        # pulls a device array back through the tunnel).
        images_pack_mode = "none"
        if isinstance(images, np.ndarray) and images.size:
            a = images.astype(np.float32, copy=False)
            if a.min() >= 0.0 and a.max() <= 1.0:
                r = a * 255.0
                if np.abs(r - np.round(r)).max() <= 1e-4:
                    images_pack_mode = "u8"

    images = jnp.asarray(images, jnp.float32)
    assert images.ndim == 4, "images must be (Nv, H, W, C)"
    n_views, height, width, n_ch = images.shape

    masks_pt = None
    if masks is not None:
        masks_pt = jnp.asarray(masks, jnp.float32)
        if masks_pt.ndim == 4:
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

    # IoU rejection is a host decision; evaluate it eagerly on a cheap
    # silhouette render BEFORE compiling the sharded bake (the classic
    # function makes the same device->host sync).
    if masks_pt is not None and iou_rejection_threshold is not None:
        sil = render(
            mesh, cam, height, width,
            render_attr=False, render_depth=False, render_normal=False,
            raster_config=raster_config,
        ).mask
        given = (masks_pt > 0.5).astype(jnp.float32)
        rendered = sil.astype(jnp.float32)
        inter = given * rendered
        union = given + rendered - inter
        iou = inter.sum((1, 2)) / union.sum((1, 2))
        iou_min = float(iou.min())
        if verbose:
            print(f"Per-view IoU: {np.asarray(iou).tolist()}")
        if iou_min < iou_rejection_threshold:
            if verbose:
                print(
                    f"Minimum view IoU {iou_min} below threshold "
                    f"{iou_rejection_threshold}, skipping camera projection"
                )
            return None

    # 'auto' or plain floats — a jnp array would die in the lru_cache'd
    # builder as an opaque unhashable-type error (direct callers may skip
    # camera_projection's identical normalization).
    pos_error_eps = _check_validity_bound("pos_error_eps", pos_error_eps)
    depth_grad_threshold = _check_validity_bound(
        "depth_grad_threshold", depth_grad_threshold
    )

    bake = _build_bake(
        device_mesh, axis_name, uv_size, height, width, n_ch,
        masks_pt is not None, uv_exp_blend_view_weight is not None,
        aoi_cos_valid_threshold, pos_error_eps, depth_grad_dilation,
        depth_grad_threshold, uv_exp_blend_alpha, poisson_blending, pb_num_iters,
        pb_keep_original_border, from_scratch, uv_padding, raster_config,
        images_pack_mode, texel_chunks,
    )

    view_weight = (
        None if uv_exp_blend_view_weight is None
        else jnp.asarray(uv_exp_blend_view_weight, jnp.float32)
    )
    with device_mesh:
        uv_proj, uv_proj_mask, uv_depth_grad, uv_aoi_cos = bake(
            images, masks_pt, mesh, cam, view_weight
        )

    return CameraProjectionOutput(
        uv_proj=uv_proj,
        uv_proj_mask=uv_proj_mask,
        uv_depth_grad=uv_depth_grad,
        uv_aoi_cos=uv_aoi_cos,
    )


@functools.lru_cache(maxsize=32)
def _build_bake(
    device_mesh, axis_name, uv_size, height, width, n_ch, has_masks,
    has_view_weight, aoi_cos_valid_threshold, pos_error_eps,
    depth_grad_dilation,
    depth_grad_threshold, uv_exp_blend_alpha, poisson_blending, pb_num_iters,
    pb_keep_original_border, from_scratch, do_uv_padding, raster_config,
    images_pack_mode, texel_chunks,
):
    """Construct (and cache) the jitted texel-sharded bake program for one
    static configuration. Cached on everything that shapes the program —
    repeated bakes with the same config hit the jit cache instead of
    retracing (a per-call closure would recompile every bake)."""
    del has_masks, has_view_weight  # only part of the cache key
    # 'auto' bounds resolve per-call inside band_fn (they need the view
    # render's depth); plain floats build the strategy once here.
    auto_validity = isinstance(pos_error_eps, str) or isinstance(
        depth_grad_threshold, str
    )
    if not auto_validity:
        validity = SimpleUVValidityStrategy(
            pos_error_eps=pos_error_eps,
            aoi_cos_thresh=aoi_cos_valid_threshold,
            depth_grad_thresh=depth_grad_threshold,
        )

    def band_fn(images_r, masks_r, mesh_r, cam_r, view_weight_r, uv_attr_b,
                uv_mask_b, uv_pos_b):
        """One device's row band: geometry gathers + attr gathers + the
        weighted view sum. Row-local by construction (see module doc).
        With ``texel_chunks > 1`` the band is further processed in
        sequential row chunks under ``lax.map`` (per-chip HBM divides by
        the chunk count — how a SINGLE chip runs a 4096² bake whose texel
        maps would not fit at once); the view render is hoisted out so
        views render once per device, not once per chunk."""
        view_geo = uv_view_geometry(
            mesh_r, cam_r, height, width,
            compute_depth_grad=True,
            depth_grad_dilation=depth_grad_dilation,
            raster_config=raster_config,
        )
        if auto_validity:
            # Same resolution as camera_projection's eager path (same
            # multipliers, same footprint math — _AUTO_* constants in
            # baking/projection.py), computed from the REPLICATED view
            # render: identical on every chip, no collective, and the
            # (Nv, 1, 1) bounds broadcast over each texel band/chunk.
            from ..baking.projection import (
                _AUTO_DEPTH_GRAD_FOOTPRINTS, _AUTO_POS_EPS_FOOTPRINTS,
            )

            footprint = _auto_footprint(
                cam_r, view_geo.view_mask, view_geo.view_depth, height
            )
            band_validity = SimpleUVValidityStrategy(
                pos_error_eps=(
                    _AUTO_POS_EPS_FOOTPRINTS * footprint
                    if isinstance(pos_error_eps, str) else pos_error_eps
                ),
                aoi_cos_thresh=aoi_cos_valid_threshold,
                depth_grad_thresh=(
                    _AUTO_DEPTH_GRAD_FOOTPRINTS * footprint
                    if isinstance(depth_grad_threshold, str)
                    else depth_grad_threshold
                ),
            )
        else:
            band_validity = validity
        weights = ExponentialBlend(
            alpha=uv_exp_blend_alpha, view_weight=view_weight_r
        )

        def gather_chunk(chunk):
            uv_attr_c, uv_mask_c, uv_pos_c = chunk
            pre_c = UVPrecomputeOutput(
                height=uv_pos_c.shape[0],
                width=uv_pos_c.shape[1],
                uv_attr=uv_attr_c,
                uv_mask=uv_mask_c,
                uv_pos=uv_pos_c,
            )
            geo = uv_gather_geometry(
                view_geo, cam_r, pre_c,
            )
            attr = uv_render_attr(
                images=images_r, masks=masks_r,
                uv_render_geometry_output=geo,
                pack_mode=images_pack_mode,
            )
            out = uv_blend_sum(pre_c, geo, attr, band_validity, weights)
            return (
                out.uv_attr_blend,
                out.uv_valid_mask_blend,
                geo.uv_depth_grad,
                geo.uv_aoi_cos,
            )

        if texel_chunks == 1:
            return gather_chunk((uv_attr_b, uv_mask_b, uv_pos_b))

        hb = uv_pos_b.shape[0]
        hc = hb // texel_chunks

        def chunked(a):
            return a.reshape(texel_chunks, hc, *a.shape[1:])

        blend_c, valid_c, dg_c, aoi_c = jax.lax.map(
            gather_chunk,
            (chunked(uv_attr_b), chunked(uv_mask_b), chunked(uv_pos_b)),
        )
        nv = dg_c.shape[1]
        wb = uv_pos_b.shape[1]
        return (
            blend_c.reshape(hb, wb, blend_c.shape[-1]),
            valid_c.reshape(hb, wb),
            dg_c.transpose(1, 0, 2, 3).reshape(nv, hb, wb),
            aoi_c.transpose(1, 0, 2, 3).reshape(nv, hb, wb),
        )

    row = P(axis_name)
    repl = P()
    sharded_band = _shard_map(
        band_fn,
        device_mesh,
        in_specs=(repl, repl, repl, repl, repl, row, row, row),
        out_specs=(row, row, P(None, axis_name), P(None, axis_name)),
    )

    @jax.jit
    def bake(images_j, masks_j, mesh_j, cam_j, view_weight_j):
        pre = uv_precompute(
            mesh_j, height=uv_size, width=uv_size, raster_config=raster_config
        )
        uv_attr_full = pre.uv_attr
        if uv_attr_full is None:
            # Texel-sharded region can't carry a None leaf; materialize the
            # from-scratch fill uv_blend_post would otherwise synthesize.
            uv_attr_full = jnp.ones((uv_size, uv_size, n_ch), jnp.float32)
        blend_raw, valid_blend, uv_depth_grad, uv_aoi_cos = sharded_band(
            images_j, masks_j, mesh_j, cam_j, view_weight_j,
            uv_attr_full, pre.uv_mask, pre.uv_pos,
        )
        uv_attr_blend = uv_blend_post(
            pre._replace(uv_attr=uv_attr_full),
            blend_raw,
            valid_blend,
            empty_value=1.0,
            do_uv_padding=do_uv_padding,
            pad_unseen_area=from_scratch,
            poisson_blending=poisson_blending,
            pb_num_iters=pb_num_iters,
            pb_keep_original_border=pb_keep_original_border,
        )
        # Keep the big outputs row-sharded on the way out (a replicated
        # output would all-gather (Nv, Huv, Wuv) maps for nothing).
        uv_attr_blend = jax.lax.with_sharding_constraint(
            uv_attr_blend, NamedSharding(device_mesh, row)
        )
        return uv_attr_blend, valid_blend, uv_depth_grad, uv_aoi_cos

    return bake

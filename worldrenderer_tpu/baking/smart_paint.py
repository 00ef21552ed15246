"""SmartPainter: iterative view-based texture inpainting.

Reference contract: mvadapter/utils/mesh_utils/smart_paint.py:37-335 —
loop: render a coverage "score map" texture from a grid of anchor cameras,
pick the worst-covered view, render it at high resolution, build an inpaint
mask (shrink -> enlarge, minus occlusion boundaries), run a pluggable
inpainting function, re-project the result into UV space, update the score
map; stop when the worst view score falls under threshold.

The loop stays host-driven (the inpainting network is an external callable,
reference smart_paint.py:272-276), but every geometric step inside a round
is the jitted TPU path: batched anchor rendering replaces nothing — the
reference already batches — and mask morphology uses reduce_window ops.
A weightless diffusion inpainter is provided as default so the loop runs
self-contained.
"""

from __future__ import annotations

from itertools import product
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import Camera, get_camera, normalize
from ..mesh import TexturedMesh
from ..ops.image import batch_dilate, batch_erode, inpaint, sobel_grad_magnitude
from ..render import render
from .projection import camera_projection
from .uv import uv_padding

__all__ = ["SmartPainter", "default_inpaint_func"]


def default_inpaint_func(image: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Weightless fallback inpainter: diffuse known pixels into the mask
    (stands in for the neural inpainter the reference plugs in)."""
    return inpaint(image, mask > 0.5, radius=64)


def _view_aoi_cos(render_out, cam: Camera) -> jnp.ndarray:
    """Camera-space normal z, zeroed outside the mask
    (reference smart_paint.py:113-143; note bg here is 0, unlike
    uv_render_geometry which keeps the raw background normal)."""
    n_cs = jnp.einsum("bhwj,bij->bhwi", render_out.normal, cam.w2c[:, :3, :3])
    n_cs = normalize(n_cs)
    n_cs = jnp.where(render_out.mask[..., None], n_cs, 0.0)
    return jnp.clip(n_cs[..., 2], 0.0, 1.0)


def _shrink_mask(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    return batch_erode(mask[None].astype(jnp.float32), 2 * radius + 1)[0] > 0.5


def _enlarge_mask(mask: jnp.ndarray, radius: int) -> jnp.ndarray:
    return batch_dilate(mask[None].astype(jnp.float32), 2 * radius + 1)[0] > 0.5


def _occlusion_boundary(
    view_depth: jnp.ndarray, dilation: int, thresh: float
) -> jnp.ndarray:
    grad = sobel_grad_magnitude(view_depth[None])[0]
    occ = grad > thresh
    if dilation > 0:
        occ = _enlarge_mask(occ, dilation)
    return occ


def _make_view_selection_cams(key: Optional[jnp.ndarray] = None) -> Camera:
    """Anchor rig: elevation x azimuth grid with slight position jitter
    (reference smart_paint.py:60-88)."""
    params = list(
        product(range(-60, 61, 15), range(0, 360, 30), [1.2], [40])
    )
    elevation, azimuth, distance, fovy = (list(p) for p in zip(*params))
    return get_camera(
        elevation_deg=np.asarray(elevation, np.float32),
        azimuth_deg=np.asarray(azimuth, np.float32),
        distance=np.asarray(distance, np.float32),
        fovy_deg=np.asarray(fovy, np.float32),
        perturb_camera_position=0.1,
        key=key,
    )


class SmartPainter:
    """Iterative worst-view inpainting loop (reference smart_paint.py:37-335)."""

    def __init__(self, raster_config=None):
        from ..ops.rasterize import DEFAULT_CONFIG

        self.raster_config = raster_config or DEFAULT_CONFIG

    def __call__(
        self,
        mesh: TexturedMesh,
        inpaint_func: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
        uv_texture: jnp.ndarray,
        uv_inpaint_mask: jnp.ndarray,
        max_view_score_thresh: float = 0.02,
        min_rounds: int = 3,
        max_rounds: int = 8,
        uv_padding_end: bool = True,
        score_render_size: int = 256,
        inpaint_render_size: int = 1024,
        key: Optional[jnp.ndarray] = None,
        saver=None,
        mod_name: str = "mod",
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (texture, covered_mask). ``inpaint_func`` maps
        ((H, W, C) image, (H, W) mask float) -> (H, W, C) image."""
        if key is None:
            key = jax.random.PRNGKey(0)
        cams = _make_view_selection_cams(key)

        texture_update = jnp.asarray(uv_texture, jnp.float32)
        uv_valid_mask_update = ~jnp.asarray(uv_inpaint_mask, bool)
        score_map_update = uv_valid_mask_update.astype(jnp.float32)

        max_view_score = 1.0
        i = 0
        while i < min_rounds or (
            max_view_score > max_view_score_thresh and i < max_rounds
        ):
            score_map_image = jnp.repeat(score_map_update[:, :, None], 3, axis=-1)
            out = render(
                mesh,
                cams,
                score_render_size,
                score_render_size,
                attr_background=1.0,
                texture_override=score_map_image,
                texture_filter_mode="nearest",
                render_depth=False,
                raster_config=self.raster_config,
            )
            aoi = _view_aoi_cos(out, cams)
            attr0 = out.attr[..., 0]
            # Score = uncovered area + aoi-weighted under-coverage
            # (reference smart_paint.py:144-159).
            uncovered = ((attr0 < 1e-3) & (aoi > 0.1)).sum(axis=(1, 2))
            weighted = (
                ((attr0 > 1e-3) & (aoi > 0.1)).astype(jnp.float32)
                * jnp.clip(aoi - attr0 - 0.3, a_min=0.0)
            ).sum(axis=(1, 2))
            view_score = np.asarray(
                (uncovered + weighted) / float(score_render_size**2)
            )
            max_view_score = float(view_score.max())
            best_view = int(view_score.argmax())
            best_cam = cams[best_view]

            out_hi = render(
                mesh,
                best_cam,
                inpaint_render_size,
                inpaint_render_size,
                attr_background=1.0,
                texture_override=score_map_image,
                texture_filter_mode="nearest",
                raster_config=self.raster_config,
            )
            aoi_hi = _view_aoi_cos(out_hi, best_cam)
            inpaint_mask = (out_hi.attr[0, :, :, 0] < 1e-3) | (
                aoi_hi[0] - out_hi.attr[0, :, :, 0] > 0.3
            )
            occ = _occlusion_boundary(out_hi.depth[0], dilation=0, thresh=0.1)
            # shrink (UV-seam speckle) -> enlarge (context) -> minus occlusion
            # boundary (bleeding), reference smart_paint.py:242-251.
            inpaint_mask = _enlarge_mask(_shrink_mask(inpaint_mask, 3), 5) & ~occ

            inpaint_image = render(
                mesh,
                best_cam,
                inpaint_render_size,
                inpaint_render_size,
                texture_override=texture_update,
                texture_filter_mode="linear",
                render_depth=False,
                render_normal=False,
                raster_config=self.raster_config,
            ).attr[0]

            inpaint_result = inpaint_func(
                inpaint_image, inpaint_mask.astype(jnp.float32)
            )
            if saver is not None:
                saver.save_image_grid(
                    f"{mod_name}_inpaint_result_{i:02d}.jpg",
                    [inpaint_image, inpaint_mask, inpaint_result],
                    rows=1,
                )

            proj = camera_projection(
                images=inpaint_result[None],
                mesh=mesh._replace(texture=texture_update),
                cam=best_cam,
                masks=inpaint_mask[None].astype(jnp.float32),
                from_scratch=False,
                poisson_blending=False,
                depth_grad_dilation=3,
                uv_exp_blend_alpha=3,
                aoi_cos_valid_threshold=0.1,
                uv_size=texture_update.shape[0],
                uv_padding=True,
                iou_rejection_threshold=None,
                raster_config=self.raster_config,
            )
            texture_update = proj.uv_proj
            uv_valid_mask_update = proj.uv_proj_mask | uv_valid_mask_update
            score_map_inpaint = jnp.where(
                proj.uv_proj_mask, proj.uv_aoi_cos[0], 0.0
            )
            score_map_update = jnp.maximum(score_map_update, score_map_inpaint)
            i += 1

        if uv_padding_end:
            texture_update = uv_padding(texture_update, uv_valid_mask_update, 3)
        return texture_update, uv_valid_mask_update

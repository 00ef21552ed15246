"""Compute ops: rasterization, interpolation, sampling, image ops, solvers."""

from .antialias import antialias
from .gbuffer import GBufferOutput, rasterize_gbuffer
from .grid_sample import grid_sample
from .image import (
    batch_dilate,
    batch_erode,
    batch_inpaint,
    inpaint,
    max_pool2d,
    sobel_grad_magnitude,
)
from .interpolate import interpolate
from .poisson import (
    PoissonBlendingSolver,
    poisson_blend,
    poisson_blend_cropped,
    poisson_blend_multigrid,
)
from .rasterize import (
    RasterizerConfig,
    auto_fast_config,
    rasterize,
    rasterize_db,
    rasterize_diff,
)
from .tensor import (
    c2w_to_polar,
    chunk_batch,
    fourier_position_encoding,
    get_activation,
    get_mvp_matrix,
    get_plucker_rays,
    polar_to_c2w,
    rays_intersect_bbox,
    reflect,
    scale_tensor,
    trunc_exp,
)
from .texture import texture, texture_construct_mip

__all__ = [
    "RasterizerConfig",
    "rasterize",
    "rasterize_diff",
    "auto_fast_config",
    "rasterize_db",
    "rasterize_gbuffer",
    "GBufferOutput",
    "interpolate",
    "texture",
    "texture_construct_mip",
    "grid_sample",
    "antialias",
    "reflect",
    "scale_tensor",
    "trunc_exp",
    "get_activation",
    "chunk_batch",
    "get_mvp_matrix",
    "rays_intersect_bbox",
    "get_plucker_rays",
    "c2w_to_polar",
    "polar_to_c2w",
    "fourier_position_encoding",
    "sobel_grad_magnitude",
    "max_pool2d",
    "batch_dilate",
    "batch_erode",
    "inpaint",
    "batch_inpaint",
    "poisson_blend",
    "poisson_blend_cropped",
    "poisson_blend_multigrid",
    "PoissonBlendingSolver",
]

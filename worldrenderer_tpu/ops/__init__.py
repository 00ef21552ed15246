"""Compute ops: rasterization, interpolation, sampling, image ops, solvers."""

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
from .poisson import PoissonBlendingSolver, poisson_blend
from .rasterize import RasterizerConfig, rasterize
from .texture import texture

__all__ = [
    "RasterizerConfig",
    "rasterize",
    "interpolate",
    "texture",
    "grid_sample",
    "sobel_grad_magnitude",
    "max_pool2d",
    "batch_dilate",
    "batch_erode",
    "inpaint",
    "batch_inpaint",
    "poisson_blend",
    "PoissonBlendingSolver",
]

"""Compute ops: rasterization, interpolation, sampling, image ops, solvers."""

from .grid_sample import grid_sample
from .interpolate import interpolate
from .rasterize import RasterizerConfig, rasterize
from .texture import texture

__all__ = [
    "RasterizerConfig",
    "rasterize",
    "interpolate",
    "texture",
    "grid_sample",
]

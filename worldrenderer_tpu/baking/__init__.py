"""Inverse rendering: UV-space rasterization, view->UV projection, blending.

TPU-native rebuild of the reference texture-baking layer
(mvadapter/utils/mesh_utils/{uv,projection,blend,cv_ops,warp}.py).
"""

from .uv import (
    UVPrecomputeOutput,
    UVRenderGeometryOutput,
    UVRenderAttrOutput,
    UVBlendOutput,
    SimpleUVValidityStrategy,
    ExponentialBlend,
    RandomChoiceBlend,
    uv_precompute,
    uv_render_geometry,
    uv_render_attr,
    uv_blend,
    uv_padding,
)
from .projection import CameraProjection, CameraProjectionOutput, camera_projection
from .smart_paint import SmartPainter, default_inpaint_func
from .warp import compute_warp_field, construct_grid_mesh
from .seg import RMBGModel, SegmentationModel, ThresholdMatting

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
    "uv_render_attr",
    "uv_blend",
    "uv_padding",
    "CameraProjection",
    "CameraProjectionOutput",
    "camera_projection",
    "SmartPainter",
    "default_inpaint_func",
    "compute_warp_field",
    "construct_grid_mesh",
    "SegmentationModel",
    "RMBGModel",
    "ThresholdMatting",
]

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
]

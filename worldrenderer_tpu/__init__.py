"""worldrenderer_tpu — TPU-native multi-view rendering + UV texture-projection
framework (JAX / XLA / Pallas), built from scratch with the capabilities of
the Tengpaz/WorldRenderer reference (see SURVEY.md)."""

__version__ = "0.1.0"

from . import baking, ops, parallel, scene
from .camera import (
    Camera,
    get_c2w,
    get_camera,
    get_orthogonal_camera,
    get_orthogonal_projection_matrix,
    get_projection_matrix,
    normalize,
    affine_inverse,
    rigid_inverse,
)
from .mesh import (
    TexturedMesh,
    compute_vertex_normals,
    compute_vertex_tangents,
    icosphere,
    load_mesh,
    make_grid_mesh,
    unify_mesh_uv,
    with_normals,
)
from .lod import LODChain, build_lod_chain, select_lod_level
from .ops import RasterizerConfig, grid_sample, interpolate, rasterize, texture
from .render import (
    DepthControlNetNormalization,
    RenderOutput,
    SimpleNormalization,
    Zero123PlusPlusNormalization,
    render,
)
from .transforms import dot, get_clip_space_position, transform_points_homo

__all__ = [
    "Camera",
    "LODChain",
    "build_lod_chain",
    "select_lod_level",
    "get_c2w",
    "get_camera",
    "get_orthogonal_camera",
    "get_projection_matrix",
    "get_orthogonal_projection_matrix",
    "normalize",
    "affine_inverse",
    "rigid_inverse",
    "TexturedMesh",
    "compute_vertex_normals",
    "compute_vertex_tangents",
    "with_normals",
    "load_mesh",
    "unify_mesh_uv",
    "icosphere",
    "make_grid_mesh",
    "RasterizerConfig",
    "rasterize",
    "interpolate",
    "texture",
    "grid_sample",
    "render",
    "RenderOutput",
    "DepthControlNetNormalization",
    "SimpleNormalization",
    "Zero123PlusPlusNormalization",
    "dot",
    "get_clip_space_position",
    "transform_points_homo",
]

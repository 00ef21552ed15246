"""Application layer: texture-baking pipeline, CLI apps.

Reference layer L6 (mvadapter/test/pipeline*.py,
mvadapter/test/utils/pipeline_texture.py).
"""

from .texture_pipeline import (
    ModProcessConfig,
    TexturePipeline,
    TexturePipelineOutput,
)
from .project_render import project_and_render

__all__ = [
    "ModProcessConfig",
    "TexturePipeline",
    "TexturePipelineOutput",
    "project_and_render",
]

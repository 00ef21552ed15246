"""Image <-> array conversion helpers and grid assembly.

Reference contracts: mvadapter/utils/mesh_utils/utils.py:22-125
(tensor_to_image, image_to_tensor, largest_factor_near_sqrt,
make_image_grid, get_current_timestamp) — numpy/PIL-based host helpers.
"""

from __future__ import annotations

import math
from datetime import datetime
from typing import List, Optional, Union

import numpy as np

__all__ = [
    "tensor_to_image",
    "image_to_tensor",
    "largest_factor_near_sqrt",
    "make_image_grid",
    "get_current_timestamp",
]


def tensor_to_image(data, batched: bool = False, format: str = "HWC"):
    """Array(s) -> PIL image(s). float in [0,1] and bool arrays are scaled
    to uint8 (reference utils.py:22-44)."""
    from PIL import Image

    if isinstance(data, Image.Image):
        return data
    data = np.asarray(data)
    if data.dtype in (np.float32, np.float16, np.float64):
        data = (np.clip(data, 0.0, 1.0) * 255).astype(np.uint8)
    elif data.dtype == np.bool_:
        data = data.astype(np.uint8) * 255
    assert data.dtype == np.uint8
    if format == "CHW":
        if batched and data.ndim == 4:
            data = data.transpose(0, 2, 3, 1)
        elif not batched and data.ndim == 3:
            data = data.transpose(1, 2, 0)
    if batched:
        return [Image.fromarray(d) for d in data]
    return Image.fromarray(data)


def image_to_tensor(image, return_type: str = "jnp"):
    """PIL image(s) / arrays -> float array in [0, 1]
    (reference utils.py:47-63; 'pt' becomes 'jnp')."""
    from PIL import Image

    assert return_type in ("np", "jnp")
    batched = True
    if isinstance(image, Image.Image):
        batched = False
        image = [image]
    if isinstance(image, list):
        image = np.stack([np.asarray(img) for img in image], axis=0)
        image = image.astype(np.float32) / 255.0
    image = np.asarray(image, np.float32)
    if not batched:
        image = image[0]
    if return_type == "jnp":
        import jax.numpy as jnp

        return jnp.asarray(image)
    return image


def largest_factor_near_sqrt(n: int) -> int:
    """Largest factor of n closest to sqrt(n) (reference utils.py:66-88)."""
    sqrt_n = int(math.sqrt(n))
    if sqrt_n * sqrt_n == n:
        return sqrt_n
    for i in range(sqrt_n, 0, -1):
        if n % i == 0:
            return i
    return 1


def make_image_grid(
    images: List,
    rows: Optional[int] = None,
    cols: Optional[int] = None,
    resize: Optional[int] = None,
):
    """Tile PIL images into one grid image (reference utils.py:91-120)."""
    from PIL import Image

    if rows is None and cols is not None:
        assert len(images) % cols == 0
        rows = len(images) // cols
    elif cols is None and rows is not None:
        assert len(images) % rows == 0
        cols = len(images) // rows
    elif rows is None and cols is None:
        rows = largest_factor_near_sqrt(len(images))
        cols = len(images) // rows
    assert len(images) == rows * cols
    if resize is not None:
        images = [img.resize((resize, resize)) for img in images]
    w, h = images[0].size
    grid = Image.new("RGB", size=(cols * w, rows * h))
    for i, img in enumerate(images):
        grid.paste(img.convert("RGB"), box=(i % cols * w, i // cols * h))
    return grid


def get_current_timestamp(fmt: str = "%Y%m%d%H%M%S") -> str:
    return datetime.now().strftime(fmt)

"""Bit-level parity with the torch ops the reference uses (grid_sample,
conv-based Sobel, max_pool). torch runs on host CPU as the oracle."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from worldrenderer_tpu.ops.grid_sample import grid_sample
from worldrenderer_tpu.ops.image import max_pool2d, sobel_grad_magnitude


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_grid_sample_matches_torch(rng, mode):
    image = rng.random((2, 9, 13, 3)).astype(np.float32)
    grid = (rng.random((2, 7, 5, 2)).astype(np.float32) * 2.4 - 1.2)  # incl. OOB

    ours = np.asarray(grid_sample(jnp.asarray(image), jnp.asarray(grid), mode=mode))

    t_img = torch.tensor(image).permute(0, 3, 1, 2)
    t_out = torch.nn.functional.grid_sample(
        t_img, torch.tensor(grid), mode=mode, align_corners=False,
        padding_mode="zeros",
    )
    ref = t_out.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-6)


def test_sobel_matches_torch(rng):
    depth = rng.random((2, 16, 16)).astype(np.float32)
    ours = np.asarray(sobel_grad_magnitude(jnp.asarray(depth)))

    gx_k = torch.tensor(
        [[1.0, 0, -1], [2, 0, -2], [1, 0, -1]]
    ).view(1, 1, 3, 3)
    gy_k = torch.tensor(
        [[1.0, 2, 1], [0, 0, 0], [-1, -2, -1]]
    ).view(1, 1, 3, 3)
    t = torch.tensor(depth)[:, None]
    gx = torch.nn.functional.conv2d(t, gx_k, padding=1)
    gy = torch.nn.functional.conv2d(t, gy_k, padding=1)
    ref = (gx**2 + gy**2).sqrt()[:, 0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("ksize", [3, 5])
def test_max_pool_matches_torch(rng, ksize):
    x = rng.random((2, 12, 12)).astype(np.float32)
    ours = np.asarray(max_pool2d(jnp.asarray(x), ksize))
    ref = torch.nn.functional.max_pool2d(
        torch.tensor(x)[:, None], ksize, stride=1, padding=ksize // 2
    )[:, 0].numpy()
    np.testing.assert_allclose(ours, ref, atol=0)


def test_uv_texture_sampling_matches_torch_grid_sample(rng):
    """Our texture() with wrap-free interior coords equals torch grid_sample
    on the equivalent NDC grid (the reference samples textures through
    dr.texture, which matches this convention on the interior)."""
    from worldrenderer_tpu.ops.texture import texture

    tex = rng.random((1, 16, 16, 3)).astype(np.float32)
    uv = rng.random((1, 6, 6, 2)).astype(np.float32) * 0.8 + 0.1  # interior
    ours = np.asarray(texture(jnp.asarray(tex), jnp.asarray(uv)))

    ndc = uv * 2.0 - 1.0
    t_out = torch.nn.functional.grid_sample(
        torch.tensor(tex).permute(0, 3, 1, 2),
        torch.tensor(ndc),
        mode="bilinear", align_corners=False, padding_mode="border",
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, t_out, atol=2e-6)


def test_grid_sample_bicubic_matches_torch(rng):
    image = rng.random((1, 11, 13, 3)).astype(np.float32)
    grid = (rng.random((1, 6, 7, 2)).astype(np.float32) * 1.8 - 0.9)
    ours = np.asarray(
        grid_sample(jnp.asarray(image), jnp.asarray(grid), mode="bicubic")
    )
    ref = torch.nn.functional.grid_sample(
        torch.tensor(image).permute(0, 3, 1, 2), torch.tensor(grid),
        mode="bicubic", align_corners=False, padding_mode="zeros",
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_parts_flat_batch_gather_bit_identical(rng):
    """grid_sample_parts flattens batched quad tables into one 2D gather
    (batched operands can get a planar layout, ~2.2x per gathered row on
    TPU); both layouts must produce bit-identical samples, f32 and
    u8-packed alike."""
    import importlib

    import jax.numpy as jnp

    gs = importlib.import_module("worldrenderer_tpu.ops.grid_sample")
    ims = jnp.asarray(rng.normal(size=(5, 37, 53, 3)).astype(np.float32))
    imq = jnp.asarray(
        (rng.integers(0, 256, size=(5, 37, 53, 2)) / 255.0).astype(np.float32)
    )
    grid = jnp.asarray(
        rng.uniform(-1.2, 1.2, size=(5, 17, 19, 2)).astype(np.float32)
    )
    parts = [(ims, "none"), (imq, "u8")]
    assert gs._FLAT_BATCH_GATHER  # the shipped default
    a = gs.grid_sample_parts(parts, grid)
    try:
        gs._FLAT_BATCH_GATHER = False
        b = gs.grid_sample_parts(parts, grid)
    finally:
        gs._FLAT_BATCH_GATHER = True
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

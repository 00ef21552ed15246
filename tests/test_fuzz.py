"""Seeded fuzz: adversarial random scenes vs the independent NumPy oracle.

The structured tests cover well-behaved meshes; real assets ship triangle
soups with degenerate faces, duplicate vertices, slivers, off-screen and
behind-camera geometry. Each seeded scene mixes all of those and must
agree with reference_raster.rasterize_np (which shares NO control-flow
structure with the tiled/binned/sorted implementation) on BOTH the
classic path and the fused G-buffer path, under the usual shared-edge
tie budget.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from reference_raster import rasterize_np
from worldrenderer_tpu.ops.gbuffer import rasterize_gbuffer
from worldrenderer_tpu.ops.rasterize import RasterizerConfig, rasterize

RES = (48, 64)


def _random_soup(seed):
    """A nasty clip-space triangle soup: random tris at mixed depths/sizes,
    plus injected degenerates (zero-area, duplicate-vertex, sliver,
    off-screen, behind-camera, near-plane-crossing)."""
    rng = np.random.default_rng(seed)
    n = 60
    # Base soup: random centers/extents, w in [0.5, 4] (positive depths).
    center = rng.uniform(-1.2, 1.2, (n, 1, 2))
    extent = rng.uniform(0.01, 0.8, (n, 1, 1))
    xy = center + extent * rng.uniform(-1, 1, (n, 3, 2))
    z = rng.uniform(-0.8, 0.8, (n, 3, 1))
    w = rng.uniform(0.5, 4.0, (n, 1, 1)) + rng.uniform(0, 0.3, (n, 3, 1))
    pos = np.concatenate([xy * w, z * w, w], axis=-1).astype(np.float32)

    # Injected degenerates (overwrite the first few triangles):
    pos[0, 1] = pos[0, 0]  # duplicate vertex -> zero area
    pos[1, :, :2] = pos[1, 0:1, :2]  # all three project to one point
    pos[2, :, 0] += 50.0  # far off-screen right
    pos[3, :, 3] = -1.0  # fully behind the camera (w < 0)
    pos[3, :, :3] *= -1.0
    # Sliver: a long, ~zero-height triangle across the screen.
    pos[4] = np.array(
        [[-2.0, 0.0, 0.0, 1.0], [2.0, 1e-4, 0.0, 1.0], [2.0, 0.0, 0.0, 1.0]],
        np.float32,
    )
    # Near-plane crossing: one vertex behind the camera.
    pos[5] = np.array(
        [[-0.5, -0.5, 0.0, 1.5], [0.5, -0.5, 0.0, 1.5], [0.0, 2.0, 0.5, -0.5]],
        np.float32,
    )
    tri = np.arange(n * 3, dtype=np.int32).reshape(n, 3)
    return pos.reshape(1, -1, 4), tri


def _tie_tolerant_compare(z_j, id_j, ref, tol_frac=0.01):
    """ids may differ on a small fraction of pixels (fp tie-breaking at
    shared/overlapping edges — the oracle iterates triangles, we sort);
    where ids agree, z must match tightly; where they differ, z must
    still be near-equal (a genuine depth tie), not a dropped triangle."""
    ids_n = ref[..., 3].astype(np.int32)
    z_n = np.where(ids_n > 0, ref[..., 2], np.inf)
    same = id_j == ids_n
    frac = 1.0 - same.mean()
    assert frac <= tol_frac, f"{frac:.3%} of pixel ids differ"
    both_fg = (id_j > 0) & (ids_n > 0)
    a, b = z_j[same & both_fg], z_n[same & both_fg]
    if a.size:
        assert np.abs(a - b).max() < 2e-4
    d = same == False  # noqa: E712
    if (d & both_fg).any():
        dz = np.abs(z_j[d & both_fg] - z_n[d & both_fg])
        assert dz.max() < 5e-2, dz.max()
    # Coverage flips beyond ties are dropped/excess triangles.
    cov_flip = (id_j > 0) != (ids_n > 0)
    assert cov_flip.mean() <= tol_frac


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fuzz_classic_vs_oracle(seed):
    pos, tri = _random_soup(seed)
    ref = rasterize_np(pos, tri, RES)
    rast = np.asarray(rasterize(jnp.asarray(pos), jnp.asarray(tri), RES))
    id_j = rast[0, ..., 3].astype(np.int32)
    z_j = np.where(id_j > 0, rast[0, ..., 2], np.inf)
    _tie_tolerant_compare(z_j, id_j, ref[0])


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("backend", ["fused_xla", "fused_pallas"])
def test_fuzz_fused_vs_oracle(seed, backend):
    pos, tri = _random_soup(seed)
    ref = rasterize_np(pos, tri, RES)
    cfg = RasterizerConfig(backend=backend, dot_precision="highest")
    g = rasterize_gbuffer(jnp.asarray(pos), jnp.asarray(tri), None, RES, cfg)
    # g.tri_id is already the rast id convention (tri index + 1, 0 = bg).
    id_j = np.where(np.asarray(g.mask), np.asarray(g.tri_id), 0)[0]
    z_j = np.where(id_j > 0, np.asarray(g.z)[0], np.inf)
    _tie_tolerant_compare(z_j, id_j, ref[0])


@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_tiny_path_vs_oracle(seed):
    """The same soups with many sub-pixel triangles routed through the
    two-sort tiny tier (bin_tiny_px) — the oracle doesn't know tiers."""
    rng = np.random.default_rng(100 + seed)
    n = 400
    center = rng.uniform(-1.0, 1.0, (n, 1, 2))
    extent = rng.uniform(0.002, 0.02, (n, 1, 1))  # mostly sub-pixel at 48x64
    xy = center + extent * rng.uniform(-1, 1, (n, 3, 2))
    z = rng.uniform(-0.5, 0.5, (n, 3, 1))
    pos = np.concatenate(
        [xy, z, np.ones_like(z)], axis=-1
    ).astype(np.float32).reshape(1, -1, 4)
    tri = np.arange(n * 3, dtype=np.int32).reshape(n, 3)
    ref = rasterize_np(pos, tri, RES)
    cfg = RasterizerConfig(
        backend="fused_xla", dot_precision="highest", bin_tiny_px=1.0
    )
    g = rasterize_gbuffer(jnp.asarray(pos), jnp.asarray(tri), None, RES, cfg)
    id_j = np.where(np.asarray(g.mask), np.asarray(g.tri_id), 0)[0]
    z_j = np.where(id_j > 0, np.asarray(g.z)[0], np.inf)
    _tie_tolerant_compare(z_j, id_j, ref[0], tol_frac=0.02)

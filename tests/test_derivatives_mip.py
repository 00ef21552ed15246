"""Image-space derivatives (rasterize_db / interpolate diff_attrs) and
mip-mapped texture filter modes.

Contracts: nvdiffrast as wrapped by the reference
(mvadapter/utils/mesh_utils/render.py:37-120): rast_db channels
(du/dX, du/dY, dv/dX, dv/dY); interpolate's out_da = (dA/dX, dA/dY) per
selected attribute; texture filter modes 'linear-mipmap-nearest' /
'linear-mipmap-linear' with uv_da / mip_level_bias level selection.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from worldrenderer_tpu.ops.interpolate import interpolate
from worldrenderer_tpu.ops.rasterize import rasterize, rasterize_db
from worldrenderer_tpu.ops.texture import texture, texture_construct_mip


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _big_triangle():
    """One triangle covering most of the screen, mild perspective."""
    pos = np.array(
        [
            [-0.9, -0.8, 0.2, 1.1],
            [0.9, -0.7, 0.3, 1.4],
            [0.0, 0.9, 0.4, 0.9],
        ],
        np.float32,
    )[None]
    tri = np.array([[0, 1, 2]], np.int32)
    return jnp.asarray(pos), jnp.asarray(tri)


def test_rast_db_matches_finite_differences():
    pos, tri = _big_triangle()
    res = 64
    rast, rast_db = rasterize_db(pos, tri, (res, res))
    rast = np.asarray(rast)[0]
    db = np.asarray(rast_db)[0]
    interior = rast[..., 3] > 0
    # Shrink to pixels whose 4-neighborhood is covered (central differences).
    core = (
        interior[1:-1, 1:-1]
        & interior[:-2, 1:-1] & interior[2:, 1:-1]
        & interior[1:-1, :-2] & interior[1:-1, 2:]
    )
    assert core.sum() > 200
    u = rast[..., 0]
    v = rast[..., 1]
    fd_du_dx = (u[1:-1, 2:] - u[1:-1, :-2]) * 0.5
    fd_du_dy = (u[2:, 1:-1] - u[:-2, 1:-1]) * 0.5
    fd_dv_dx = (v[1:-1, 2:] - v[1:-1, :-2]) * 0.5
    fd_dv_dy = (v[2:, 1:-1] - v[:-2, 1:-1]) * 0.5
    an = db[1:-1, 1:-1]
    for fd, ch in [
        (fd_du_dx, 0), (fd_du_dy, 1), (fd_dv_dx, 2), (fd_dv_dy, 3),
    ]:
        np.testing.assert_allclose(
            an[..., ch][core], fd[core], rtol=0.05, atol=2e-4,
        )
    # Background derivative is zero.
    assert np.all(db[~interior] == 0.0)


def test_interpolate_diff_attrs_matches_finite_differences(rng):
    pos, tri = _big_triangle()
    res = 64
    rast, rast_db = rasterize_db(pos, tri, (res, res))
    attr = jnp.asarray(rng.random((1, 3, 2)), jnp.float32)
    out, out_da = interpolate(attr, rast, tri, rast_db=rast_db, diff_attrs="all")
    out = np.asarray(out)[0]
    da = np.asarray(out_da)[0]
    interior = np.asarray(rast)[0][..., 3] > 0
    core = (
        interior[1:-1, 1:-1]
        & interior[:-2, 1:-1] & interior[2:, 1:-1]
        & interior[1:-1, :-2] & interior[1:-1, 2:]
    )
    for a_i in range(2):
        fd_dx = (out[1:-1, 2:, a_i] - out[1:-1, :-2, a_i]) * 0.5
        fd_dy = (out[2:, 1:-1, a_i] - out[:-2, 1:-1, a_i]) * 0.5
        np.testing.assert_allclose(
            da[1:-1, 1:-1, 2 * a_i][core], fd_dx[core], rtol=0.05, atol=2e-4
        )
        np.testing.assert_allclose(
            da[1:-1, 1:-1, 2 * a_i + 1][core], fd_dy[core], rtol=0.05, atol=2e-4
        )


def test_interpolate_diff_attrs_subset(rng):
    pos, tri = _big_triangle()
    rast, rast_db = rasterize_db(pos, tri, (16, 16))
    attr = jnp.asarray(rng.random((1, 3, 4)), jnp.float32)
    out_all, da_all = interpolate(attr, rast, tri, rast_db, "all")
    out_sel, da_sel = interpolate(attr, rast, tri, rast_db, [2])
    np.testing.assert_allclose(np.asarray(out_all), np.asarray(out_sel))
    np.testing.assert_allclose(
        np.asarray(da_sel), np.asarray(da_all)[..., 4:6]
    )


def test_rasterize_db_rast_matches_plain_rasterize():
    pos, tri = _big_triangle()
    rast_plain = rasterize(pos, tri, (32, 32))
    rast, _ = rasterize_db(pos, tri, (32, 32))
    np.testing.assert_allclose(np.asarray(rast), np.asarray(rast_plain))


def test_mip_chain_shapes(rng):
    tex = jnp.asarray(rng.random((1, 16, 32, 3)), jnp.float32)
    mips = texture_construct_mip(tex)
    assert [m.shape[1:3] for m in mips] == [(8, 16), (4, 8), (2, 4), (1, 2)]
    mips2 = texture_construct_mip(tex, max_mip_level=2)
    assert len(mips2) == 2


def test_mip_level_bias_selects_exact_level(rng):
    tex = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
    uv = jnp.asarray(rng.random((1, 5, 5, 2)) * 0.8 + 0.1, jnp.float32)
    mips = texture_construct_mip(tex)
    for lv in (0, 1, 2):
        got = texture(
            tex, uv, mip_level_bias=jnp.full((1, 5, 5), float(lv)),
            filter_mode="linear-mipmap-nearest",
        )
        want = texture(mips[lv - 1] if lv else tex, uv, filter_mode="linear")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-6)


def test_mipmap_linear_lerps_between_levels(rng):
    tex = jnp.asarray(rng.random((1, 16, 16, 2)), jnp.float32)
    uv = jnp.asarray(rng.random((1, 4, 4, 2)) * 0.8 + 0.1, jnp.float32)
    mips = texture_construct_mip(tex)
    got = texture(
        tex, uv, mip_level_bias=jnp.full((1, 4, 4), 1.25),
        filter_mode="linear-mipmap-linear",
    )
    s1 = texture(mips[0], uv, filter_mode="linear")
    s2 = texture(mips[1], uv, filter_mode="linear")
    want = 0.75 * np.asarray(s1) + 0.25 * np.asarray(s2)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-6)


def test_uv_da_level_selection(rng):
    """A pixel footprint of 4 texels (uv_da * tw = 4) selects level 2."""
    tex = jnp.asarray(rng.random((1, 32, 32, 1)), jnp.float32)
    uv = jnp.asarray(rng.random((1, 3, 3, 2)) * 0.6 + 0.2, jnp.float32)
    uv_da = jnp.zeros((1, 3, 3, 4), jnp.float32)
    uv_da = uv_da.at[..., 0].set(4.0 / 32.0)  # du/dX -> 4-texel step
    got = texture(
        tex, uv, uv_da=uv_da, filter_mode="linear-mipmap-nearest",
    )
    mips = texture_construct_mip(tex)
    want = texture(mips[1], uv, filter_mode="linear")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-6)


def test_auto_mode_resolution(rng):
    tex = jnp.asarray(rng.random((1, 8, 8, 1)), jnp.float32)
    uv = jnp.asarray(rng.random((1, 2, 2, 2)) * 0.5 + 0.25, jnp.float32)
    # auto without derivatives = plain linear
    a = texture(tex, uv, filter_mode="auto")
    b = texture(tex, uv, filter_mode="linear")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # auto with bias = trilinear
    c = texture(
        tex, uv, mip_level_bias=jnp.ones((1, 2, 2)), filter_mode="auto"
    )
    d = texture(
        tex, uv, mip_level_bias=jnp.ones((1, 2, 2)),
        filter_mode="linear-mipmap-linear",
    )
    np.testing.assert_allclose(np.asarray(c), np.asarray(d))


@pytest.mark.parametrize("boundary_mode", ["wrap", "clamp", "zero"])
def test_mip_boundary_modes_consistent(rng, boundary_mode):
    """Mip path at level 0 == single-level path for every boundary mode,
    including out-of-range coordinates."""
    tex = jnp.asarray(rng.random((1, 8, 8, 3)), jnp.float32)
    uv = jnp.asarray(rng.random((1, 6, 6, 2)) * 3.0 - 1.0, jnp.float32)
    got = texture(
        tex, uv, mip_level_bias=jnp.zeros((1, 6, 6)),
        filter_mode="linear-mipmap-nearest", boundary_mode=boundary_mode,
    )
    want = texture(tex, uv, filter_mode="linear", boundary_mode=boundary_mode)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-6)

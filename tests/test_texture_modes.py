"""texture() boundary/filter-mode semantics vs a direct NumPy reference.

The op's linear path fetches all four bilinear taps with ONE fused
quad-table gather (ops/texture.py); these tests pin it to the plain
four-tap definition (nvdiffrast semantics, reference render.py:83-120)
including far out-of-range coordinates for every boundary mode.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from worldrenderer_tpu.ops.texture import texture


def _ref_fetch(tex, iy, ix, mode):
    th, tw = tex.shape[0], tex.shape[1]
    if mode == "wrap":
        return tex[iy % th, ix % tw]
    inside = (0 <= iy < th) and (0 <= ix < tw)
    if mode == "zero" and not inside:
        return np.zeros(tex.shape[-1], tex.dtype)
    return tex[np.clip(iy, 0, th - 1), np.clip(ix, 0, tw - 1)]


def _ref_texture(tex, uv, filter_mode, boundary_mode):
    b, h, w, _ = uv.shape
    th, tw, c = tex.shape[1], tex.shape[2], tex.shape[3]
    out = np.zeros((b, h, w, c), np.float32)
    for bi in range(b):
        t = tex[bi if tex.shape[0] > 1 else 0]
        for i in range(h):
            for j in range(w):
                x = uv[bi, i, j, 0] * tw - 0.5
                y = uv[bi, i, j, 1] * th - 0.5
                if filter_mode == "nearest":
                    out[bi, i, j] = _ref_fetch(
                        t,
                        int(np.floor(y + 0.5)),
                        int(np.floor(x + 0.5)),
                        boundary_mode,
                    )
                    continue
                x0, y0 = int(np.floor(x)), int(np.floor(y))
                fx, fy = x - x0, y - y0
                acc = np.zeros(c, np.float64)
                for dy, wy in ((0, 1 - fy), (1, fy)):
                    for dx, wx in ((0, 1 - fx), (1, fx)):
                        acc += wx * wy * _ref_fetch(
                            t, y0 + dy, x0 + dx, boundary_mode
                        )
                out[bi, i, j] = acc
    return out


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize("boundary_mode", ["wrap", "clamp", "zero"])
@pytest.mark.parametrize("filter_mode", ["linear", "nearest"])
def test_texture_modes_match_reference(rng, boundary_mode, filter_mode):
    tex = rng.random((1, 9, 13, 3)).astype(np.float32)
    # Coordinates spanning far outside [0, 1] on both axes.
    uv = (rng.random((2, 7, 5, 2)) * 4.0 - 1.5).astype(np.float32)
    ref = _ref_texture(tex, uv, filter_mode, boundary_mode)
    ours = np.asarray(
        texture(
            jnp.asarray(tex), jnp.asarray(uv),
            filter_mode=filter_mode, boundary_mode=boundary_mode,
        )
    )
    np.testing.assert_allclose(ours, ref, atol=3e-6)


@pytest.mark.parametrize("boundary_mode", ["wrap", "clamp", "zero"])
def test_texture_straddle_taps_exact(rng, boundary_mode):
    """Pixels whose 2x2 footprint straddles the texture border — the case
    the padded quad table exists for."""
    tex = rng.random((1, 8, 8, 2)).astype(np.float32)
    edges = np.array(
        [
            [-0.01, 0.5], [0.01, 0.5], [0.99, 0.5], [1.01, 0.5],
            [0.5, -0.01], [0.5, 0.01], [0.5, 0.99], [0.5, 1.01],
            [-0.01, -0.01], [1.01, 1.01], [0.0, 0.0], [1.0, 1.0],
        ],
        np.float32,
    ).reshape(1, 12, 1, 2)
    ref = _ref_texture(tex, edges, "linear", boundary_mode)
    ours = np.asarray(
        texture(jnp.asarray(tex), jnp.asarray(edges), boundary_mode=boundary_mode)
    )
    np.testing.assert_allclose(ours, ref, atol=3e-6)


def test_texture_per_batch_textures(rng):
    """B distinct textures sample independently (no shared-broadcast path)."""
    tex = rng.random((3, 6, 6, 4)).astype(np.float32)
    uv = rng.random((3, 4, 4, 2)).astype(np.float32)
    ref = _ref_texture(tex, uv, "linear", "wrap")
    ours = np.asarray(texture(jnp.asarray(tex), jnp.asarray(uv)))
    np.testing.assert_allclose(ours, ref, atol=3e-6)


def test_texture_bf16_table_close_to_f32(rng):
    """A bfloat16 texture keeps the quad table in bf16 (1.3x faster
    gathers on v5e); outputs stay float32 and within bf16 texel
    precision of the f32 path."""
    tex = rng.random((1, 16, 16, 3)).astype(np.float32)
    uv = (rng.random((2, 8, 8, 2)) * 1.4 - 0.2).astype(np.float32)
    f32 = np.asarray(texture(jnp.asarray(tex), jnp.asarray(uv)))
    b16 = texture(jnp.asarray(tex, jnp.bfloat16), jnp.asarray(uv))
    assert b16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(b16), f32, atol=8e-3)


def test_render_auto_mip_reduces_minification_aliasing():
    """texture_filter_mode="auto_mip": mip level from screen-space UV
    finite differences. A fine checker viewed minified must come out close
    to its mean (box-filtered) instead of aliasing to near 0/1 patches."""
    import numpy as np

    from worldrenderer_tpu import TexturedMesh, get_camera, render
    from worldrenderer_tpu.mesh import make_grid_mesh

    verts, faces = make_grid_mesh(24, extent=1.0)
    uv = (verts[:, :2] - verts[:, :2].min(0)) / np.ptp(verts[:, :2], 0)
    t = (np.indices((256, 256)).sum(0) % 2).astype(np.float32)  # 1px checker
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.stack([t, t, t], -1),
    )
    cam = get_camera(
        elevation_deg=50.0, distance=3.0, fovy_deg=40.0, num_views=1,
        near=0.1, far=10.0,
    )
    lin = render(mesh, cam, 64, 64, render_depth=False, render_normal=False)
    mip = render(
        mesh, cam, 64, 64, render_depth=False, render_normal=False,
        texture_filter_mode="auto_mip",
    )
    m = np.asarray(lin.mask)
    a_lin = np.asarray(lin.attr[..., 0])[m]
    a_mip = np.asarray(mip.attr[..., 0])[m]
    # box-filtered checker converges to 0.5; auto_mip must sit far closer
    assert abs(a_mip.mean() - 0.5) < 0.05
    assert np.abs(a_mip - 0.5).mean() < 0.5 * np.abs(a_lin - 0.5).mean()


# --- cube-map sampling (boundary_mode='cube') ---------------------------
# The reference never exercises cube mode (its nvdiffrast wrapper only
# passes wrap/clamp, render.py:83-120); this closes the capability gap
# with the underlying library. Faces follow the OpenGL order/orientation.


def _cube_bake(size, fn):
    """Bake a smooth direction field fn(n)->(C,) into a (1,6,S,S,C) cube."""
    from worldrenderer_tpu.ops.texture import _cube_face_dirs

    face = np.repeat(np.arange(6), size * size)
    jj, ii = np.meshgrid(np.arange(size), np.arange(size), indexing="xy")
    sc = np.tile(((jj.ravel() + 0.5) / size) * 2 - 1, 6)
    tc = np.tile(((ii.ravel() + 0.5) / size) * 2 - 1, 6)
    d = _cube_face_dirs(face, sc, tc)
    n = d / np.linalg.norm(d, axis=-1, keepdims=True)
    vals = fn(n).astype(np.float32)
    return vals.reshape(6, size, size, -1)[None]


def _smooth_field(n):
    return np.stack(
        [np.sin(2.1 * n[..., 0] + 0.3), np.cos(1.7 * n[..., 1]),
         n[..., 2] * 0.5 + 0.5], -1
    )


def test_cube_linear_matches_field_including_edges(rng):
    size = 32
    tex = jnp.asarray(_cube_bake(size, _smooth_field))
    d = rng.normal(size=(1, 17, 13, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # force a block of directions to hug face edges (the seam-critical set)
    edge = np.stack(
        [np.ones(64), np.linspace(-1, 1, 64),
         np.where(np.arange(64) % 2 == 0, 1.0, -1.0) * (1 - 1e-4)], -1
    ).astype(np.float32)
    d[0, :4, :, :] = (
        edge / np.linalg.norm(edge, axis=-1, keepdims=True)
    ).reshape(4, 16, 3)[:, :13]
    out = np.asarray(texture(tex, jnp.asarray(d), boundary_mode="cube"))
    want = _smooth_field(d.astype(np.float64))
    assert np.abs(out - want).max() < 2e-2


def test_cube_exact_at_texel_centers(rng):
    from worldrenderer_tpu.ops.texture import _cube_face_dirs

    size = 16
    tex = rng.normal(size=(1, 6, size, size, 3)).astype(np.float32)
    face = np.repeat(np.arange(6), 4)
    iy = rng.integers(0, size, 24)
    ix = rng.integers(0, size, 24)
    sc = ((ix + 0.5) / size) * 2 - 1
    tc = ((iy + 0.5) / size) * 2 - 1
    d = _cube_face_dirs(face, sc, tc).astype(np.float32).reshape(1, 4, 6, 3)
    out = np.asarray(
        texture(jnp.asarray(tex), jnp.asarray(d), boundary_mode="cube")
    ).reshape(24, 3)
    np.testing.assert_allclose(out, tex[0, face, iy, ix], rtol=0, atol=1e-5)


def test_cube_nearest_picks_face(rng):
    size = 8
    tex = np.zeros((1, 6, size, size, 1), np.float32)
    tex[0, :, :, :, 0] = np.arange(6)[:, None, None]
    d = rng.normal(size=(2, 5, 5, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    out = np.asarray(
        texture(
            jnp.asarray(tex), jnp.asarray(d), boundary_mode="cube",
            filter_mode="nearest",
        )
    )[..., 0]
    ax = np.argmax(np.abs(d), axis=-1)
    sign = np.take_along_axis(d, ax[..., None], -1)[..., 0] < 0
    np.testing.assert_array_equal(out, ax * 2 + sign)


def test_cube_seam_continuity(rng):
    # walk across the +x/+z edge; consecutive bilinear samples of a random
    # texture must not jump more than one intra-face texel step does
    size = 16
    tex = jnp.asarray(rng.normal(size=(1, 6, size, size, 2)).astype(np.float32))
    t = np.linspace(-0.2, 0.2, 401)
    d = np.stack([1 + t, 0.1 * np.ones_like(t), 1 - t], -1).astype(np.float32)
    out = np.asarray(
        texture(tex, jnp.asarray(d).reshape(1, 1, -1, 3), boundary_mode="cube")
    )[0, 0]
    steps = np.abs(np.diff(out, axis=0)).max(-1)
    # the path crosses ~ size/2 texel boundaries over 400 samples; each step
    # covers << 1 texel so per-step deltas stay well under the texel range
    assert steps.max() < 0.35 * np.abs(np.asarray(tex)).max()


@pytest.mark.parametrize("mode", ["flat1d", "block8", "shard4"])
@pytest.mark.parametrize("shared", [True, False])
def test_gather_modes_bit_identical(rng, mode, shared):
    """Every gather lowering is the same function — modes exist only because
    XLA's TPU gather emitter is shape-dependent (non-monotonic in table
    size); outputs must match the default bit-for-bit."""
    tex = rng.normal(size=(1 if shared else 3, 37, 29, 3)).astype(np.float32)
    uv = rng.uniform(-0.2, 1.2, size=(3, 11, 13, 2)).astype(np.float32)
    base = np.asarray(texture(jnp.asarray(tex), jnp.asarray(uv)))
    got = np.asarray(
        texture(jnp.asarray(tex), jnp.asarray(uv), gather_mode=mode)
    )
    np.testing.assert_array_equal(got, base)


@pytest.mark.parametrize("boundary_mode", ["wrap", "clamp", "zero"])
@pytest.mark.parametrize("gather_mode", ["vmap", "block8"])
def test_pack_u8_bit_identical_on_quantized(rng, boundary_mode, gather_mode):
    """pack_mode='u8' gathers the 2x2 taps as bit-packed uint32 words
    (3 per row instead of 12 f32 columns). For 255-quantized textures
    (image-file sources) the unpacked taps are bit-identical to the f32
    quad table, so the blended output matches bit-for-bit."""
    q = rng.integers(0, 256, size=(2, 23, 31, 3))
    tex = (q.astype(np.float32) / 255.0).astype(np.float32)
    uv = rng.uniform(-0.2, 1.2, size=(2, 9, 17, 2)).astype(np.float32)
    base = np.asarray(
        texture(jnp.asarray(tex), jnp.asarray(uv), boundary_mode=boundary_mode)
    )
    got = np.asarray(
        texture(
            jnp.asarray(tex), jnp.asarray(uv), boundary_mode=boundary_mode,
            pack_mode="u8", gather_mode=gather_mode,
        )
    )
    np.testing.assert_array_equal(got, base)


def test_pack_u8_single_channel_and_shared(rng):
    q = rng.integers(0, 256, size=(1, 16, 16, 1))
    tex = (q.astype(np.float32) / 255.0).astype(np.float32)
    uv = rng.uniform(0, 1, size=(3, 7, 5, 2)).astype(np.float32)
    base = np.asarray(texture(jnp.asarray(tex), jnp.asarray(uv)))
    got = np.asarray(
        texture(jnp.asarray(tex), jnp.asarray(uv), pack_mode="u8")
    )
    np.testing.assert_array_equal(got, base)


def test_pack_u8_through_render():
    """texture_pack_mode threads through render() on both raster paths."""
    import jax

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh
    from worldrenderer_tpu.ops.rasterize import RasterizerConfig
    from worldrenderer_tpu.render import render

    rng = np.random.default_rng(3)
    verts, faces = make_grid_mesh(8, extent=1.0)
    uv = (verts[:, :2] - verts[:, :2].min(0)) / np.ptp(verts[:, :2], 0)
    q = rng.integers(0, 256, size=(32, 32, 3))
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.asarray(q, jnp.float32) / 255.0,
    )
    cam = get_camera(
        elevation_deg=30.0, distance=2.5, fovy_deg=45.0, num_views=2,
        near=0.1, far=10.0,
    )
    for backend in ("fused_xla", "xla"):
        cfg = RasterizerConfig(backend=backend)
        base = render(mesh, cam, 48, 48, render_attr=True, raster_config=cfg)
        got = render(
            mesh, cam, 48, 48, render_attr=True, raster_config=cfg,
            texture_pack_mode="u8",
        )
        np.testing.assert_array_equal(
            np.asarray(got.attr), np.asarray(base.attr)
        )


def test_pack_u8_mip_trilinear_identical_on_quantized(rng):
    """pack_mode='u8' on the mip path: every level 255-quantized +
    byte-packed. Passing an explicitly quantized mip stack makes it
    bit-identical to the f32 packed-row table."""
    from worldrenderer_tpu.ops.texture import texture_construct_mip

    q = rng.integers(0, 256, size=(1, 32, 32, 3))
    tex = jnp.asarray(q.astype(np.float32) / 255.0)
    mip_q = [
        jnp.round(m * 255.0) / 255.0 for m in texture_construct_mip(tex)
    ]
    uv = jnp.asarray(rng.uniform(0, 1, size=(2, 9, 9, 2)), jnp.float32)
    lvl = jnp.asarray(
        rng.uniform(0, len(mip_q), size=(2, 9, 9)), jnp.float32
    )
    base = np.asarray(
        texture(tex, uv, mip_level_bias=lvl, mip=mip_q,
                filter_mode="linear-mipmap-linear")
    )
    got = np.asarray(
        texture(tex, uv, mip_level_bias=lvl, mip=mip_q,
                filter_mode="linear-mipmap-linear", pack_mode="u8")
    )
    np.testing.assert_array_equal(got, base)


def test_render_auto_mip_honors_pack_mode():
    """texture_pack_mode threads into the auto_mip sampler (packed mip
    chain re-quantizes each level, so expect ~8-bit closeness, not
    bit-identity)."""
    import jax

    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh
    from worldrenderer_tpu.render import render

    rng = np.random.default_rng(9)
    verts, faces = make_grid_mesh(8, extent=1.0)
    uv = (verts[:, :2] - verts[:, :2].min(0)) / np.ptp(verts[:, :2], 0)
    q = rng.integers(0, 256, size=(64, 64, 3))
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.asarray(q, jnp.float32) / 255.0,
    )
    cam = get_camera(
        elevation_deg=40.0, distance=2.5, fovy_deg=45.0, num_views=1,
        near=0.1, far=10.0,
    )
    base = render(
        mesh, cam, 32, 32, render_attr=True, texture_filter_mode="auto_mip",
        texture_pack_mode="none",
    )
    packed = render(
        mesh, cam, 32, 32, render_attr=True, texture_filter_mode="auto_mip",
        texture_pack_mode="u8",
    )
    d = np.abs(np.asarray(packed.attr) - np.asarray(base.attr))
    assert d.max() <= 2.0 / 255.0, d.max()
    assert d.max() > 0.0  # the packed mip chain IS engaged (re-quantized)


def test_render_auto_pack_default():
    """render()'s texture_pack_mode='auto' default engages the packed
    sampler for 255-quantized textures (bit-identical) and falls back for
    float textures (also bit-identical to pack 'none')."""
    from worldrenderer_tpu import get_camera
    from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh
    from worldrenderer_tpu.render import render

    rng = np.random.default_rng(4)
    verts, faces = make_grid_mesh(8, extent=1.0)
    uv = (verts[:, :2] - verts[:, :2].min(0)) / np.ptp(verts[:, :2], 0)
    cam = get_camera(
        elevation_deg=30.0, distance=2.5, fovy_deg=45.0, num_views=1,
        near=0.1, far=10.0,
    )
    for tex in (
        rng.integers(0, 256, size=(32, 32, 3)).astype(np.float32) / 255.0,
        rng.random((32, 32, 3)).astype(np.float32),
    ):
        mesh = TexturedMesh(
            v_pos=jnp.asarray(verts, jnp.float32),
            t_pos_idx=jnp.asarray(faces, jnp.int32),
            v_tex=jnp.asarray(uv, jnp.float32),
            t_tex_idx=jnp.asarray(faces, jnp.int32),
            texture=jnp.asarray(tex),
        )
        auto = render(mesh, cam, 48, 48, render_attr=True)
        none = render(
            mesh, cam, 48, 48, render_attr=True, texture_pack_mode="none"
        )
        np.testing.assert_array_equal(
            np.asarray(auto.attr), np.asarray(none.attr)
        )

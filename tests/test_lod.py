"""LOD chains: decimation pyramid + screen-coverage level selection (the
forward rasterizer's sub-pixel-triangle answer; the reference decimates
unconditionally in mesh_process.py:168-220)."""

import jax.numpy as jnp
import numpy as np
import pytest

from worldrenderer_tpu import (
    LODChain, TexturedMesh, build_lod_chain, get_camera, select_lod_level,
)
from worldrenderer_tpu import meshproc
from worldrenderer_tpu.mesh import make_grid_mesh, uv_sphere_mesh
from worldrenderer_tpu.render import render

pytestmark = pytest.mark.skipif(
    not meshproc.native_available(), reason="native meshproc failed to build"
)


@pytest.fixture(scope="module")
def bumpy():
    verts, faces = make_grid_mesh(
        100, extent=1.0, height_fn=lambda x, y: 0.2 * np.sin(4 * x) * np.cos(4 * y)
    )
    return TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
    )


@pytest.fixture(scope="module")
def chain(bumpy):
    return build_lod_chain(bumpy, factors=(1, 4, 16))


def test_chain_face_counts(bumpy, chain):
    t = bumpy.num_faces
    assert len(chain) == 3
    assert chain.levels[0].num_faces == t
    assert chain.levels[1].num_faces <= t // 4 + 64
    assert chain.levels[2].num_faces <= t // 16 + 64


def test_level_selection_by_coverage(chain):
    near = get_camera(
        elevation_deg=30.0, distance=2.0, fovy_deg=50.0, num_views=1,
        near=0.1, far=50.0,
    )
    far = get_camera(
        elevation_deg=30.0, distance=30.0, fovy_deg=50.0, num_views=1,
        near=0.1, far=50.0,
    )
    # close-up at high res: full detail; tiny on screen: coarsest
    assert select_lod_level(chain, near, 1024, 1024) == 0
    assert select_lod_level(chain, far, 128, 128) == len(chain) - 1
    # a batch mixing near and far picks the finest any view needs
    import jax
    both = jax.tree_util.tree_map(
        lambda a, b: jnp.concatenate([a, b], axis=0), near, far
    )
    assert select_lod_level(chain, both, 1024, 1024) == 0


@pytest.mark.slow  # ~30-65 s compile-bound; full-lane only
def test_decimated_level_renders_similar_coverage(bumpy, chain):
    cam = get_camera(
        elevation_deg=35.0, distance=3.0, fovy_deg=50.0, num_views=1,
        near=0.1, far=10.0,
    )
    a = render(bumpy, cam, 128, 128, render_attr=False, render_normal=True)
    b = render(
        chain.levels[-1], cam, 128, 128, render_attr=False, render_normal=True
    )
    ca = float(jnp.mean(a.mask))
    cb = float(jnp.mean(b.mask))
    assert abs(ca - cb) < 0.03 * max(ca, 1e-6), (ca, cb)


def test_textured_chain_keeps_uvs():
    verts, faces, uv = uv_sphere_mesh(33, 65)
    tex = jnp.zeros((64, 64, 3), jnp.float32)
    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=tex,
    )
    chain = build_lod_chain(mesh, factors=(1, 4))
    lvl = chain.levels[1]
    assert lvl.v_tex is not None and lvl.texture is not None
    assert float(lvl.v_tex.min()) >= -1e-5 and float(lvl.v_tex.max()) <= 1 + 1e-5
    assert lvl.num_faces <= mesh.num_faces // 4 + 64

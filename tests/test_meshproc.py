"""Native mesh-processing library: weld, components, holes, smooth,
decimate, UV atlas, process_raw roundtrip."""

import numpy as np
import pytest

from worldrenderer_tpu import meshproc
from worldrenderer_tpu.mesh import icosphere, make_grid_mesh

pytestmark = pytest.mark.skipif(
    not meshproc.native_available(), reason="native meshproc failed to build"
)


def test_weld_merges_duplicates():
    v = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1.0000001, 0, 0], [0, 0, 1]],
        np.float64,
    )
    f = np.array([[0, 1, 2], [3, 4, 2]], np.int64)
    wv, wf = meshproc.weld_vertices(v, f, threshold=1e-3)
    assert len(wv) == 4  # vertex 3 merged into 1
    assert len(wf) == 2
    # topology now shares the merged vertex
    assert len(np.unique(wf)) == 4


def test_remove_small_components():
    v1, f1 = icosphere(2)
    v2, f2 = icosphere(0)
    v2 = v2 * 0.1 + 5.0
    v = np.concatenate([v1, v2])
    f = np.concatenate([f1, f2 + len(v1)])
    ov, of = meshproc.remove_small_components(v, f, min_faces=100)
    assert len(of) == len(f1)  # the tiny sphere (20 faces) dropped
    assert len(ov) == len(v1)


def test_fill_holes_closes_boundary():
    v, f = icosphere(2)
    f_holed = f[:-6]  # drop some faces to open holes
    ov, of = meshproc.fill_holes(v, f_holed, max_hole_size=30)
    # boundary edges (used once) should be gone after filling
    edges = np.sort(
        np.concatenate([of[:, [0, 1]], of[:, [1, 2]], of[:, [2, 0]]]), axis=1
    )
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all(), "mesh should be watertight after hole fill"


def test_taubin_smooth_preserves_volume_roughly(rng):
    v, f = icosphere(3)
    noisy = v + rng.normal(0, 0.01, v.shape)
    sv, sf = meshproc.taubin_smooth(noisy, f, steps=10)
    assert sv.shape == v.shape
    r = np.linalg.norm(sv, axis=1)
    # smoothing should reduce noise without collapsing the sphere
    assert abs(r.mean() - 1.0) < 0.05
    assert r.std() < np.linalg.norm(noisy, axis=1).std()


def test_decimate_reaches_target():
    v, f = icosphere(4)  # 5120 faces
    dv, df = meshproc.decimate(v, f, target_faces=500)
    assert len(df) <= 600
    assert len(df) >= 300
    # still roughly a unit sphere
    r = np.linalg.norm(dv, axis=1)
    assert abs(r.mean() - 1.0) < 0.1


def test_uv_atlas_valid_coords():
    v, f = icosphere(2)
    uv = meshproc.uv_parameterize_uvatlas(v, f, size=512)
    assert uv.shape == (len(f), 3, 2)
    assert uv.min() >= 0.0 and uv.max() <= 1.0
    # charts should occupy a reasonable area fraction (no degenerate packing)
    span = uv.reshape(-1, 2).max(0) - uv.reshape(-1, 2).min(0)
    assert span.min() > 0.3


def _edge_face_counts(faces):
    edges = np.sort(
        np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]),
        axis=1,
    )
    _, counts = np.unique(edges, axis=0, return_counts=True)
    return counts


def test_repair_non_manifold_edges():
    # edge (0,1) shared by THREE faces -> smallest-area extra face dropped
    v = np.array(
        [[0, 0, 0], [1, 0, 0], [0.5, 1, 0], [0.5, -1, 0], [0.5, 0, 0.2]],
        np.float64,
    )
    f = np.array([[0, 1, 2], [0, 1, 3], [0, 1, 4]], np.int64)
    rv, rf = meshproc.repair_non_manifold(v, f)
    assert _edge_face_counts(rf).max() <= 2
    assert len(rf) == 2
    # the small face (apex z=0.2, smallest area) is the one dropped
    assert not any(4 in face for face in rf)


def test_repair_non_manifold_bowtie_vertex():
    # two triangles joined only at vertex 0 (bowtie) -> vertex duplicated
    v = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [-1, 0, 0], [-1, -1, 0]], np.float64
    )
    f = np.array([[0, 1, 2], [0, 3, 4]], np.int64)
    rv, rf = meshproc.repair_non_manifold(v, f, vertdispratio=0.1)
    assert len(rv) == 6
    # faces no longer share any vertex
    assert len(set(rf[0]) & set(rf[1])) == 0
    # the duplicate moved toward its fan centroid by ~vertdispratio
    d = np.linalg.norm(rv - np.array([0.0, 0.0, 0.0]), axis=1)
    assert 0.0 < sorted(d)[1] < 0.2


def test_fill_holes_survives_non_manifold_input():
    # a sphere with a hole AND a 3-face edge: the process chain's repair must
    # leave fill_holes with clean topology (VERDICT r1 item 3)
    v, f = icosphere(2)
    v = np.concatenate([v, [[0.0, 0.0, 1.5]]])
    extra = np.array([[f[0][0], f[0][1], len(v) - 1]], np.int64)
    f_bad = np.concatenate([f[:-4], extra])  # 4 faces removed -> hole
    ov, of, on = meshproc.process_mesh(
        v, f_bad, targetfacenum=10**9, stepsmoothnum=0
    )
    assert _edge_face_counts(of).max() <= 2


def test_uv_atlas_honors_max_stretch():
    v, f = icosphere(3)
    bound = 1.0 / (1.0 - 1.0 / 6.0)
    meshproc.uv_parameterize_uvatlas(v, f, max_stretch=1.0 / 6.0)
    assert meshproc.last_atlas_stretch() <= bound + 1e-6
    # torus: genus-1, curvature in both signs
    nu, nv_ = 48, 24
    us = np.linspace(0, 2 * np.pi, nu, endpoint=False)
    vs = np.linspace(0, 2 * np.pi, nv_, endpoint=False)
    tv = np.array(
        [
            [(1 + 0.4 * np.cos(b)) * np.cos(a), (1 + 0.4 * np.cos(b)) * np.sin(a), 0.4 * np.sin(b)]
            for a in us
            for b in vs
        ]
    )
    tf = []
    for i in range(nu):
        for j in range(nv_):
            a0 = i * nv_ + j
            b0 = ((i + 1) % nu) * nv_ + j
            c0 = ((i + 1) % nu) * nv_ + (j + 1) % nv_
            d0 = i * nv_ + (j + 1) % nv_
            tf += [[a0, b0, c0], [a0, c0, d0]]
    meshproc.uv_parameterize_uvatlas(tv, np.array(tf), max_stretch=1.0 / 6.0)
    assert meshproc.last_atlas_stretch() <= bound + 1e-6


def test_decimate_with_texture_preserves_uvs():
    from worldrenderer_tpu.mesh import uv_sphere_mesh

    verts, faces, uvs = uv_sphere_mesh(33, 65)
    vp, vt, fo = meshproc.decimate_with_texture(
        np.asarray(verts, np.float64), np.asarray(uvs, np.float64),
        np.asarray(faces, np.int64), target_faces=1000,
    )
    assert len(fo) <= 1100
    assert vt.min() >= -1e-6 and vt.max() <= 1.0 + 1e-6
    r = np.linalg.norm(vp, axis=1)
    assert 0.9 < r.mean() < 1.05
    # UV-seam boundary edges survive: the seam-cut mesh keeps a boundary
    assert (_edge_face_counts(fo) == 1).any()


def test_decimate_with_texture_render_psnr():
    """Decimating a textured sphere 4x must re-render close to the original
    (the atlas survives collapse; reference capability
    decimate_quadric_edge_collapse_with_texture, mesh_process.py:30-47)."""
    import jax.numpy as jnp

    import worldrenderer_tpu as wr
    from worldrenderer_tpu.mesh import uv_sphere_mesh

    verts, faces, uvs = uv_sphere_mesh(33, 65)
    tex = (np.indices((128, 128)).sum(0) // 16 % 2).astype(np.float32)
    texture = jnp.stack([tex, 1 - tex, tex * 0 + 0.5], -1)

    def make(v, f, uv):
        return wr.TexturedMesh(
            v_pos=jnp.asarray(v, jnp.float32),
            t_pos_idx=jnp.asarray(f, jnp.int32),
            v_tex=jnp.asarray(uv, jnp.float32),
            t_tex_idx=jnp.asarray(f, jnp.int32),
            texture=texture,
        )

    cam = wr.get_camera(
        elevation_deg=[20.0], distance=[2.7], fovy_deg=[40.0],
        azimuth_deg=[30.0], near=0.1, far=10.0,
    )
    ref = wr.render(make(verts, faces, uvs), cam, 128, 128, render_attr=True)
    vp, vt, fo = meshproc.decimate_with_texture(
        np.asarray(verts, np.float64), np.asarray(uvs, np.float64),
        np.asarray(faces, np.int64), target_faces=len(faces) // 4,
    )
    out = wr.render(make(vp, fo, vt), cam, 128, 128, render_attr=True)
    both = np.asarray(ref.mask[..., 0] & out.mask[..., 0])
    assert both.mean() > 0.2
    err = (np.asarray(ref.attr) - np.asarray(out.attr))[both]
    psnr = -10.0 * np.log10(np.mean(err**2) + 1e-12)
    assert psnr > 18.0, f"texture PSNR after decimation too low: {psnr:.1f} dB"


def test_process_mesh_chain():
    v, f = icosphere(3)
    ov, of, on = meshproc.process_mesh(
        v, f, targetfacenum=400, maxholesize=30, stepsmoothnum=2
    )
    assert len(of) <= 500
    assert on.shape == ov.shape
    norms = np.linalg.norm(on, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_process_raw_roundtrip(tmp_path):
    from worldrenderer_tpu.scene.gltf import load_glb, save_glb

    v, f = make_grid_mesh(10, height_fn=lambda x, y: 0.1 * x * y)
    src = tmp_path / "in.glb"
    dst = tmp_path / "out.glb"
    save_glb(src, v.astype(np.float32), f.astype(np.uint32))
    meshproc.process_raw(str(src), str(dst), preprocess=False)
    out = load_glb(dst)
    assert out["uv"] is not None
    assert out["uv"].min() >= 0.0 and out["uv"].max() <= 1.0
    assert len(out["faces"]) == len(f)
    # surface area preserved (pure reparameterization)
    def area(verts, faces):
        c = np.cross(
            verts[faces[:, 1]] - verts[faces[:, 0]],
            verts[faces[:, 2]] - verts[faces[:, 0]],
        )
        return 0.5 * np.linalg.norm(c, axis=1).sum()

    np.testing.assert_allclose(
        area(out["vertices"], out["faces"]), area(v, f), rtol=1e-5
    )

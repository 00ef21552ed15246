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

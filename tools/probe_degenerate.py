"""On-chip degenerate-camera probes (run per round after kernel or
binning changes; each asserts and the script exits nonzero on failure):
elevation-90 (degenerate up vector), fully off-screen mesh, camera inside
an icosphere (near-plane crossings everywhere; clipless path + auto
budgets must give full interior coverage).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/probe_degenerate.py
Last run (v5e): elev90 cov 0.515, offscreen cov 0.0, inside-sphere cov
1.0 — ALL PROBES OK."""
import numpy as np, jax.numpy as jnp
import worldrenderer_tpu as wr
from worldrenderer_tpu.mesh import TexturedMesh, make_grid_mesh, uv_sphere_mesh
from worldrenderer_tpu.ops.rasterize import FAST_TPU_CONFIG, auto_fast_config
from worldrenderer_tpu.transforms import get_clip_space_position

verts, faces = make_grid_mesh(
    72, extent=1.0, height_fn=lambda x, y: 0.3 * np.sin(3 * x) * np.cos(3 * y)
)
mesh = TexturedMesh(v_pos=jnp.asarray(verts, jnp.float32),
                    t_pos_idx=jnp.asarray(faces, jnp.int32))

# 1. elevation 90 (up vector degenerate with look direction)
cam = wr.get_camera(elevation_deg=[90.0], distance=[3.0], fovy_deg=[50.0],
                    azimuth_deg=[0.0], near=0.1, far=10.0)
pc = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)
cfg = auto_fast_config(pc, mesh.t_pos_idx, (256, 256))
out = wr.render(mesh, cam, 256, 256, render_attr=False, render_depth=True,
                render_normal=True, raster_config=cfg)
print("elev90: coverage", float(out.mask.mean()),
      "finite", bool(np.isfinite(np.asarray(out.normal)).all()))
assert np.isfinite(np.asarray(out.normal)).all()
assert float(out.mask.mean()) > 0.3

# 2. mesh fully off-screen
cam2 = wr.get_camera(elevation_deg=[10.0], distance=[3.0], fovy_deg=[30.0],
                     azimuth_deg=[0.0], near=0.1, far=10.0)
far_mesh = mesh._replace(v_pos=mesh.v_pos + jnp.array([100.0, 0.0, 0.0]))
pc2 = get_clip_space_position(far_mesh.v_pos, cam2.mvp_mtx)
cfg2 = auto_fast_config(pc2, far_mesh.t_pos_idx, (256, 256))
out2 = wr.render(far_mesh, cam2, 256, 256, render_attr=False,
                 render_depth=True, render_normal=True, raster_config=cfg2)
print("offscreen: coverage", float(out2.mask.mean()),
      "finite", bool(np.isfinite(np.asarray(out2.depth)).all()))
assert float(out2.mask.mean()) == 0.0
assert np.isfinite(np.asarray(out2.depth)).all()

# 3. camera inside an icosphere (near-plane crossings everywhere)
sv, sf, _ = uv_sphere_mesh(33, 65)
sphere = TexturedMesh(v_pos=jnp.asarray(sv, jnp.float32),
                      t_pos_idx=jnp.asarray(sf, jnp.int32))
cam3 = wr.get_camera(elevation_deg=[0.0], distance=[0.2], fovy_deg=[80.0],
                     azimuth_deg=[30.0], near=0.05, far=10.0)
pc3 = get_clip_space_position(sphere.v_pos, cam3.mvp_mtx)
cfg3 = auto_fast_config(pc3, sphere.t_pos_idx, (256, 256))
out3 = wr.render(sphere, cam3, 256, 256, render_attr=False,
                 render_depth=True, render_normal=True, raster_config=cfg3)
cov3 = float(out3.mask.mean())
print("inside-sphere: coverage", cov3,
      "finite", bool(np.isfinite(np.asarray(out3.normal)).all()))
assert cov3 > 0.95  # the sphere interior surrounds the camera
assert np.isfinite(np.asarray(out3.normal)).all()
print("ALL PROBES OK")

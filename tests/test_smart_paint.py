"""SmartPainter: one-round smoke test with the weightless inpainter on a
small textured sphere with a masked-out texture region."""

import jax.numpy as jnp
import numpy as np
import pytest

from worldrenderer_tpu.baking.smart_paint import SmartPainter, default_inpaint_func
from worldrenderer_tpu.mesh import TexturedMesh, uv_sphere_mesh

UV = 64


@pytest.mark.slow
def test_smart_painter_fills_masked_region():
    verts, faces, uv = uv_sphere_mesh(17, 33)
    tex = np.full((UV, UV, 3), 0.6, np.float32)
    inpaint_mask = np.zeros((UV, UV), bool)
    inpaint_mask[24:40, 24:40] = True
    tex[inpaint_mask] = 0.0

    mesh = TexturedMesh(
        v_pos=jnp.asarray(verts, jnp.float32),
        t_pos_idx=jnp.asarray(faces, jnp.int32),
        v_tex=jnp.asarray(uv, jnp.float32),
        t_tex_idx=jnp.asarray(faces, jnp.int32),
        texture=jnp.asarray(tex),
    )

    painter = SmartPainter()
    out_tex, covered = painter(
        mesh,
        default_inpaint_func,
        jnp.asarray(tex),
        jnp.asarray(inpaint_mask),
        min_rounds=1,
        max_rounds=2,
        max_view_score_thresh=1.0,  # stop after min_rounds
        score_render_size=64,
        inpaint_render_size=128,
    )
    out_tex = np.asarray(out_tex)
    covered = np.asarray(covered)
    assert out_tex.shape == tex.shape
    assert np.isfinite(out_tex).all()
    # coverage can only grow
    assert covered.mean() >= (~inpaint_mask).mean() - 1e-6
    # the hole region should have moved toward the surrounding color
    hole_vals = out_tex[inpaint_mask]
    assert hole_vals.mean() > 0.2, f"hole not inpainted: {hole_vals.mean()}"

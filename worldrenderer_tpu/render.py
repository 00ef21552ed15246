"""G-buffer rendering: one jittable call produces mask / position / depth /
textured color / normal / tangent maps for a batch of views.

Reference contract: mvadapter/utils/mesh_utils/render.py:220-286 (render) and
render.py:152-217 (depth normalization strategies). In-place torch mutations
(``gb_nrm[~mask] = bg``) become ``jnp.where``; everything is traced once and
fused by XLA.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .camera import Camera, normalize
from .mesh import TexturedMesh, with_normals
from .ops import RasterizerConfig, interpolate, rasterize, texture
from .ops.rasterize import DEFAULT_CONFIG
from .transforms import get_clip_space_position, transform_points_homo

__all__ = [
    "RenderOutput",
    "render",
    "DepthControlNetNormalization",
    "Zero123PlusPlusNormalization",
    "SimpleNormalization",
]


class RenderOutput(NamedTuple):
    attr: Optional[jnp.ndarray] = None
    mask: Optional[jnp.ndarray] = None
    depth: Optional[jnp.ndarray] = None
    normal: Optional[jnp.ndarray] = None
    tangent: Optional[jnp.ndarray] = None
    pos: Optional[jnp.ndarray] = None


class DepthControlNetNormalization(NamedTuple):
    """Inverted per-view min/max depth (reference render.py:164-183)."""

    far_clip: float = 0.25
    near_clip: float = 1.0
    bg_value: float = 0.0

    def __call__(self, depth: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        b = depth.shape[0]
        flat = depth.reshape(b, -1)
        mn = flat.min(axis=-1)[:, None, None]
        mx = flat.max(axis=-1)[:, None, None]
        d = 1.0 - jnp.clip((depth - mn) / (mx - mn + 1e-5), 0.0, 1.0)
        d = d * (self.near_clip - self.far_clip) + self.far_clip
        return jnp.where(mask, d, self.bg_value)


class Zero123PlusPlusNormalization(NamedTuple):
    """Per-view min/max depth (reference render.py:186-196)."""

    bg_value: float = 0.8

    def __call__(self, depth: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        b = depth.shape[0]
        flat = depth.reshape(b, -1)
        mn = flat.min(axis=-1)[:, None, None]
        mx = flat.max(axis=-1)[:, None, None]
        d = jnp.clip((depth - mn) / (mx - mn + 1e-5), 0.0, 1.0)
        return jnp.where(mask, d, self.bg_value)


class SimpleNormalization(NamedTuple):
    """Affine scale/offset depth mapping (reference render.py:199-217)."""

    scale: float = 1.0
    offset: float = -1.0
    clamp: bool = True
    bg_value: float = 1.0

    def __call__(self, depth: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        d = depth * self.scale + self.offset
        if self.clamp:
            d = jnp.clip(d, 0.0, 1.0)
        return jnp.where(mask, d, self.bg_value)


def _fd_uv_da(tex_c: jnp.ndarray) -> jnp.ndarray:
    """Screen-space UV footprint by forward finite differences of the
    per-pixel (u, v) image: channels (du/dX, du/dY, dv/dX, dv/dY) for
    :func:`..ops.texture.texture`'s mip-level selection
    (``texture_filter_mode="auto_mip"``).

    Inside a triangle (u, v) are smooth, so the FD matches the analytic
    derivative to first order; across triangle/background boundaries it is
    wrong, but there it only perturbs the MIP LEVEL of edge pixels (a
    filtering choice, not a geometry value) — the TPU-native trade against
    carrying analytic derivative planes through the fused kernel."""
    du_dx = jnp.diff(tex_c, axis=2, append=tex_c[:, :, -1:])
    du_dy = jnp.diff(tex_c, axis=1, append=tex_c[:, -1:])
    return jnp.concatenate(
        [du_dx[..., 0:1], du_dy[..., 0:1], du_dx[..., 1:2], du_dy[..., 1:2]],
        axis=-1,
    )


def _render_fused(
    mesh: TexturedMesh,
    cam: Camera,
    v_pos_clip: jnp.ndarray,
    height: int,
    width: int,
    *,
    render_attr: bool,
    render_depth: bool,
    render_normal: bool,
    render_tangent: bool,
    antialias_attr: bool,
    depth_normalization_strategy,
    attr_background,
    normal_background,
    tangent_background,
    texture_override,
    texture_filter_mode: str,
    texture_gather_mode: str,
    texture_pack_mode: str,
    raster_config: RasterizerConfig,
) -> "RenderOutput":
    """Gather-free fast path: all requested channels ride attribute planes
    through one fused rasterization (ops/gbuffer.py). Normals/tangents are
    interpolated over the primary topology (per-vertex values required; UV
    seams get primary-vertex normals rather than the stitched-topology
    blend of the classic path — identical on stitched meshes). Texture
    coordinates ride as channels when UVs are per-primary-vertex."""
    from .mesh import compute_vertex_normals
    from .ops.gbuffer import rasterize_gbuffer

    nv = mesh.v_pos.shape[0]
    # World position is derived by unprojecting the depth plane (pure math,
    # exact for points on the triangle plane) instead of carrying three
    # attribute-plane rows — 25% less gather + matmul in the hot kernel.
    channels = []
    slices = {}
    at = 0

    if render_normal:
        v_nrm = mesh.v_nrm
        if v_nrm is None or v_nrm.shape[0] != nv:
            v_nrm = compute_vertex_normals(mesh.v_pos, mesh.t_pos_idx)
        channels.append(v_nrm)
        slices["normal"] = (at, at + 3)
        at += 3
    if render_tangent:
        v_tang = mesh.v_tang
        if v_tang is None or v_tang.shape[0] != nv:
            raise ValueError("fused path needs per-primary-vertex tangents")
        channels.append(v_tang)
        slices["tangent"] = (at, at + 3)
        at += 3
    sample_uv = render_attr and mesh.v_tex is not None and mesh.v_tex.shape[0] == nv
    if render_attr and not sample_uv:
        raise ValueError(
            "fused path requires per-primary-vertex UVs for attr rendering; "
            "use the classic backend for split UV topologies"
        )
    if sample_uv:
        channels.append(mesh.v_tex)
        slices["uv"] = (at, at + 2)
        at += 2

    v_attr = jnp.concatenate(channels, axis=-1) if channels else None
    out = rasterize_gbuffer(
        v_pos_clip, mesh.t_pos_idx, v_attr, (height, width), raster_config,
        pos_world=mesh.v_pos, mvp=cam.mvp_mtx,
    )
    mask = out.mask

    # Unproject NDC (x, y, z) through the inverse MVP to world position.
    inv_mvp = jnp.linalg.inv(cam.mvp_mtx)  # (B, 4, 4)
    px = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    py = (jnp.arange(height, dtype=jnp.float32) + 0.5) / height * 2.0 - 1.0
    ndc = jnp.stack(
        [
            jnp.broadcast_to(px[None, None, :], out.z.shape),
            jnp.broadcast_to(py[None, :, None], out.z.shape),
            out.z,
            jnp.ones_like(out.z),
        ],
        axis=-1,
    )  # (B, H, W, 4)
    world_h = jnp.einsum("bhwj,bij->bhwi", ndc, inv_mvp,
                         precision=jax.lax.Precision.HIGHEST)
    w_div = jnp.where(jnp.abs(world_h[..., 3:4]) < 1e-20, 1e-20, world_h[..., 3:4])
    gb_pos = jnp.where(mask[..., None], world_h[..., :3] / w_div, 0.0)
    res = {"mask": mask, "pos": gb_pos}

    if render_depth:
        gb_pos_vs = transform_points_homo(gb_pos, cam.w2c)
        gb_depth = -gb_pos_vs[..., 2]
        b = gb_depth.shape[0]
        mn = jnp.where(mask, gb_depth, jnp.inf).reshape(b, -1).min(axis=-1)[
            :, None, None
        ]
        gb_depth = jnp.where(mask, gb_depth, mn)
        if depth_normalization_strategy is not None:
            gb_depth = depth_normalization_strategy(gb_depth, mask)
        res["depth"] = gb_depth

    if render_normal:
        a0, a1 = slices["normal"]
        gb_nrm = normalize(out.attr[..., a0:a1])
        res["normal"] = jnp.where(mask[..., None], gb_nrm, normal_background)

    if render_tangent:
        a0, a1 = slices["tangent"]
        gb_tang = normalize(out.attr[..., a0:a1])
        res["tangent"] = jnp.where(mask[..., None], gb_tang, tangent_background)

    if sample_uv:
        a0, a1 = slices["uv"]
        tex_c = out.attr[..., a0:a1]
        tex = texture_override if texture_override is not None else mesh.texture
        if texture_filter_mode == "auto_mip":
            gb_rgb_fg = texture(
                tex[None], tex_c, uv_da=_fd_uv_da(tex_c), filter_mode="auto",
                pack_mode=texture_pack_mode,
            )
        else:
            gb_rgb_fg = texture(
                tex[None], tex_c, filter_mode=texture_filter_mode,
                gather_mode=texture_gather_mode,
                pack_mode=texture_pack_mode,
            )
        gb_rgb = jnp.where(
            mask[..., None], gb_rgb_fg, jnp.ones_like(gb_rgb_fg) * attr_background
        )
        if antialias_attr:
            from .ops.antialias import antialias as aa

            rast_like = jnp.concatenate(
                [
                    jnp.zeros_like(out.z)[..., None],
                    jnp.zeros_like(out.z)[..., None],
                    out.z[..., None],
                    out.tri_id.astype(jnp.float32)[..., None],
                ],
                axis=-1,
            )
            gb_rgb = aa(gb_rgb, rast_like, v_pos_clip, mesh.t_pos_idx)
        res["attr"] = gb_rgb

    return RenderOutput(**res)


def render(
    mesh: TexturedMesh,
    cam: Camera,
    height: int,
    width: int,
    render_attr: bool = True,
    render_depth: bool = True,
    render_normal: bool = True,
    render_tangent: bool = False,
    antialias_attr: bool = False,
    depth_normalization_strategy=DepthControlNetNormalization(),
    attr_background: Union[float, jnp.ndarray] = 0.5,
    normal_background: Union[float, jnp.ndarray] = 0.0,
    tangent_background: Union[float, jnp.ndarray] = 0.0,
    texture_override: Optional[jnp.ndarray] = None,
    texture_filter_mode: str = "linear",
    texture_gather_mode: str = "vmap",
    texture_pack_mode: str = "auto",
    raster_config: RasterizerConfig = DEFAULT_CONFIG,
    ssaa: int = 1,
    view_chunk: int = 0,
) -> RenderOutput:
    """Render per-view G-buffers (reference render.py:220-286).

    Whole view batches render in one traced computation — the per-view Python
    loop of the reference app (test/pipeline.py:194) disappears into the
    batch axis.

    ``view_chunk``: process the view batch in sequential chunks of this
    size (``lax.map``; 0 = whole batch at once). Large batches make the
    rasterizer's flat record table proportionally large, and the TPU
    gather emitter's per-row cost RISES with table size (non-monotonically
    — measured on the 32-view config2 orbit: whole-batch 651 views/s,
    chunks of 8 = 731, chunks of 16 = 545, interleaved A/B). A/B per
    workload; every per-view output is independent so results only differ
    at the usual per-shape FMA-tiling ULPs.

    ``ssaa``: supersampling factor. ssaa=N renders at (N*H, N*W) and
    box-downfilters every channel — the gold-standard geometric
    antialiasing, orthogonal to ``antialias_attr``'s analytic edge blend.
    The returned ``mask`` becomes FLOAT coverage in [0, 1] (interior 1.0,
    silhouette fractional); averaged ``normal``/``tangent`` are not
    re-normalized (linear-space filtering, as an image downsampler would).
    Note any scene-tuned ``raster_config`` (auto_fast_config / binning
    budgets) must be sized for the SUPERSAMPLED resolution.
    """
    if texture_pack_mode == "auto":
        # Byte-pack the texture gather when the texture is 255-quantized
        # (image-file sources, i.e. every GLB/PNG-loaded mesh): packed
        # taps are bit-identical for k/255 texels (ops/texture.py).
        # The quantization check runs ONLY on host-resident numpy input
        # (as camera_projection's images_pack_mode='auto' does): calling
        # np.asarray on a device-resident jax.Array would pull the whole
        # texture back through the axon tunnel (~2 MB/s, ~6 s for a
        # 1024^2 RGB) on EVERY eager render. Device arrays / tracers /
        # float textures fall back to the f32 table.
        # auto never upgrades under texture_filter_mode='auto_mip': the
        # packed mip chain re-quantizes every downsampled level to 8 bits
        # (lossy by up to ~2/255) — opt into that with an explicit
        # texture_pack_mode='u8'.
        texture_pack_mode = "none"
        tex_auto = texture_override if texture_override is not None else mesh.texture
        # Size gate: packing trades 4x narrower gather rows for per-row
        # byte-unpack VPU work, and the trade is SHAPE-DEPENDENT (PERF.md
        # §1-2: never predict gather perf): measured interleaved on-chip,
        # u8 wins 1.14x on a 1024^2 table (config4) and LOSES 0.90x on
        # the town fixture's 256x768 strip atlas, whose gather already
        # runs at coherent-row speed. Auto only upgrades tables at least
        # ~512^2 texels; explicit texture_pack_mode='u8' is always
        # honored (bit-exact either way for quantized textures).
        big_enough = (
            tex_auto is not None
            and hasattr(tex_auto, "shape")
            and len(tex_auto.shape) >= 2
            and int(tex_auto.shape[0]) * int(tex_auto.shape[1]) >= 512 * 512
        )
        if render_attr and texture_filter_mode != "auto_mip" and big_enough:
            # Load-time registration: load_mesh verified quantization on
            # the HOST numpy image before upload, so device-resident
            # loaded meshes take the packed path with zero transfers
            # (mesh.register_quantized_texture).
            from .mesh import is_registered_quantized_texture

            if is_registered_quantized_texture(tex_auto):
                texture_pack_mode = "u8"
        checkable = isinstance(tex_auto, np.ndarray)
        if (
            not checkable
            and isinstance(tex_auto, jax.Array)
            and not isinstance(tex_auto, jax.core.Tracer)
        ):
            # Concrete arrays already on a host (CPU) backend are a memcpy
            # away; anything on an accelerator stays un-inspected.
            try:
                checkable = all(
                    d.platform == "cpu" for d in tex_auto.devices()
                )
            except Exception:
                checkable = False
        if (
            render_attr and texture_filter_mode != "auto_mip"
            and checkable and big_enough
        ):
            a = np.asarray(tex_auto)
            if a.size and a.min() >= 0.0 and a.max() <= 1.0:
                r = a * 255.0
                if np.abs(r - np.round(r)).max() <= 1e-4:
                    texture_pack_mode = "u8"

    n_views_total = int(cam.mvp_mtx.shape[0])
    if view_chunk and 0 < view_chunk < n_views_total:
        if n_views_total % view_chunk != 0:
            raise ValueError(
                f"view_chunk {view_chunk} must divide the view count "
                f"{n_views_total}"
            )
        n_chunks = n_views_total // view_chunk
        cam_c = jax.tree_util.tree_map(
            lambda x: x.reshape(n_chunks, view_chunk, *x.shape[1:]), cam
        )

        def one_chunk(cv):
            return render(
                mesh, cv, height, width,
                render_attr=render_attr, render_depth=render_depth,
                render_normal=render_normal, render_tangent=render_tangent,
                antialias_attr=antialias_attr,
                depth_normalization_strategy=depth_normalization_strategy,
                attr_background=attr_background,
                normal_background=normal_background,
                tangent_background=tangent_background,
                texture_override=texture_override,
                texture_filter_mode=texture_filter_mode,
                texture_gather_mode=texture_gather_mode,
                texture_pack_mode=texture_pack_mode,
                raster_config=raster_config,
                ssaa=ssaa,
            )

        out = jax.lax.map(one_chunk, cam_c)
        return RenderOutput(**{
            k: None if v is None else v.reshape(n_views_total, *v.shape[2:])
            for k, v in out._asdict().items()
        })

    if ssaa > 1:
        out = render(
            mesh, cam, height * ssaa, width * ssaa,
            render_attr=render_attr, render_depth=render_depth,
            render_normal=render_normal, render_tangent=render_tangent,
            antialias_attr=antialias_attr,
            depth_normalization_strategy=depth_normalization_strategy,
            attr_background=attr_background,
            normal_background=normal_background,
            tangent_background=tangent_background,
            texture_override=texture_override,
            texture_filter_mode=texture_filter_mode,
            texture_gather_mode=texture_gather_mode,
            texture_pack_mode=texture_pack_mode,
            raster_config=raster_config,
        )

        def down(x):
            if x is None:
                return None
            b = x.shape[0]
            if x.ndim == 3:  # (B, H, W)
                return x.astype(jnp.float32).reshape(
                    b, height, ssaa, width, ssaa
                ).mean((2, 4))
            c = x.shape[-1]
            return x.reshape(b, height, ssaa, width, ssaa, c).mean((2, 4))

        return RenderOutput(**{k: down(v) for k, v in out._asdict().items()})
    if raster_config.backend == "auto":
        # Prefer the fused G-buffer path; it requires per-primary-vertex
        # UVs for attr rendering. Split-UV (seamed) topologies are seam-cut
        # to unified indexing on the fly (host-side, memoized per mesh) so
        # real GLBs keep fused speed — matching nvdiffrast, which pays
        # nothing for a separate t_tex_idx (reference render.py:260-272).
        # Under jit tracing the cut is impossible (host numpy), so traced
        # split meshes fall back to the classic pipeline.
        split_uv = (
            render_attr
            and mesh.v_tex is not None
            and mesh.v_tex.shape[0] != mesh.v_pos.shape[0]
        )
        if split_uv and not any(
            isinstance(a, jax.core.Tracer)
            for a in (mesh.v_pos, mesh.v_tex, mesh.t_pos_idx, mesh.t_tex_idx)
        ):
            from .mesh import _unify_cached

            mesh = _unify_cached(mesh)
            split_uv = False
        on_tpu = jax.default_backend() in ("tpu", "axon")
        if not split_uv:
            backend = "fused_pallas" if on_tpu else "fused_xla"
        else:
            backend = "pallas" if on_tpu else "xla"
        raster_config = raster_config._replace(backend=backend)

    mesh = with_normals(mesh, compute_tangents=render_tangent)

    v_pos_clip = get_clip_space_position(mesh.v_pos, cam.mvp_mtx)

    if raster_config.backend in ("fused_xla", "fused_pallas"):
        return _render_fused(
            mesh, cam, v_pos_clip, height, width,
            render_attr=render_attr,
            render_depth=render_depth,
            render_normal=render_normal,
            render_tangent=render_tangent,
            antialias_attr=antialias_attr,
            depth_normalization_strategy=depth_normalization_strategy,
            attr_background=attr_background,
            normal_background=normal_background,
            tangent_background=tangent_background,
            texture_override=texture_override,
            texture_filter_mode=texture_filter_mode,
            texture_gather_mode=texture_gather_mode,
            texture_pack_mode=texture_pack_mode,
            raster_config=raster_config,
        )

    rast = rasterize(v_pos_clip, mesh.t_pos_idx, (height, width), raster_config)
    mask = rast[..., 3] > 0

    gb_pos = interpolate(mesh.v_pos[None], rast, mesh.t_pos_idx)
    out = {"mask": mask, "pos": gb_pos}

    if render_depth:
        gb_pos_vs = transform_points_homo(gb_pos, cam.w2c)
        gb_depth = -gb_pos_vs[..., 2]
        # Background pixels take the per-view min depth before normalization
        # (reference render.py:250-255).
        b = gb_depth.shape[0]
        mn = gb_depth.reshape(b, -1).min(axis=-1)[:, None, None]
        gb_depth = jnp.where(mask, gb_depth, mn)
        if depth_normalization_strategy is not None:
            gb_depth = depth_normalization_strategy(gb_depth, mask)
        out["depth"] = gb_depth

    if render_attr:
        tex_c = interpolate(mesh.v_tex[None], rast, mesh.t_tex_idx)
        tex = texture_override if texture_override is not None else mesh.texture
        if texture_filter_mode == "auto_mip":
            gb_rgb_fg = texture(
                tex[None], tex_c, uv_da=_fd_uv_da(tex_c), filter_mode="auto",
                pack_mode=texture_pack_mode,
            )
        else:
            gb_rgb_fg = texture(
                tex[None], tex_c, filter_mode=texture_filter_mode,
                gather_mode=texture_gather_mode,
                pack_mode=texture_pack_mode,
            )
        gb_rgb_bg = jnp.ones_like(gb_rgb_fg) * attr_background
        gb_rgb = jnp.where(mask[..., None], gb_rgb_fg, gb_rgb_bg)
        if antialias_attr:
            from .ops.antialias import antialias as aa

            gb_rgb = aa(gb_rgb, rast, v_pos_clip, mesh.t_pos_idx)
        out["attr"] = gb_rgb

    if render_normal:
        gb_nrm = interpolate(mesh.v_nrm[None], rast, mesh.stitched_t_pos_idx)
        gb_nrm = normalize(gb_nrm)
        out["normal"] = jnp.where(mask[..., None], gb_nrm, normal_background)

    if render_tangent:
        gb_tang = interpolate(mesh.v_tang[None], rast, mesh.stitched_t_pos_idx)
        gb_tang = normalize(gb_tang)
        out["tangent"] = jnp.where(mask[..., None], gb_tang, tangent_background)

    return RenderOutput(**out)

"""Tile-based z-buffered triangle rasterizer (the nvdiffrast-rasterize
equivalent, TPU-native).

Contract matches ``dr.rasterize`` as wrapped by the reference
(mvadapter/utils/mesh_utils/render.py:39-62):

    rasterize(pos_clip (B, V, 4) f32, tri (T, 3) i32, (H, W))
        -> rast (B, H, W, 4) f32 with channels (u, v, z/w, triangle_id + 1)

``triangle_id + 1`` is 0 for background pixels.  (u, v) are the
perspective-correct barycentric weights of vertices 1 and 2 of the winning
triangle, so ``attr = a0 * (1 - u - v) + a1 * u + a2 * v`` reproduces
nvdiffrast's ``interpolate``.  z/w is the screen-affine interpolated NDC
depth of the winning triangle.

Design (TPU-first, not a CUDA translation):
  * Every edge function and the depth are **screen-affine planes**
    ``f(p) = alpha*px + beta*py + gamma`` — so evaluating all edges of a
    chunk of triangles over a pixel tile is ONE matmul
    ``(4C, 3) @ (3, P)`` that runs on the MXU instead of the VPU.  This is
    the single biggest throughput lever: the systolic array evaluates
    coverage ~40x faster than elementwise VPU code.
  * Screen is split into VPU-friendly tiles (default 32 x 128 pixels).
    Plane constants are **rebased to each tile's origin** during binning, so
    in-tile pixel coordinates stay in [0, 128) and fp32 edge evaluation
    keeps sub-0.01-pixel conditioning even at 4k resolutions.
  * A jnp binning pass computes, per tile, a padded list of triangles whose
    bbox overlaps the tile (stable order = input order).  ``K = None``
    means no cap (always exact); a cap trades worst-case correctness for
    speed on dense meshes.
  * The z/id pass scans binned triangles in chunks per tile; the z-buffer
    update is a running masked min — no atomics, fully vectorized.
  * A final resolve pass gathers the winning triangle's coefficients per
    pixel and computes perspective-correct (u, v) once.

Near-plane handling is CLIPLESS (homogeneous rasterization, Olano-Greer
style) instead of nvdiffrast's geometric polygon clipping
(mvadapter/utils/mesh_utils/render.py:33-62): a triangle crossing w = 0
gets edge planes from the cofactors of its homogeneous vertex matrix
M = [x_pix*w; y_pix*w; w] — built WITHOUT dividing by w, yet still affine
in screen space, so it rides the same plane-matmul machinery.  Key
identities: sum_i e_i(p) * w_i = det(M) (a constant), so the NDC depth
z(p) = sum_i e_i(p) * z_i / det stays a single affine plane; coverage
``all(e_i * sign(det) >= 0)`` automatically selects the w > 0 branch of
the projective triangle; and the perspective-correct barycentrics are
simply e_i / sum_j e_j (stored with inv_w = inv_area = 1 so the shared
resolve/attr formulas reproduce them unchanged).  The visible region is
then bounded by the in-kernel NDC z clip (-1 <= z <= 1), which is exactly
the GL near/far clip for w > 0.  Crossing triangles get a full-screen
bbox (their projection is unbounded) and route through the huge-triangle
binning path.

Image-space barycentric derivatives (nvdiffrast's rast_db second output)
are available via :func:`rasterize_db` — analytic plane-ratio quotients,
not finite differences; ``rasterize`` itself keeps the single-tensor
return (grad_db accepted for signature parity).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from .tensor import edge0_pad_block

__all__ = [
    "rasterize", "rasterize_db", "rasterize_diff", "RasterizerConfig",
    "FAST_TPU_CONFIG", "binning_stats", "auto_fast_config",
]

_W_EPS = 1e-8


class RasterizerConfig(NamedTuple):
    """Static tuning knobs for the rasterizer."""

    tile_h: int = 32
    tile_w: int = 128
    chunk: int = 128
    # Max binned triangles per tile. None = auto: exact (K = T) whenever the
    # dense coefficient tensor stays within _AUTO_TILE_ENTRY_BUDGET, else a
    # memory-bounded cap (see _auto_cap; engages above ~1024^2 outputs where
    # per-tile densities are small anyway). Explicit values trade worst-case
    # correctness for speed — validate with a doubled-cap coverage check.
    max_tris_per_tile: Optional[int] = None
    # "auto" resolves per platform at trace time: Pallas kernels on TPU,
    # XLA implementations elsewhere (CPU tests). Explicit values:
    # "xla" | "pallas" | "fused_xla" | "fused_pallas" | "vpu_pallas".
    backend: str = "auto"
    # Binning strategy: "sort_pairs" does ONE sort of (tile, tri) replica
    # pairs (fast, used automatically for T >= bin_sort_pairs_min_tris);
    # "argsort" stable-compacts each tile column (simple, cheap for small T).
    bin_mode: str = "sort_pairs"
    # sort_pairs knobs: replica span in TILES per axis (triangles whose bbox
    # covers more tiles go through the medium tier if enabled, else the
    # shared huge-triangle list of size bin_huge, which must exceed the
    # count of such triangles).
    bin_span_tiles_y: int = 4
    bin_span_tiles_x: int = 2
    bin_huge: int = 256
    bin_sort_pairs_min_tris: int = 4096
    # Optional MEDIUM tier (bin_med > 0): up to bin_med triangles whose
    # bbox exceeds the small span but fits bin_med_span get replicas over
    # an 8x4-style span block (bin_med * span_slots keys) instead of the
    # huge tier's one-replica-per-tile enumeration (bin_huge * n_tiles
    # keys). Lets the small span stay tight (small span keys dominate the
    # sort) while near-camera scenes with hundreds of mid-size triangles
    # stay within budget.
    bin_med: int = 0
    bin_med_span_y: int = 8
    bin_med_span_x: int = 4
    # Flat-list length cap as a multiple of T: the sorted pair list is
    # truncated to cap_factor*T entries before the coefficient gather
    # (sentinel padding sorts last, so this only drops real entries when the
    # total replica count exceeds the cap — validate per scene by doubling).
    bin_flat_cap_factor: int = 4
    # MXU precision for the in-kernel plane matmuls: "highest" (true fp32,
    # safest) or "split_bf16" (hi/lo split, fp32 accumulation — the fast
    # default via FAST_TPU_CONFIG). "high" (3-pass bf16) CRASHES Mosaic
    # lowering in this jax (CLAUDE.md) — the Pallas dispatch upgrades it
    # to "highest"; it only takes effect on the XLA backends.
    dot_precision: str = "highest"
    # How the DMA-path prep reads each output chunk's c-length window of
    # the sorted flat id list (arbitrary offsets): "shift" = two aligned
    # row gathers + arithmetic barrel shift (vectorized; DEFAULT — won the
    # interleaved A/B by 16%, every pair >= +14%), "dynamic" = vmapped 1-D
    # dynamic slices (lowers to a SEQUENTIAL device loop, ~0.85 us/window —
    # profiled as a top-3 frame cost), "gather" = windowed lax.gather
    # (measured ~neutral vs dynamic). All three are bit-identical.
    chunk_slice_mode: str = "shift"
    # DMA-kernel chunk unroll: 2 processes chunk pairs with independent
    # compare/reduce chains (more ILP, half the loop/DMA bookkeeping) and an
    # odd-chunk tail; 1 is the classic double-buffered loop. Measured
    # perf-NEUTRAL on v5e (interleaved A/B median ratio 0.999 — Mosaic
    # already pipelines the serial loop); kept as a tested variant for
    # other chips/scenes.
    kernel_unroll: int = 1
    # DMA-kernel unique-winner selection: "dot" = lower-triangular prefix
    # matmul ((c, c) @ (c, P) bf16 — one full-depth MXU pass set per
    # chunk), "vpu" = min-row-index reduction on the VPU (same cost class
    # as the zmin reduce; frees the MXU passes). Bit-identical outputs —
    # flat segments ascend by triangle id, so min row index == min id.
    winner_mode: str = "dot"
    # DMA-kernel select rows pre-split into stacked bf16 hi/lo at prep
    # time (split_bf16 only): one select dot per chunk instead of two,
    # no per-chunk cast. split_bf16-class value noise (XLA vs Mosaic
    # f32->bf16 rounding differs at the last bit); precision-gated.
    sel_pack: bool = False
    # Sub-pixel-triangle sort path (the 1M-triangle cliff): triangles whose
    # bbox is smaller than this many pixels in BOTH axes cover at most ONE
    # pixel center — they skip tile binning entirely and rasterize by
    # sorting (pixel, z, id) triples (two XLA sorts; scatters are ~serial
    # on TPU). Work becomes O(T log T) instead of O(T * tile_pixels).
    # 0 = off; 1.0 is the exactness bound (a 1 px bbox can contain at most
    # one pixel center per axis). Values > 1 would need multi-candidate
    # emission and are rejected. Only the fused G-buffer paths honor it
    # (rasterize_gbuffer / render); the classic rasterize() pipeline
    # ignores it (tiny triangles still render via tiles — correct, just
    # without the speedup).
    bin_tiny_px: float = 0.0
    # Absolute cap on the flat binned-entry list (0 = none; combined with
    # bin_flat_cap_factor by min). With bin_tiny_px on, live entries can be
    # FAR below any factor*T bound (a 1M-tri scene bins 86k non-tiny
    # entries), and the flat coefficient arrays + their record gather are
    # sized by this cap — auto_fast_config sets it from measured live
    # entries; binning_stats validates it like every other budget.
    bin_flat_cap_abs: int = 0
    # Two-stage small-tier key emission (0 = off): stage 1 compacts the
    # live small-tier triangle ids with ONE single-operand T-entry sort,
    # stage 2 emits span replica keys for just that cap-sized prefix. The
    # direct emission sorts span_y*span_x*T keys that are ~95% sentinels
    # on tiny-heavy scenes (bin_tiny_px routes most triangles off the tile
    # pipeline); two-stage sorts T + cap*span keys instead. Bit-identical
    # while the cap holds (the live key set is unchanged; overflow drops
    # the highest triangle ids) — auto_fast_config sizes it from measured
    # live small-tier counts and binning_stats validates it like every
    # other budget. Ignored when >= T (two-stage would not shrink the
    # sort).
    bin_small_cap: int = 0
    # Tiny-path candidate compaction (0 = off): a sub-pixel triangle's
    # candidate only survives when its pixel center is actually inside it
    # (probability ~ its area, so at 1M tris / 512^2 only ~10-25% are
    # covered). Compacting covered candidates with ONE single-operand
    # T-entry sort shrinks the tiny path's two multi-operand sorts from
    # (T + H*W) to (cap + H*W) entries. Bit-identical while the cap holds
    # every covered candidate (overflow drops the highest triangle ids);
    # auto_fast_config sizes it from measured covered counts and
    # binning_stats validates it like every other budget. Ignored when
    # >= T.
    bin_tiny_cap: int = 0
    # Sub-tile row banding for the DMA kernel (1 = off). With bin_subtile=s
    # the binning runs at (tile_h / s)-row BAND granularity and each
    # (triangle, pixel) plane eval touches only the band's tile_w*(tile_h/s)
    # pixels — the coverage/select MXU pass count per entry divides by s
    # while entries only grow by the band-straddle factor. Unlike shrinking
    # tile_h itself (measured -15%: per-tile fixed costs double), the
    # kernel KEEPS tile_h-row output tiles and runs all s bands of a tile
    # through ONE continuous double-buffered DMA pipeline, so grid steps,
    # output writes and DMA warmups stay at the tile count. s must divide
    # tile_h; spans (bin_span_tiles_y / bin_med_span_y) are interpreted in
    # BAND units when s > 1 (auto_fast_config validates budgets either
    # way). Only the fused DMA G-buffer path honors it (like bin_tiny_px);
    # BIT-identical to bin_subtile=1 in every precision mode: the rebase
    # stays at the TILE origin and each band evaluates with its true
    # tile-local ly, so every pixel sees the same float expressions over
    # the same candidate set in the same tie order.
    bin_subtile: int = 1
    # DMA-kernel chunk streaming granularity: fetch this many consecutive
    # chunks per double-buffered DMA pair instead of one. The per-chunk
    # DMA issue + semaphore-wait fixed cost divides by up to `group`
    # (transfers themselves are ~100 ns of bandwidth at these sizes);
    # groups align to absolute chunk indices so a median 1-2-chunk tile
    # lands in ONE fetch. BIT-identical to 1 (same data, expressions,
    # order). Only the default DMA pipeline honors it (bin_subtile > 1 or
    # kernel_unroll == 2 force it back to 1). VMEM cost: the double
    # buffers grow to 2 * group * 16 KB (group = 8 -> 256 KB, trivial).
    dma_group: int = 1
    # DMA-kernel coverage test: "cmp" = 4 float compares + 3 ands, "bits" =
    # sign-bit OR over the three edge rows + an |z|-bits range test (6 VPU
    # passes over (c, P) instead of 9). Differs from float semantics only
    # at e == -0.0, which no live entry can produce (see _kernel_dma).
    cov_mode: str = "cmp"
    # Dead-entry corner cull (binning): drop (tile, triangle) replica
    # entries whose triangle provably covers NO pixel center in the tile —
    # the max of some edge function over the tile-rect ∩ bbox candidate-
    # center rect is clearly negative. 13-15% of small-tier entries on
    # headline-class scenes are dead (bbox binning near diagonal edges;
    # tools/probe_dead_entries.py), modeling 11-14% fewer kernel chunk
    # trips. Conservative by a 2e-5 relative margin (~5x split_bf16's
    # ~2^-17 eval noise; the probe culls 0 live entries across scenes), so
    # outputs stay BIT-identical: a culled entry can never win a pixel.
    # Applies to all three tiers (small direct + two-stage, medium, huge)
    # on the sort_pairs flat path only — the _bin_triangles column-argsort
    # fallback (t_total < bin_sort_pairs_min_tris, or int32 key overflow)
    # silently ignores it, which is harmless (the cull is bit-identical by
    # construction; the fallback just keeps its dead entries).
    bin_cull: bool = False
    # Backface culling (OPT-IN; correctness is a property of the SCENE):
    # 0 renders both windings, matching nvdiffrast (reference
    # render.py:30-62 draws backfaces; z-buffering hides them on closed
    # meshes). +1 drops screen-space-clockwise (signed area < 0)
    # triangles at setup, -1 the counter-clockwise ones; this codebase's
    # negated-Y projection makes standard outward-CCW-wound meshes
    # (glTF/OBJ convention, uv_sphere_mesh) front-facing with area < 0 —
    # i.e. use -1 for them (probe + A/B: tools/ab_backface.py). Culling is
    # VISIBLY exact only for watertight opaque meshes viewed from
    # outside (every backface pixel is occluded by a nearer front face);
    # z/coverage are then identical and tri_id can differ only on
    # shared-edge tie pixels where a culled backface used to win min-id.
    # Open sheets / interior cameras render holes — never auto-enabled.
    # Near-plane-crossing triangles are always exempt (see
    # _triangle_setup). Applies to EVERY path (tile tiers, tiny sort
    # path, classic, binning_stats) via setup.valid, so budget guards
    # stay in lockstep and closed-mesh scenes bin ~half the entries.
    backface_cull: int = 0


DEFAULT_CONFIG = RasterizerConfig()

# When max_tris_per_tile is None the per-tile cap K auto-sizes so the dense
# (n_tiles, 3, R*K) coefficient tensor stays bounded: n_tiles * K entries
# <= this budget (K = T, exact, whenever that fits — e.g. any mesh at
# <= 512^2; at 2048^2+ the cap engages, where per-tile densities are tiny).
# Without a cap, K = T at uv_size 2048 allocates tens of GB and OOMs HBM.
_AUTO_TILE_ENTRY_BUDGET = 16 * 2**20


def _auto_cap(t_total: int, n_tiles: int) -> int:
    return int(
        min(t_total, max(2048, _AUTO_TILE_ENTRY_BUDGET // max(n_tiles, 1)))
    )


def _resolve_backend(backend: str, fused: bool) -> str:
    """Resolve backend="auto" per platform at trace time: Pallas kernels on
    TPU, XLA implementations elsewhere (CPU golden tests run the same code
    the TPU kernels are verified against).

    Explicit names CROSS-MAP between the two pipeline families so one
    tuned config drives both entry points at full speed: a classic
    ``rasterize`` call with backend="fused_pallas" (e.g. FAST_TPU_CONFIG /
    every auto_fast_config output) takes the Pallas z/id + flat-DMA fast
    paths instead of silently falling back to the XLA scan, and
    ``rasterize_gbuffer`` with backend="pallas" takes the fused kernel."""
    if backend == "auto":
        on_tpu = jax.default_backend() in ("tpu", "axon")
        if fused:
            return "fused_pallas" if on_tpu else "fused_xla"
        return "pallas" if on_tpu else "xla"
    if fused:
        return {"pallas": "fused_pallas", "xla": "fused_xla"}.get(
            backend, backend
        )
    return {
        "fused_pallas": "pallas",
        "vpu_pallas": "pallas",
        "fused_xla": "xla",
    }.get(backend, backend)

# Tuned TPU fast path (gather-free fused kernel + flat binning). K is a
# per-scene knob: it must exceed the worst-case per-tile triangle count
# (validate with a doubled-K coverage check, see bench.py).
FAST_TPU_CONFIG = RasterizerConfig(
    tile_h=16, max_tris_per_tile=1536, backend="fused_pallas", chunk=128,
    dot_precision="split_bf16",  # merged hi/lo bf16, near-fp32 (the DMA
    # kernel keeps exact ids to 2^24 triangles; beyond that it falls
    # back to true fp32)
    # Round-3 kernel wins (interleaved on-chip A/B, 10 pairs, 9 wins,
    # median +5.4% frame = ~+11% kernel): winner uniqueness on the VPU
    # (bit-identical) + prep-split stacked bf16 select rows (one select
    # dot per chunk; split_bf16-class value noise, precision-gated).
    winner_mode="vpu",
    sel_pack=True,
    # Tighter flat-list/huge budgets than the safe defaults (the aligned
    # coefficient-list capacity scales with these, and its record gather is
    # a per-row cost): validate per scene with binning_stats (bench.py
    # asserts it; camera_projection validates by default).
    bin_flat_cap_factor=2,
    bin_huge=64,
    # 2x2 replica span: the sorted key list is span_y*span_x keys per
    # triangle, and halving 4x2 -> 2x2 lifted the headline 769 -> 1023
    # views/s (tools/tune_fast_config.py; tile_h32/chunk256/capfactor3 all
    # regressed 10-12%). Triangles taller than 32 px or wider than 256 px
    # overflow the small span — the MEDIUM tier (8x4-tile span block, up
    # to 512 triangles = 16k keys) absorbs the hundreds of mid-size
    # triangles of near-camera scenes far cheaper than widening the small
    # span (+4T keys) or the huge budget (n_tiles keys each). Truly huge
    # (>128 px tall / >512 px wide, incl. near-plane-crossing projections)
    # still go per-overlapped-tile via bin_huge. Per-scene budget
    # validation (binning_stats) catches overflow of any tier.
    bin_span_tiles_y=2,
    bin_span_tiles_x=2,
    bin_med=512,
    # Dead-entry corner cull: 13-15% of small-tier entries on headline-
    # class scenes never cover a pixel center (tools/probe_dead_entries.py)
    # and the per-chunk-fixed-cost-bound DMA kernel pays per entry. On-chip
    # interleaved A/B (tools/ab_bin_cull.py): 4/4 pairs >= 1.0, median
    # +5.8% frame, BIT-identical z/id in fp32 and split_bf16.
    bin_cull=True,
)


class _TriSetup(NamedTuple):
    """Per-triangle screen-space plane coefficients (one view).

    Edge i of triangle t: ``e_i(p) = planes[t, i, 0] * px +
    planes[t, i, 1] * py + planes[t, i, 2]`` with px/py in pixel units
    (pixel centers at +0.5). Row 3 is the affine z/w plane. Coverage is
    ``all(e_i >= 0)`` after orientation normalization at setup.

    All arrays have a trailing padded slot at index T (valid=False) so that
    binned id lists can safely pad with T.
    """

    planes: jnp.ndarray  # (T+1, 4, 3) f32 — 3 edge planes + z plane
    inv_w: jnp.ndarray  # (T+1, 3) 1/w per vertex
    inv_area: jnp.ndarray  # (T+1,) 1/|area|
    valid: jnp.ndarray  # (T+1,) bool
    bbox: jnp.ndarray  # (T+1, 4) xmin, xmax, ymin, ymax in pixel units


def _triangle_setup(
    pos_clip: jnp.ndarray,
    tri: jnp.ndarray,
    width: int,
    height: int,
    backface_cull: int = 0,
) -> _TriSetup:
    """Per-view triangle setup. pos_clip (V, 4), tri (T, 3).

    ``backface_cull`` (RasterizerConfig.backface_cull): 0 renders both
    windings (nvdiffrast parity — reference render.py:30-62 draws
    backfaces and lets z-buffering hide them); +1 marks screen-space
    clockwise (signed area < 0) non-crossing triangles invalid, -1 the
    counter-clockwise ones. Near-plane-crossing triangles are NEVER
    culled (their cofactor-plane orientation is a different quantity)."""
    v = pos_clip[tri]  # (T, 3, 4)
    w = v[..., 3]
    front = jnp.all(w > _W_EPS, axis=-1)
    crossing = jnp.any(w > _W_EPS, axis=-1) & ~front
    w_safe = jnp.where(jnp.abs(w) < _W_EPS, _W_EPS, w)
    inv_w = 1.0 / w_safe
    # Screen coords in pixel units; pixel (ix, iy) center sits at (ix+0.5, iy+0.5).
    x = (v[..., 0] * inv_w + 1.0) * (width * 0.5)  # (T, 3)
    y = (v[..., 1] * inv_w + 1.0) * (height * 0.5)
    zw = v[..., 2] * inv_w

    # Edge i runs from vertex (i+1)%3 to (i+2)%3; e_i is the barycentric
    # numerator of vertex i:  e_i(p) = dx*(py - ay) - dy*(px - ax).
    nxt = jnp.array([1, 2, 0])
    prv = jnp.array([2, 0, 1])
    ax = x[:, nxt]
    ay = y[:, nxt]
    dx = x[:, prv] - ax  # (T, 3)
    dy = y[:, prv] - ay
    # Signed 2*area = cross(v1-v0, v2-v0).
    area = (x[:, 1] - x[:, 0]) * (y[:, 2] - y[:, 0]) - (y[:, 1] - y[:, 0]) * (
        x[:, 2] - x[:, 0]
    )
    sgn = jnp.where(area < 0, -1.0, 1.0)
    area_abs = jnp.abs(area)
    valid = front & (area_abs > 0)
    inv_area = jnp.where(valid, 1.0 / jnp.maximum(area_abs, 1e-30), 0.0)
    dxs = dx * sgn[:, None]
    dys = dy * sgn[:, None]

    # Edge planes: alpha = -dys, beta = dxs, gamma = dys*ax - dxs*ay.
    alpha = -dys
    beta = dxs
    gamma = dys * ax - dxs * ay
    edge_planes = jnp.stack([alpha, beta, gamma], axis=-1)  # (T, 3, 3)

    # z/w is screen-affine: z(p) = sum_i e_i(p) * zw_i / |area|.
    zc = zw * inv_area[:, None]  # (T, 3)
    z_plane = jnp.einsum("ti,tic->tc", zc, edge_planes,
                         precision=jax.lax.Precision.HIGHEST)  # (T, 3)

    bbox = jnp.stack(
        [x.min(axis=1), x.max(axis=1), y.min(axis=1), y.max(axis=1)], axis=-1
    )

    # ---- Clipless homogeneous planes for near-plane-crossing triangles
    # (see module docstring). Built from clip coords directly — no division
    # by w — so vertices at/behind w = 0 are handled exactly.
    hx = (v[..., 0] + v[..., 3]) * (width * 0.5)  # x_pixel * w  (T, 3)
    hy = (v[..., 1] + v[..., 3]) * (height * 0.5)
    ha = hy[:, nxt] * w[:, prv] - w[:, nxt] * hy[:, prv]  # cofactor rows
    hb = w[:, nxt] * hx[:, prv] - hx[:, nxt] * w[:, prv]
    hg = hx[:, nxt] * hy[:, prv] - hy[:, nxt] * hx[:, prv]
    det = ha[:, 0] * hx[:, 0] + hb[:, 0] * hy[:, 0] + hg[:, 0] * w[:, 0]
    hsgn = jnp.where(det < 0, -1.0, 1.0)
    det_abs = jnp.abs(det)
    inv_det = jnp.where(det_abs > 0, 1.0 / jnp.maximum(det_abs, 1e-30), 0.0)
    # NDC depth plane: z(p) = sum_i e_i(p) * z_i / det (scale-exact; the
    # edge-plane conditioning rescale below must NOT touch it).
    zq = v[..., 2] * (hsgn * inv_det)[:, None]  # (T, 3)
    hz = jnp.stack(
        [jnp.sum(ha * zq, axis=1), jnp.sum(hb * zq, axis=1),
         jnp.sum(hg * zq, axis=1)], axis=-1
    )  # (T, 3)
    # Common positive per-triangle rescale (cancels in every e-ratio the
    # pipeline computes) keeps cofactor magnitudes ~1 for fp32 health.
    m = jnp.maximum(
        jnp.max(jnp.abs(ha), axis=1),
        jnp.maximum(jnp.max(jnp.abs(hb), axis=1), jnp.max(jnp.abs(hg), axis=1)),
    )
    hsc = (jnp.where(m > 0, 1.0 / jnp.maximum(m, 1e-30), 0.0) * hsgn)[:, None]
    h_planes = jnp.stack([ha * hsc, hb * hsc, hg * hsc], axis=-1)  # (T, 3, 3)

    cx = crossing[:, None]
    edge_planes = jnp.where(cx[..., None], h_planes, edge_planes)
    z_plane = jnp.where(cx, hz, z_plane)
    # inv_w = inv_area = 1 makes the shared resolve/attr formulas compute
    # the homogeneous barycentrics e_i / sum_j e_j directly.
    inv_w = jnp.where(cx, 1.0, inv_w)
    inv_area = jnp.where(crossing, 1.0, inv_area)
    valid = valid | (crossing & (det_abs > 0))
    if backface_cull:
        # Facing uses the pre-normalization signed area; `front` (all
        # w > eps) excludes crossing triangles by construction.
        valid = valid & ~(front & (area * backface_cull < 0))
    # Conservative bbox for crossing triangles: project the candidate
    # points of the w >= eps_b clipped polygon (front vertices + the two
    # edge intersections, whose w = eps_b projections are huge but finite
    # and directionally correct). Points with 0 < w < eps_b that pass the
    # z clip lie within ~eps_b of the camera plane with |z_clip| < eps_b —
    # geometrically the triangle grazing the camera origin itself; below
    # the rasterizer's own _W_EPS granularity.
    eps_b = jnp.maximum(1e-4 * jnp.max(jnp.abs(w), axis=1), 1e-7)[:, None]
    v_ok = w > eps_b  # (T, 3) vertices safely in front
    wi, wj = w, w[:, nxt]
    cross_e = (wi > eps_b) != (wj > eps_b)  # (T, 3) edges crossing w=eps_b
    tt = (eps_b - wi) / jnp.where(jnp.abs(wj - wi) < 1e-30, 1e-30, wj - wi)
    xc = v[..., 0] + tt * (v[:, nxt, 0] - v[..., 0])
    yc = v[..., 1] + tt * (v[:, nxt, 1] - v[..., 1])
    pxc = (xc / eps_b + 1.0) * (width * 0.5)
    pyc = (yc / eps_b + 1.0) * (height * 0.5)

    def _mm(vals, ok, big, take_min):
        vals = jnp.where(ok, vals, big if take_min else -big)
        return vals.min(axis=1) if take_min else vals.max(axis=1)

    big = jnp.float32(3e9)
    cxmin = jnp.minimum(_mm(x, v_ok, big, True), _mm(pxc, cross_e, big, True))
    cxmax = jnp.maximum(_mm(x, v_ok, big, False), _mm(pxc, cross_e, big, False))
    cymin = jnp.minimum(_mm(y, v_ok, big, True), _mm(pyc, cross_e, big, True))
    cymax = jnp.maximum(_mm(y, v_ok, big, False), _mm(pyc, cross_e, big, False))
    bbox_cross = jnp.stack([cxmin, cxmax, cymin, cymax], axis=-1)
    bbox = jnp.where(cx, bbox_cross, bbox)

    planes = jnp.concatenate([edge_planes, z_plane[:, None, :]], axis=1)

    def pad(a, fill=0.0):
        cfg = [(0, 1)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, cfg, constant_values=fill)

    return _TriSetup(
        planes=pad(planes),
        inv_w=pad(inv_w),
        inv_area=pad(inv_area),
        valid=pad(valid, False),
        bbox=pad(bbox),
    )


class _TriSetupT(NamedTuple):
    """Transposed (lane-friendly) twin of :class:`_TriSetup` for the fused
    DMA path: every per-triangle quantity keeps T on the minor (lane) dim.
    The classic layout's (T, 4, 3) arrays tile their (4, 3) minor dims to
    (8, 128) on TPU — an ~85x footprint blowup that made triangle setup a
    0.7 ms/view fixed cost at 10k triangles.

    ``planes12`` rows are [e0_a, e0_b, e0_g, e1_a, ..., z_a, z_b, z_g]
    (same values as _TriSetup.planes reshaped (T+1, 12), transposed)."""

    planes12: jnp.ndarray  # (12, T+1) f32
    inv_w: jnp.ndarray  # (3, T+1)
    inv_area: jnp.ndarray  # (T+1,)
    valid: jnp.ndarray  # (T+1,)
    bbox4: jnp.ndarray  # (4, T+1) rows xmin, xmax, ymin, ymax


def _bbox_vectors(setup):
    """(xmin, xmax, ymin, ymax) of live triangles for either setup layout."""
    if isinstance(setup, _TriSetupT):
        b = setup.bbox4[:, :-1]
        return b[0], b[1], b[2], b[3]
    b = setup.bbox[:-1]
    return b[:, 0], b[:, 1], b[:, 2], b[:, 3]


def _triangle_setup_t(
    pos_clip: jnp.ndarray,
    tri: jnp.ndarray,
    width: int,
    height: int,
    v4: Optional[jnp.ndarray] = None,
    backface_cull: int = 0,
) -> _TriSetupT:
    """Per-view triangle setup in transposed orientation (see _TriSetupT).
    Same math as :func:`_triangle_setup`; one row-gather + one 2D transpose
    up front, then every op runs on (rows, T) arrays at full lane width.

    ``v4`` (4, 3, T): pre-gathered clip positions (vertex-major). Batched
    callers hoist ONE (3T, B*4) gather out of their view vmap — gather cost
    is per-row, so gathering all views' columns at once is ~B times cheaper
    than B per-view gathers."""
    t_total = tri.shape[0]
    if v4 is None:
        # One row gather in vertex-major order, one 2D transpose.
        v4 = pos_clip[tri.T.reshape(-1)].T.reshape(4, 3, t_total)
    w = v4[3]  # (3, T)
    front = jnp.all(w > _W_EPS, axis=0)
    crossing = jnp.any(w > _W_EPS, axis=0) & ~front
    w_safe = jnp.where(jnp.abs(w) < _W_EPS, _W_EPS, w)
    inv_w = 1.0 / w_safe
    x = (v4[0] * inv_w + 1.0) * (width * 0.5)  # (3, T)
    y = (v4[1] * inv_w + 1.0) * (height * 0.5)
    zw = v4[2] * inv_w

    nxt = jnp.array([1, 2, 0])
    prv = jnp.array([2, 0, 1])
    ax = x[nxt]  # (3, T) — sublane permute
    ay = y[nxt]
    dx = x[prv] - ax
    dy = y[prv] - ay
    area = (x[1] - x[0]) * (y[2] - y[0]) - (y[1] - y[0]) * (x[2] - x[0])
    sgn = jnp.where(area < 0, -1.0, 1.0)
    area_abs = jnp.abs(area)
    valid = front & (area_abs > 0)
    inv_area = jnp.where(valid, 1.0 / jnp.maximum(area_abs, 1e-30), 0.0)
    dxs = dx * sgn[None]
    dys = dy * sgn[None]

    alpha = -dys  # (3, T)
    beta = dxs
    gamma = dys * ax - dxs * ay
    # z/w plane: z_c = sum_i zw_i * inv_area * edge_plane_i_c.
    zc = zw * inv_area[None]  # (3, T)
    z_a = jnp.sum(zc * alpha, axis=0)
    z_b = jnp.sum(zc * beta, axis=0)
    z_g = jnp.sum(zc * gamma, axis=0)
    bbox4 = jnp.stack(
        [x.min(axis=0), x.max(axis=0), y.min(axis=0), y.max(axis=0)], axis=0
    )

    # ---- Clipless homogeneous planes for near-plane-crossing triangles
    # (transposed twin of the block in _triangle_setup; see module
    # docstring). No division by w anywhere.
    hx = (v4[0] + v4[3]) * (width * 0.5)  # (3, T)
    hy = (v4[1] + v4[3]) * (height * 0.5)
    ha = hy[nxt] * w[prv] - w[nxt] * hy[prv]  # (3, T) cofactor rows
    hb = w[nxt] * hx[prv] - hx[nxt] * w[prv]
    hg = hx[nxt] * hy[prv] - hy[nxt] * hx[prv]
    det = ha[0] * hx[0] + hb[0] * hy[0] + hg[0] * w[0]  # (T,)
    hsgn = jnp.where(det < 0, -1.0, 1.0)
    det_abs = jnp.abs(det)
    inv_det = jnp.where(det_abs > 0, 1.0 / jnp.maximum(det_abs, 1e-30), 0.0)
    zq = v4[2] * (hsgn * inv_det)[None]  # (3, T)
    hz_a = jnp.sum(ha * zq, axis=0)
    hz_b = jnp.sum(hb * zq, axis=0)
    hz_g = jnp.sum(hg * zq, axis=0)
    m = jnp.maximum(
        jnp.max(jnp.abs(ha), axis=0),
        jnp.maximum(jnp.max(jnp.abs(hb), axis=0), jnp.max(jnp.abs(hg), axis=0)),
    )
    hsc = (jnp.where(m > 0, 1.0 / jnp.maximum(m, 1e-30), 0.0) * hsgn)[None]
    ha, hb, hg = ha * hsc, hb * hsc, hg * hsc

    cr = crossing[None]
    alpha = jnp.where(cr, ha, alpha)
    beta = jnp.where(cr, hb, beta)
    gamma = jnp.where(cr, hg, gamma)
    z_a = jnp.where(crossing, hz_a, z_a)
    z_b = jnp.where(crossing, hz_b, z_b)
    z_g = jnp.where(crossing, hz_g, z_g)
    inv_w = jnp.where(cr, 1.0, inv_w)
    inv_area = jnp.where(crossing, 1.0, inv_area)
    valid = valid | (crossing & (det_abs > 0))
    if backface_cull:
        # Twin of the _triangle_setup cull: pre-normalization area sign,
        # crossing triangles exempt (front excludes them).
        valid = valid & ~(front & (area * backface_cull < 0))
    # Conservative bbox for crossing triangles (transposed twin of the
    # block in _triangle_setup: project the w >= eps_b clip-polygon
    # candidates).
    eps_b = jnp.maximum(1e-4 * jnp.max(jnp.abs(w), axis=0), 1e-7)[None]
    v_ok = w > eps_b  # (3, T)
    wj = w[nxt]
    cross_e = (w > eps_b) != (wj > eps_b)
    tt = (eps_b - w) / jnp.where(jnp.abs(wj - w) < 1e-30, 1e-30, wj - w)
    xc = v4[0] + tt * (v4[0][nxt] - v4[0])
    yc = v4[1] + tt * (v4[1][nxt] - v4[1])
    pxc = (xc / eps_b + 1.0) * (width * 0.5)
    pyc = (yc / eps_b + 1.0) * (height * 0.5)

    def _mm(vals, ok, take_min):
        big = jnp.float32(3e9)
        vals = jnp.where(ok, vals, big if take_min else -big)
        return vals.min(axis=0) if take_min else vals.max(axis=0)

    bbox_cross = jnp.stack(
        [
            jnp.minimum(_mm(x, v_ok, True), _mm(pxc, cross_e, True)),
            jnp.maximum(_mm(x, v_ok, False), _mm(pxc, cross_e, False)),
            jnp.minimum(_mm(y, v_ok, True), _mm(pyc, cross_e, True)),
            jnp.maximum(_mm(y, v_ok, False), _mm(pyc, cross_e, False)),
        ],
        axis=0,
    )  # (4, T)
    bbox4 = jnp.where(cr, bbox_cross, bbox4)

    planes12 = jnp.concatenate(
        [
            jnp.stack([alpha[0], beta[0], gamma[0]], axis=0),
            jnp.stack([alpha[1], beta[1], gamma[1]], axis=0),
            jnp.stack([alpha[2], beta[2], gamma[2]], axis=0),
            jnp.stack([z_a, z_b, z_g], axis=0),
        ],
        axis=0,
    )  # (12, T)

    def pad(a, fill=0.0):
        cfg = [(0, 0)] * (a.ndim - 1) + [(0, 1)]
        return jnp.pad(a, cfg, constant_values=fill)

    return _TriSetupT(
        planes12=pad(planes12),
        inv_w=pad(inv_w),
        inv_area=pad(inv_area),
        valid=pad(valid, False),
        bbox4=pad(bbox4),
    )


def _bin_triangles(
    setup: _TriSetup,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    max_per_tile: int,
) -> jnp.ndarray:
    """Per-tile padded triangle id lists, (n_tiles, K) int32, padded with T
    (the invalid slot). Order within a tile = input triangle order."""
    n_ty = -(-height // tile_h)
    n_tx = -(-width // tile_w)
    n_tiles = n_ty * n_tx
    t_total = setup.valid.shape[0] - 1

    bbox = setup.bbox[:-1]
    # Tile index ranges covered by each triangle's bbox (inclusive).
    tx0 = jnp.clip(jnp.floor((bbox[:, 0] - 0.5) / tile_w), 0, n_tx - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((bbox[:, 1] + 0.5) / tile_w), 0, n_tx - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((bbox[:, 2] - 0.5) / tile_h), 0, n_ty - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((bbox[:, 3] + 0.5) / tile_h), 0, n_ty - 1).astype(jnp.int32)
    # Cull triangles entirely off screen.
    on_screen = (
        (bbox[:, 1] >= 0)
        & (bbox[:, 0] <= width)
        & (bbox[:, 3] >= 0)
        & (bbox[:, 2] <= height)
        & setup.valid[:-1]
    )

    tile_ix = jnp.arange(n_tiles, dtype=jnp.int32)
    tyi = tile_ix // n_tx  # (n_tiles,)
    txi = tile_ix % n_tx
    # overlap (T, n_tiles)
    overlap = (
        (txi[None, :] >= tx0[:, None])
        & (txi[None, :] <= tx1[:, None])
        & (tyi[None, :] >= ty0[:, None])
        & (tyi[None, :] <= ty1[:, None])
        & on_screen[:, None]
    )
    # Stable compaction: argsort of (not overlap) along T keeps covered
    # triangles first in original order.
    order = jnp.argsort(~overlap, axis=0, stable=True)  # (T, n_tiles)
    k = min(max_per_tile, t_total)
    ids = order[:k].T.astype(jnp.int32)  # (n_tiles, K)
    counts = overlap.sum(axis=0)  # (n_tiles,)
    keep = jnp.arange(k, dtype=jnp.int32)[None, :] < counts[:, None]
    return jnp.where(keep, ids, t_total)


def _bin_triangles_sort_pairs(
    setup: _TriSetup,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    max_per_tile: int,
    span_y_max: int,
    span_x_max: int,
    n_huge: int,
    n_med: int = 0,
    med_span_y: int = 8,
    med_span_x: int = 4,
    cull_margin: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fast binning: ONE sort of (tile, tri) replica pairs instead of a
    per-tile-column stable argsort (the per-column sort was ~16x more
    sorted elements and the dominant fixed cost per view).

    Each triangle contributes up to span_y*span_x replicas covering its
    bbox's tile range (span_* = span_px / tile size per axis); up to
    ``n_huge`` triangles with a larger bbox get per-overlapped-tile
    replicas sorted into the same stream (see _bin_flat) — further huge
    triangles are dropped; callers validate with the exact path.
    Returns (ids (n_tiles, K) int32 padded with T, live entry counts
    (n_tiles,) int32)."""
    t_total = setup.valid.shape[0] - 1
    flat = _bin_flat(
        setup, width, height, tile_h, tile_w, span_y_max, span_x_max, n_huge,
        n_med=n_med, med_span_y=med_span_y, med_span_x=med_span_x,
        cull_margin=cull_margin,
    )
    s_tri, _, starts, counts = flat

    k = min(max_per_tile, t_total)
    j = jnp.arange(k, dtype=jnp.int32)[None, :]
    gather_idx = jnp.clip(starts[:, None] + j, 0, s_tri.shape[0] - 1)
    ids = jnp.where(j < counts[:, None], s_tri[gather_idx], t_total)
    entry_counts = jnp.minimum(counts, k).astype(jnp.int32)
    return ids, entry_counts


def _bin_classify(
    setup,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    span_y_max: int,
    span_x_max: int,
    n_med: int,
    med_span_y: int,
    med_span_x: int,
    tiny_px: float = 0.0,
):
    """Shared bbox->tile-range + size-tier classification for `_bin_flat`
    (the binning) and `_binning_stats_jit` (the lossiness guard). The
    guard's entire contract is staying bit-in-lockstep with the binning's
    clip/span/tier rules, so this logic exists exactly ONCE — edit here
    and both move together.

    ``setup`` may be a _TriSetup or _TriSetupT (both carry `valid` and
    feed `_bbox_vectors`). Returns (tx0, tx1, ty0, ty1, span_x, span_y,
    on_screen, small, medium, huge); `small` is already masked by
    on_screen, `medium`/`huge` are NOT (consumers mask at selection)."""
    n_ty = -(-height // tile_h)
    n_tx = -(-width // tile_w)
    xmin, xmax, ymin, ymax = _bbox_vectors(setup)
    tx0 = jnp.clip(jnp.floor((xmin - 0.5) / tile_w), 0, n_tx - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((xmax + 0.5) / tile_w), 0, n_tx - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((ymin - 0.5) / tile_h), 0, n_ty - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((ymax + 0.5) / tile_h), 0, n_ty - 1).astype(jnp.int32)
    on_screen = (
        (xmax >= 0)
        & (xmin <= width)
        & (ymax >= 0)
        & (ymin <= height)
        & setup.valid[:-1]
    )
    span_x = tx1 - tx0 + 1
    span_y = ty1 - ty0 + 1
    big = (span_x > span_x_max) | (span_y > span_y_max)
    if n_med > 0:
        fits_med = (span_x <= med_span_x) & (span_y <= med_span_y)
        medium = big & fits_med
        huge = big & ~fits_med
    else:
        medium = jnp.zeros_like(big)
        huge = big
    small = on_screen & ~big
    if tiny_px > 0:
        # Sub-pixel triangles leave the tile pipeline entirely (handled by
        # the sort path, see RasterizerConfig.bin_tiny_px). A tiny bbox has
        # span 1, so only the `small` tier is affected — but the mask must
        # be computed HERE so binning, its lossiness guard, and the sort
        # path all share one definition of "tiny".
        tiny = _tiny_mask(setup, tiny_px)
        small = small & ~tiny
    return tx0, tx1, ty0, ty1, span_x, span_y, on_screen, small, medium, huge


def _tiny_mask(setup, tiny_px: float):
    """bbox smaller than tiny_px in BOTH axes (and a live triangle).
    Shared by _bin_classify (exclusion) and the sort path (inclusion)."""
    xmin, xmax, ymin, ymax = _bbox_vectors(setup)
    return (
        setup.valid[:-1]
        & ((xmax - xmin) < tiny_px)
        & ((ymax - ymin) < tiny_px)
    )


# Relative margin for the dead-entry corner cull (RasterizerConfig.bin_cull).
# Must exceed the kernel-side coverage-eval divergence from exact math:
# f32 rebase + eval is ~eps*mag, split_bf16's hi/lo coefficient split is
# ~2^-17*mag ≈ 7.6e-6*mag. 2e-5 clears both; tools/probe_dead_entries.py
# verifies 0 live entries culled at this class of margin.
#
# Bit-identity fine print: the margin bounds eval noise at pixel centers
# INSIDE the tile-rect ∩ bbox-center rect. A center just OUTSIDE the bbox
# (its exact edge value within the noise band of zero, adversarially
# aligned geometry) could in principle be noisily covered by the kernel
# while the cull drops the entry using the rect-restricted max — so
# guaranteed bit-identity additionally assumes no pixel center sits inside
# that noise band just outside the bbox (never observed across probed
# scenes and on-chip checks; the band is ~1e-4 px wide in screen space).
_CULL_MARGIN = 2e-5


def _edge_rows9(setup):
    """(9, T) edge-plane rows [e0_a, e0_b, e0_g, e1_a, ...] for either
    setup layout (a cheap slice for _TriSetupT; one reshape otherwise)."""
    if isinstance(setup, _TriSetupT):
        return setup.planes12[:9, :-1]
    p = setup.planes[:-1, :3, :]  # (T, 3, 3)
    return p.reshape(p.shape[0], 9).T


def _topk_small(prio: jnp.ndarray, g: int):
    """Exact ``lax.top_k`` replacement for small g: g sequential
    argmax + mask passes under one scan. ``lax.top_k`` lowers to a FULL
    stable sort carrying an iota operand — traced at 1.9 ms/view on a
    1M-triangle scene just to select the g=16 huge-tier entries; g argmax
    reductions read the array g times instead (~0.1 ms). Selection is
    bit-identical: values descending, first index on ties (argmax returns
    the first maximum; masking it yields the next)."""
    neg = jnp.iinfo(prio.dtype).min

    def step(p, _):
        i = jnp.argmax(p).astype(jnp.int32)
        return p.at[i].set(neg), (p[i], i)

    _, (vals, idx) = jax.lax.scan(step, prio, None, length=g)
    return vals, idx


def _bin_flat(
    setup: _TriSetup,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    span_y_max: int,
    span_x_max: int,
    n_huge: int,
    flat_cap_factor: int = 0,
    n_med: int = 0,
    med_span_y: int = 8,
    med_span_x: int = 4,
    tiny_px: float = 0.0,
    cap_abs: int = 0,
    small_cap: int = 0,
    cull_margin: float = 0.0,
):
    """Flat binning core: ONE sort of (tile, tri) replica pairs.

    Returns (s_tri (L,) i32 — triangle ids sorted tile-major then ascending,
    sentinel T in the tail; s_tile (L,) i32 with n_tiles for sentinels;
    starts (n_tiles,) i32 segment offsets; counts (n_tiles,) i32).
    Each tile's live entries are the CONTIGUOUS slice
    s_tri[starts[t] : starts[t] + counts[t]] — downstream consumers expand
    per-tile blocks with cheap contiguous dynamic slices instead of row
    gathers.

    Three size tiers (budgeted; overflow drops triangles — callers
    validate with binning_stats): triangles fitting the small span get a
    static span_y*span_x replica block each (these keys dominate the sort
    — keep the span tight); up to ``n_med`` bigger ones fitting the medium
    span get a med_span_y*med_span_x block; up to ``n_huge`` larger still
    get one replica PER OVERLAPPED TILE. Every tile's list is exactly its
    live set — an earlier design prepended a fixed huge-slot block to
    EVERY tile, which tripled the kernel's chunk count."""
    n_ty = -(-height // tile_h)
    n_tx = -(-width // tile_w)
    n_tiles = n_ty * n_tx
    t_total = setup.valid.shape[0] - 1

    (tx0, tx1, ty0, ty1, span_x, span_y, on_screen, small, medium, huge) = (
        _bin_classify(
            setup, width, height, tile_h, tile_w, span_y_max, span_x_max,
            n_med, med_span_y, med_span_x, tiny_px=tiny_px,
        )
    )

    tri_idx = jnp.arange(t_total, dtype=jnp.int32)
    sentinel = jnp.int32(n_tiles) * jnp.int32(t_total)

    cm = float(cull_margin)
    if cm > 0.0:
        e9 = _edge_rows9(setup)
        xmin, xmax, ymin, ymax = _bbox_vectors(setup)
        # First/last pixel-center coordinate the triangle's own bbox spans
        # (centers sit at +0.5): any covered center lies in the tile's
        # center rect ∩ this bbox-center rect.
        cb = (
            jnp.ceil(xmin - 0.5) + 0.5, jnp.floor(xmax - 0.5) + 0.5,
            jnp.ceil(ymin - 0.5) + 0.5, jnp.floor(ymax - 0.5) + 0.5,
        )

        def _dead_at(ty, tx, e9=e9, cb=cb):
            """True where a (triangle, tile) entry provably covers no pixel
            center: the rect is empty, or the MAX of some edge function
            over it (corner eval: e(x0,y0) + max(0, a*w) + max(0, b*h)) is
            below -margin*mag — conservative vs the kernel's own f32 /
            split_bf16 eval (see _CULL_MARGIN)."""
            bx0, bx1, by0, by1 = cb
            rx0 = jnp.maximum(tx.astype(jnp.float32) * tile_w + 0.5, bx0)
            rx1 = jnp.minimum(
                tx.astype(jnp.float32) * tile_w + (tile_w - 0.5), bx1
            )
            ry0 = jnp.maximum(ty.astype(jnp.float32) * tile_h + 0.5, by0)
            ry1 = jnp.minimum(
                ty.astype(jnp.float32) * tile_h + (tile_h - 0.5), by1
            )
            dead = (rx1 < rx0) | (ry1 < ry0)
            rxw = jnp.maximum(rx1 - rx0, 0.0)
            ryh = jnp.maximum(ry1 - ry0, 0.0)
            for k in range(3):
                a, b, g = e9[3 * k], e9[3 * k + 1], e9[3 * k + 2]
                emax = (
                    a * rx0 + b * ry0 + g
                    + jnp.maximum(0.0, a * rxw)
                    + jnp.maximum(0.0, b * ryh)
                )
                mag = (
                    jnp.abs(a) * jnp.abs(rx1)
                    + jnp.abs(b) * jnp.abs(ry1)
                    + jnp.abs(g)
                )
                dead = dead | (emax < -(cm * mag))
            return dead

    sc = min(small_cap, t_total) if small_cap > 0 else 0
    if 0 < sc < t_total:
        # Two-stage small-tier emission (see RasterizerConfig.bin_small_cap):
        # compact live small-tier ids with ONE single-operand T-entry sort
        # (ids unique -> unstable is exact), then emit replica keys for the
        # sc-sized prefix only. Downstream-identical to direct emission
        # while sc holds every live small id (the live key set is the same,
        # only sentinel multiplicity differs); overflow drops the HIGHEST
        # triangle ids deterministically — binning_stats guards it.
        skey = jnp.where(small, tri_idx, jnp.int32(t_total))
        (skey,) = jax.lax.sort((skey,), num_keys=1, is_stable=False)
        sid = skey[:sc]  # ascending live ids; t_total sentinels in the tail
        slive = sid < t_total
        sid_c = jnp.minimum(sid, t_total - 1)
        geo_cols = [ty0, tx0, span_y, span_x]
        if cm > 0.0:
            # Dead-entry masks evaluated BEFORE compaction on full (T,)
            # COLUMNS (pure elementwise) and packed into one bit-per-span
            # int column riding the geo gather below. An earlier version
            # gathered the 13 cull inputs (4 cb + 9 e9) per compacted row
            # instead — 36 ns/row, 5.7 ms/view at 1M tris (traced
            # fusion.9); the column eval is bandwidth-cheap and the
            # booleans are IDENTICAL (same _dead_at math on the same
            # values), so this is bit-exact by construction.
            # One int32 column holds 31 span slots; wider spans (the
            # small-tier product is 4 by default but configurable) spill
            # into further columns — 1 << 31 would overflow int32.
            n_dead_cols = -(-(span_y_max * span_x_max) // 31)
            deadbits = [
                jnp.zeros((t_total,), jnp.int32) for _ in range(n_dead_cols)
            ]
            bit = 0
            for sy in range(span_y_max):
                for sx in range(span_x_max):
                    d = _dead_at(ty0 + sy, tx0 + sx)
                    deadbits[bit // 31] = deadbits[bit // 31] | jnp.where(
                        d, jnp.int32(1 << (bit % 31)), jnp.int32(0)
                    )
                    bit += 1
            geo_cols.extend(deadbits)
        # One row gather for all per-triangle columns (the per-row latency
        # floor makes one wide gather beat N 1-column gathers; PERF.md §1).
        geo = jnp.stack(geo_cols, axis=1)[sid_c]
        sty0, stx0 = geo[:, 0], geo[:, 1]
        ssy, ssx = geo[:, 2], geo[:, 3]
        keys = []
        bit = 0
        for sy in range(span_y_max):
            for sx in range(span_x_max):
                tile = jnp.minimum((sty0 + sy) * n_tx + (stx0 + sx), n_tiles)
                valid = slive & (sx < ssx) & (sy < ssy)
                if cm > 0.0:
                    sdead = geo[:, 4 + bit // 31]
                    valid = valid & (((sdead >> (bit % 31)) & 1) == 0)
                bit += 1
                keys.append(
                    jnp.where(valid, tile * t_total + sid_c, sentinel)
                )
        keys = jnp.concatenate(keys)  # (sc * span_y_max * span_x_max,)
    else:
        # Replica pairs: key = tile * T + tri (tile-major; sentinels last).
        keys = []
        for sy in range(span_y_max):
            for sx in range(span_x_max):
                # Clamp: masked-out lanes still compute tile * T, and an
                # off-grid tile index could overflow the int32 key space.
                tile = jnp.minimum((ty0 + sy) * n_tx + (tx0 + sx), n_tiles)
                valid = small & (sx < span_x) & (sy < span_y)
                if cm > 0.0:
                    valid = valid & ~_dead_at(ty0 + sy, tx0 + sx)
                keys.append(
                    jnp.where(valid, tile * t_total + tri_idx, sentinel)
                )
        keys = jnp.concatenate(keys)  # (T * span_y_max * span_x_max,)

    gm = min(n_med, t_total) if n_med > 0 else 0
    if gm > 0:
        prio_m = jnp.where(medium & on_screen, t_total - tri_idx, 0)
        mvals, midx = (
            _topk_small(prio_m, gm) if gm <= 64
            else jax.lax.top_k(prio_m, gm)
        )
        mid = jnp.clip(midx.astype(jnp.int32), 0, t_total - 1)  # (Gm,)
        mvalid = mvals > 0
        mty0, mtx0 = ty0[mid], tx0[mid]
        msy, msx = span_y[mid], span_x[mid]
        if cm > 0.0:
            # 13 one-column gathers (4 cb + 9 e9): inconsistent with the
            # per-row latency floor law (PERF.md §1 — the two-stage small
            # tier uses ONE 13-col row gather for this), but at <= bin_med
            # rows the absolute cost is noise. If this tier ever grows,
            # switch to the ctbl row-gather pattern above.
            mcb = tuple(c[mid] for c in cb)
            me9 = [e9[i][mid] for i in range(9)]
        mkeys = []
        for sy in range(med_span_y):
            for sx in range(med_span_x):
                tile = jnp.minimum(
                    (mty0 + sy) * n_tx + (mtx0 + sx), n_tiles
                )
                valid = mvalid & (sy < msy) & (sx < msx)
                if cm > 0.0:
                    valid = valid & ~_dead_at(mty0 + sy, mtx0 + sx,
                                              e9=me9, cb=mcb)
                mkeys.append(
                    jnp.where(valid, tile * t_total + mid, sentinel)
                )
        keys = jnp.concatenate([keys] + mkeys)

    g = min(n_huge, t_total) if n_huge > 0 else 0
    if g > 0:
        prio = jnp.where(huge & on_screen, t_total - tri_idx, 0)
        top_vals, top_idx = (
            _topk_small(prio, g) if g <= 64
            else jax.lax.top_k(prio, g)
        )
        hid = jnp.clip(top_idx.astype(jnp.int32), 0, t_total - 1)  # (G,)
        hvalid = top_vals > 0
        tiles = jnp.arange(n_tiles, dtype=jnp.int32)
        tyi = tiles // n_tx
        txi = tiles % n_tx
        hov = (
            hvalid[:, None]
            & (txi[None, :] >= tx0[hid][:, None])
            & (txi[None, :] <= tx1[hid][:, None])
            & (tyi[None, :] >= ty0[hid][:, None])
            & (tyi[None, :] <= ty1[hid][:, None])
        )  # (G, n_tiles)
        if cm > 0.0:
            # Huge (thin diagonal / near-plane-crossing) triangles overlap
            # far fewer tiles than their bbox — the cull pays most here.
            hcb = tuple(c[hid][:, None] for c in cb)
            he9 = [e9[i][hid][:, None] for i in range(9)]
            hov = hov & ~_dead_at(tyi[None, :], txi[None, :],
                                  e9=he9, cb=hcb)
        hkeys = jnp.where(
            hov, tiles[None, :] * t_total + hid[:, None], sentinel
        )
        keys = jnp.concatenate([keys, hkeys.reshape(-1)])

    # Keys encode (tile, tri) pairs uniquely (duplicates are impossible
    # except interchangeable sentinels), so an UNSTABLE single-operand sort
    # is exact — jnp.sort's default stability made XLA carry an extra iota
    # operand through the whole 4M-entry sort (traced on the 1M-tri scene).
    (keys,) = jax.lax.sort((keys,), num_keys=1, is_stable=False)
    cap = keys.shape[0]
    if flat_cap_factor > 0:
        cap = min(cap, flat_cap_factor * t_total)
    if cap_abs > 0:
        cap = min(cap, cap_abs)
    if cap < keys.shape[0]:
        # Truncate the (sentinel-heavy) tail so downstream gathers touch
        # ~live entries only.
        keys = keys[:cap]
    s_tile = (keys // t_total).astype(jnp.int32)  # ascending; sentinel tail
    s_tri = (keys % t_total).astype(jnp.int32)
    s_tri = jnp.where(s_tile < n_tiles, s_tri, t_total)

    # Per-tile segment starts/counts: binary search on the sorted tile ids
    # (the earlier one-compare-sum was O(n_tiles * L) — fine at 512^2 but
    # quadratic pain at UV-atlas tile counts).
    bounds = jnp.searchsorted(
        s_tile, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    starts = bounds[:-1]
    counts = bounds[1:] - bounds[:-1]
    return s_tri, s_tile, starts, counts


_BIG_NEG = -3.0e38


def _gather_tile_coeffs(
    setup: _TriSetup,
    ids: jnp.ndarray,  # (n_tiles, K)
    tile_origin: jnp.ndarray,  # (n_tiles, 2) float32 (x0, y0)
) -> jnp.ndarray:
    """Gather per-tile plane coefficients and rebase their constant term to
    the tile origin (tile-local pixel coordinates keep fp32 conditioning).

    Invalid/padded triangles get an edge-0 constant of -BIG, so the
    ``e0 >= 0`` coverage test excludes them with no separate mask.

    Returns coeffs (n_tiles, 3, 4K) coef-major ([e0|e1|e2|z] blocks of K
    along the minor dim — lane-aligned; a minor-dim-3 layout would pad
    3 -> 128 lanes in VMEM)."""
    planes = setup.planes[ids]  # (n_tiles, K, 4, 3)
    ox = tile_origin[:, 0][:, None, None]
    oy = tile_origin[:, 1][:, None, None]
    gamma = planes[..., 2] + planes[..., 0] * ox + planes[..., 1] * oy
    valid = setup.valid[ids]  # (n_tiles, K)
    gamma = gamma.at[..., 0].set(jnp.where(valid, gamma[..., 0], _BIG_NEG))
    planes = jnp.concatenate([planes[..., :2], gamma[..., None]], axis=-1)
    n_tiles, k = ids.shape
    return planes.transpose(0, 3, 2, 1).reshape(n_tiles, 3, 4 * k)


def _raster_zid_tile(
    coeffs: jnp.ndarray,  # (3, 4K) coef-major tile-local plane coefficients
    ids: jnp.ndarray,  # (K,) global triangle ids
    tile_h: int,
    tile_w: int,
    chunk: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """z/id pass for one tile. Returns (z (th, tw), id (th, tw)).

    Per chunk of C triangles, ONE (4C, 3) @ (3, P) matmul evaluates all
    edge and depth planes over the tile's P pixels on the MXU; the VPU then
    only does the coverage compare and the running min."""
    k = ids.shape[0]
    c = min(chunk, k)
    n_chunks = -(-k // c)
    p = tile_h * tile_w

    # B matrix: tile-local pixel centers.
    ly = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 0).reshape(-1) + 0.5
    lx = jax.lax.broadcasted_iota(jnp.float32, (tile_h, tile_w), 1).reshape(-1) + 0.5
    b_mat = jnp.stack([lx, ly, jnp.ones_like(lx)], axis=0)  # (3, P)

    # Pad K up to chunk multiple (padded slots: e0 const -BIG -> uncovered).
    pad = n_chunks * c - k
    kp = k + pad
    if pad:
        pad_block = edge0_pad_block(4, pad, coeffs.dtype, _BIG_NEG)
        coeffs = jnp.concatenate([coeffs.reshape(3, 4, k), pad_block], axis=2)
        ids = jnp.pad(ids, (0, pad), constant_values=0)
    else:
        coeffs = coeffs.reshape(3, 4, k)

    def body(carry, inputs):
        zbuf, idbuf = carry
        coeffs_c, ids_c = inputs  # (3, 4, C), (C,)
        e = jax.lax.dot_general(
            coeffs_c.reshape(3, 4 * c), b_mat,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (4C, P)
        e = e.reshape(4, c, p)
        z = e[3]
        cov = (
            (e[0] >= 0) & (e[1] >= 0) & (e[2] >= 0) & (z >= -1.0) & (z <= 1.0)
        )
        z = jnp.where(cov, z, jnp.inf)

        # Gather-free winner selection (gathers serialize on TPU): min-z,
        # then min-id among the z==zmin rows. Binned ids ascend, so the
        # smallest id is the earliest in order — same tie rule as argmin.
        zmin = jnp.min(z, axis=0)  # (P,)
        id_cand = jnp.where(z == zmin[None], ids_c[:, None], 2**30)
        idmin = jnp.min(id_cand, axis=0)
        upd = zmin < zbuf
        zbuf = jnp.where(upd, zmin, zbuf)
        idbuf = jnp.where(upd, idmin + 1, idbuf)
        return (zbuf, idbuf), None

    init = (jnp.full((p,), jnp.inf, jnp.float32), jnp.zeros((p,), jnp.int32))
    xs = (
        coeffs.reshape(3, 4, n_chunks, c).transpose(2, 0, 1, 3),
        ids.reshape(n_chunks, c),
    )
    (zbuf, idbuf), _ = jax.lax.scan(body, init, xs)
    return zbuf.reshape(tile_h, tile_w), idbuf.reshape(tile_h, tile_w)


def _bin_dispatch(
    setup: _TriSetup,
    width: int,
    height: int,
    tile_h: int,
    tile_w: int,
    max_per_tile: int,
    config: RasterizerConfig,
) -> jnp.ndarray:
    """Choose the binning strategy. sort_pairs needs tile*T to fit int32;
    fall back to the column argsort otherwise."""
    """Returns (ids (n_tiles, K') padded with T, entry_counts (n_tiles,))
    where live entries occupy a contiguous prefix of each tile's list."""
    n_tiles = (-(-height // tile_h)) * (-(-width // tile_w))
    t_total = setup.valid.shape[0] - 1
    if (
        config.bin_mode == "sort_pairs"
        and t_total >= config.bin_sort_pairs_min_tris
        and (n_tiles + 1) * t_total < 2**31
    ):
        return _bin_triangles_sort_pairs(
            setup, width, height, tile_h, tile_w, max_per_tile,
            config.bin_span_tiles_y, config.bin_span_tiles_x, config.bin_huge,
            n_med=config.bin_med, med_span_y=config.bin_med_span_y,
            med_span_x=config.bin_med_span_x,
            cull_margin=_CULL_MARGIN if config.bin_cull else 0.0,
        )
    ids = _bin_triangles(setup, width, height, tile_h, tile_w, max_per_tile)
    counts = jnp.sum(ids < t_total, axis=1).astype(jnp.int32)
    return ids, counts


def _resolve_uv(
    setup: _TriSetup, idmap: jnp.ndarray, zmap: jnp.ndarray
) -> jnp.ndarray:
    """Gather winning-triangle coefficients per pixel and compute
    perspective-correct (u, v). idmap (H, W) int32 (0 = bg)."""
    h, w = idmap.shape
    t = jnp.maximum(idmap - 1, 0)
    px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5

    planes = setup.planes[t]  # (H, W, 4, 3)
    inv_w = setup.inv_w[t]  # (H, W, 3)
    inv_area = setup.inv_area[t]

    e = (
        planes[..., :3, 0] * px[..., None]
        + planes[..., :3, 1] * py[..., None]
        + planes[..., :3, 2]
    )  # (H, W, 3)
    b = e * inv_area[..., None]
    pw = b * inv_w  # (H, W, 3)
    denom = jnp.sum(pw, axis=-1)
    denom = jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
    u = pw[..., 1] / denom
    v = pw[..., 2] / denom
    mask = idmap > 0
    u = jnp.where(mask, u, 0.0)
    v = jnp.where(mask, v, 0.0)
    zout = jnp.where(mask, zmap, 0.0)
    return jnp.stack([u, v, zout, idmap.astype(jnp.float32)], axis=-1)


def _rasterize_single(
    pos_clip: jnp.ndarray,
    tri: jnp.ndarray,
    height: int,
    width: int,
    config: RasterizerConfig,
) -> jnp.ndarray:
    """One view: pos_clip (V, 4) -> rast (H, W, 4)."""
    tile_h, tile_w = config.tile_h, config.tile_w
    # Pad resolution up to tile multiples; crop at the end.
    ph = -(-height // tile_h) * tile_h
    pw = -(-width // tile_w) * tile_w
    n_ty, n_tx = ph // tile_h, pw // tile_w
    t_total = tri.shape[0]

    config = config._replace(backend=_resolve_backend(config.backend, False))
    setup = _triangle_setup(
        pos_clip, tri, width, height, backface_cull=config.backface_cull
    )
    max_per_tile = config.max_tris_per_tile or _auto_cap(t_total, n_ty * n_tx)

    # At sort_pairs scale, compute the FULL rast output (u, v, z, id)
    # through the fused gbuffer path in uv_mode: (u, v) are the
    # perspective-correct interpolation of one-hot corner attributes, so
    # they ride the attribute planes and neither the binning-side dense
    # (n_tiles, K, 4, 3) gather (minor-dim-3 TPU layout pads 3 -> 128
    # lanes; tens of GB at uv_size 2048) nor the classic resolve's
    # per-pixel (H, W, 4, 3) plane gather (~800 MB/frame at 4096^2) is
    # ever materialized.
    use_flat = (
        config.bin_mode == "sort_pairs"
        and t_total >= config.bin_sort_pairs_min_tris
        and (n_ty * n_tx + 1) * t_total < 2**31
    )
    if use_flat:
        from .gbuffer import _gbuffer_single

        zid_cfg = config._replace(
            backend="fused_pallas" if config.backend == "pallas" else "fused_xla"
        )
        _, zmap, idmap, uvmap = _gbuffer_single(
            pos_clip, tri, None, height, width, zid_cfg, uv_mode=True
        )
        return jnp.concatenate(
            [uvmap, zmap[..., None], idmap.astype(jnp.float32)[..., None]],
            axis=-1,
        )

    ids, counts = _bin_dispatch(
        setup, width, height, tile_h, tile_w, max_per_tile, config
    )

    tile_ix = jnp.arange(n_ty * n_tx, dtype=jnp.int32)
    ty0 = (tile_ix // n_tx * tile_h).astype(jnp.float32)
    tx0 = (tile_ix % n_tx * tile_w).astype(jnp.float32)
    tile_origin = jnp.stack([tx0, ty0], axis=-1)

    coeffs = _gather_tile_coeffs(setup, ids, tile_origin)

    if config.backend == "pallas":
        from .rasterize_pallas import raster_zid_tiles_pallas

        z_tiles, id_tiles = raster_zid_tiles_pallas(
            coeffs, ids, counts, tile_h, tile_w, config.chunk
        )
    else:
        z_tiles, id_tiles = jax.vmap(
            lambda co, i: _raster_zid_tile(co, i, tile_h, tile_w, config.chunk)
        )(coeffs, ids)

    zmap = (
        z_tiles.reshape(n_ty, n_tx, tile_h, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(ph, pw)[:height, :width]
    )
    idmap = (
        id_tiles.reshape(n_ty, n_tx, tile_h, tile_w)
        .transpose(0, 2, 1, 3)
        .reshape(ph, pw)[:height, :width]
    )
    return _resolve_uv(setup, idmap, zmap)


def _resolve_db(setup: _TriSetup, idmap: jnp.ndarray) -> jnp.ndarray:
    """Analytic image-space derivatives of the winning triangle's
    barycentrics (nvdiffrast's rast_db: du/dX, du/dY, dv/dX, dv/dY).

    With u = n1(p)/D(p) and v = n2(p)/D(p), where n_i(p) = e_i(p)*inv_w_i
    and D(p) = sum_i n_i(p) are screen-affine planes, the quotient rule
    gives exact derivatives from the plane coefficients — no finite
    differences. Clipless near-plane-crossing triangles store inv_w = 1 so
    u = e1/sum(e); the same formula stays exact for them."""
    h, w = idmap.shape
    t = jnp.maximum(idmap - 1, 0)
    px = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    py = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5

    planes = setup.planes[t][..., :3, :]  # (H, W, 3edges, 3coef)
    inv_w = setup.inv_w[t]  # (H, W, 3)

    nc = planes * inv_w[..., None]  # numerator plane coefs n_i
    dc = jnp.sum(nc, axis=-2)  # (H, W, 3) denominator plane coefs
    n_val = (
        nc[..., 0] * px[..., None] + nc[..., 1] * py[..., None] + nc[..., 2]
    )  # (H, W, 3) n_i(p)
    d_val = jnp.sum(n_val, axis=-1)  # (H, W)
    d_val = jnp.where(jnp.abs(d_val) < 1e-20, 1e-20, d_val)
    inv_d2 = 1.0 / (d_val * d_val)

    def ddir(i, c):  # d(n_i/D)/d{X,Y}: (n_i_c * D - n_i * D_c) / D^2
        return (nc[..., i, c] * d_val - n_val[..., i] * dc[..., c]) * inv_d2

    db = jnp.stack([ddir(1, 0), ddir(1, 1), ddir(2, 0), ddir(2, 1)], axis=-1)
    return jnp.where((idmap > 0)[..., None], db, 0.0)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _rasterize_db_batched(pos, tri, resolution, config):
    height, width = resolution
    cfg = config._replace(backend=_resolve_backend(config.backend, False))

    def per_view(pos_clip):
        rast = _rasterize_single(pos_clip, tri, height, width, cfg)
        setup = _triangle_setup(pos_clip, tri, width, height)
        db = _resolve_db(setup, rast[..., 3].astype(jnp.int32))
        return rast, db

    return jax.vmap(per_view)(pos)


def rasterize_db(
    pos: jnp.ndarray,
    tri: jnp.ndarray,
    resolution: Tuple[int, int],
    config: RasterizerConfig = DEFAULT_CONFIG,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rasterize with image-space barycentric derivatives.

    Returns (rast (B, H, W, 4), rast_db (B, H, W, 4)) matching nvdiffrast's
    two-tensor contract (reference render.py:37-52): rast_db channels are
    (du/dX, du/dY, dv/dX, dv/dY), zero on background. The derivatives are
    analytic plane-ratio quotients, not finite differences. Feed rast_db to
    :func:`interpolate` (diff_attrs) or scale to texel units for
    :func:`texture`'s mip-mapped filter modes."""
    pos = pos.astype(jnp.float32)
    tri = tri.astype(jnp.int32)
    if pos.ndim != 3:
        raise ValueError("pos must be (B, V, 4) — range mode is not supported")
    return _rasterize_db_batched(pos, tri, tuple(resolution), config)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _binning_stats_jit(pos, tri, resolution, config):
    height, width = resolution
    tile_h, tile_w = config.tile_h, config.tile_w
    full_ty = -(-height // tile_h)
    n_tx = -(-width // tile_w)
    t_total = tri.shape[0]
    # bin_subtile: the binning runs at band granularity over the PADDED
    # grid (see _gbuffer_dma_batched) — the guard must classify/count at
    # exactly the same grid or span/per-bin budgets drift.
    sub = max(config.bin_subtile, 1)
    bin_h = tile_h // sub
    bin_height = full_ty * tile_h if sub > 1 else height
    n_ty = full_ty * sub
    k_cap = config.max_tris_per_tile or _auto_cap(t_total, n_ty * n_tx)

    def per_view(pos_clip):
        setup = _triangle_setup_t(
            pos_clip, tri, width, height,
            backface_cull=config.backface_cull,
        )
        # SAME classification code path as _bin_flat (the guard must stay
        # bit-in-lockstep with the binning; see _bin_classify).
        (tx0, tx1, ty0, ty1, span_x, span_y, on, small, medium, huge) = (
            _bin_classify(
                setup, width, bin_height, bin_h, tile_w,
                config.bin_span_tiles_y, config.bin_span_tiles_x,
                config.bin_med, config.bin_med_span_y, config.bin_med_span_x,
                tiny_px=config.bin_tiny_px,
            )
        )
        n_small = jnp.sum(small)  # live small-tier tris (bin_small_cap)
        # Potential tiny count at the 1 px exactness bound, regardless of
        # config (lets auto_fast_config decide whether the sort path pays).
        n_tiny = jnp.sum(_tiny_mask(setup, 1.0))
        n_tiny_cov = jnp.int32(0)
        if config.bin_tiny_px > 0:
            # Tiny triangles produce NO replica keys or per-tile entries
            # (they go through the sort path) — keep the guard in lockstep.
            tiny_on = _tiny_mask(setup, config.bin_tiny_px)
            on = on & ~tiny_on
            # Covered tiny candidates (the bin_tiny_cap budget target) —
            # counted with the sort path's OWN candidate eval so the guard
            # cannot drift from the emission.
            from .gbuffer import _tiny_candidates

            pix, _ = _tiny_candidates(
                setup.planes12, setup.bbox4, tiny_on,
                height, width, tile_h, tile_w,
            )
            n_tiny_cov = jnp.sum(pix < height * width)
        n_med = jnp.sum(medium & on)
        n_huge = jnp.sum(huge & on)
        live = jnp.sum(jnp.where(on, span_x * span_y, 0))
        # Exact per-tile counts via a 2D difference grid + prefix sums:
        # +1 at (ty0, tx0), -1 at (ty0, tx1+1)/(ty1+1, tx0), +1 at
        # (ty1+1, tx1+1), then cumsum along both axes — O(T + n_tiles)
        # at any atlas size (no (T, n_tiles) overlap matrix).
        grid = jnp.zeros((n_ty + 1, n_tx + 1), jnp.int32)
        one = jnp.where(on, 1, 0).astype(jnp.int32)
        grid = grid.at[ty0, tx0].add(one)
        grid = grid.at[ty0, tx1 + 1].add(-one)
        grid = grid.at[ty1 + 1, tx0].add(-one)
        grid = grid.at[ty1 + 1, tx1 + 1].add(one)
        counts = jnp.cumsum(jnp.cumsum(grid, axis=0), axis=1)[:n_ty, :n_tx]
        return n_huge, n_med, live, counts.max(), n_tiny, n_small, n_tiny_cov

    n_huge, n_med, live, max_tile, n_tiny, n_small, n_tiny_cov = (
        jax.vmap(per_view)(pos)
    )
    return (
        n_huge.max(), n_med.max(), live.max(), max_tile.max(),
        jnp.int32(k_cap), n_tiny.max(), n_small.max(), n_tiny_cov.max(),
    )


def auto_fast_config(
    pos,
    tri,
    resolution,
    base: RasterizerConfig = FAST_TPU_CONFIG,
    headroom: float = 2.0,
    cap_headroom: float = 1.5,
    extra_probes=(),
    auto_tiny: bool = True,
    backface_cull: int = 0,
) -> RasterizerConfig:
    """Scene-adaptive binning budgets for the fast path.

    The fast config's tier budgets are a speed/robustness trade-off: every
    key block costs sort time whether used or not (an always-on 512-slot
    medium tier measured -25% on a scene with zero mediums). This measures
    THIS scene's span distribution with the exact, cheap
    :func:`binning_stats` histogram and sizes each tier to its actual need
    times ``headroom`` (rounded up to a power of two, so nearby scenes
    share jit caches), then validates the result is lossless.

    pos (B, V, 4) clip positions for the cameras that will be rendered.
    Returns a config safe for this scene; raises if validation fails
    (cannot happen unless headroom < 1).
    """
    # extra_probes: additional (pos, tri, resolution) rasterizations the
    # SAME config must stay lossless for (e.g. camera_projection's UV-atlas
    # pass alongside its view renders) — each budget sizes to the worst
    # probe.
    if backface_cull:
        # OPT-IN (see RasterizerConfig.backface_cull — the caller asserts
        # the scene is watertight-opaque, e.g. via mesh.is_watertight).
        # Stamped BEFORE probing so every stats histogram and budget below
        # sizes to the culled triangle set (~half the entries on closed
        # meshes).
        base = base._replace(backface_cull=backface_cull)
    if auto_tiny and base.bin_tiny_px == 0:
        # Heavily sub-pixel scenes (high-poly meshes at moderate screen
        # sizes) hit the tile kernel's O(T * tile_px) cliff; the two-sort
        # tiny path renders the same geometry 2.5x faster at 1M tris (see
        # docs/PERF.md). The sorts cost O((T + H*W) log) per view whether
        # they pay or not, so only engage when the tile-path savings
        # clearly dominate: most triangles sub-pixel AND enough of them
        # that the cliff is real. Thresholds are conservative; callers can
        # always set bin_tiny_px explicitly (or pass auto_tiny=False).
        t_total = int(tri.shape[0])
        if t_total >= 300_000:
            pre = binning_stats(pos, tri, resolution, base)
            if pre["n_tiny_1px"] >= 0.6 * t_total:
                base = base._replace(bin_tiny_px=1.0)
    probe = base._replace(bin_med=max(base.bin_med, 1))
    probes = [(pos, tri, resolution)] + list(extra_probes)
    stats_list = [binning_stats(p, t, r, probe) for p, t, r in probes]
    stats = {
        k: max(st[k] for st in stats_list)
        for k in ("n_med", "n_huge", "max_per_tile", "live_entries")
    }

    def pow2_at_least(n, lo):
        v = lo
        while v < n:
            v *= 2
        return v

    n_med = stats["n_med"]
    n_huge = stats["n_huge"]
    med = 0 if n_med == 0 else pow2_at_least(int(headroom * n_med), 64)
    huge = pow2_at_least(int(headroom * n_huge) + 8, 16)
    k_cap = base.max_tris_per_tile
    if k_cap is not None and stats["max_per_tile"] > k_cap:
        k_cap = pow2_at_least(int(headroom * stats["max_per_tile"]), k_cap)
    cap_factor = base.bin_flat_cap_factor
    if cap_factor > 0:
        for (p_i, t_i, r_i), st in zip(probes, stats_list):
            t_tot = int(t_i.shape[0])
            if st["live_entries"] > cap_factor * t_tot:
                cap_factor = max(
                    cap_factor,
                    -(-int(headroom * st["live_entries"]) // t_tot),
                )
    cap_abs = base.bin_flat_cap_abs
    if base.bin_tiny_px > 0:
        # With the tiny sort path on, live entries sit far below factor*T
        # (the flat arrays + record gather scale with the cap) — size an
        # ABSOLUTE cap from the measured worst view instead. Above 64k the
        # pow2 rounding costs real HBM (a 2^18 cap for 87k live entries put
        # 3x the live rows through the record gather, ~2 ms/view at 1M
        # tris); round to 8192 there instead — full ``headroom`` margin is
        # preserved, only the jit-cache-sharing granule coarsens.
        # cap_headroom, not headroom: these caps directly size the flat
        # record gathers and multi-operand sorts (cost is per ROW, traced
        # ~40% of the raw-1M frame), their overflow is deterministic and
        # guard-checked, and the probe measures the ACTUAL cameras — 2x
        # margin was paying real milliseconds for protection the
        # validation loop already provides.
        worst_live = max(st["live_entries"] for st in stats_list)
        need = int(cap_headroom * worst_live)
        cap_abs = (
            pow2_at_least(need, 4096) if need <= 65536
            else -(-need // 8192) * 8192
        )
    small_cap = base.bin_small_cap
    if base.bin_tiny_px > 0:
        # Tiny-heavy scenes leave the small-tier key array ~95% sentinels;
        # two-stage emission (bin_small_cap) sorts T + cap*span keys
        # instead of span*T. Size the cap like cap_abs; _bin_flat ignores
        # it when >= T (two-stage would not shrink the sort).
        worst_small = max(st["n_small_tris"] for st in stats_list)
        need_s = int(cap_headroom * worst_small)
        small_cap = (
            pow2_at_least(need_s, 4096) if need_s <= 65536
            else -(-need_s // 8192) * 8192
        )
    tiny_cap = base.bin_tiny_cap
    if base.bin_tiny_px > 0:
        # Only ~area-fraction of sub-pixel candidates cover their pixel
        # center; compacting them (bin_tiny_cap) shrinks the tiny path's
        # two multi-operand sorts from (T + H*W) to (cap + H*W) entries.
        # Same sizing rule as the other caps.
        worst_cov = max(st["n_tiny_cov"] for st in stats_list)
        need_t = int(cap_headroom * worst_cov)
        tiny_cap = (
            pow2_at_least(need_t, 4096) if need_t <= 65536
            else -(-need_t // 8192) * 8192
        )
    cfg = base._replace(
        bin_med=med, bin_huge=huge, max_tris_per_tile=k_cap,
        bin_flat_cap_factor=cap_factor, bin_flat_cap_abs=cap_abs,
        bin_small_cap=small_cap, bin_tiny_cap=tiny_cap,
    )
    for p_i, t_i, r_i in probes:
        final = binning_stats(p_i, t_i, r_i, cfg)
        if not final["ok"]:
            raise ValueError(f"auto_fast_config failed to validate: {final}")
    return cfg


def binning_stats(pos, tri, resolution, config=DEFAULT_CONFIG):
    """Exact per-scene binning-budget diagnostics (failure detection for
    the lossy sort_pairs budgets; cheap — no rasterization, no doubled
    run). pos (B, V, 4) clip positions.

    Returns a dict with the worst-case-over-views numbers and their
    configured capacities; ``ok`` is True iff every budget holds, i.e. the
    flat binning is guaranteed lossless for this scene/config."""
    (n_huge, n_med, live, max_tile, k_cap, n_tiny, n_small, n_tiny_cov) = (
        _binning_stats_jit(
            jnp.asarray(pos, jnp.float32), jnp.asarray(tri, jnp.int32),
            tuple(resolution), config,
        )
    )
    t_total = int(tri.shape[0])
    flat_cap = (
        config.bin_flat_cap_factor * t_total
        if config.bin_flat_cap_factor > 0 else 2**62
    )
    if config.bin_flat_cap_abs > 0:
        flat_cap = min(flat_cap, config.bin_flat_cap_abs)
    stats = {
        "n_huge": int(n_huge),
        "huge_budget": int(config.bin_huge),
        "n_med": int(n_med),
        "med_budget": int(config.bin_med),
        "live_entries": int(live),
        "flat_cap": int(min(flat_cap, 2**62)),
        "max_per_tile": int(max_tile),
        "k_cap": int(k_cap),
        # Triangles whose bbox is < 1 px in both axes (the sort-path
        # candidates) — informational; bin_tiny_px decides whether they
        # actually leave the tile pipeline.
        "n_tiny_1px": int(n_tiny),
        # Live small-tier triangles (the bin_small_cap budget target).
        "n_small_tris": int(n_small),
        "small_cap_budget": int(config.bin_small_cap),
        # Covered tiny candidates (the bin_tiny_cap budget target; 0 when
        # bin_tiny_px is off).
        "n_tiny_cov": int(n_tiny_cov),
        "tiny_cap_budget": int(config.bin_tiny_cap),
    }
    small_cap_on = 0 < config.bin_small_cap < t_total
    tiny_cap_on = (
        config.bin_tiny_px > 0 and 0 < config.bin_tiny_cap < t_total
    )
    stats["ok"] = (
        stats["n_huge"] <= stats["huge_budget"]
        and stats["n_med"] <= stats["med_budget"]
        and stats["live_entries"] <= stats["flat_cap"]
        and stats["max_per_tile"] <= stats["k_cap"]
        and (
            not small_cap_on
            or stats["n_small_tris"] <= stats["small_cap_budget"]
        )
        and (
            not tiny_cap_on
            or stats["n_tiny_cov"] <= stats["tiny_cap_budget"]
        )
    )
    return stats


@functools.partial(jax.jit, static_argnums=(2, 3))
def _rasterize_batched(pos, tri, resolution, config):
    height, width = resolution
    cfg = config._replace(backend=_resolve_backend(config.backend, False))
    n_tiles = (-(-height // cfg.tile_h)) * (-(-width // cfg.tile_w))
    t_total = tri.shape[0]
    use_flat = (
        cfg.bin_mode == "sort_pairs"
        and t_total >= cfg.bin_sort_pairs_min_tris
        and (n_tiles + 1) * t_total < 2**31
    )
    if use_flat and cfg.backend == "pallas":
        # Whole batch through the ONE batched DMA kernel (uv_mode emits the
        # full nvdiffrast rast contract directly).
        from .gbuffer import _gbuffer_core

        gcfg = cfg._replace(backend="fused_pallas")
        _, z, idm, uvm = _gbuffer_core(
            pos, tri, None, height, width, gcfg, uv_mode=True
        )
        return jnp.concatenate(
            [uvm, z[..., None], idm.astype(jnp.float32)[..., None]], axis=-1
        )
    return jax.vmap(lambda p: _rasterize_single(p, tri, height, width, cfg))(pos)


def rasterize(
    pos: jnp.ndarray,
    tri: jnp.ndarray,
    resolution: Tuple[int, int],
    config: RasterizerConfig = DEFAULT_CONFIG,
    grad_db: bool = True,  # accepted for API parity; derivatives not produced
) -> jnp.ndarray:
    """Rasterize triangles. pos (B, V, 4) f32, tri (T, 3) i32.

    Returns (B, H, W, 4) with channels (u, v, z/w, tri_id + 1); 0 = background.
    """
    del grad_db
    if pos.ndim != 3:
        raise ValueError("pos must be (B, V, 4) — range mode is not supported")
    pos = pos.astype(jnp.float32)
    tri = tri.astype(jnp.int32)
    return _rasterize_batched(pos, tri, tuple(resolution), config)


def _diff_barycentrics(
    pos: jnp.ndarray, tri: jnp.ndarray, tid: jnp.ndarray,
    height: int, width: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Differentiable (u, v, z/w) of the (fixed) winner triangles.

    pos (B, V, 4) clip, tid (B, H, W) int32 winner ids (+1, 0 = bg, treated
    as constant). Perspective-correct barycentrics from the same viewport
    convention as :func:`_triangle_setup` (pixel centers at +0.5):
        u = e1/w1 / sum_i e_i/w_i,  v = e2/w2 / ...,
        z = sum_i e_i * (z_i/w_i) / sum_i e_i
    with e_i the screen-space sub-triangle areas at the pixel center —
    every term a jnp op, so d(u,v,z)/d(pos) flows by autodiff."""
    t = jnp.maximum(tid - 1, 0)
    corners = jax.vmap(lambda p, idx: p[tri[idx]])(pos, t)  # (B, H, W, 3, 4)
    w = corners[..., 3]
    w_safe = jnp.where(jnp.abs(w) < _W_EPS, _W_EPS, w)
    inv_w = 1.0 / w_safe
    x = (corners[..., 0] * inv_w + 1.0) * (width * 0.5)  # (B, H, W, 3)
    y = (corners[..., 1] * inv_w + 1.0) * (height * 0.5)
    zw = corners[..., 2] * inv_w

    px = jax.lax.broadcasted_iota(jnp.float32, tid.shape, 2) + 0.5
    py = jax.lax.broadcasted_iota(jnp.float32, tid.shape, 1) + 0.5
    # e_i = cross(v_prv - v_nxt, p - v_nxt): barycentric numerator of vtx i.
    e = []
    for i in range(3):
        nxt, prv = (i + 1) % 3, (i + 2) % 3
        dx = x[..., prv] - x[..., nxt]
        dy = y[..., prv] - y[..., nxt]
        e.append(dx * (py - y[..., nxt]) - dy * (px - x[..., nxt]))
    e_sum = e[0] + e[1] + e[2]
    e_sum = jnp.where(jnp.abs(e_sum) < 1e-20, 1e-20, e_sum)
    d = e[0] * inv_w[..., 0] + e[1] * inv_w[..., 1] + e[2] * inv_w[..., 2]
    d = jnp.where(jnp.abs(d) < 1e-30, 1e-30, d)
    u = e[1] * inv_w[..., 1] / d
    v = e[2] * inv_w[..., 2] / d
    z = (e[0] * zw[..., 0] + e[1] * zw[..., 1] + e[2] * zw[..., 2]) / e_sum
    return u, v, z


def rasterize_diff(
    pos: jnp.ndarray,
    tri: jnp.ndarray,
    resolution: Tuple[int, int],
    config: RasterizerConfig = DEFAULT_CONFIG,
) -> jnp.ndarray:
    """Rasterize with VERTEX-POSITION gradients (nvdiffrast's gradient
    model, reference capability via render.py:30-62): coverage (the winner
    id image) is a piecewise-constant function of ``pos`` and is treated as
    fixed (stop-gradient); the (u, v, z/w) channels carry exact analytic
    gradients w.r.t. the clip positions through a differentiable
    perspective-correct barycentric recompute. Silhouette/occlusion-boundary
    gradients are NOT produced here — route color through
    :func:`..antialias.antialias` (its edge-crossing weights are themselves
    differentiable in ``pos``), matching nvdiffrast's division of labor.

    Primal values are bit-identical to :func:`rasterize` (straight-through:
    the recompute contributes only the tangent); cost adds one
    (B, H, W, 3, 4) corner gather + dense math — use for optimization
    loops, not the forward-only fast path.
    """
    if pos.ndim != 3:
        raise ValueError("pos must be (B, V, 4) — range mode is not supported")
    pos = pos.astype(jnp.float32)
    tri = tri.astype(jnp.int32)
    height, width = resolution
    rast = _rasterize_batched(
        jax.lax.stop_gradient(pos), tri, tuple(resolution), config
    )
    tid = rast[..., 3].astype(jnp.int32)
    u, v, z = _diff_barycentrics(pos, tri, tid, height, width)
    covered = (tid > 0).astype(jnp.float32)

    def st(primal, recomp):
        # straight-through: primal from the exact rasterizer, tangent from
        # the differentiable recompute (zeroed on background)
        recomp = recomp * covered
        return jax.lax.stop_gradient(primal - recomp) + recomp

    return jnp.stack(
        [
            st(rast[..., 0], u),
            st(rast[..., 1], v),
            st(rast[..., 2], z),
            rast[..., 3],
        ],
        axis=-1,
    )

"""Tensor ops grab-bag: activations, micro-batching, ray-bbox intersection,
polar<->c2w conversions, Fourier positional encoding.

Reference contracts: mvadapter/utils/ops.py (trunc_exp:40-56,
get_activation:59-93, chunk_batch:96-160, get_mvp_matrix:281-299,
rays_intersect_bbox:346-385, get_plucker_rays:388-393, c2w_to_polar /
polar_to_c2w:396-436, fourier_position_encoding:439-462). The torch
custom-autograd trunc_exp becomes a jax.custom_jvp; chunk_batch becomes a
host loop over jnp slices (outside jit — inside jit, XLA handles memory).
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Any, Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import normalize
from ..transforms import dot

__all__ = [
    "reflect",
    "scale_tensor",
    "trunc_exp",
    "get_activation",
    "chunk_batch",
    "get_mvp_matrix",
    "rays_intersect_bbox",
    "get_plucker_rays",
    "c2w_to_polar",
    "polar_to_c2w",
    "fourier_position_encoding",
    "edge0_pad_block",
]


def reflect(x: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    return 2 * dot(x, n) * n - x


def scale_tensor(dat, inp_scale=None, tgt_scale=None):
    if inp_scale is None:
        inp_scale = (0, 1)
    if tgt_scale is None:
        tgt_scale = (0, 1)
    dat = (dat - inp_scale[0]) / (inp_scale[1] - inp_scale[0])
    return dat * (tgt_scale[1] - tgt_scale[0]) + tgt_scale[0]


@jax.custom_jvp
def trunc_exp(x):
    """exp with gradient computed at clamp(x, max=15) — avoids inf gradients
    in density activations (reference ops.py:40-56, torch-ngp)."""
    return jnp.exp(x)


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = jnp.exp(x)
    return y, dx * jnp.exp(jnp.clip(x, a_max=15.0))


def get_activation(name: Optional[str]) -> Callable:
    """Named activation lookup (reference ops.py:59-93)."""
    if name is None:
        return lambda x: x
    name = name.lower()
    table = {
        "none": lambda x: x,
        "lin2srgb": lambda x: jnp.clip(
            jnp.where(
                x > 0.0031308,
                jnp.power(jnp.clip(x, a_min=0.0031308), 1.0 / 2.4) * 1.055 - 0.055,
                12.92 * x,
            ),
            0.0,
            1.0,
        ),
        "exp": jnp.exp,
        "shifted_exp": lambda x: jnp.exp(x - 1.0),
        "trunc_exp": trunc_exp,
        "shifted_trunc_exp": lambda x: trunc_exp(x - 1.0),
        "sigmoid": jax.nn.sigmoid,
        "tanh": jnp.tanh,
        "shifted_softplus": lambda x: jax.nn.softplus(x - 1.0),
        "scale_-11_01": lambda x: x * 0.5 + 0.5,
        "negative": lambda x: -x,
    }
    if name in table:
        return table[name]
    fn = getattr(jax.nn, name, None)
    if fn is not None:
        return fn
    raise ValueError(f"Unknown activation function: {name}")


def chunk_batch(func: Callable, chunk_size: int, *args, **kwargs) -> Any:
    """Host-side micro-batching over the leading axis (reference
    ops.py:96-160): call ``func`` on slices and concatenate outputs (arrays,
    or dicts/tuples of arrays). For memory-bounded sweeps outside jit."""
    if chunk_size <= 0:
        return func(*args, **kwargs)

    def is_arr(a):
        return isinstance(a, (jnp.ndarray, np.ndarray)) and a.ndim > 0

    batch = None
    for arg in list(args) + list(kwargs.values()):
        if is_arr(arg):
            batch = arg.shape[0]
            break
    assert batch is not None, "No array found in args, cannot determine batch size."

    out: dict = defaultdict(list)
    out_type = None
    for i in range(0, max(1, batch), chunk_size):
        chunk = func(
            *[a[i : i + chunk_size] if is_arr(a) else a for a in args],
            **{k: a[i : i + chunk_size] if is_arr(a) else a for k, a in kwargs.items()},
        )
        if chunk is None:
            continue
        out_type = type(chunk)
        if isinstance(chunk, (jnp.ndarray, np.ndarray)):
            chunk_items = {0: chunk}
        elif isinstance(chunk, dict):
            chunk_items = chunk
        elif isinstance(chunk, (tuple, list)):
            chunk_items = {i: v for i, v in enumerate(chunk)}
        else:
            raise TypeError(f"unsupported chunk_batch return type {type(chunk)}")
        for k, v in chunk_items.items():
            out[k].append(v)

    if out_type is None:
        return None
    merged = {k: jnp.concatenate(v, axis=0) for k, v in out.items()}
    if out_type in (jnp.ndarray, type(jnp.zeros(1)), np.ndarray):
        return merged[0]
    if out_type is dict:
        return merged
    return out_type([merged[i] for i in range(len(merged))])


def get_mvp_matrix(c2w: jnp.ndarray, proj_mtx: jnp.ndarray) -> jnp.ndarray:
    """MVP from c2w via the analytic rigid inverse (reference ops.py:281-299)."""
    from ..camera import rigid_inverse

    squeeze = c2w.ndim == 2
    if squeeze:
        c2w, proj_mtx = c2w[None], proj_mtx[None]
    mvp = proj_mtx @ rigid_inverse(c2w)
    return mvp[0] if squeeze else mvp


def rays_intersect_bbox(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    radius: Union[float, jnp.ndarray],
    near: float = 0.0,
    valid_thresh: float = 0.01,
):
    """Slab-method ray / axis-aligned-box intersection
    (reference ops.py:346-385). Returns (t_near (..., 1), t_far (..., 1),
    rays_valid (...))."""
    input_shape = rays_o.shape[:-1]
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    rays_d = jnp.where(jnp.abs(rays_d) < 1e-6, 1e-6, rays_d)
    if isinstance(radius, (int, float)):
        radius = jnp.array(
            [[-radius, radius]] * 3, jnp.float32
        )
    radius = (1.0 - 1.0e-3) * radius
    i0 = (radius[..., 1] - rays_o) / rays_d
    i1 = (radius[..., 0] - rays_o) / rays_d
    t_near = jnp.clip(jnp.minimum(i0, i1).max(axis=-1), a_min=near)
    t_far = jnp.maximum(i0, i1).min(axis=-1)
    rays_valid = t_far - t_near > valid_thresh
    t_near = jnp.where(rays_valid, t_near, 0.0)
    t_far = jnp.where(rays_valid, t_far, 0.0)
    return (
        t_near.reshape(*input_shape, 1),
        t_far.reshape(*input_shape, 1),
        rays_valid.reshape(*input_shape),
    )


def get_plucker_rays(rays_o: jnp.ndarray, rays_d: jnp.ndarray) -> jnp.ndarray:
    """Plücker 6-vector from normalized origin/direction
    (reference ops.py:388-393)."""
    rays_o = normalize(rays_o)
    rays_d = normalize(rays_d)
    return jnp.concatenate([jnp.cross(rays_o, rays_d), rays_d], axis=-1)


def c2w_to_polar(c2w: np.ndarray) -> Tuple[float, float, float]:
    """(elevation, azimuth, distance) from a c2w matrix
    (reference ops.py:396-408). Host-side scalars."""
    cam_pos = np.asarray(c2w)[:3, 3]
    x, y, z = cam_pos.tolist()
    distance = float(np.linalg.norm(cam_pos))
    elevation = math.asin(z / distance)
    if abs(x) < 1.0e-5 and abs(y) < 1.0e-5:
        azimuth = 0.0
    else:
        azimuth = math.atan2(y, x)
        if azimuth < 0:
            azimuth += 2 * math.pi
    return elevation, azimuth, distance


def polar_to_c2w(elevation: float, azimuth: float, distance: float) -> np.ndarray:
    """Z-up look-at c2w from polar coordinates (reference ops.py:411-436).
    Angles in radians."""
    z = distance * math.sin(elevation)
    x = distance * math.cos(elevation) * math.cos(azimuth)
    y = distance * math.cos(elevation) * math.sin(azimuth)
    lookat = -np.array([x, y, z], np.float64)
    lookat /= np.linalg.norm(lookat)
    up = np.array([0.0, 0.0, 1.0])
    s = np.cross(lookat, up)
    s /= np.linalg.norm(s)
    u = np.cross(s, lookat)
    rot = np.stack([s, u, -lookat], axis=0).T
    c2w = np.zeros((4, 4), np.float32)
    c2w[:3, :3] = rot
    c2w[:3, 3] = [x, y, z]
    c2w[3, 3] = 1.0
    return c2w


def get_intrinsic_from_fov(fov: float, height: int, width: int, bs: int = -1):
    """Pinhole intrinsics from a vertical fov (reference ops.py:302-313)."""
    focal = 0.5 * height / math.tan(0.5 * fov)
    intr = np.identity(3, dtype=np.float32)
    intr[0, 0] = focal
    intr[1, 1] = focal
    intr[0, 2] = width / 2.0
    intr[1, 2] = height / 2.0
    if bs > 0:
        intr = np.repeat(intr[None], bs, axis=0)
    return jnp.asarray(intr)


def binary_cross_entropy(input: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Numerically explicit BCE (reference ops.py:316-320)."""
    return -jnp.mean(
        target * jnp.log(input) + (1.0 - target) * jnp.log(1.0 - input)
    )


def tet_sdf_diff(vert_sdf: jnp.ndarray, tet_edges: jnp.ndarray) -> jnp.ndarray:
    """Sign-consistency loss over tet edges crossing the SDF zero level
    (reference ops.py:323-334). The torch version boolean-masks crossing
    edges (dynamic shape); here the per-edge losses are where-weighted and
    averaged over the crossing count — identical value, static shapes."""
    s = vert_sdf[:, 0][tet_edges.reshape(-1)].reshape(-1, 2)
    crossing = jnp.sign(s[:, 0]) != jnp.sign(s[:, 1])

    def bce_logits(logits, labels):
        return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
            jnp.exp(-jnp.abs(logits))
        )

    per_edge = bce_logits(s[:, 0], (s[:, 1] > 0).astype(s.dtype)) + bce_logits(
        s[:, 1], (s[:, 0] > 0).astype(s.dtype)
    )
    n = jnp.maximum(jnp.sum(crossing), 1)
    return jnp.sum(jnp.where(crossing, per_edge, 0.0)) / n


def validate_empty_rays(ray_indices, t_start, t_end):
    """Replace an empty ray set with one dummy ray (reference
    ops.py:337-344). Host-side guard — shapes must be concrete."""
    if np.asarray(ray_indices).size == 0:
        ray_indices = jnp.zeros((1,), jnp.int32)
        t_start = jnp.zeros((1,), jnp.float32)
        t_end = jnp.zeros((1,), jnp.float32)
    return ray_indices, t_start, t_end


def fourier_position_encoding(x: jnp.ndarray, n_freq: int, dim: int) -> jnp.ndarray:
    """sin/cos features at octave frequencies along ``dim``
    (reference ops.py:439-462)."""
    assert n_freq > 0
    input_shape = x.shape
    ndim = x.ndim
    if dim < 0:
        dim = ndim + dim
    bands = 2.0 ** jnp.arange(n_freq, dtype=x.dtype)
    bands = bands.reshape((1,) * (dim + 1) + (n_freq,) + (1,) * (ndim - dim - 1))
    x = x.reshape(input_shape[: dim + 1] + (1,) + input_shape[dim + 1 :])
    sin = jnp.sin(bands * x).reshape(
        input_shape[:dim] + (-1,) + input_shape[dim + 1 :]
    )
    cos = jnp.cos(bands * x).reshape(
        input_shape[:dim] + (-1,) + input_shape[dim + 1 :]
    )
    return jnp.concatenate([sin, cos], axis=dim)


def edge0_pad_block(r: int, pad: int, dtype, neg: float) -> jnp.ndarray:
    """A ``(3, r, pad)`` plane-coefficient padding block whose edge-0
    constant row (``[2, 0, :]``) is ``neg`` (so padded rasterizer slots are
    never covered) — built WITHOUT an ``.at[].set`` on the full-size zeros.

    The obvious ``zeros((..., pad)).at[..., 2, 0, :].set(neg)`` lowers to a
    scatter on a constant, and XLA's scatter constant-folder materializes
    the WHOLE block as a baked literal — 37 MB of HLO constant at UV-atlas
    tile counts (``(8192, 3, 4, 94)`` at a 4096² atlas), which inflates
    remote-compile requests and folding time. A small ``(3, r)`` fold +
    runtime ``broadcast_to`` stays bytes-sized: XLA's constant folder skips
    broadcasts. Callers needing a leading tile dim broadcast again —
    ``jnp.broadcast_to(block[None], (n_tiles, 3, r, pad))`` — which is
    equally fold-proof.
    """
    col = jnp.zeros((3, r), dtype).at[2, 0].set(neg)  # tiny (3, r) fold
    return jnp.broadcast_to(col[:, :, None], (3, r, pad))

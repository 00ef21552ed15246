"""Dataset-scale render sweep runner: many (mesh, trajectory) jobs over a
device mesh with size bucketing, async host IO, and checkpoint/resume.

This is the SURVEY.md §7.7 subsystem — the part the reference only gestures
at with vestigial DDP scaffolding (mvadapter/utils/config.py:26-30,
misc.py:129-145). Design:

  * meshes are padded to size buckets so jit caches stay warm across jobs
    (SURVEY.md §7.3);
  * the view axis shards across the device mesh (ICI collectives only);
  * PNG encoding/writes happen on a host thread pool, overlapping device
    compute;
  * a progress JSON enables resume after interruption (reference
    `ExperimentConfig.resume` was dead config, config.py:62 — here it works).
"""

from __future__ import annotations

import json
import os
import threading
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..camera import Camera
from ..mesh import TexturedMesh
from ..render import RenderOutput, render
from ..utils.logging import get_logger
from .device_mesh import make_device_mesh
from .dist import is_main_process

logger = get_logger(__name__)

__all__ = ["RenderJob", "SweepRunner", "pad_mesh_to_bucket"]


def _next_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if n <= b:
            return b
    return int(2 ** np.ceil(np.log2(max(n, 1))))


def pad_mesh_to_bucket(
    mesh: TexturedMesh,
    vertex_buckets: Sequence[int] = (1 << 12, 1 << 14, 1 << 16, 1 << 18),
    face_buckets: Sequence[int] = (1 << 12, 1 << 14, 1 << 16, 1 << 18),
) -> TexturedMesh:
    """Pad vertex/face buffers up to bucket sizes with degenerate data so
    different meshes reuse one compiled program. Padded faces reference
    vertex 0 three times -> zero area -> culled by the rasterizer's
    valid-area test (ops/rasterize.py)."""
    nv, nf = mesh.num_vertices, mesh.num_faces
    bv = _next_bucket(nv, vertex_buckets)
    bf = _next_bucket(nf, face_buckets)

    def pad_rows(a, n, fill=0.0):
        if a is None or a.shape[0] >= n:
            return a
        cfg = [(0, n - a.shape[0])] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, cfg, constant_values=fill)

    out = mesh._replace(
        v_pos=pad_rows(mesh.v_pos, bv),
        t_pos_idx=pad_rows(mesh.t_pos_idx, bf, 0),
        v_tex=pad_rows(mesh.v_tex, bv),
        t_tex_idx=pad_rows(mesh.t_tex_idx, bf, 0) if mesh.t_tex_idx is not None else None,
        v_nrm=pad_rows(mesh.v_nrm, bv),
        v_tang=pad_rows(mesh.v_tang, bv),
    )
    if mesh.stitched_v_pos is not None:
        out = out._replace(
            stitched_v_pos=pad_rows(mesh.stitched_v_pos, bv),
            stitched_t_pos_idx=pad_rows(mesh.stitched_t_pos_idx, bf, 0),
        )
    return out


@dataclass
class RenderJob:
    """One sweep unit: a mesh + camera trajectory to render."""

    name: str
    mesh: TexturedMesh
    cam: Camera
    height: int = 512
    width: int = 512
    render_kwargs: dict = field(default_factory=dict)


class SweepRunner:
    """Run many render jobs across the local device mesh with async IO."""

    def __init__(
        self,
        output_dir: str,
        device_mesh=None,
        io_workers: int = 8,
        bucket_meshes: bool = True,
    ):
        self.output_dir = output_dir
        self.device_mesh = device_mesh or make_device_mesh()
        self.executor = ThreadPoolExecutor(max_workers=io_workers)
        self.bucket_meshes = bucket_meshes
        self._progress_path = os.path.join(output_dir, "sweep_progress.json")
        self._done: set = set()
        self._lock = threading.Lock()
        os.makedirs(output_dir, exist_ok=True)
        self._load_progress()

    # -- progress / resume --------------------------------------------------

    def _load_progress(self) -> None:
        if os.path.exists(self._progress_path):
            try:
                self._done = set(json.load(open(self._progress_path)))
                logger.info(f"Resuming sweep: {len(self._done)} jobs already done")
            except Exception:
                self._done = set()

    def _mark_done(self, name: str) -> None:
        with self._lock:
            self._done.add(name)
            if is_main_process():
                with open(self._progress_path, "w") as f:
                    json.dump(sorted(self._done), f)

    # -- IO ------------------------------------------------------------------

    def _save_outputs(self, job: RenderJob, out_np: dict) -> None:
        from ..scene.video import save_depth_frames_16bit, save_frames

        job_dir = os.path.join(self.output_dir, job.name)
        if "attr" in out_np:
            save_frames(out_np["attr"], os.path.join(job_dir, "rgb"), "rgb")
        if "mask" in out_np:
            save_frames(out_np["mask"], os.path.join(job_dir, "mask"), "mask")
        if "depth" in out_np:
            save_depth_frames_16bit(
                out_np["depth"], os.path.join(job_dir, "depth"), "depth"
            )
        if "normal" in out_np:
            save_frames(
                np.clip(out_np["normal"] * 0.5 + 0.5, 0, 1),
                os.path.join(job_dir, "normal"),
                "normal",
            )
        self._mark_done(job.name)

    # -- main ----------------------------------------------------------------

    def run(self, jobs: List[RenderJob], save: bool = True) -> List[Optional[dict]]:
        """Render all jobs; returns per-job output dicts (None for skipped).
        Device compute for job i+1 overlaps host IO for job i."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = self.device_mesh.axis_names[0]
        view_shard = NamedSharding(self.device_mesh, P(axis))
        repl = NamedSharding(self.device_mesh, P())
        n_dev = self.device_mesh.devices.size

        futures = []
        results: List[Optional[dict]] = []
        for job in jobs:
            if job.name in self._done:
                logger.info(f"skip {job.name} (done)")
                results.append(None)
                continue
            mesh = pad_mesh_to_bucket(job.mesh) if self.bucket_meshes else job.mesh
            n_views = len(job.cam)
            pad_views = (-n_views) % n_dev
            cam = job.cam
            if pad_views:
                idx = jnp.concatenate(
                    [jnp.arange(n_views), jnp.zeros(pad_views, jnp.int32)]
                )
                cam = cam[idx]
            mesh = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, repl) if x is not None else None, mesh
            )
            cam = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, view_shard) if x is not None else None,
                cam,
            )
            out: RenderOutput = jax.jit(
                render,
                static_argnames=(
                    "height", "width", "render_attr", "render_depth",
                    "render_normal", "render_tangent",
                ),
            )(mesh, cam, height=job.height, width=job.width, **job.render_kwargs)
            out_np = {
                k: np.asarray(v)[:n_views]
                for k, v in out._asdict().items()
                if v is not None
            }
            results.append(out_np)
            if save:
                futures.append(self.executor.submit(self._save_outputs, job, out_np))

        for f in futures:
            f.result()
        return results

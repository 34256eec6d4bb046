"""Distributed FDK: z-sharded volume, ICI-gathered projections.

Scheme (SURVEY.md §2/§5 distributed design):

  * the volume z-block is sharded over the 1-D mesh axis ``z`` — each
    device owns a contiguous z-slab (the reference's per-GPU subvolume,
    src/cuda/subvolume_information.cpp, but static and deterministic);
  * each projection CHUNK is sharded over the same axis for the
    weight+filter stage (the FFTs parallelize over projections), then
    ``all_gather``-ed over ICI so every device backprojects every
    projection into its own slab — communication rides ICI, compute is
    embarrassingly parallel, zero steady-state reductions;
  * the per-shard global z offset is derived from ``axis_index`` inside
    ``shard_map`` (the reference lost this offset in a thread_local —
    SURVEY.md §5 bug 1/2 — here it is pure dataflow).

Works identically on a virtual CPU mesh (tests), a single real chip
(mesh of 1), or a multi-host pod slice (``jax.distributed`` +
``jax.make_mesh`` over all global devices).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..geometry import DetectorGeometry, VolumeGeometry
from ..ops.backprojection_xla import make_bp_grid
from ..ops.weighting import weight_map
from ..ops.filtering import ramp_filter_spectrum, filter_projections
from .mesh import Z_AXIS, make_z_mesh

__all__ = ["DistributedReconstructor"]


class DistributedReconstructor:
    """FDK over a device mesh: volume z-sharded, projections gathered.

    ``block_dz`` is the (padded) z extent processed at once; it must be
    divisible by the mesh size.  ``chunk_size`` is the number of
    projections per device step and must also be divisible by the mesh
    size (the chunk is filter-sharded over devices).
    """

    def __init__(
        self,
        det: DetectorGeometry,
        vol: VolumeGeometry,
        *,
        mesh: Optional[Mesh] = None,
        chunk_size: int = 16,
        block_dz: Optional[int] = None,
        backend: str = "auto",
    ):
        self.det = det
        self.vol = vol
        self.mesh = mesh if mesh is not None else make_z_mesh()
        self.n_dev = self.mesh.devices.size
        self.chunk_size = int(chunk_size)
        if self.chunk_size % self.n_dev:
            raise ValueError(
                f"chunk_size {chunk_size} not divisible by mesh size {self.n_dev}"
            )
        dz = block_dz if block_dz is not None else vol.dim_z
        if dz % self.n_dev:
            raise ValueError(f"block_dz {dz} not divisible by mesh size {self.n_dev}")
        self.block_dz = dz
        self.local_dz = dz // self.n_dev

        self.grid = make_bp_grid(det, vol)
        self._weights = weight_map(det)
        self._spectrum = ramp_filter_spectrum(det.n_row, det.l_px_row)

        if backend == "auto":
            backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        if backend == "pallas":
            from ..ops.backprojection_pallas import backproject_chunk_pallas
            self._bp = backproject_chunk_pallas
        else:
            from ..ops.backprojection_xla import backproject_chunk_xla
            self._bp = backproject_chunk_xla

        vol_spec = P(Z_AXIS, None, None)
        proj_spec = P(Z_AXIS, None, None)
        ang_spec = P(Z_AXIS)

        def shard_step(volume, chunk, sin_phi, cos_phi, z_offset, roi_offset):
            # volume: (local_dz, ny, nx); chunk: (C/n, n_col, n_row)
            filtered_local = filter_projections(
                chunk * self._weights, self._spectrum, det.n_row
            )
            filtered = jax.lax.all_gather(filtered_local, Z_AXIS, tiled=True)
            sins = jax.lax.all_gather(sin_phi, Z_AXIS, tiled=True)
            coss = jax.lax.all_gather(cos_phi, Z_AXIS, tiled=True)
            my_z0 = jax.lax.axis_index(Z_AXIS) * self.local_dz
            return self._bp(
                volume, filtered, sins, coss, self.grid,
                z_offset=z_offset + my_z0, roi_offset=roi_offset,
            )

        mapped = jax.shard_map(
            shard_step,
            mesh=self.mesh,
            in_specs=(vol_spec, proj_spec, ang_spec, ang_spec, P(), P()),
            out_specs=vol_spec,
        )
        self._step = jax.jit(mapped, donate_argnums=(0,))

        self._vol_sharding = NamedSharding(self.mesh, vol_spec)
        self._proj_sharding = NamedSharding(self.mesh, proj_spec)
        self._ang_sharding = NamedSharding(self.mesh, ang_spec)

    def init_block(self) -> jax.Array:
        return jax.device_put(
            jnp.zeros((self.block_dz, self.vol.dim_y, self.vol.dim_x), jnp.float32),
            self._vol_sharding,
        )

    def accumulate(
        self,
        volume: jax.Array,
        projections,
        angles_deg,
        *,
        z_offset: int = 0,
        roi_offset: Tuple[int, int, int] = (0, 0, 0),
    ) -> jax.Array:
        C = self.chunk_size
        n = len(angles_deg)
        roi = jnp.asarray(roi_offset, jnp.int32)
        for i in range(0, n, C):
            chunk = np.asarray(projections[i:i + C], dtype=np.float32)
            ang = np.asarray(angles_deg[i:i + C], dtype=np.float32)
            if chunk.shape[0] < C:
                pad = C - chunk.shape[0]
                chunk = np.pad(chunk, ((0, pad), (0, 0), (0, 0)))
                ang = np.pad(ang, (0, pad))
            phi = np.deg2rad(ang).astype(np.float32)
            volume = self._step(
                volume,
                jax.device_put(chunk, self._proj_sharding),
                jax.device_put(np.sin(phi), self._ang_sharding),
                jax.device_put(np.cos(phi), self._ang_sharding),
                jnp.int32(z_offset),
                roi,
            )
        return volume

    def reconstruct(self, projections, angles_deg, **kw) -> np.ndarray:
        out = self.accumulate(self.init_block(), projections, angles_deg, **kw)
        return np.asarray(out)[: self.vol.dim_z]

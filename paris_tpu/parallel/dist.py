"""Distributed FDK: sharded volume, ICI-gathered projections.

Scheme (SURVEY.md §2/§5 distributed design):

  * the volume block is sharded over the 1-D mesh — each device owns a
    contiguous slab (the reference's per-GPU subvolume,
    src/cuda/subvolume_information.cpp, but static and deterministic).
    The XLA backend shards the z axis of the (z, y, x) accumulator; the
    Pallas backend keeps its (y, x, z) kernel layout and shards the
    Y axis (alignment-free — z must stay 128-padded per shard), which
    is mathematically identical (backprojection is independent per
    voxel; the per-shard offset rides the same roi-offset dataflow);
  * each projection CHUNK is sharded over the mesh for the
    weight+filter stage (the FFTs parallelize over projections), then
    ``all_gather``-ed over ICI so every device backprojects every
    projection into its own slab — communication rides ICI, compute is
    embarrassingly parallel, zero steady-state reductions;
  * per-shard offsets are derived from ``axis_index`` inside
    ``shard_map`` (the reference lost its subvolume offset in a
    thread_local — SURVEY.md §5 bugs 1/2 — here it is pure dataflow).

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
from ..ops.backprojection_xla import backproject_chunk_xla, make_bp_grid
from ..ops.weighting import weight_map
from ..ops.filtering import ramp_filter_spectrum, filter_projections
from ..pipeline import (
    dequantize_chunk, identity_qparams, quantize_chunk_u16,
    _proj_bytes, _proj_sublane, _scratch_rows, _vmem_budget,
    _STAGE_WORKERS as _STAGE_CONCURRENCY,
)
from .mesh import Z_AXIS, make_z_mesh

__all__ = ["DistributedReconstructor"]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class DistributedReconstructor:
    """FDK over a device mesh: volume sharded, projections gathered.

    ``block_dz`` is the (padded) z extent processed at once.
    ``chunk_size`` is the number of projections per device step; both
    must satisfy backend-specific divisibility (chunk by mesh size; for
    the XLA backend block_dz by mesh size as well).
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
        interpret: bool = False,
        v_band_width=None,
        accuracy: str = "exact",
        window_mode: Optional[str] = None,
    ):
        if accuracy not in ("exact", "fast"):
            raise ValueError(f"accuracy must be 'exact' or 'fast', "
                             f"got {accuracy!r}")
        self.det = det
        self.vol = vol
        self.accuracy = accuracy
        self.mesh = mesh if mesh is not None else make_z_mesh()
        self.n_dev = self.mesh.devices.size
        self.chunk_size = int(chunk_size)
        if self.chunk_size % self.n_dev:
            raise ValueError(
                f"chunk_size {chunk_size} not divisible by mesh size {self.n_dev}"
            )
        dz = block_dz if block_dz is not None else vol.dim_z
        self.block_dz = dz
        self._owned_ranges = self._chunk_owned_ranges()

        self.grid = make_bp_grid(det, vol)
        self._weights = weight_map(det)
        self._spectrum = ramp_filter_spectrum(det.n_row, det.l_px_row)

        # x-tile ladder + loud fallback, as in Reconstructor.__init__
        # (pipeline.py): a wide-fan geometry narrows the tile before
        # surrendering to the ~3000x-slower XLA op
        from ..pipeline import resolve_pallas_x_tile
        import os as _os
        self.x_tile = None
        was_auto = backend == "auto"
        if was_auto:
            backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        if backend == "pallas":
            if _os.environ.get("PARIS_BP_XTILE"):
                self.x_tile = resolve_pallas_x_tile(
                    self.grid, int(_os.environ["PARIS_BP_XTILE"]))
            else:
                self.x_tile = resolve_pallas_x_tile(self.grid)
            if self.x_tile is None:
                if not was_auto:
                    raise ValueError(
                        "geometry's h-band exceeds the Pallas envelope "
                        "at every supported x-tile (64/32/16); use "
                        "backend='xla' (or 'auto') for this geometry")
                import logging
                logging.getLogger("paris_tpu.parallel").warning(
                    "geometry's h-band exceeds the Pallas envelope at "
                    "every x-tile (64/32/16); falling back to the "
                    "portable XLA backprojection op — measured ~3000x "
                    "slower on TPU (0.02 vs 60.5 Gupd/s at 512-class)")
                backend = "xla"
        self.backend = backend

        ang_spec = P(Z_AXIS)
        proj_spec = P(Z_AXIS, None, None)

        if backend == "xla":
            if dz % self.n_dev:
                raise ValueError(
                    f"block_dz {dz} not divisible by mesh size {self.n_dev}")
            self.local_dz = dz // self.n_dev
            vol_spec = P(Z_AXIS, None, None)
            self._state_shape = (dz, vol.dim_y, vol.dim_x)
            self._vp = 0

            def shard_step(volume, chunk, sin_phi, cos_phi, qparams,
                           offs, static_plan=None):  # static_plan: XLA n/a
                # volume: (local_dz, ny, nx); chunk: (C/n, n_col, n_row)
                dq = dequantize_chunk(chunk, qparams)
                filtered = filter_projections(
                    dq * self._weights, self._spectrum, det.n_row)
                filtered = jax.lax.all_gather(filtered, Z_AXIS, tiled=True)
                sins = jax.lax.all_gather(sin_phi, Z_AXIS, tiled=True)
                coss = jax.lax.all_gather(cos_phi, Z_AXIS, tiled=True)
                my_z0 = jax.lax.axis_index(Z_AXIS) * self.local_dz
                return backproject_chunk_xla(
                    volume, filtered, sins, coss, self.grid,
                    z_offset=offs[2] + my_z0,
                    roi_offset=(offs[0], offs[1], 0),
                )

        elif backend == "pallas":
            from ..ops import backprojection_pallas as bpp
            self._bpp = bpp
            ny = _round_up(vol.dim_y, self.n_dev)
            self.local_ny = ny // self.n_dev
            nxp = _round_up(vol.dim_x, 128)
            nzp = _round_up(dz, 128)
            vol_spec = P(Z_AXIS, None, None)   # shard axis 0 = y
            self._state_shape = (ny, nxp, nzp)
            vp_full = _round_up(det.n_col, 128)
            self._vp = vp_full if v_band_width is None else \
                min(vp_full, _round_up(v_band_width, 128))
            # the all-gather makes the FULL chunk resident in every
            # device's VMEM, so the budget check uses the global chunk
            # size — same validation as Reconstructor.__init__
            # (pipeline.py); without it an oversized chunk surfaces as
            # a Mosaic allocation failure instead of this message
            hp = _round_up(det.n_row, _proj_sublane(accuracy))
            srows = _scratch_rows(accuracy, self.x_tile)
            pb = _proj_bytes(accuracy)
            vmem_est = self.chunk_size * self._vp * (pb * hp + 4 * srows)
            budget = _vmem_budget()
            if vmem_est > budget:
                max_c = max(1, budget // (self._vp * (pb * hp + 4 * srows)))
                raise ValueError(
                    f"chunk_size {self.chunk_size} needs ~{vmem_est >> 20}MB "
                    f"VMEM for a {hp}x{self._vp} projection band; reduce "
                    f"chunk_size to <= {max_c} or narrow the detector band")

            def shard_step(volume, chunk, sin_phi, cos_phi, qparams,
                           offs, static_plan=None):
                # volume: (local_ny, nxp, nzp); fast mode arrives as
                # per-frame affine-u16 over the host->device wire
                # (dequant here) and gathers bf16 over ICI — half the
                # bytes on both hops
                dq = dequantize_chunk(chunk, qparams)
                filtered = filter_projections(
                    dq * self._weights, self._spectrum, det.n_row)
                if accuracy == "fast":
                    proj_t = bpp.pad_projections_t(filtered, jnp.bfloat16)
                else:
                    proj_t = bpp.pad_projections_t(filtered, jnp.float32,
                                                   sub=16)
                if self._vp < vp_full:
                    # band BEFORE the all-gather: the ICI broadcast only
                    # carries the detector rows this z-block can sample
                    proj_t = jax.lax.dynamic_slice(
                        proj_t, (0, 0, offs[3]),
                        (proj_t.shape[0], proj_t.shape[1], self._vp))
                proj_t = jax.lax.all_gather(proj_t, Z_AXIS, tiled=True)
                sins = jax.lax.all_gather(sin_phi, Z_AXIS, tiled=True)
                coss = jax.lax.all_gather(cos_phi, Z_AXIS, tiled=True)
                my_y0 = jax.lax.axis_index(Z_AXIS) * self.local_ny
                shard_offs = jnp.stack(
                    [offs[0], offs[1] + my_y0, offs[2], offs[3]])
                if accuracy == "exact":
                    # split AFTER the gather (local elementwise): the
                    # bf16x3 exact path, see ops/backprojection_pallas
                    proj_t = bpp.split_bf16_planes(proj_t)
                # static_plan is z-only, so one plan serves every y shard
                return bpp.backproject_chunk_pallas_yxz(
                    volume, proj_t, sins, coss, self.grid, shard_offs,
                    interpret=interpret,
                    precision=jax.lax.Precision.DEFAULT,
                    window_mode=window_mode, static_plan=static_plan,
                    x_tile=self.x_tile)
        else:
            raise ValueError(f"unknown backend {backend!r}")

        @functools.lru_cache(maxsize=32)     # one entry per z-block
        def step_for(static_plan):
            mapped = jax.shard_map(
                functools.partial(shard_step, static_plan=static_plan),
                mesh=self.mesh,
                in_specs=(vol_spec, proj_spec, ang_spec, ang_spec,
                          P(Z_AXIS, None), P()),
                out_specs=vol_spec,
                # pallas_call out_shapes carry no varying-mesh-axes info
                check_vma=False,
            )
            stepped = jax.jit(mapped, donate_argnums=(0,))
            from .. import compile_cache
            from ..pipeline import _CachedStep, _env_knobs
            # persistent executable cache for the sharded step too —
            # including MULTI-HOST (r4 verdict 2): each process caches
            # its serialized copy of the global SPMD executable, keyed
            # by its (process_index, process_count) so a shared cache
            # dir (or a pod restart with a different host order) never
            # hands process i another process's binding; every host of
            # a warm pod job then skips the full Mosaic/XLA compile
            # (the reference binary's instant start, src/main.cpp:
            # 112-178, was per-host too).  Proven by the 2-proc CPU
            # warm-start test (tests/test_multihost_2proc.py).
            if compile_cache.cache_dir():
                from ..pipeline import _cache_key_det
                key = ("dist", backend, _cache_key_det(det), vol,
                       self.chunk_size,
                       self.block_dz, self.n_dev, accuracy, window_mode,
                       interpret, self._vp, _env_knobs(), static_plan) + (
                    () if self.x_tile in (None, 64)
                    else ("xtile", self.x_tile))
                if jax.process_count() > 1:
                    key += ("proc", jax.process_index(),
                            jax.process_count())
                return _CachedStep(
                    stepped, key,
                    execution_devices=list(self.mesh.devices.flat))
            return stepped

        self._step_for = step_for
        self._step = step_for(None)
        self._vol_sharding = NamedSharding(self.mesh, vol_spec)
        self._proj_sharding = NamedSharding(self.mesh, proj_spec)
        self._ang_sharding = NamedSharding(self.mesh, ang_spec)
        # per-frame qparams ride the same projection-axis sharding, so
        # each host only needs correct rows for the frames it owns
        self._qp_sharding = NamedSharding(self.mesh, P(Z_AXIS, None))

    def _v_band_lo(self, z0_global: int) -> int:
        vp_full = _round_up(self.det.n_col, 128)
        if self.backend != "pallas" or not self._vp or self._vp >= vp_full:
            return 0
        from ..geometry import detector_row_band
        lo, hi = detector_row_band(self.det, self.vol, z0_global, self.block_dz)
        if hi - lo > self._vp:
            raise ValueError(
                f"v_band_width {self._vp} too narrow for block at "
                f"z={z0_global} (needs {hi - lo} rows)")
        return max(0, min(lo, vp_full - self._vp))

    def init_block(self) -> jax.Array:
        # jit with out_shardings works on single- AND multi-process
        # meshes (device_put of a host array onto a global sharding
        # would fail multi-host: non-addressable devices)
        return jax.jit(
            functools.partial(jnp.zeros, self._state_shape, jnp.float32),
            out_shardings=self._vol_sharding)()

    def _chunk_owned_ranges(self):
        """Contiguous [lo, hi) chunk-slot ranges owned by THIS process.

        The chunk axis is sharded blockwise over the mesh: device k owns
        slots [k*C/n, (k+1)*C/n).  Adjacent owned ranges are merged, so
        a single-process mesh collapses to [(0, C)].  Used to quantize
        and stage ONLY the frames this host's devices will upload
        (non-owned rows of a multi-host chunk are zero placeholders
        that ``_put`` never reads)."""
        local = self.chunk_size // self.n_dev
        pidx = jax.process_index()
        ranges = []
        for k, dev in enumerate(self.mesh.devices.flat):
            if dev.process_index != pidx:
                continue
            lo, hi = k * local, (k + 1) * local
            if ranges and ranges[-1][1] == lo:
                ranges[-1] = (ranges[-1][0], hi)
            else:
                ranges.append((lo, hi))
        return ranges

    def _put(self, data: np.ndarray, sharding) -> jax.Array:
        """Host array -> globally sharded device array (multi-host safe).

        Only this process's ADDRESSABLE shards of ``data`` are ever
        read — rows belonging to other hosts' devices may be
        zero-filled placeholders (the disjoint-decode input path,
        parallel/app.py) and never cross any wire.
        """
        if jax.process_count() > 1:
            return jax.make_array_from_callback(
                data.shape, sharding, lambda idx: data[idx])
        return jax.device_put(data, sharding)

    def _prepare(self, z_offset: int, roi_offset: Tuple[int, int, int]):
        rx1, ry1, rz1 = roi_offset
        z0 = int(rz1 + z_offset)
        vlo = self._v_band_lo(z0)
        offs = jnp.asarray([rx1, ry1, z0, vlo], jnp.int32)
        step = (self._step_for((z0, vlo)) if self.backend == "pallas"
                else self._step)
        return step, offs

    def stage_chunk(self, chunk, ang):
        """Start the async h2d of one (chunk, angles) pair.

        Mirrors ``Reconstructor.stage_chunk`` (pipeline.py): issuing
        the transfer one chunk AHEAD of the step that consumes it
        overlaps each host's h2d with the devices' execution of the
        previous step (the reference overlapped upload and compute via
        its pipelined loader stage + per-thread streams,
        src/loader.cpp:28-33).  Fast mode stages per-frame affine-u16
        — half the wire bytes; non-owned frame rows of a multi-host
        chunk are never read (``_put`` only pulls addressable shards),
        so quantization too runs only over THIS host's owned slot
        ranges — host staging CPU scales with 1/hosts, like the decode.
        """
        C = self.chunk_size
        chunk = np.asarray(chunk, dtype=np.float32)
        ang = np.asarray(ang, dtype=np.float32)
        if ang.shape[0] < C:
            ang = np.pad(ang, (0, C - ang.shape[0]))
        if self.accuracy == "fast" and self.backend == "pallas":
            if len(self._owned_ranges) == 1 and \
                    self._owned_ranges[0] == (0, C):
                chunk, qparams = quantize_chunk_u16(
                    chunk, C, concurrency=_STAGE_CONCURRENCY)
            else:
                n = chunk.shape[0]
                q = np.zeros((C,) + chunk.shape[1:], np.uint16)
                qparams = np.zeros((C, 2), np.float32)
                for lo, hi in self._owned_ranges:
                    if min(hi, n) > lo:
                        sq, sp = quantize_chunk_u16(
                            np.ascontiguousarray(chunk[lo:min(hi, n)]),
                            hi - lo, concurrency=_STAGE_CONCURRENCY)
                        q[lo:hi] = sq
                        qparams[lo:hi] = sp
                chunk = q
        else:
            qparams = identity_qparams(C)
            if chunk.shape[0] < C:
                chunk = np.pad(
                    chunk, ((0, C - chunk.shape[0]), (0, 0), (0, 0)))
        phi = np.deg2rad(ang).astype(np.float32)
        return (self._put(chunk, self._proj_sharding),
                self._put(np.sin(phi), self._ang_sharding),
                self._put(np.cos(phi), self._ang_sharding),
                self._put(qparams, self._qp_sharding))

    def step_staged(self, volume, staged, *, z_offset: int = 0,
                    roi_offset: Tuple[int, int, int] = (0, 0, 0)):
        """Accumulate one pre-staged chunk (see ``stage_chunk``)."""
        step, offs = self._prepare(z_offset, roi_offset)
        dev_chunk, sin, cos, qparams = staged
        return step(volume, dev_chunk, sin, cos, qparams, offs)

    def accumulate(
        self,
        volume: jax.Array,
        projections,
        angles_deg,
        *,
        z_offset: int = 0,
        roi_offset: Tuple[int, int, int] = (0, 0, 0),
    ) -> jax.Array:
        """Stream projections through the sharded step, staged ahead on
        worker threads (``pipeline.stage_stream``): each host's chunk
        quantization and uploads overlap the devices' execution of
        earlier steps."""
        from ..pipeline import stage_stream
        C = self.chunk_size
        n = len(angles_deg)
        step, offs = self._prepare(z_offset, roi_offset)
        pairs = ((projections[i:i + C], angles_deg[i:i + C])
                 for i in range(0, n, C))
        for staged, _ in stage_stream(self.stage_chunk, pairs):
            volume = step(volume, *staged, offs)
        return volume

    def write_shards(self, volume: jax.Array, path: str, z_base: int,
                     dim_z_valid: int) -> int:
        """Write this process's addressable shards of a block into the
        ddbvf at their global offsets (multi-host output path)."""
        from . import multihost
        if self.backend == "pallas":     # y-sharded kernel layout
            return multihost.write_local_shards_yxz(
                path, volume, z_base, dim_z_valid,
                self.vol.dim_y, self.vol.dim_x)
        return multihost.write_local_shards(
            path, volume, z_base, max_z=z_base + dim_z_valid)

    def finalize(self, volume: jax.Array) -> np.ndarray:
        """Backend state -> (block_dz, ny, nx) ndarray (single-process).

        On multi-host runs the global block is not addressable from one
        process — use ``write_shards`` instead.
        """
        if jax.process_count() > 1:
            raise RuntimeError(
                "finalize() materializes the global block and cannot run "
                "multi-host; use write_shards()")
        if self.backend == "pallas":
            shape = (self.block_dz, self.vol.dim_y, self.vol.dim_x)
            if volume.nbytes > (1 << 30):
                # big blocks: slab-wise d2h + host transpose, exactly as
                # Reconstructor.finalize — the device-side transpose
                # materializes extra HBM copies AND its d2h measured 5x
                # slower than slab reads on the tunnel transport
                # (dist_overlap_ab round 5: 9m57s vs ~2m for 4.3 GB)
                return self._bpp.from_kernel_layout_host(volume, shape)
            out = self._bpp.from_kernel_layout(volume, shape)
            return np.asarray(out)
        return np.asarray(volume)

    def reconstruct(self, projections, angles_deg, **kw) -> np.ndarray:
        out = self.accumulate(self.init_block(), projections, angles_deg, **kw)
        return self.finalize(out)[: self.vol.dim_z]

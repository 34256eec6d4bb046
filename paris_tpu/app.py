"""End-to-end reconstruction driver: blocks x projection stream -> ddbvf.

The orchestration layer the reference spread across main.cpp's task
queue, per-device worker threads and the sink (src/main.cpp:79-169) —
redesigned as a deterministic host loop:

  * z-blocks come from the deterministic HBM-budget planner
    (``plan_z_blocks``), padded to one uniform shape so every block
    reuses one compiled program (the reference recompiled nothing but
    paid a fresh memory probe per device, and its remainder block would
    have forced a recompile here);
  * per block: stream (or reuse cached) projections through the
    reconstructor, then write the block at its GLOBAL z offset (fixing
    reference bug 1) and record completion in the sink manifest —
    interrupted runs resume with ``resume=True``, recomputing only
    missing blocks;
  * projections are cached host-side when they fit in RAM (the
    reference re-read every HIS file once per subvolume per device,
    SURVEY.md §3.2 "re-scans dir per task").
"""

from __future__ import annotations

import dataclasses
import logging
import time
from typing import Optional, Sequence, Tuple

import numpy as np
import jax

from .exceptions import (
    ParisError, StageConstructionError, StageRuntimeError,
)
from .geometry import (
    DetectorGeometry, RegionOfInterest, VolumeGeometry,
    SubvolumeInfo, apply_roi, derive_volume_geometry, plan_z_blocks,
)
from .io.sink import VolumeSink
from .io.source import ProjectionSource
from .pipeline import Reconstructor
from .utils.logging import StageTimers, fmt_duration
from .utils.profiling import ThroughputMeter, trace

logger = logging.getLogger("paris_tpu.app")

__all__ = ["ReconstructionJob", "run_job"]


@dataclasses.dataclass
class ReconstructionJob:
    det: DetectorGeometry
    input_path: str
    output_path: str
    prefix: str = "vol"
    angle_path: Optional[str] = None
    quality: int = 1
    roi: Optional[RegionOfInterest] = None
    chunk_size: int = 16
    backend: str = "auto"
    # "fast" (default): bf16 interpolation tables — the CUDA texture
    # unit's precision class; measured on chip at 256^3 vs the NumPy
    # golden oracle: fast 2.0e-4, exact 1.0e-4 rel RMSE (gate 1e-3),
    # fast ~1.5x faster.  "exact": f32 tables + bf16x3 stage-1 matmuls.
    accuracy: str = "fast"
    block_dz: Optional[int] = None    # force z-block extent (else HBM planner)
    hbm_budget_bytes: Optional[int] = None
    cache_projections: Optional[bool] = None   # None = auto by RAM
    resume: bool = False
    max_cache_bytes: int = 64 << 30
    trace_dir: Optional[str] = None   # jax.profiler trace output
    # Stop after computing this many NEW blocks (None = all); completed
    # blocks are durable in the sink manifest, so a wrapper re-invokes
    # with resume=True until the volume is complete.  Operational
    # containment knob: bounds per-process resource growth on very long
    # jobs — e.g. host RSS on transports whose h2d transfers retain
    # their host buffers for the process lifetime (measured on tunneled
    # TPU: every device_put leaks its full payload; a 181 GB-wire job
    # OOMs a 125 GB host without this).
    max_blocks: Optional[int] = None


def _perf_block_dz(job: ReconstructionJob, vol_geo: VolumeGeometry,
                   full_geo: VolumeGeometry,
                   hbm_budget: Optional[int] = None,
                   proj_buffer: int = 0) -> Optional[int]:
    """Kernel-throughput-aware z-block extent (pallas on TPU only).

    Total backprojection work is split-invariant, so the block extent is
    a pure efficiency knob.  Measured on v5e at 1024-class (single
    z-grid-step kernel, static window plan, fast):

        whole volume (C=24)  72.2 Gupd/s
        dz=512 banded (C=24) 58.2   dz=256 39.4   dz=128 36.8

    — stage-1 Q-scratch fills amortize over the whole z column, so the
    LARGEST extent that (a) fits the per-device HBM budget and (b)
    keeps a chunk of >= 8 projections in VMEM wins.  Returns None for
    "no forced extent" (the planner then keeps one whole-volume block,
    or splits by the HBM budget).
    """
    import jax as _jax
    if job.backend not in ("pallas", "auto") or \
            _jax.default_backend() != "tpu" or vol_geo.dim_z < 512:
        return None
    from .geometry import detector_row_band
    from .pipeline import max_chunk_size
    rz1 = job.roi.z1 if job.roi else 0

    def band_for(dz):
        n_blocks = -(-vol_geo.dim_z // dz)
        band = max(
            (lambda lo_hi: lo_hi[1] - lo_hi[0])(
                detector_row_band(job.det, full_geo, i * dz + rz1, dz))
            for i in range(n_blocks))
        return band if band < job.det.n_col else None

    # whole volume in one block, if HBM allows it
    if hbm_budget is None or (hbm_budget - proj_buffer
                              >= _block_hbm_bytes(vol_geo, vol_geo.dim_z)):
        if max_chunk_size(job.det, None, accuracy=job.accuracy) >= 8:
            return None
    for dz in (1024, 512, 256, 128):
        if dz >= vol_geo.dim_z:
            continue
        if max_chunk_size(job.det, band_for(dz),
                          accuracy=job.accuracy) >= (8 if dz != 512 else 4):
            return dz
    return None


def _block_hbm_bytes(vol_geo: VolumeGeometry, dz: int) -> int:
    """Peak HBM bytes of one pallas z-block: the 128-padded
    kernel-layout accumulator plus the big-block finalize d2h slab
    (``from_kernel_layout_host`` eagerly materializes FINALIZE_SLAB
    device slices next to the live accumulator).  The previous
    ``4*x*y*(dz+8)`` estimate under-counted both terms and relied on
    the 0.45 HBM safety factor to stay safe (ADVICE r3)."""
    from .ops.backprojection_pallas import FINALIZE_SLAB

    def rup(v, m):
        return -(-v // m) * m

    acc = 4 * vol_geo.dim_y * rup(vol_geo.dim_x, 128) * rup(dz, 128)
    slab = 4 * FINALIZE_SLAB * vol_geo.dim_y * vol_geo.dim_x
    return acc + slab


def _free_hbm_bytes() -> Optional[int]:
    """Live free-HBM probe (bytes); None when stats are unavailable."""
    try:
        dev = jax.local_devices()[0]
        stats = dev.memory_stats() or {}
    except Exception:                     # backends without stats support
        return None
    limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
    if not limit:
        return None
    return int(limit) - int(stats.get("bytes_in_use", 0))


def _overlap_free_est(hbm_budget: Optional[int],
                      budget_is_auto: bool) -> Optional[int]:
    """Free-device-memory estimate for the finalize/write overlap gate.

    Prefer a live stats probe.  Without stats, ``hbm_budget/0.45`` only
    recovers free memory when the budget came from ``_auto_hbm_budget``
    (which returned 45% of free); a USER-supplied --hbm-budget-gb is an
    absolute cap — on BOTH paths (live stats included): sizing two
    accumulators against actual free HBM would let runtime residency
    exceed the user's stated limit ~2x, defeating the cap's purpose
    (co-tenant setups; ADVICE r4).  None = no information (overlap
    allowed)."""
    free = _free_hbm_bytes()
    if free is not None:
        est = int(free * 0.95)
        return est if budget_is_auto or hbm_budget is None \
            else min(est, hbm_budget)
    if hbm_budget is None:
        return None
    if budget_is_auto:
        return int(hbm_budget / 0.45 * 0.95)
    return hbm_budget


def _fits_two_blocks(vol_geo: VolumeGeometry, dz: int, proj_buffer: int,
                     free_est: Optional[int], n_shards: int = 1) -> bool:
    """Do TWO padded accumulators (+ staging) fit the free estimate?
    The single overlap-fit criterion — the planner's extent cap and the
    runtime overlap gate must agree (same expression, one place), and
    BOTH drivers use it: ``n_shards`` scales the block to the per-device
    share on a sharded mesh (free_est is per-device)."""
    if free_est is None:
        return True
    return (2 * _block_hbm_bytes(vol_geo, dz) // max(1, n_shards)
            + proj_buffer <= free_est)


def _overlap_block_dz(vol_geo: VolumeGeometry, free_est: Optional[int],
                      proj_buffer: int, dz_padded: int,
                      n_shards: int = 1, align: int = 8) -> Optional[int]:
    """Largest ``align``-aligned extent below ``dz_padded`` for which
    TWO padded accumulators (+ staging buffers) fit the device's free
    memory — enables the finalize/write overlap.  None when the
    current extent already fits (no change needed) or when nothing
    above 128 slices does (tiny-volume 128-padding dominates)."""
    def fits_two(dz: int) -> bool:
        return _fits_two_blocks(vol_geo, dz, proj_buffer, free_est,
                                n_shards)

    if fits_two(dz_padded):
        return None
    dz2 = dz_padded - align
    while dz2 > 128 and not fits_two(dz2):
        dz2 -= align
    return dz2 if dz2 > 128 else None


def _finish_writer(writer, pending_future, logger_) -> None:
    """Writer-thread epilogue shared by BOTH drivers' try/finally:
    drain an in-flight write (never torn mid-block) and ALWAYS join the
    writer thread.  On the normal path the pending future is already
    None (the loop tail waited); on the exception path the write's own
    failure is LOGGED rather than raised so it cannot mask the original
    error — raised only when no other exception is active."""
    import sys as _sys
    in_flight_exc = _sys.exc_info()[1] is not None
    try:
        if pending_future is not None:
            pending_future.result()
    except Exception:
        if not in_flight_exc:
            raise
        logger_.exception("in-flight block write also failed "
                          "during error shutdown")
    finally:
        writer.shutdown(wait=True)


def _auto_hbm_budget() -> Optional[int]:
    """Default per-device volume-block budget from live device memory.

    TPU-native analog of the reference's memory probe
    (src/cuda/subvolume_information.cpp:72-109: free-memory query +
    ``vol + 10*proj`` model + confirming test allocation): XLA exposes
    ``bytes_limit``/``bytes_in_use`` per device, so the budget is
    deterministic — no trial allocation loop.  Returns ~45% of free HBM
    because the block is materialized twice at finalize (kernel-layout
    accumulator + transposed output copy) plus XLA temps; projection
    residency is subtracted separately by ``plan_z_blocks``.
    When the runtime reports no memory stats (some TPU transports, e.g.
    tunneled devices, return an empty dict) the HBM size falls back to a
    device-kind table — a 2048-class volume must still be split rather
    than planned as one un-allocatable 32 GB block.  Returns None
    (single whole-volume block) only on platforms with neither stats
    nor a known HBM size (e.g. CPU).
    """
    import jax as _jax
    try:
        dev = _jax.local_devices()[0]
        stats = dev.memory_stats() or {}
    except Exception:                     # backends without stats support
        return None
    limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
    if limit:
        free = int(limit) - int(stats.get("bytes_in_use", 0))
    else:
        kind = (getattr(dev, "device_kind", "") or "").lower()
        hbm_gib = {"v5 lite": 16, "v5e": 16, "v4": 32, "v5p": 95,
                   "v6 lite": 32, "v6e": 32, "v3": 16, "v2": 8}
        free = next((gib << 30 for k, gib in hbm_gib.items() if k in kind),
                    0)
        if not free:
            return None
    budget = int(free * 0.45)
    return budget if budget > 0 else None


def _budget_max_dz(hbm_budget: int, proj_buffer_bytes: int,
                   vol_geo: VolumeGeometry, align: int = 8) -> int:
    """Largest z-block extent fitting the budget (aligned, >= align)."""
    usable = hbm_budget - proj_buffer_bytes
    slice_bytes = 4 * vol_geo.dim_x * vol_geo.dim_y
    return max(align, (usable // slice_bytes // align) * align)


def _roi_offset(job: ReconstructionJob) -> Tuple[int, int, int]:
    if job.roi is None:
        return (0, 0, 0)
    return (job.roi.x1, job.roi.y1, job.roi.z1)


def run_job(job: ReconstructionJob) -> str:
    """Run a full reconstruction; returns the output ddbvf path.

    Raises ``StageConstructionError`` if the pipeline cannot be built
    (bad geometry/paths/backend) and ``StageRuntimeError`` if it fails
    mid-stream — the reference's two exception tiers (exception.h:31-41).
    """
    try:
        return _run_job(job)
    except (ParisError, KeyboardInterrupt):
        raise
    except (OSError, ValueError) as e:
        raise StageRuntimeError(f"reconstruction failed: {e}") from e


def _run_job(job: ReconstructionJob) -> str:
    t_start = time.perf_counter()
    timers = StageTimers()

    try:
        full_geo = derive_volume_geometry(job.det)
    except ValueError as e:
        raise StageConstructionError(str(e)) from e
    logger.info("volume [vx]: %d x %d x %d, voxel %.4f mm",
                full_geo.dim_x, full_geo.dim_y, full_geo.dim_z,
                full_geo.l_vx_x)
    vol_geo = apply_roi(full_geo, job.roi) if job.roi else full_geo
    if job.roi:
        logger.info("ROI volume [vx]: %d x %d x %d",
                    vol_geo.dim_x, vol_geo.dim_y, vol_geo.dim_z)

    proj_bytes = 4 * job.det.n_row * job.det.n_col
    proj_buffer = 4 * proj_bytes * job.chunk_size
    hbm_budget = job.hbm_budget_bytes
    if hbm_budget is None:
        hbm_budget = _auto_hbm_budget()
        if hbm_budget is not None:
            logger.info("auto HBM budget: %.1f GB per device",
                        hbm_budget / 2**30)
    block_dz = job.block_dz
    if block_dz is None:
        block_dz = _perf_block_dz(job, vol_geo, full_geo,
                                  hbm_budget, proj_buffer)
        if block_dz is not None and hbm_budget is not None:
            # the perf-derived extent must still fit device memory
            block_dz = min(block_dz,
                           _budget_max_dz(hbm_budget, proj_buffer, vol_geo))
    try:
        info = plan_z_blocks(
            vol_geo,
            hbm_budget_bytes=hbm_budget,
            proj_buffer_bytes=proj_buffer,
            block_dz=block_dz,
        )
    except ValueError as e:
        # planner failures (budget too small for one slice, bad forced
        # extent) are construction-phase, like the reference's
        # stage_construction_error (src/exception.h:31-36)
        raise StageConstructionError(str(e)) from e
    logger.info("z-split: %d block(s) of %d slices (padded)",
                info.num, info.dim_z_padded)

    # prefer an overlap-capable split: when the volume is multi-block
    # ANYWAY, capping the extent so TWO padded accumulators fit lets
    # the writer thread drain block k while k+1 reconstructs (write
    # dominates wall on slow sinks — 2048-class: 25 min write vs 5 min
    # reconstruct); a user-forced --block-dz is respected
    # PARIS_WRITE_OVERLAP=0 disables the finalize/write overlap (and the
    # extent adjustment that serves it).  Default ON: on hosts with
    # dedicated DMA + a disk sink, hiding compute behind the write wall
    # is free.  Measured caveat (BASELINE.md): on transports where d2h
    # and h2d share one link (e.g. a tunneled TPU at ~100 MB/s), the
    # overlapped streams contend and the serialized order can win.
    import os as _os
    overlap_enabled = _os.environ.get("PARIS_WRITE_OVERLAP", "1") != "0"
    free_est = _overlap_free_est(hbm_budget,
                                 budget_is_auto=job.hbm_budget_bytes is None)
    if overlap_enabled and free_est is not None and info.num > 1 \
            and job.block_dz is None:
        dz2 = _overlap_block_dz(vol_geo, free_est, proj_buffer,
                                info.dim_z_padded)
        if dz2 is not None:
            info = plan_z_blocks(
                vol_geo, hbm_budget_bytes=hbm_budget,
                proj_buffer_bytes=proj_buffer, block_dz=dz2)
            logger.info(
                "z-split adjusted for write overlap: %d block(s) "
                "of %d slices (padded)", info.num, info.dim_z_padded)

    try:
        sink = VolumeSink(job.output_path, job.prefix, vol_geo.dim_x,
                          vol_geo.dim_y, vol_geo.dim_z, resume=job.resume)
    except (OSError, ValueError) as e:
        raise StageConstructionError(f"cannot open sink: {e}") from e

    # detector-row banding: blocks only sample a band of detector rows;
    # use the widest band over all blocks so one compiled program serves
    # every block (pallas backend only; ignored by xla)
    v_band = None
    if info.num > 1:
        from .geometry import detector_row_band
        rz1 = job.roi.z1 if job.roi else 0
        widths = [
            (lambda lo_hi: lo_hi[1] - lo_hi[0])(
                detector_row_band(job.det, full_geo, b.z0 + rz1,
                                  b.dim_z_padded))
            for b in info.blocks
        ]
        v_band = max(widths)
        if v_band >= job.det.n_col:
            v_band = None
        else:
            logger.info("detector row band: %d of %d rows per block",
                        v_band, job.det.n_col)

    from .pipeline import max_chunk_size, resolve_pallas_x_tile
    chunk_size = job.chunk_size
    import jax as _jax
    if job.backend in ("pallas", "auto") and _jax.default_backend() == "tpu":
        # clamp with the tile the Reconstructor will actually resolve:
        # a narrowed (wide-fan) tile has up to 4x less Q-scratch, so
        # the default-64 estimate would over-clamp exactly there
        from .ops.backprojection_xla import make_bp_grid as _mk
        xt = resolve_pallas_x_tile(_mk(job.det, full_geo))
        cmax = max_chunk_size(job.det, v_band, accuracy=job.accuracy,
                              x_tile=xt)
        if chunk_size > cmax:
            logger.info("clamping chunk size %d -> %d (VMEM budget)",
                        chunk_size, cmax)
            chunk_size = cmax
    try:
        rec = Reconstructor(
            job.det, full_geo, chunk_size=chunk_size, backend=job.backend,
            block_shape=(info.dim_z_padded, vol_geo.dim_y, vol_geo.dim_x),
            v_band_width=v_band, accuracy=job.accuracy,
        )
    except ValueError as e:
        raise StageConstructionError(str(e)) from e
    logger.info("backend: %s, chunk size %d", rec.backend, chunk_size)

    def new_source() -> ProjectionSource:
        return ProjectionSource(
            job.input_path, angle_file=job.angle_path,
            delta_phi=job.det.delta_phi, quality=job.quality,
        )

    # decide on host-side projection caching
    cache = job.cache_projections
    cached: Optional[Tuple[np.ndarray, np.ndarray]] = None

    rx1, ry1, rz1 = _roi_offset(job)
    n_done = 0
    # Overlapped finalize: block k's device->host drain + ddbvf write
    # run on a writer thread WHILE block k+1 reconstructs — the write
    # phase dominates wall time on slow links/disks (2048-class: 25 min
    # write vs 5 min reconstruct) and the reference serialized it per
    # subvolume behind a mutex (src/sink.cpp:72-94).  Requires TWO
    # padded accumulators (+ the finalize slab) resident at once, so
    # overlap only engages when they fit the device's free memory
    # (hbm_budget is ~45% of free; at 2048-class two blocks do NOT fit
    # and the writer degenerates to in-line waits).
    import concurrent.futures as _cf
    overlap = overlap_enabled and _fits_two_blocks(
        vol_geo, info.dim_z_padded, proj_buffer, free_est)
    if overlap and info.num > 1:
        logger.info("write overlap: block k+1 reconstructs while "
                    "block k drains to disk")
    writer = _cf.ThreadPoolExecutor(1, thread_name_prefix="paris-write")
    pending: Optional[_cf.Future] = None

    def _finalize_write(vol_state, blk):
        with timers.time("finalize+write"):
            out = rec.finalize(vol_state)[: blk.dim_z]
            sink.write_block(blk.index, out, blk.z0)

    # The try/finally makes the failure path DELIBERATE (r4 verdict 6):
    # on an exception escaping the loop the writer thread is drained
    # synchronously — no torn block, no orphaned thread — and a pending
    # write's own failure surfaces without masking the original error.
    try:
        for block in info.blocks:
            if sink.is_done(block.index):
                logger.info("block %d already complete, skipping (resume)",
                            block.index)
                continue
            logger.info("reconstructing block %d/%d (z %d..%d)",
                        block.index + 1, info.num, block.z0,
                        block.z0 + block.dim_z - 1)
            volume = rec.init_block()
            n_proj = 0
            # rate counts VALID voxels only (padded tail slices are compute
            # overhead, not useful updates)
            meter = ThroughputMeter(
                block.dim_z * vol_geo.dim_y * vol_geo.dim_x)
            with timers.time("reconstruct"), trace(job.trace_dir):
                if cached is not None:
                    data, angs = cached
                    volume = rec.accumulate(
                        volume, data, angs,
                        z_offset=block.z0, roi_offset=(rx1, ry1, rz1))
                    n_proj = len(angs)
                    jax.block_until_ready(volume)
                    meter.add(n_proj)
                else:
                    # explicit True always collects (dataclass contract);
                    # auto (None) collects only when a later block will
                    # reuse the cache
                    state = {"collect": cache is True
                             or (cache is None and info.num > 1)}
                    datas, angles = [], []

                    def pairs():
                        # consumed on THIS thread by stage_stream; staging
                        # (quantize + h2d) runs on its worker threads
                        for plist in new_source().iter_chunks(rec.chunk_size):
                            data = np.stack([p.data for p in plist])
                            angs = np.asarray(
                                [p.phi for p in plist], np.float32)
                            if state["collect"]:
                                datas.append(data)
                                angles.append(angs)
                                if sum(d.nbytes for d in datas) > \
                                        job.max_cache_bytes:
                                    state["collect"] = False
                                    datas.clear()
                                    angles.clear()
                            yield data, angs

                    from .pipeline import stage_stream
                    first_chunk = n_done == 0
                    for staged, k in stage_stream(rec.stage_chunk, pairs()):
                        volume = rec.step_staged(
                            volume, staged, z_offset=block.z0,
                            roi_offset=(rx1, ry1, rz1))
                        if first_chunk:
                            # time-to-first-chunk marker: a cold process
                            # pays the step compile (or its cached load)
                            # inside this first step
                            jax.block_until_ready(volume)
                            logger.info("first chunk accumulated "
                                        "(step compile/load amortized)")
                            first_chunk = False
                        n_proj += k
                        meter.add(k)
                    if state["collect"] and datas:
                        cached = (np.concatenate(datas), np.concatenate(angles))
                # close the stage only when the device has actually finished
                # (async dispatch returns early); keeps the reconstruct /
                # finalize+write split honest
                jax.block_until_ready(volume)
            if n_proj == 0:
                logger.warning("no projections found in %s", job.input_path)
            if pending is not None:
                # bound in-flight accumulators at 2 (this block's + the one
                # draining); also surfaces writer-thread errors
                pending.result()
                pending = None
            pending = writer.submit(_finalize_write, volume, block)
            # drop the loop's reference NOW: without overlap the wait below
            # frees the accumulator before the next init_block (a 2x-block
            # HBM peak OOMs at 2048-class, where one block is 8 GiB)
            volume = None
            if not overlap:
                pending.result()
                pending = None
            n_done += 1
            pps, gups = meter.rates()
            logger.info("block %d done (%d projections, %.1f proj/s, %.1f Gupd/s)",
                        block.index, n_proj, pps, gups)
            if job.max_blocks is not None and n_done >= job.max_blocks:
                logger.info("stopping after %d block(s) (max_blocks); "
                            "resume=True completes the remaining blocks",
                            n_done)
                break

        if pending is not None:
            pending.result()
            pending = None
    finally:
        _finish_writer(writer, pending, logger)
    total = time.perf_counter() - t_start
    timers.report(logger)
    logger.info("reconstruction finished in %s -> %s",
                fmt_duration(total), sink.path)
    return sink.path

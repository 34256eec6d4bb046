"""Single-chip FDK reconstruction pipeline.

Replaces the reference's per-projection streaming loop
(src/main.cpp:98-105: load -> h2d -> weight -> filter -> backproject, one
projection at a time) with a TPU-idiomatic design:

  * projections are processed in fixed-size CHUNKS (static shapes, one
    XLA program) — weighting+filtering batch over the whole chunk (FFTs
    want batches), and the backprojection accumulates the full chunk per
    volume pass so HBM volume traffic is amortized by the chunk size;
  * the volume accumulator is DONATED between steps (in-place update,
    no copy) and, on the Pallas backend, kept in kernel layout
    (y, x, z) for the whole run — transposed once at the end;
  * host->device feeding is overlapped with device compute via JAX async
    dispatch: while the device runs chunk i, the host stages chunk i+1.

``Reconstructor`` is the reusable compiled program; ``reconstruct`` is
the convenience one-shot driver.
"""

from __future__ import annotations

import collections
import concurrent.futures
import functools
import itertools
import os
from typing import Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .geometry import DetectorGeometry, VolumeGeometry
from .ops.weighting import weight_map
from .ops.filtering import ramp_filter_spectrum, filter_projections
from .ops.backprojection_xla import backproject_chunk_xla, make_bp_grid

__all__ = ["Reconstructor", "reconstruct", "preprocess_chunk"]


def preprocess_chunk(chunk, weights, spectrum, n_row):
    """weight + ramp-filter a (C, n_col, n_row) chunk (fused by XLA)."""
    return filter_projections(chunk * weights, spectrum, n_row)


def dequantize_chunk(chunk, qparams):
    """Per-frame affine dequant: (C,...) x (C, 2) [scale, lo] -> f32."""
    return (chunk.astype(jnp.float32) * qparams[:, 0, None, None]
            + qparams[:, 1, None, None])


def quantize_chunk_u16(chunk: np.ndarray, pad_to: int, *,
                       concurrency: int = 1):
    """Per-FRAME affine-u16 wire quantization of an unpadded (n, V, H)
    chunk; returns (u16 chunk padded to ``pad_to`` frames, (pad_to, 2)
    f32 qparams rows [scale, lo]).

    ``concurrency`` is how many of these calls run at once on the host
    (the native quantizer's thread budget is cpu_count/concurrency):
    stage_stream-driven callers pass their worker count so two in-flight
    quantizations don't oversubscribe; direct/serial callers keep the
    default 1 = full host parallelism (ADVICE r4).

    Per-frame (not per-chunk) ranges keep the quantization step tied to
    each frame's own dynamic range, and give padded tail frames
    ``scale=0, lo=0`` so they dequantize to EXACT zeros — a per-chunk
    range computed after zero-padding dragged ``lo`` toward 0 for
    all-positive detector data (~3x the step) and made padded frames
    dequantize to small nonzero planes that were then filtered and
    backprojected at angle 0 (ADVICE r3).
    """
    n = chunk.shape[0]
    q = np.empty((pad_to,) + chunk.shape[1:], np.uint16)
    qparams = np.zeros((pad_to, 2), np.float32)
    from .io import native
    if native.quantize_u16_available() and chunk.flags.c_contiguous:
        # fused native two-pass loop (threaded across frames) — NumPy
        # needs ~4 full-array passes and this feeds the chip on the
        # streaming critical path
        native.quantize_u16(chunk, q, qparams, n_threads=max(
            1, (os.cpu_count() or 1) // max(1, concurrency)))
    else:
        lo = chunk.min(axis=(1, 2))
        scale = (chunk.max(axis=(1, 2)) - lo) / 65535.0
        scale[scale <= 0.0] = 1.0
        np.rint((chunk - lo[:, None, None]) * (1.0 / scale)[:, None, None],
                casting="unsafe", out=q[:n])
        qparams[:n, 0] = scale
        qparams[:n, 1] = lo
    q[n:] = 0
    return q, qparams


def identity_qparams(pad_to: int) -> np.ndarray:
    """(pad_to, 2) qparams that make dequantize_chunk the identity."""
    qp = np.zeros((pad_to, 2), np.float32)
    qp[:, 0] = 1.0
    return qp


# concurrent staging workers (stage_stream default); the native
# quantizer divides its thread budget by this so two in-flight chunk
# quantizations don't oversubscribe the host
_STAGE_WORKERS = 2


def stage_stream(stage_fn, pairs, *, depth: int = 3,
                 workers: int = _STAGE_WORKERS):
    """Run ``stage_fn(data, angles)`` on a thread pool, keeping up to
    ``depth`` staged chunks in flight; yields ``(staged, n)`` in order.

    The round-3 streaming path staged chunks on the CONSUMER thread:
    double buffering moved the transfer ahead of the step dispatch,
    but host quantization and the h2d transfer of chunk i+1 still ran
    serially between the dispatches of steps i and i+1 — at the
    measured ~100 MB/s sustained h2d of the TPU tunnel that capped the
    3600-projection config-3 run at 20.6 proj/s (kernel alone: 69).
    With staging on worker threads, quantization of one chunk overlaps
    the transfer of another (device_put releases the GIL) and the
    consumer thread only dispatches steps.  Two workers saturate the
    wire; ``depth`` bounds device-side buffering to ~3 chunks.
    """
    with concurrent.futures.ThreadPoolExecutor(
            workers, thread_name_prefix="paris-stage") as ex:
        pairs = iter(pairs)
        futs: collections.deque = collections.deque()
        try:
            for data, ang in itertools.islice(pairs, depth):
                futs.append((ex.submit(stage_fn, data, ang), len(ang)))
            while futs:
                fut, n = futs.popleft()
                staged = fut.result()
                nxt = next(pairs, None)
                if nxt is not None:
                    futs.append(
                        (ex.submit(stage_fn, nxt[0], nxt[1]), len(nxt[1])))
                yield staged, n
        finally:
            for fut, _ in futs:
                fut.cancel()


def _cache_key_det(det: DetectorGeometry) -> DetectorGeometry:
    """Detector as keyed in the compiled-step caches: delta_phi zeroed.

    The compiled program is delta-phi-INVARIANT — angles enter as
    runtime sin/cos arrays, and every trace-time constant (weights,
    filter spectrum, BpGrid, window plans) depends only on pixel
    pitches, offsets and distances — so two scans of the same geometry
    at different angular steps (e.g. a 360- and a 3600-projection scan)
    must share one cached executable."""
    import dataclasses as _dc
    return _dc.replace(det, delta_phi=0.0)


def _env_knobs() -> tuple:
    """Snapshot of every env knob the kernel wrapper reads at TRACE
    time (ops/backprojection_pallas.py reads these inside
    ``backproject_chunk_pallas_yxz``) plus the compile-cache location.
    Part of the compiled-step cache key: a process that changes one of
    these between Reconstructor builds must NOT get the stale step
    (ADVICE r3 medium)."""
    return tuple(os.environ.get(k, "") for k in (
        "PARIS_BP_XTILE", "PARIS_BP_ZTILE", "PARIS_BP_FORI",
        "PARIS_BP_WINDOWS", "PARIS_BP_STATICWIN",
        "PARIS_BP_DEBUG_VARIANT", "PARIS_VMEM_BUDGET"))


class _CachedStep:
    """A jitted step + per-static-plan PERSISTENT executable cache.

    Calls route to AOT-compiled executables kept in an in-memory dict
    keyed by the static args (the pallas step's trace-time block plan
    ``(z0s, vls)``); on a miss the on-disk cache (``compile_cache``) is
    consulted before paying ``lower().compile()``, and a fresh compile
    is serialized back to disk — a second PROCESS running the same
    config starts in seconds instead of minutes (the reference binary's
    instant start, src/main.cpp:112-178).  Shared across Reconstructor
    instances via ``_STEP_CACHE`` exactly like the bare jitted step.
    """

    def __init__(self, jit_fn, key_parts: tuple, execution_devices=None):
        self._jit = jit_fn
        self._key = key_parts
        self._devices = execution_devices    # None = default device
        self._execs: dict = {}

    def __call__(self, volume, chunk, sin, cos, qparams, offs, *static):
        exe = self._execs.get(static)
        if exe is None:
            from . import compile_cache
            parts = (self._key, static)
            exe = compile_cache.load(parts, self._devices)
            if exe is None:
                exe = self._jit.lower(volume, chunk, sin, cos, qparams,
                                      offs, *static).compile()
                compile_cache.store(parts, exe)
            self._execs[static] = exe
        return exe(volume, chunk, sin, cos, qparams, offs)


def _auto_backend() -> str:
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def resolve_pallas_x_tile(grid, requested: Optional[int] = None):
    """Largest supported x-tile for this geometry, or None (unsupported).

    The Pallas kernel's banded h-interp requires one x-tile's detector
    span to fit the 256-px band, and the bound scales with x_tile
    (ops/backprojection_pallas.py: ``(x_tile-1)*span + 4 + sub``) — so a
    wide-fan geometry that fails at the default 64 often fits at 32 or
    16 (~4x wider spans).  Falling straight back to the XLA op instead
    was the r4-verdict "silent 3000x cliff": the same-chip A/B measured
    0.02 Gupd/s (XLA op) vs 60.5 (Pallas) at 512-class.  A narrower
    tile costs some MXU efficiency but stays orders of magnitude ahead.
    """
    from .ops.backprojection_pallas import pallas_supported
    if requested is not None and pallas_supported(grid, requested):
        return requested
    # a requested tile acts as an UPPER bound: fall through to narrower
    # rungs rather than re-opening the silent-fallback hole (a stale
    # PARIS_BP_XTILE=64 must not defeat the ladder)
    cap = requested if requested is not None else 64
    for xt in (64, 32, 16):
        if xt <= cap and pallas_supported(grid, xt):
            return xt
    return None


def _vmem_budget() -> int:
    """Per-kernel VMEM budget for resident projections + scratch.

    v5e/v5p cores have 128 MiB of VMEM (probed on hardware); 96 MiB
    leaves room for the double-buffered volume blocks and Mosaic's own
    buffers.  Override with PARIS_VMEM_BUDGET (bytes).
    """
    return int(os.environ.get("PARIS_VMEM_BUDGET", 96 << 20))


def max_chunk_size(det: DetectorGeometry, v_band_width=None,
                   budget_bytes: Optional[int] = None,
                   accuracy: str = "exact",
                   x_tile: Optional[int] = None) -> int:
    """Largest pallas chunk fitting the VMEM budget for this detector."""
    if budget_bytes is None:
        budget_bytes = _vmem_budget()
    def rup(x, m):
        return -(-x // m) * m
    vp = rup(det.n_col, 128) if v_band_width is None else \
        min(rup(det.n_col, 128), rup(v_band_width, 128))
    hp = rup(det.n_row, _proj_sublane(accuracy))
    pb = _proj_bytes(accuracy)
    return max(1, budget_bytes
               // (vp * (pb * hp + 4 * _scratch_rows(accuracy, x_tile))))


def _proj_bytes(accuracy: str) -> int:
    """Bytes per resident projection sample (fast mode holds bf16)."""
    return 2 if accuracy == "fast" else 4


def _proj_sublane(accuracy: str) -> int:
    """Sublane padding quantum of the resident projection band.

    Both modes hold bf16 data (fast: one plane; exact: hi+lo planes for
    the bf16x3 matmul), so both pad to the bf16 (16, 128) tile.
    """
    return 16


def _scratch_rows(accuracy: str, x_tile: Optional[int] = None) -> int:
    """Per-chunk VMEM scratch rows (Q[/dQ]) in units of VP-wide f32 rows.

    The kernel's window-major scratch stores 64-lane-stride windows
    (2*VP/128 - 1 of them), ~2x the VP width — hence the factor 2.
    Scratch scales with the x-tile (one Q row per tile voxel).
    """
    from .ops import backprojection_pallas as bpp
    xt = bpp._XTILE if x_tile is None else x_tile
    return xt * 2 * (1 if accuracy == "fast" else 2)


# Compiled steps keyed by everything that shapes the program, shared
# across Reconstructor instances: a new Reconstructor for the same
# (geometry, config) reuses the jitted step, so repeated jobs in one
# process (warmup + timed run, multi-job services, the CLI called as a
# library) compile ONCE.  Remote-compile latency through a TPU tunnel
# was measured at 37-424 s for the 1024-class step — without this cache
# every run_job paid it again.  LRU-bounded (PARIS_STEP_CACHE_MAX
# entries, default 64): a long-lived service rotating geometries must
# not accumulate compiled executables (~75 MB each at 2048-class)
# without limit; live Reconstructors keep their own reference, so
# eviction only drops the shared handle.
_STEP_CACHE: "collections.OrderedDict" = collections.OrderedDict()


def _step_cache_put(key, step):
    _STEP_CACHE[key] = step
    _STEP_CACHE.move_to_end(key)
    raw = os.environ.get("PARIS_STEP_CACHE_MAX", "64")
    try:
        limit = int(raw)
    except ValueError:     # same hardening class as _evict (ADVICE r4)
        import logging
        logging.getLogger("paris_tpu.pipeline").warning(
            "ignoring malformed PARIS_STEP_CACHE_MAX=%r (using 64)", raw)
        limit = 64
    while len(_STEP_CACHE) > max(1, limit):
        _STEP_CACHE.popitem(last=False)


def _step_cache_get(key):
    step = _STEP_CACHE.get(key)
    if step is not None:
        _STEP_CACHE.move_to_end(key)
    return step


class Reconstructor:
    """Compiled single-device FDK step for one (det, vol) geometry.

    ``chunk_size`` is the number of projections accumulated per volume
    pass.  Larger chunks amortize volume HBM traffic; the projections of
    a chunk must fit on-device alongside the volume block.
    """

    def __init__(
        self,
        det: DetectorGeometry,
        vol: VolumeGeometry,
        *,
        chunk_size: int = 16,
        block_shape: Optional[Tuple[int, int, int]] = None,  # (dz, ny, nx)
        backend: str = "auto",
        interpret: bool = False,
        v_band_width: Optional[int] = None,   # detector-row band (pallas)
        accuracy: str = "exact",              # "fast": bf16 interp tables
        window_mode: Optional[str] = None,    # pallas stage-2 strategy
        x_tile: Optional[int] = None,         # pallas x-tile (None = ladder)
        device=None,
    ):
        if accuracy not in ("exact", "fast"):
            raise ValueError(f"accuracy must be 'exact' or 'fast', "
                             f"got {accuracy!r}")
        self.det = det
        self.vol = vol
        self.accuracy = accuracy
        self.chunk_size = int(chunk_size)
        self.block_shape = tuple(block_shape or vol.shape_zyx)
        self.device = device
        self.grid = make_bp_grid(det, vol)
        self._weights = weight_map(det)
        self._spectrum = ramp_filter_spectrum(det.n_row, det.l_px_row)

        self.x_tile: Optional[int] = None
        was_auto = backend == "auto"
        if was_auto:
            backend = _auto_backend()
        if backend == "pallas":
            if x_tile is None and os.environ.get("PARIS_BP_XTILE"):
                x_tile = int(os.environ["PARIS_BP_XTILE"])  # expt knob
            self.x_tile = resolve_pallas_x_tile(self.grid, x_tile)
            if self.x_tile is None:
                if not was_auto:
                    raise ValueError(
                        "geometry's h-band exceeds the Pallas envelope "
                        "at every supported x-tile (64/32/16); use "
                        "backend='xla' (or 'auto') for this geometry")
                import logging
                logging.getLogger("paris_tpu.pipeline").warning(
                    "geometry's h-band exceeds the Pallas envelope at "
                    "every x-tile (64/32/16); falling back to the "
                    "portable XLA backprojection op — measured ~3000x "
                    "slower on TPU (0.02 vs 60.5 Gupd/s at 512-class)")
                backend = "xla"
            elif self.x_tile != 64:
                import logging
                logging.getLogger("paris_tpu.pipeline").info(
                    "wide-fan geometry: pallas x-tile narrowed to %d",
                    self.x_tile)
        self.backend = backend

        if backend == "pallas":
            from .ops import backprojection_pallas as bpp
            self._bpp = bpp
            dz, ny, nx = self.block_shape
            self._state_shape = (
                ny, bpp._round_up(nx, 128), bpp._round_up(dz, 128))
            vp_full = bpp._round_up(det.n_col, 128)
            if v_band_width is None:
                self._vp = vp_full
            else:
                self._vp = min(vp_full, bpp._round_up(v_band_width, 128))
            # VMEM budget: banded projections + Q[/dQ] scratch must fit
            # alongside the volume block and pipeline buffers (~16MB/core)
            hp = bpp._round_up(det.n_row, _proj_sublane(accuracy))
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
            # exact mode runs the bf16x3 matmul path: f32 projections
            # split into (hi, lo) bf16 planes, 3 native-bf16 MXU passes
            # (~1e-5 accuracy, matches the old 6-pass HIGHEST to ~5e-7
            # while ~15% faster end-to-end; measured v5e 1024-class)
            # z0s/vls: optional STATIC copies of offs[2]/offs[3] (python
            # ints).  When given, the kernel derives a trace-time window
            # plan for stage 2 (no dynamic scratch addressing — ~7%
            # faster at the 1024 flagship); jit retraces per block, which
            # is a handful of compilations for any real run.
            # the constructor-chosen x-tile shapes the program, so it is
            # part of BOTH cache keys (in-process and on-disk); the
            # default 64 keys as None for fingerprint compatibility
            xt_key = None if self.x_tile == 64 else self.x_tile
            cache_key = ("pallas", _cache_key_det(det), vol,
                         self.chunk_size,
                         self.block_shape, self._vp, accuracy, window_mode,
                         interpret, _env_knobs(),
                         None if device is None else repr(device)) + (
                () if xt_key is None else ("xtile", xt_key))
            # the in-process key ALSO carries the cache-dir setting (a
            # toggled PARIS_COMPILE_CACHE must not reuse a step wrapped
            # for the other mode); the DISK fingerprint uses cache_key
            # alone so entries survive relocation of the cache dir
            from . import compile_cache
            step_key = cache_key + (compile_cache.cache_dir(),)
            cached = _step_cache_get(step_key)
            if cached is not None:
                self._step = cached
            else:
                weights, spectrum, grid_, vp, vpf = (
                    self._weights, self._spectrum, self.grid, self._vp,
                    vp_full)
                xt = self.x_tile

                @functools.partial(jax.jit, donate_argnums=(0,),
                                   static_argnums=(6, 7))
                def _step(volume_yxz, chunk, sin_phi, cos_phi, qparams,
                          offs, z0s=None, vls=None):
                    # fast mode stages per-frame affine-u16 over the
                    # wire; the dequant fuses into the weight multiply
                    dq = dequantize_chunk(chunk, qparams)
                    filtered = preprocess_chunk(
                        dq, weights, spectrum, det.n_row)
                    if accuracy == "fast":
                        proj_t = bpp.pad_projections_t(filtered,
                                                       jnp.bfloat16)
                    else:
                        proj_t = bpp.pad_projections_t(filtered,
                                                       jnp.float32, sub=16)
                    if vp < vpf:
                        proj_t = jax.lax.dynamic_slice(
                            proj_t, (0, 0, offs[3]),
                            (proj_t.shape[0], proj_t.shape[1], vp))
                    if accuracy == "exact":
                        proj_t = bpp.split_bf16_planes(proj_t)
                    static_plan = None if z0s is None or vls is None \
                        else (z0s, vls)
                    return bpp.backproject_chunk_pallas_yxz(
                        volume_yxz, proj_t, sin_phi, cos_phi, grid_, offs,
                        interpret=interpret,
                        precision=jax.lax.Precision.DEFAULT,
                        window_mode=window_mode, static_plan=static_plan,
                        x_tile=xt)

                # the loaded executable is bound to the default device;
                # non-default placements keep the plain jit step
                if compile_cache.cache_dir() and device is None:
                    _step = _CachedStep(_step, cache_key)
                _step_cache_put(step_key, _step)
                self._step = _step
        elif backend == "xla":
            cache_key = ("xla", _cache_key_det(det), vol, self.chunk_size,
                         self.block_shape, _env_knobs(),
                         None if device is None else repr(device))
            from . import compile_cache
            step_key = cache_key + (compile_cache.cache_dir(),)
            cached = _step_cache_get(step_key)
            if cached is not None:
                self._step = cached
            else:
                weights, spectrum, grid_ = (self._weights, self._spectrum,
                                            self.grid)

                @functools.partial(jax.jit, donate_argnums=(0,))
                def _step(volume, chunk, sin_phi, cos_phi, qparams, offs):
                    filtered = preprocess_chunk(
                        dequantize_chunk(chunk, qparams),
                        weights, spectrum, det.n_row)
                    return backproject_chunk_xla(
                        volume, filtered, sin_phi, cos_phi, grid_,
                        z_offset=offs[2], roi_offset=(offs[0], offs[1], 0),
                    )

                # the loaded executable is bound to the default device;
                # non-default placements keep the plain jit step
                if compile_cache.cache_dir() and device is None:
                    _step = _CachedStep(_step, cache_key)
                _step_cache_put(step_key, _step)
                self._step = _step
            self._state_shape = self.block_shape
            self._vp = 0
        else:
            raise ValueError(f"unknown backend {backend!r}")

    # -- chunk iteration ----------------------------------------------------

    def _chunks(self, projections, angles_deg) -> Iterator[Tuple[np.ndarray,
                                                                 np.ndarray]]:
        """Yield fixed-size (chunk, angles) pairs, zero-padding the tail.

        Zero-padded projections contribute nothing (filter of zeros is
        zero), so padding keeps shapes static without affecting results.
        """
        C = self.chunk_size
        n = len(angles_deg)
        for i in range(0, n, C):
            chunk = np.asarray(projections[i:i + C], dtype=np.float32)
            ang = np.asarray(angles_deg[i:i + C], dtype=np.float32)
            if chunk.shape[0] < C:
                pad = C - chunk.shape[0]
                chunk = np.pad(chunk, ((0, pad), (0, 0), (0, 0)))
                ang = np.pad(ang, (0, pad))
            yield chunk, ang

    def _v_band_lo(self, z0_global: int) -> int:
        """Detector-row band start for the block at global z0 (pallas)."""
        if self.backend != "pallas" or self._vp >= \
                self._bpp._round_up(self.det.n_col, 128):
            return 0
        from .geometry import detector_row_band
        lo, hi = detector_row_band(
            self.det, self.vol, z0_global, self.block_shape[0])
        if hi - lo > self._vp:
            raise ValueError(
                f"v_band_width {self._vp} too narrow for block at z={z0_global}"
                f" (needs {hi - lo} rows)")
        vp_full = self._bpp._round_up(self.det.n_col, 128)
        return max(0, min(lo, vp_full - self._vp))

    # -- public API ---------------------------------------------------------

    def init_block(self) -> jnp.ndarray:
        z = jnp.zeros(self._state_shape, jnp.float32)
        return jax.device_put(z, self.device) if self.device else z

    def stage_chunk(self, chunk, ang):
        """Start the async h2d of one (chunk, angles) pair.

        Returns the argument pack ``step_staged`` consumes.  Issuing the
        device transfer one chunk AHEAD of the step that consumes it
        overlaps h2d with the previous step's device execution, and in
        "fast" accuracy the chunk crosses the wire as per-FRAME
        affine-quantized u16 — half the host->device bytes with
        frame_range/65535 absolute error (~1.5e-5 of the data range,
        far below the 1e-3 gate; bf16 staging was tried first and
        FAILED the 1024-class gate at 5.5e-3 — the ramp filter
        amplifies pre-filter quantization noise, so 16 uniform bits
        beat 8 mantissa bits).  "exact" stages f32 (lossless).
        """
        C = self.chunk_size
        chunk = np.asarray(chunk, dtype=np.float32)
        ang = np.asarray(ang, dtype=np.float32)
        if ang.shape[0] < C:
            ang = np.pad(ang, (0, C - ang.shape[0]))
        put = (functools.partial(jax.device_put, device=self.device)
               if self.device else jax.device_put)
        if self.accuracy == "fast" and self.backend == "pallas":
            # staged under stage_stream: _STAGE_WORKERS of these run
            # concurrently, so each takes its share of the host threads
            chunk, qparams = quantize_chunk_u16(
                chunk, C, concurrency=_STAGE_WORKERS)
        else:
            qparams = identity_qparams(C)
            if chunk.shape[0] < C:
                chunk = np.pad(
                    chunk, ((0, C - chunk.shape[0]), (0, 0), (0, 0)))
        phi = np.deg2rad(ang).astype(np.float32)
        return (put(chunk), put(np.sin(phi)), put(np.cos(phi)),
                put(qparams))

    def _offsets(self, z_offset, roi_offset):
        rx1, ry1, rz1 = roi_offset
        z0 = int(rz1 + z_offset)
        vlo = self._v_band_lo(z0) if self.backend == "pallas" else 0
        offs = jnp.asarray([rx1, ry1, z0, vlo], jnp.int32)
        extra = (z0, vlo) if self.backend == "pallas" else ()
        return offs, extra

    def step_staged(self, volume, staged, *, z_offset: int = 0,
                    roi_offset: Tuple[int, int, int] = (0, 0, 0)):
        """Accumulate one pre-staged chunk (see ``stage_chunk``)."""
        offs, extra = self._offsets(z_offset, roi_offset)
        dev_chunk, sin, cos, qparams = staged
        return self._step(volume, dev_chunk, sin, cos, qparams, offs,
                          *extra)

    def accumulate(
        self,
        volume: jnp.ndarray,
        projections,
        angles_deg,
        *,
        z_offset: int = 0,
        roi_offset: Tuple[int, int, int] = (0, 0, 0),
    ) -> jnp.ndarray:
        """Stream all projections through weight/filter/backproject.

        Staged ahead on worker threads (``stage_stream``): chunk
        quantization and h2d transfers overlap each other AND the
        device's execution of earlier steps.
        """
        offs, extra = self._offsets(z_offset, roi_offset)
        for staged, _ in stage_stream(
                self.stage_chunk, self._chunks(projections, angles_deg)):
            volume = self._step(volume, *staged, offs, *extra)
        return volume

    def finalize(self, volume: jnp.ndarray) -> np.ndarray:
        """Backend state -> (dz, ny, nx) ndarray."""
        if self.backend == "pallas":
            if volume.nbytes > (1 << 30):
                # big blocks: slab-wise d2h + host transpose — the
                # device-side transpose would materialize ~3x the block
                # in HBM (OOMs at 2048-class, where the state is 8 GiB)
                return self._bpp.from_kernel_layout_host(
                    volume, self.block_shape)
            out = self._bpp.from_kernel_layout(volume, self.block_shape)
            return np.asarray(out)
        return np.asarray(volume)

    def run(self, projections, angles_deg, **kw) -> np.ndarray:
        return self.finalize(
            self.accumulate(self.init_block(), projections, angles_deg, **kw))


def reconstruct(
    det: DetectorGeometry,
    vol: VolumeGeometry,
    projections,
    angles_deg,
    *,
    chunk_size: int = 16,
    backend: str = "auto",
    z_offset: int = 0,
    roi_offset: Tuple[int, int, int] = (0, 0, 0),
    block_shape: Optional[Tuple[int, int, int]] = None,
    interpret: bool = False,
) -> np.ndarray:
    """One-shot FDK reconstruction; returns the (dz, ny, nx) volume."""
    rec = Reconstructor(
        det, vol, chunk_size=chunk_size, backend=backend,
        block_shape=block_shape, interpret=interpret,
    )
    return rec.run(projections, angles_deg,
                   z_offset=z_offset, roi_offset=roi_offset)

"""Voxel-driven FDK backprojection — Pallas TPU kernel (the hot path).

Same math as ``backprojection_xla`` (reference:
src/openmp/backprojection.cpp:96-152, src/cuda/backprojection.cu:65-130),
re-architected for the TPU's vector/matrix units, which have no general
per-element gather.  The CUDA kernel's texture fetch is decomposed into
two structured interpolations:

  stage 1 — h-interpolation as a BANDED ONE-HOT MATMUL on the MXU.
    For one y-row and one x-tile of ``x_tile`` voxels, the detector
    column coordinate h(x) spans a narrow band of the detector (bounded
    by |dh/dx| <= span_bound, computed from the geometry at trace
    time).  The projection chunk is kept transposed in VMEM as
    P_T[h, v]; a dynamic sublane slice picks the band, and an
    (x_tile x BAND) one-hot interpolation matrix (2 nonzeros per row:
    1-fh, fh) multiplies it:
        Q[x, v] = sum_h W[x, h] * P_T[band_h, v]
    Q is cached in VMEM scratch and reused across all z-tiles of the
    (y, x-tile) column.  Detector h-border-zero falls out for free:
    out-of-range h0 rows have no one-hot match and yield zero.
    Narrow x-tiles (default 64) keep the band within one 128-wide MXU
    contraction tile, halving matmul passes vs 128-voxel tiles.

  stage 2 — v-interpolation as WINDOWED LANE GATHERS on the VPU.
    For an (x_tile x, 128 z) output tile, v(x, z) = z*factor(x) indexes
    Q's v axis.  TPU supports per-lane gather only within a 128-wide
    window (jnp.take_along_axis axis=1 on tall (n,128) tables), so Q is
    scanned in static 128-wide windows; each window contributes via
    gather + in-window select.  The base value Q[v0] and forward
    difference dQ[v0] are gathered (border-zero v handling is an
    explicit mask), giving det = Q[v0] + fv*dQ[v0].  Two speed paths:
      * window selection (``window_mode``): the static worst-case
        window count is K = VP/128, but any one (angle, tile) touches a
        narrow v interval.  The scratch stores windows at 64-LANE STRIDE
        (window j covers Q[64j, 64j+128)); "dynamic" (default) computes
        the lowest touched window from SCALAR interval bounds (tile
        x/y/z extents x geometry) and gathers ``span_w`` windows
        stepping by 2 via dynamic leading-dim indexing — the 64-lane
        base quantization means 2 gathers cover any v span <= 191 px
        (a 128-quantized base needs 3 whenever |dv/dz| > ~0.97).
        "direct" gathers all K disjoint windows (wins when K is small).
        No per-angle control flow anywhere: scalar pl.when branches per
        (angle, sub-tile) — tile culling, rare-window branches — were
        measured at 25-30 Gupd/s vs 47 straight-line on v5e;
      * packed Q/dQ (``pack_qdq``) — Q and dQ are round-to-nearest
        bf16-packed into one int32 lane in stage 1, halving the gather
        count; numerically ~4e-3 per sample, which averages out over
        hundreds of angles (use with DEFAULT matmul precision; the
        exact mode keeps two f32 gathers).

The volume block lives in (y, x, z) layout — z minor (lanes), x on
sublanes.  The grid is (y, x-tile, z-step) with z innermost, so each
(1, x_tile, z_tile) volume block is read+written once per chunk of C
angles: chunking amortizes volume HBM traffic below the roofline bound
(BASELINE.md).  Each grid step processes z_tile/128 lane-width
sub-tiles; z_tile defaults to the WHOLE padded block (one z grid step),
which amortizes the fixed per-step cost (grid bookkeeping, stage-1
predication, DMA handshakes — measured ~25% of the kernel at
z_tile=128) over every sub-tile and lets the trace-time static window
plan engage for every block shape (round-3 ladder: dz512-banded 58.2 →
single-block 72.2 Gupd/s at the 1024 flagship).
``PARIS_BP_DEBUG_VARIANT`` (1=scratch-read only, 2=no stage 2,
3=no stage 1, 4=gathers pinned) re-runs that bisection on any config.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import DetectorGeometry, VolumeGeometry
from .backprojection_xla import BpGrid

__all__ = [
    "backproject_chunk_pallas",
    "backproject_chunk_pallas_yxz",
    "pallas_supported",
    "to_kernel_layout",
    "from_kernel_layout",
    "from_kernel_layout_host",
    "pad_projections_t",
]

_LANE = 128
_SUB = 8
_SUB_BF16 = 16       # bf16 native sublane tiling is (16, 128)
_BAND = 256          # max supported h-band (VMEM / W-matrix width cap)
_XTILE = 64          # default x-tile (sublane) size, band fits one MXU tile


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _sublane(dtype) -> int:
    """Sublane quantum for dynamic second-minor slices of this dtype.

    Mosaic requires dynamic sublane offsets/extents aligned to the
    dtype's native tile: (8, 128) for f32 but (16, 128) for bf16 — an
    8-but-not-16-aligned bf16 slice may be rejected or mislowered on
    hardware (interpret mode doesn't catch it).
    """
    return _SUB_BF16 if jnp.dtype(dtype) == jnp.dtype(jnp.bfloat16) else _SUB


def _span_bound_px(grid: BpGrid) -> float:
    """Trace-time upper bound on |dh/dx| in detector px per voxel."""
    det, vol = grid.det, grid.vol
    r = (vol.dim_x / 2.0) * vol.l_vx_x * math.sqrt(2.0)  # padded corner radius
    r = min(r, abs(grid.d_so) * 0.95)
    f_max = grid.d_sd / (abs(grid.d_so) - r)
    return (vol.l_vx_x / det.l_px_row) * f_max * (1.0 + math.sqrt(2.0) * r /
                                                  (abs(grid.d_so) - r))


def _h_band_px(grid: BpGrid, x_tile: int, sub: int = _SUB) -> int:
    """Tight h-interpolation band for one x-tile (sublane-aligned).

    margin: bilinear corner (+2), sublane quantization of the band
    start (+``sub``: 8 for f32, 16 for bf16), floor slack (+2).
    """
    need = (x_tile - 1) * _span_bound_px(grid) + 4.0 + sub
    return _round_up(int(math.ceil(need)), sub)


def pallas_supported(grid: BpGrid, x_tile: int = _XTILE) -> bool:
    """The banded h-interp requires the x-tile's h span to fit the band.

    Checked against the widest (bf16) sublane quantum so one answer
    covers both accuracy modes.
    """
    return _h_band_px(grid, x_tile, _SUB_BF16) <= _BAND


def to_kernel_layout(vol_zyx: jnp.ndarray) -> jnp.ndarray:
    """(dz, ny, nx) -> (ny, nxp, nzp) with x,z padded to 128."""
    dz, ny, nx = vol_zyx.shape
    out = jnp.transpose(vol_zyx, (1, 2, 0))
    return jnp.pad(out, ((0, 0), (0, _round_up(nx, _LANE) - nx),
                         (0, _round_up(dz, _LANE) - dz)))


def from_kernel_layout(vol_yxz: jnp.ndarray, shape_zyx: Tuple[int, int, int]
                       ) -> jnp.ndarray:
    dz, ny, nx = shape_zyx
    return jnp.transpose(vol_yxz[:ny, :nx, :dz], (2, 0, 1))


# z-slab extent of the big-block finalize d2h path; also used by the
# app's whole-volume-block HBM gate (one slab is eagerly materialized
# on device next to the live accumulator)
FINALIZE_SLAB = 64


def from_kernel_layout_host(vol_yxz, shape_zyx: Tuple[int, int, int],
                            slab: int = FINALIZE_SLAB) -> np.ndarray:
    """(ny, nxp, nzp) device accumulator -> host (dz, ny, nx) ndarray.

    Device-side ``from_kernel_layout`` materializes the sliced AND the
    transposed copy next to the live accumulator (~3x the block in HBM
    — an OOM at 2048-class blocks, where the accumulator alone is
    8 GiB).  This variant pulls z-slabs (one ~1 GiB eager slice each)
    and transposes on the host, so device peak stays accumulator + one
    slab.
    """
    dz, ny, nx = shape_zyx
    out = np.empty((dz, ny, nx), np.float32)
    for z0 in range(0, dz, slab):
        z1 = min(dz, z0 + slab)
        part = np.asarray(vol_yxz[:, :, z0:z1])     # d2h (ny, nxp, s)
        out[z0:z1] = np.transpose(part[:ny, :nx, :], (2, 0, 1))
    return out


def pad_projections_t(projections: jnp.ndarray,
                      dtype=jnp.float32, sub: Optional[int] = None
                      ) -> jnp.ndarray:
    """(C, n_col, n_row) -> transposed padded (C, HP, VP): axis1=h, axis2=v.

    ``dtype=bfloat16`` halves the kernel's dominant VMEM term (the
    resident projection band), letting the caller run ~2x larger chunks;
    the stage-1 matmul then runs with native bf16 MXU inputs.  Same
    precision class as the CUDA texture unit's reduced-precision
    bilinear path — the pipeline's "fast" accuracy mode.
    """
    C, n_col, n_row = projections.shape
    if sub is None:
        sub = _sublane(jnp.dtype(dtype))
    pt = jnp.transpose(projections, (0, 2, 1))
    pt = jnp.pad(pt, ((0, 0), (0, _round_up(n_row, sub) - n_row),
                      (0, _round_up(n_col, _LANE) - n_col)))
    return pt.astype(dtype)


def split_bf16_planes(pt: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """f32 (C, HP, VP) -> (hi, lo) bf16 planes with hi + lo ~= pt.

    Feeds the kernel's 3-pass "x3" matmul path: Mosaic has no HIGH dot
    precision, so the bf16x3 scheme (W_hi*P_hi + W_hi*P_lo + W_lo*P_hi,
    all native-bf16 MXU passes) is synthesized from explicit planes.
    Residency cost equals f32 (2+2 bytes); rounding error ~1e-5 relative
    vs the 6-pass HIGHEST path's ~1e-7, at half the MXU passes.
    """
    hi = pt.astype(jnp.bfloat16)
    lo = (pt - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _v_stride_bound(grid: BpGrid) -> float:
    """Trace-time bound on |dv/dz| (detector rows per voxel step in z)."""
    det, vol = grid.det, grid.vol
    r = (vol.dim_x / 2.0) * vol.l_vx_x * math.sqrt(2.0)
    r = min(r, abs(grid.d_so) * 0.95)
    f_max = grid.d_sd / (abs(grid.d_so) - r)
    return f_max * vol.l_vx_z / det.l_px_col


def _v_xspread_bound(grid: BpGrid, x_tile: int = _XTILE) -> float:
    """Trace-time bound on the v spread across one x tile."""
    det, vol = grid.det, grid.vol
    r = (vol.dim_x / 2.0) * vol.l_vx_x * math.sqrt(2.0)
    r = min(r, abs(grid.d_so) * 0.95)
    f_max = grid.d_sd / (abs(grid.d_so) - r)
    z_max_mm = (vol.dim_z / 2.0 + _LANE) * vol.l_vx_z
    dfdx = vol.l_vx_x * f_max * f_max / grid.d_sd
    return z_max_mm * x_tile * dfdx / det.l_px_col


def _v_span_px(grid: BpGrid, x_tile: int = _XTILE) -> float:
    """Trace-time bound on one (x, z) tile's detector-v interval width."""
    return ((_LANE - 1) * _v_stride_bound(grid)
            + _v_xspread_bound(grid, x_tile) + 4.0)


def _static_window_plan(grid: BpGrid, z0s: int, vls: int, VP: int, KW: int,
                        n_z2: int) -> list:
    """Trace-time per-z2 window plan [(base, n_windows)] for single
    z-step grids with STATIC block z-offset ``z0s`` and detector-row
    band start ``vls``.

    Every voxel's v lies in z_mm x [f_lo, f_hi] (the global factor
    interval from the corner-radius bound); a sub-tile's worst-case v
    interval is therefore known at trace time, killing the per-(angle,
    sub-tile) scalar chains AND the dynamic scratch addressing of the
    "dynamic" mode.  Unsafe voxels (weight 0) gather zeros from their
    all-zero Q rows regardless of the window set, so only safe voxels
    constrain coverage.
    """
    det, vol = grid.det, grid.vol
    r_b = min((vol.dim_x / 2.0) * vol.l_vx_x * math.sqrt(2.0),
              abs(grid.d_so) * 0.95)
    f_lo = grid.d_sd / (abs(grid.d_so) + r_b)
    f_hi = grid.d_sd / (abs(grid.d_so) - r_b)
    off_z = -(vol.dim_z * vol.l_vx_z) / 2.0 + vol.l_vx_z / 2.0
    plan = []
    for z2 in range(n_z2):
        z_mm_lo = (z2 * _LANE + z0s) * vol.l_vx_z + off_z
        z_mm_hi = z_mm_lo + (_LANE - 1) * vol.l_vx_z
        cands = [z_mm_lo * f_lo, z_mm_lo * f_hi,
                 z_mm_hi * f_lo, z_mm_hi * f_hi]
        v_lo = (min(cands) - grid.v_min) / det.l_px_col - 0.5 - vls
        v_hi = (max(cands) - grid.v_min) / det.l_px_col - 0.5 - vls
        lo = max(0, int(math.floor(v_lo)) - 2)
        hi = min(VP - 1, int(math.ceil(v_hi)) + 3)   # +1 bilinear, +2 slack
        wb = min(lo >> 6, KW - 1)
        nw = -(-(hi - 64 * wb + 1) // _LANE)
        if nw > (KW - 1 - wb) // 2 + 1:
            # Stride-2 windows from an ODD base top out 64 lanes short of
            # VP (the top window KW-1 is even-indexed), so an odd-base
            # plan whose interval reaching the detector top cannot cover
            # it.  Drop to the even base below — even bases always reach
            # VP — and recompute.  (Clamping nw instead silently gathers
            # the top z sub-tile from the wrong window.)
            wb -= wb & 1
            nw = -(-(hi - 64 * wb + 1) // _LANE)
        nw = max(1, nw)
        assert nw <= (KW - 1 - wb) // 2 + 1 and 64 * wb + 128 * nw > hi, (
            "static window plan cannot cover its v interval",
            z2, wb, nw, lo, hi, VP, KW)
        # MASK ELISION: when the conservative interval sits strictly
        # inside the detector's valid v0 range [-vls, -vls + n_col - 2]
        # (band-relative), every SAFE voxel of the sub-tile passes the
        # border test by construction, and UNSAFE voxels (weight 0)
        # gather from their all-zero Q rows whatever their index — the
        # gather is sublane-local, idx is &127-wrapped, and a negative
        # bucket can only keep the base window, still the zero row.  So
        # the per-element validity compare+select can be skipped.
        # floor(v_lo)-2 / ceil(v_hi)+1 give one px of slack beyond the
        # bilinear corner.
        skip_mask = (int(math.floor(v_lo)) - 2 >= -vls
                     and int(math.ceil(v_hi)) + 1 <= -vls + det.n_col - 2)
        plan.append((wb, nw, skip_mask))
    return plan


def _v_span_windows(grid: BpGrid, x_tile: int = _XTILE) -> int:
    """128-wide v windows needed per (x, z) tile from a 64-QUANTIZED base.

    The Q scratch stores windows at 64-lane stride (window j covers
    [64j, 64j+128)), so the dynamic base wastes at most 64 lanes of the
    first window; the gathered windows step by 2 (disjoint 128-lane
    coverage).  For |dv/dz| slightly above 1 (span ~143 px) this yields
    2 gathers where a 128-quantized base needs 3.
    """
    span = _v_span_px(grid, x_tile)
    return max(1, int(math.ceil((span + 65.0) / _LANE)))


def _pack_bf16_pair(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """Round-to-nearest bf16-pack two f32 arrays into one int32 lane.

    ``hi`` occupies the top 16 bits (so unpacking it is a single mask —
    bf16 is the top half of f32), ``lo`` the bottom 16.
    """
    hi_i = jax.lax.bitcast_convert_type(hi, jnp.int32)
    lo_i = jax.lax.bitcast_convert_type(lo, jnp.int32)
    bias = jnp.int32(0x8000)
    hi_i = jnp.bitwise_and(hi_i + bias, jnp.int32(-65536))
    lo_i = jax.lax.shift_right_logical(lo_i + bias, 16)
    return jnp.bitwise_or(hi_i, lo_i)


def _unpack_bf16_pair(p: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    hi = jax.lax.bitcast_convert_type(
        jnp.bitwise_and(p, jnp.int32(-65536)), jnp.float32)
    lo = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(p, 16), jnp.float32)
    return hi, lo


def _bp_kernel(
    # SMEM scalar refs, then VMEM refs + scratch (unpacked below)
    sin_ref, cos_ref, off_ref,
    *refs,
    grid: BpGrid,
    C: int,
    HP: int,
    VP: int,
    band: int,
    mm_precision,
    span_w: int,
    x_tile: int,
    sub: int,
    pack: bool,
    x3: bool,
    window_mode: str,
    den_floor: float,
    z_tile: int = _LANE,
    debug_variant: int = 0,
    swin=None,      # static per-z2 window plan [(base, n_windows), ...]
    fori: int = 0,    # >0: lax.fori_loop over angle blocks of this size
):
    if x3:      # bf16x3: projections arrive as (hi, lo) bf16 planes
        proj_ref, proj_lo_ref, vol_in_ref, vol_out_ref, *scratch = refs
    else:
        proj_ref, vol_in_ref, vol_out_ref, *scratch = refs
        proj_lo_ref = None
    if pack:
        q_ref, = scratch
        dq_ref = None
    else:
        q_ref, dq_ref = scratch
    det, vol = grid.det, grid.vol
    y = pl.program_id(0)
    xt = pl.program_id(1)
    zt = pl.program_id(2)
    XT = x_tile

    l_vx_x, l_vx_y, l_vx_z = vol.l_vx_x, vol.l_vx_y, vol.l_vx_z
    off_x = -(vol.dim_x * l_vx_x) / 2.0 + l_vx_x / 2.0
    off_y = -(vol.dim_y * l_vx_y) / 2.0 + l_vx_y / 2.0
    off_z = -(vol.dim_z * l_vx_z) / 2.0 + l_vx_z / 2.0
    d_so, d_sd = grid.d_so, grid.d_sd
    n_row, n_col = det.n_row, det.n_col

    rx1 = off_ref[0]
    ry1 = off_ref[1]
    z0g = off_ref[2]  # rz1 + z_offset combined by the wrapper
    vlo = off_ref[3]  # detector-row band start (0 when unbanded)

    # per-x voxel geometry, shape (XT, 1); cheap enough to recompute per step
    xi = jax.lax.broadcasted_iota(jnp.int32, (XT, 1), 0) + xt * XT + rx1
    xs = xi.astype(jnp.float32) * l_vx_x + off_x
    ys = (y + ry1).astype(jnp.float32) * l_vx_y + off_y

    def per_angle(c):
        sin_c, cos_c = sin_ref[c], cos_ref[c]
        s = xs * cos_c + ys * sin_c                      # (XT, 1)
        t = -xs * sin_c + ys * cos_c
        denom = s + d_so
        safe = denom > 1e-3 * abs(d_so)
        inv = jnp.where(safe, 1.0 / denom, 0.0)
        factor = d_sd * inv
        weight = jnp.where(safe, 0.5 * (d_so * inv) ** 2, 0.0)
        return safe, factor, weight

    # ---- per-(angle, tile) SCALAR factor interval (z-invariant) ----------
    # From the tile's x/y extents and the geometry alone.  Any voxel
    # inside the trace-time radius bound has denom >= den_floor, so f_hi
    # bounds every voxel ``safe`` keeps.  Feeds the v window base.
    xs_lo_s = (xt * XT + rx1).astype(jnp.float32) * l_vx_x + off_x
    xs_hi_s = xs_lo_s + (XT - 1) * l_vx_x
    ys_sc = (y + ry1).astype(jnp.float32) * l_vx_y + off_y

    def tile_factor_interval(c):
        sin_c, cos_c = sin_ref[c], cos_ref[c]
        s1 = xs_lo_s * cos_c + ys_sc * sin_c
        s2 = xs_hi_s * cos_c + ys_sc * sin_c
        den_lo = jnp.maximum(jnp.minimum(s1, s2) + d_so, den_floor)
        den_hi = jnp.maximum(jnp.maximum(s1, s2) + d_so, den_lo)
        return d_sd / den_hi, d_sd / den_lo          # (f_lo, f_hi)

    # v windows live at 64-lane stride: window j covers Q[64j, 64j+128).
    # Stage 2 gathers ``span_w`` windows stepping by 2 (disjoint 128-lane
    # coverage) from a 64-quantized dynamic base — one fewer gather than
    # a 128-quantized base for |dv/dz| slightly above 1.
    KW = max(1, 2 * (VP // _LANE) - 1)

    # ---- stage 1 (once per (y, x-tile)): fill the Q scratch --------------
    # The scratch is WINDOW-MAJOR — (C, KW, XT, 128) — so stage 2's gathers
    # read whole contiguous tiles instead of lane-slicing a (XT, VP) row
    # at a different offset per z-tile.
    @pl.when(jnp.logical_and(zt == 0, debug_variant != 3))
    def _stage1():
        band_cols = jax.lax.broadcasted_iota(jnp.int32, (XT, band), 1)

        def _stage1_angle(c, carry=0):
            safe, factor, weight = per_angle(c)
            sin_c, cos_c = sin_ref[c], cos_ref[c]
            t = -xs * sin_c + ys * cos_c
            h = (t * factor - grid.h_min) / det.l_px_row - 0.5
            h0f = jnp.floor(h)
            fh = h - h0f
            valid_h = safe & (h0f >= 0.0) & (h0f + 1.0 <= n_row - 1)
            h0 = jnp.clip(h0f, -1.0, float(n_row - 1)).astype(jnp.int32)

            b0 = jnp.clip(jnp.min(jnp.where(valid_h, h0, n_row - 1)),
                          0, max(0, HP - band))
            # sublane-aligned window start (Mosaic requires the dtype's
            # native sublane quantum: 8 for f32, 16 for bf16)
            b0 = pl.multiple_of((b0 // sub) * sub, sub)
            if debug_variant == 7:   # static band base (cost isolation)
                b0 = 0
            rel = h0 - b0                                 # (XT, 1)
            fhw = jnp.where(valid_h, fh, 0.0)
            one_m = jnp.where(valid_h, 1.0 - fh, 0.0)
            W = (jnp.where(band_cols == rel, one_m, 0.0)
                 + jnp.where(band_cols == rel + 1, fhw, 0.0))
            band_rows = proj_ref[c, pl.ds(b0, band), :]    # (band, VP)
            if x3:
                # Mosaic has no HIGH dot precision; synthesize bf16x3:
                # 3 native-bf16 MXU passes, ~1e-5 relative error, half
                # the passes of the 6-pass HIGHEST path.
                def _dot(a, b):
                    return jax.lax.dot_general(
                        a, b, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
                rows_lo = proj_lo_ref[c, pl.ds(b0, band), :]
                W_hi = W.astype(jnp.bfloat16)
                W_lo = (W - W_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                Q = (_dot(W_hi, band_rows) + _dot(W_hi, rows_lo)
                     + _dot(W_lo, band_rows))
            else:
                if band_rows.dtype == jnp.bfloat16:
                    W = W.astype(jnp.bfloat16)     # native bf16 MXU pass
                Q = jax.lax.dot_general(
                    W, band_rows, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=mm_precision,
                )                                          # (XT, VP)
            # FDK weight applied AFTER the matmul, in f32: the one-hot
            # rows may be bf16-quantized (fast mode) but the folded
            # 0.5*(d_so/denom)^2 weight stays exact.  Once per column —
            # stage 2 never multiplies by it per z-tile.
            Q = Q * weight
            def store_windows(ref, A, c=c):
                """Even windows are aligned slices of A; odd ones are
                aligned slices of A rotated left by 64 lanes (one native
                lane-roll instead of KW/2 unaligned slices).  The roll's
                wrapped tail is never addressed: the top odd window
                (2K-3) ends 64 lanes short of VP."""
                Ar = pltpu.roll(A, shift=VP - 64, axis=1)  # Ar[i] = A[i+64]
                for k in range(KW):
                    src, half = (A, k // 2) if k % 2 == 0 else (Ar, k // 2)
                    ref[c, k] = src[:, half * _LANE:(half + 1) * _LANE]

            if pack:
                # NEIGHBOR pack: int32 lane = (bf16(Q[v]) << 16) |
                # bf16(Q[v+1]).  One rounded bf16 plane + one lane-roll
                # replaces the old (Q, D) pack's separate D construction
                # and second rounding (~5 fewer VPU ops per VP lane);
                # stage 2 forms the forward difference after the gather.
                # The roll's wrapped last lane (Q[VP-1+1] = Q[0]) is only
                # reachable at v0 = VP-1, which the validity mask kills
                # (v0 <= n_col-2 for valid lanes).
                bias = jnp.int32(0x8000)
                B = jnp.bitwise_and(
                    jax.lax.bitcast_convert_type(Q, jnp.int32) + bias,
                    jnp.int32(-65536))
                Br = pltpu.roll(B, shift=VP - 1, axis=1)   # Br[l] = B[l+1]
                store_windows(
                    q_ref, jnp.bitwise_or(
                        B, jax.lax.shift_right_logical(Br, 16)))
            else:
                # forward difference along v: det = Q[v0] + fv * dQ[v0]
                D = (jnp.concatenate(
                    [Q[:, 1:], jnp.zeros((XT, 1), jnp.float32)],
                    axis=1) - Q)
                store_windows(q_ref, Q)
                store_windows(dq_ref, D)
            return carry

        if fori:
            # loop over angle BLOCKS of ``fori`` unrolled angles instead
            # of C unrolled copies: C/fori-fold less Mosaic IR (remote
            # compiles of the fully-unrolled flagship kernel measured
            # 400-700 s; fori=1 compiles in ~20 s) while in-block
            # unrolling preserves most cross-angle pipelining
            def _s1_block(i, carry):
                for k in range(fori):
                    _stage1_angle(i * fori + k)
                return carry
            jax.lax.fori_loop(0, C // fori, _s1_block, 0)
        else:
            for c in range(C):
                _stage1_angle(c)

    # ---- stage 2: v-interp + accumulate this (1, XT, z_tile) block --------
    # The block holds z_tile//128 lane-width sub-tiles; processing several
    # per grid step amortizes the fixed per-step cost (grid bookkeeping,
    # stage-1 predication, block DMA handshakes) measured at ~25% of the
    # kernel at z_tile=128.  The running total stays in REGISTERS and
    # there is NO per-angle control flow: scalar pl.when branches per
    # (angle, sub-tile) were measured to cost far more than the work they
    # saved on v5e (47 -> 25-30 Gupd/s for a tile-culling + rare-window
    # branch variant), so everything is straight-line.
    K = VP // _LANE
    # v affine chain folded into one broadcast mul + scalar add:
    #   v_rel = zs * (factor/l_px_col) + (-v_min/l_px_col - 0.5 - vlo)
    # v0 comes out band-relative, so the gather needs no `- vlo`, and the
    # validity bounds become band-relative scalars.  No clip: factor and
    # zs are clamped/bounded, so the int32 conversion can't overflow,
    # and out-of-range lanes are killed by ``valid`` after the gather.
    inv_lpx = 1.0 / det.l_px_col
    vb = (-grid.v_min / det.l_px_col - 0.5) - vlo.astype(jnp.float32)
    lo_b = -vlo                        # floor(v) >= 0       (band-relative)
    v_span = jnp.uint32(n_col - 2)     # hi_b - lo_b (validity range width)
    if debug_variant == 2:          # stage-1 + grid/DMA overhead only
        vol_out_ref[0] = vol_in_ref[0]
        return

    fints = [tile_factor_interval(c) for c in range(C)]
    n_z2 = z_tile // _LANE
    if swin is not None and debug_variant == 0:
        # ---- STATIC window plan (single z-step grids + static block
        # offsets): the per-(angle, sub-tile) window set was derived at
        # TRACE time from the global factor interval, so stage 2 has no
        # scalar chains, no dynamic scratch addressing (measured ~4 ps/upd
        # at the 1024 flagship), and nw as low as 2 for sub-tiles near
        # the rotation-axis z-center where the factor spread is narrow.
        fscales = None if fori else [per_angle(c)[1] * inv_lpx
                                     for c in range(C)]
        for z2 in range(n_z2):
            wb, nw, skip = swin[z2]
            zb = z2 * _LANE             # single z-step: zt == 0
            zidx = (jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1)
                    + zb + z0g)
            zs = zidx.astype(jnp.float32) * l_vx_z + off_z
            total = vol_in_ref[0, :, z2 * _LANE:(z2 + 1) * _LANE]
            vb_adj = vb - jnp.float32(64 * wb)
            lo_adj = lo_b - 64 * wb

            def _angle(c, total, wb=wb, nw=nw, skip=skip, zs=zs,
                       vb_adj=vb_adj, lo_adj=lo_adj):
                fscale = (per_angle(c)[1] * inv_lpx if fori
                          else fscales[c])
                v = zs * fscale + vb_adj
                v0f = jnp.floor(v)
                fv = v - v0f
                relv = v0f.astype(jnp.int32)     # window-relative v0
                idx = relv & (_LANE - 1)
                bucket = relv >> 7
                if pack:
                    a = jnp.take_along_axis(q_ref[c, wb], idx, axis=1)
                    for j in range(1, nw):
                        a = jnp.where(bucket == j, jnp.take_along_axis(
                            q_ref[c, wb + 2 * j], idx, axis=1), a)
                    q0, q1 = _unpack_bf16_pair(a)
                    d0 = q1 - q0
                else:
                    a0 = jnp.take_along_axis(q_ref[c, wb], idx, axis=1)
                    a1 = jnp.take_along_axis(dq_ref[c, wb], idx, axis=1)
                    for j in range(1, nw):
                        m = bucket == j
                        a0 = jnp.where(m, jnp.take_along_axis(
                            q_ref[c, wb + 2 * j], idx, axis=1), a0)
                        a1 = jnp.where(m, jnp.take_along_axis(
                            dq_ref[c, wb + 2 * j], idx, axis=1), a1)
                    q0, d0 = a0, a1
                if skip:
                    # interior sub-tile (plan proved every safe voxel's
                    # v0 on-detector; unsafe rows gather their zero Q
                    # row): no border compare+select — ~3 of the ~14
                    # VPU ops per (angle, element) in this loop
                    return total + (q0 + fv * d0)
                valid = (relv - lo_adj).astype(jnp.uint32) <= v_span
                return total + jnp.where(valid, q0 + fv * d0, 0.0)

            if fori:
                def _blk(i, total):
                    for k in range(fori):
                        total = _angle(i * fori + k, total)
                    return total
                total = jax.lax.fori_loop(0, C // fori, _blk, total)
            else:
                for c in range(C):
                    total = _angle(c, total)
            vol_out_ref[0, :, z2 * _LANE:(z2 + 1) * _LANE] = total
        return

    # z-invariant per-angle vector state, hoisted out of the z2 loop:
    # factor (XT, 1) and its premultiplied v-scale (the (64,1)-shaped
    # geometry chain is ~80 VREG-ops per evaluation; recomputing it per
    # (angle, sub-tile) cost ~10% of the kernel)
    fscales = [per_angle(c)[1] * inv_lpx for c in range(C)]

    for z2 in range(z_tile // _LANE):
        zb = zt * z_tile + z2 * _LANE    # first z index of this sub-tile
        zidx = jax.lax.broadcasted_iota(jnp.int32, (1, _LANE), 1) + zb + z0g
        zs = zidx.astype(jnp.float32) * l_vx_z + off_z     # (1, LANE)
        total = vol_in_ref[0, :, z2 * _LANE:(z2 + 1) * _LANE]
        # per-sub-tile scalar z extent (feeds the v window-base interval)
        zs_lo = (zb + z0g).astype(jnp.float32) * l_vx_z + off_z
        zs_hi = zs_lo + (_LANE - 1) * l_vx_z
        for c in range(C):
            if debug_variant == 1:      # scratch read + accumulate only
                g = q_ref[c, 0]
                if pack:
                    q0, d0 = _unpack_bf16_pair(g)
                    total = total + q0 + d0
                else:
                    total = total + g
                continue
            v = zs * fscales[c] + vb                           # (XT, LANE)
            v0f = jnp.floor(v)
            fv = v - v0f
            v0 = v0f.astype(jnp.int32)
            # unsigned range test: v0 in [lo_b, lo_b + v_span]
            valid = (v0 - lo_b).astype(jnp.uint32) <= v_span

            def take(ref_ck, idx):
                return jnp.take_along_axis(ref_ck, idx, axis=1)

            def gather_merge(k0, nw, relv, idx, step, c=c):
                """nw 128-wide windows from (traced or static) k0.

                Gathered windows step by ``step`` in the 64-lane-stride
                scratch (step 2 = disjoint 128-lane coverage), so the
                in-window index (v0 - base) & 127 is shared and one
                bucket compare per extra window merges the results.
                Out-of-cover lanes land on garbage and are killed by the
                ``valid`` mask (the detector-row band covers every
                on-detector voxel of the block, corner magnification
                included — geometry.detector_row_band).
                """
                bucket = relv >> 7
                if pack:
                    a = take(q_ref[c, k0], idx)
                    for j in range(1, nw):
                        g = take(q_ref[c, k0 + step * j], idx)
                        a = jnp.where(bucket == j, g, a)
                    return a
                a0 = take(q_ref[c, k0], idx)
                a1 = take(dq_ref[c, k0], idx)
                for j in range(1, nw):
                    m = bucket == j
                    a0 = jnp.where(m, take(q_ref[c, k0 + step * j], idx), a0)
                    a1 = jnp.where(m, take(dq_ref[c, k0 + step * j], idx), a1)
                return a0, a1

            if debug_variant == 4:      # v compute + interp, gathers pinned
                res = q_ref[c, 0] if pack else (q_ref[c, 0], dq_ref[c, 0])
            elif debug_variant == 5:
                # full dynamic-mode index math, but STATIC table base:
                # isolates the cost of the dynamic scratch window address
                f_lo, f_hi = fints[c]
                v_mm_lo = jnp.minimum(
                    jnp.minimum(zs_lo * f_lo, zs_lo * f_hi),
                    jnp.minimum(zs_hi * f_lo, zs_hi * f_hi))
                rel_lo = (v_mm_lo - grid.v_min) / det.l_px_col - 0.5
                k_lo_raw = (jnp.floor(rel_lo).astype(jnp.int32) - vlo - 1) >> 6
                k0 = jnp.clip(k_lo_raw, 0, KW - 1 - 2 * (span_w - 1))
                relv = v0 - k0 * 64
                idx = relv & (_LANE - 1)
                res = gather_merge(0, span_w, relv, idx, 2)
            elif debug_variant == 6:
                # dynamic table base from a TRIVIAL scalar (no f32 chain):
                # isolates the scalar-computation cost
                k0 = jnp.int32((c + z2) % max(1, KW - 1 - 2 * (span_w - 1)))
                relv = v0 - k0 * 64
                idx = relv & (_LANE - 1)
                res = gather_merge(k0, span_w, relv, idx, 2)
            elif K <= max(span_w, 2) or window_mode == "direct":
                # all K disjoint windows (even scratch indices)
                relv = v0
                idx = relv & (_LANE - 1)
                res = gather_merge(0, K, relv, idx, 2)
            else:
                # "dynamic": window base from the SCALAR v interval — the
                # tile x/y/z extents x geometry give a conservative v_lo
                # without touching a vector lane; span_w windows stepping
                # by 2 from the 64-quantized base cover every valid voxel.
                f_lo, f_hi = fints[c]
                v_mm_lo = jnp.minimum(
                    jnp.minimum(zs_lo * f_lo, zs_lo * f_hi),
                    jnp.minimum(zs_hi * f_lo, zs_hi * f_hi))
                rel_lo = (v_mm_lo - grid.v_min) / det.l_px_col - 0.5
                k_lo_raw = (jnp.floor(rel_lo).astype(jnp.int32) - vlo - 1) >> 6
                k0 = jnp.clip(k_lo_raw, 0, KW - 1 - 2 * (span_w - 1))
                relv = v0 - k0 * 64
                idx = relv & (_LANE - 1)
                res = gather_merge(k0, span_w, relv, idx, 2)

            if pack:
                q0, q1 = _unpack_bf16_pair(res)
                d0 = q1 - q0
            else:
                q0, d0 = res
            total = total + jnp.where(valid, q0 + fv * d0, 0.0)
        vol_out_ref[0, :, z2 * _LANE:(z2 + 1) * _LANE] = total


def backproject_chunk_pallas_yxz(
    volume_yxz: jnp.ndarray,        # (ny, nxp, nzp) kernel layout
    proj_t: jnp.ndarray,            # (C, HP, VP) transposed padded
    sin_phi: jnp.ndarray,           # (C,)
    cos_phi: jnp.ndarray,           # (C,)
    grid: BpGrid,
    offsets,                        # int32 (4,): rx1, ry1, rz1+z_offset, v_band_lo
    *,
    interpret: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    pack_qdq: Optional[bool] = None,
    x_tile: Optional[int] = None,
    window_mode: Optional[str] = None,   # "dynamic" (default) | "direct"
    z_tile: Optional[int] = None,
    static_plan: Optional[Tuple[int, int]] = None,   # (z0, v_band_lo) ints
) -> jnp.ndarray:
    """Accumulate C projections into a kernel-layout volume block.

    ``proj_t`` may be a detector-row BAND of the full projection
    (columns [v_band_lo, v_band_lo + VP) of the transposed layout):
    z-blocks only ever sample a band of detector rows
    (geometry.detector_row_band), so callers slice before the call to
    cut VMEM, matmul width, gather windows and ICI broadcast bytes.

    ``pack_qdq`` (default: on iff ``precision`` is DEFAULT) bf16-packs
    the stage-1 output pairs so stage 2 does one gather instead of two —
    the "fast" accuracy mode (~4e-3 per-sample, averages out over a
    scan); the HIGHEST/two-gather combination is the "exact" mode that
    matches the XLA op to ~1e-5.

    INVARIANT: when ``static_plan=(z0s, vls)`` is given, it must equal
    the *runtime* values ``(offsets[2], offsets[3])`` — the kernel mixes
    the traced z0g/vlo with the trace-time window plan, so inconsistent
    values silently gather from the wrong detector-row windows.  The
    pipeline passes both from the same (z0, vlo) pair; direct callers
    must do the same (checked when ``offsets`` is a concrete array).
    """
    import os
    if x_tile is None:       # env knobs for kernel experiments
        x_tile = int(os.environ.get("PARIS_BP_XTILE", _XTILE))
    if window_mode is None:
        # v5e A/B history (Gupd/s, 512-class fast): per-window branch
        # ladder 15.6, all-K-window "direct" 35.2, scalar-interval-base
        # "dynamic" 40.5 (and per-angle pl.when variants — tile culling,
        # rare-3rd-window branch — measured 25-30 at the 1024 flagship vs
        # 47 straight-line: scalar branches per (angle, sub-tile) cost
        # more than the gathers they save).
        window_mode = os.environ.get("PARIS_BP_WINDOWS", "dynamic")
    if window_mode not in ("direct", "dynamic"):
        # round-3 cleanup: the experimental "hoist"/"prefetch"/"dynamic1"
        # modes were deleted — the trace-time static window plan (always
        # engaged now that the z grid is a single step) supersedes the
        # dynamic machinery they varied, and none ever recorded a win.
        raise ValueError(f"unknown window_mode {window_mode!r}")
    offsets = jnp.asarray(offsets, jnp.int32)
    if offsets.shape[0] == 3:
        offsets = jnp.concatenate([offsets, jnp.zeros((1,), jnp.int32)])
    ny, nxp, nzp = volume_yxz.shape
    # a (hi, lo) bf16 plane pair selects the 3-pass "x3" matmul path
    # (see split_bf16_planes) — the exact-mode default
    x3 = isinstance(proj_t, (tuple, list))
    if x3:
        proj_t, proj_lo = proj_t
        assert proj_t.dtype == jnp.bfloat16 and proj_lo.dtype == jnp.bfloat16
        assert proj_t.shape == proj_lo.shape
    C, HP, VP = proj_t.shape
    if z_tile is None:
        # v5e A/B (Gupd/s, fast): 512-class 43.4/46.6/50.2 at z_tile
        # 128/256/512 and 1024-class dz1024 67.7 (z_tile 512) vs 69.7
        # (z_tile 1024 = whole block, C=16) — ONE z grid step is best:
        # deepest fixed-cost amortization AND the static trace-time
        # window plan engages (it needs nzp == z_tile).
        z_tile = int(os.environ.get("PARIS_BP_ZTILE", "0")) or nzp
    while nzp % z_tile:      # shallow blocks fall back to lane-width steps
        z_tile //= 2
    assert nxp % _LANE == 0 and nzp % _LANE == 0, (nxp, nzp)
    assert nxp % x_tile == 0, (nxp, x_tile)
    assert VP % _LANE == 0, VP
    if pack_qdq is None:
        # x3 is the exact path: keep two f32 scratches + two gathers
        pack_qdq = precision == jax.lax.Precision.DEFAULT and not x3
    sub = _sublane(proj_t.dtype)
    if not x3 and proj_t.dtype == jnp.bfloat16 \
            and precision == jax.lax.Precision.HIGHEST:
        raise ValueError(
            "bf16 projections imply fast-mode accuracy; HIGHEST matmul "
            "precision cannot recover it — pass f32 projections (or an "
            "(hi, lo) plane pair for the x3 path) for exact accuracy")
    assert HP % sub == 0, (
        f"projection sublane axis {HP} not padded to the {proj_t.dtype} "
        f"quantum {sub}; use pad_projections_t")
    band = min(_h_band_px(grid, x_tile, sub), HP)
    if not pallas_supported(grid, x_tile):
        raise ValueError(
            "geometry's h-span per x-tile exceeds the interpolation band; "
            "use the XLA backend")
    span_w = _v_span_windows(grid, x_tile)
    fori_n = int(os.environ.get("PARIS_BP_FORI", "0"))
    if fori_n and C % fori_n:
        fori_n = 1          # angle count must divide the block size
    det, vol = grid.det, grid.vol
    r_b = min((vol.dim_x / 2.0) * vol.l_vx_x * math.sqrt(2.0),
              abs(grid.d_so) * 0.95)
    den_floor = abs(grid.d_so) - r_b

    # static per-z2 window plan: only valid when the z grid is a single
    # step (the plan indexes sub-tiles by absolute z) and the dynamic
    # machinery would otherwise be engaged
    swin = None
    r_corner = (vol.dim_x / 2.0) * vol.l_vx_x * math.sqrt(2.0)
    if (static_plan is not None and nzp == z_tile
            and VP // _LANE > max(span_w, 2)
            and window_mode == "dynamic"
            and r_corner <= 0.95 * abs(grid.d_so)
            and os.environ.get("PARIS_BP_STATICWIN", "1") != "0"):
        z0s, vls = static_plan
        try:                      # concrete (non-traced) offsets only
            off_np = np.asarray(offsets)
        except jax.errors.TracerArrayConversionError:
            off_np = None
        if off_np is not None:
            assert (int(off_np[2]), int(off_np[3])) == (int(z0s), int(vls)), (
                "static_plan must match offsets[2:4] (see docstring)",
                tuple(off_np[2:4]), static_plan)
        swin = _static_window_plan(
            grid, int(z0s), int(vls), VP, max(1, 2 * (VP // _LANE) - 1),
            z_tile // _LANE)

    kern = functools.partial(
        _bp_kernel, grid=grid, C=C, HP=HP, VP=VP, band=band,
        mm_precision=precision, span_w=span_w, x_tile=x_tile, sub=sub,
        pack=pack_qdq, x3=x3,
        window_mode=window_mode, den_floor=den_floor, z_tile=z_tile,
        debug_variant=int(os.environ.get("PARIS_BP_DEBUG_VARIANT", "0")),
        swin=swin,
        fori=fori_n)

    # Q windows live at 64-lane stride (overlapping), KW = 2*VP/128 - 1:
    # halves the worst-case gather count per (angle, sub-tile) at the
    # cost of doubling the scratch (accounted in pipeline.max_chunk_size)
    KW = max(1, 2 * (VP // _LANE) - 1)
    if pack_qdq:
        scratch = [pltpu.VMEM((C, KW, x_tile, _LANE), jnp.int32)]
    else:
        scratch = [pltpu.VMEM((C, KW, x_tile, _LANE), jnp.float32),
                   pltpu.VMEM((C, KW, x_tile, _LANE), jnp.float32)]

    proj_spec = pl.BlockSpec((C, HP, VP), lambda y, xt, zt: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),     # sin
        pl.BlockSpec(memory_space=pltpu.SMEM),     # cos
        pl.BlockSpec(memory_space=pltpu.SMEM),     # offsets
        proj_spec,                                 # proj_t (hi plane if x3)
    ]
    args = [sin_phi, cos_phi, offsets, proj_t]
    if x3:
        in_specs.append(proj_spec)                 # lo plane
        args.append(proj_lo)
    in_specs.append(
        pl.BlockSpec((1, x_tile, z_tile), lambda y, xt, zt: (y, xt, zt),
                     memory_space=pltpu.VMEM))     # vol in
    args.append(volume_yxz)

    # VMEM ceiling: v5e/v5p cores have 128 MiB (probed; the default
    # Mosaic scoped limit is lower), so large chunks and full-height
    # bands are legal — tell the compiler how much this kernel needs.
    proj_bytes = proj_t.size * proj_t.dtype.itemsize * (2 if x3 else 1)
    def _nbytes(s):
        try:
            return int(np.prod(s.shape)) * jnp.dtype(s.dtype).itemsize
        except (TypeError, AttributeError):
            return 0                       # DMA semaphores etc.
    scratch_bytes = sum(_nbytes(s) for s in scratch)
    block_bytes = 4 * x_tile * z_tile * 4          # in+out, double-buffered
    vmem_limit = min(128 * 1024 * 1024,
                     max(32 * 1024 * 1024,
                         int((proj_bytes + scratch_bytes + block_bytes)
                             * 1.25)))
    pgrid = (ny, nxp // x_tile, nzp // z_tile)
    return pl.pallas_call(
        kern,
        grid=pgrid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, x_tile, z_tile),
                               lambda y, xt, zt: (y, xt, zt),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ny, nxp, nzp), jnp.float32),
        scratch_shapes=scratch,
        input_output_aliases={len(args) - 1: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
    )(*args)


def backproject_chunk_pallas(
    volume: jnp.ndarray,            # (dz, ny, nx) external layout
    projections: jnp.ndarray,       # (C, n_col, n_row) filtered
    sin_phi: jnp.ndarray,
    cos_phi: jnp.ndarray,
    grid: BpGrid,
    z_offset=0,
    roi_offset: Tuple[int, int, int] = (0, 0, 0),
    *,
    interpret: bool = False,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
    pack_qdq: Optional[bool] = None,
    window_mode: Optional[str] = None,
) -> jnp.ndarray:
    """Drop-in replacement for ``backproject_chunk_xla``.

    Converts layouts per call — for repeated chunks prefer keeping the
    accumulator in kernel layout via ``backproject_chunk_pallas_yxz``
    (``pipeline.Reconstructor`` does).
    """
    dz, ny, nx = volume.shape
    rx1, ry1, rz1 = roi_offset
    vk = to_kernel_layout(volume)
    pt = pad_projections_t(projections)
    offs = jnp.stack([
        jnp.asarray(rx1, jnp.int32), jnp.asarray(ry1, jnp.int32),
        jnp.asarray(rz1, jnp.int32) + jnp.asarray(z_offset, jnp.int32),
    ])
    out = backproject_chunk_pallas_yxz(
        vk, pt, sin_phi, cos_phi, grid, offs, interpret=interpret,
        precision=precision, pack_qdq=pack_qdq, window_mode=window_mode)
    return from_kernel_layout(out, (dz, ny, nx))

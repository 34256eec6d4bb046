"""Single-chip FDK reconstruction pipeline.

Replaces the reference's per-projection streaming loop
(src/main.cpp:98-105: load -> h2d -> weight -> filter -> backproject, one
projection at a time) with a TPU-idiomatic design:

  * projections are processed in fixed-size CHUNKS (static shapes, one
    XLA program) — weighting+filtering batch over the whole chunk (FFTs
    want batches), and the backprojection accumulates the full chunk per
    volume pass so HBM volume traffic is amortized by the chunk size;
  * the volume accumulator is DONATED between steps (in-place update,
    no copy — the XLA analog of the reference accumulating in a device
    buffer);
  * host->device feeding is overlapped with device compute via JAX async
    dispatch: while the device runs chunk i, the host stages chunk i+1.

``Reconstructor`` is the reusable compiled program; ``reconstruct`` is
the convenience one-shot driver.
"""

from __future__ import annotations

import functools
from typing import Iterator, Optional, Sequence, Tuple

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
        device=None,
    ):
        self.det = det
        self.vol = vol
        self.chunk_size = int(chunk_size)
        self.block_shape = tuple(block_shape or vol.shape_zyx)
        self.device = device
        self.grid = make_bp_grid(det, vol)
        self._weights = weight_map(det)
        self._spectrum = ramp_filter_spectrum(det.n_row, det.l_px_row)

        if backend == "auto":
            backend = "pallas" if jax.default_backend() == "tpu" else "xla"
        self.backend = backend
        if backend == "pallas":
            from .ops.backprojection_pallas import backproject_chunk_pallas
            self._bp = backproject_chunk_pallas
        elif backend == "xla":
            self._bp = backproject_chunk_xla
        else:
            raise ValueError(f"unknown backend {backend!r}")

        @functools.partial(jax.jit, static_argnames=("z_offset", "roi_offset"),
                           donate_argnums=(0,))
        def _step(volume, chunk, sin_phi, cos_phi, z_offset, roi_offset):
            filtered = preprocess_chunk(
                chunk, self._weights, self._spectrum, det.n_row
            )
            return self._bp(
                volume, filtered, sin_phi, cos_phi, self.grid,
                z_offset=z_offset, roi_offset=roi_offset,
            )

        self._step = _step

    # -- chunk iteration ----------------------------------------------------

    def _chunks(
        self, projections, angles_deg
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
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

    # -- public API ---------------------------------------------------------

    def init_block(self) -> jnp.ndarray:
        z = jnp.zeros(self.block_shape, jnp.float32)
        return jax.device_put(z, self.device) if self.device else z

    def accumulate(
        self,
        volume: jnp.ndarray,
        projections,
        angles_deg,
        *,
        z_offset: int = 0,
        roi_offset: Tuple[int, int, int] = (0, 0, 0),
    ) -> jnp.ndarray:
        """Stream all projections through weight/filter/backproject."""
        for chunk, ang in self._chunks(projections, angles_deg):
            phi = np.deg2rad(ang).astype(np.float32)
            volume = self._step(
                volume,
                jnp.asarray(chunk),
                jnp.asarray(np.sin(phi)),
                jnp.asarray(np.cos(phi)),
                z_offset,
                roi_offset,
            )
        return volume


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
) -> np.ndarray:
    """One-shot FDK reconstruction; returns the (dz, ny, nx) volume."""
    rec = Reconstructor(
        det, vol, chunk_size=chunk_size, backend=backend, block_shape=block_shape
    )
    out = rec.accumulate(
        rec.init_block(), projections, angles_deg,
        z_offset=z_offset, roi_offset=roi_offset,
    )
    return np.asarray(out)

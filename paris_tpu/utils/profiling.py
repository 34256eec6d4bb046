"""Profiling / observability (SURVEY.md §5 tracing).

The reference's only instrumentation was one wall-clock readout and a
per-10-projections log line (src/main.cpp:171-178,
src/backprojection.cpp:65-66).  Here:

  * ``trace()`` wraps a region in a ``jax.profiler`` trace (view with
    TensorBoard / xprof) when a directory is given, else is a no-op;
  * ``ThroughputMeter`` reports voxel-updates/s and projections/s — the
    BASELINE.json north-star metrics — continuously during a run;
  * ``annotate`` names host-side regions inside device traces.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Optional

logger = logging.getLogger("paris_tpu.profiling")

__all__ = ["trace", "annotate", "ThroughputMeter"]


@contextlib.contextmanager
def trace(trace_dir: Optional[str] = None):
    """Profile the enclosed region into ``trace_dir`` (no-op if None)."""
    if not trace_dir:
        yield
        return
    import jax
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", trace_dir)


def annotate(name: str):
    """Named host region (shows up inside jax profiler traces)."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class ThroughputMeter:
    """Accumulates voxel-update / projection counts; logs rates.

    ``report_every`` controls the cadence of progress logs (the
    reference logged every 10th projection; we log on a work-volume
    cadence so huge runs aren't log-bound).
    """

    def __init__(self, voxels_per_block: int, report_every_s: float = 10.0):
        self.voxels = voxels_per_block
        self.t0 = time.perf_counter()
        self._last = self.t0
        self.report_every_s = report_every_s
        self.projections = 0

    def add(self, n_projections: int) -> None:
        self.projections += n_projections
        now = time.perf_counter()
        if now - self._last >= self.report_every_s:
            self._last = now
            self.log()

    @property
    def voxel_updates(self) -> int:
        return self.projections * self.voxels

    def rates(self):
        dt = max(time.perf_counter() - self.t0, 1e-9)
        return self.projections / dt, self.voxel_updates / dt / 1e9

    def log(self) -> None:
        pps, gups = self.rates()
        logger.info("progress: %d projections, %.1f proj/s, %.1f Gupd/s",
                    self.projections, pps, gups)

"""Benchmark: backprojection throughput on the flagship config.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

North-star metric (BASELINE.json): backprojection Gvoxel-updates/s/chip.
``vs_baseline`` is the achieved fraction of the chip's memory-roofline
ceiling for a chunked backprojection (HBM_BW / (8 bytes / chunk_size) —
see BASELINE.md), i.e. >1.0 means past the naive per-projection
streaming bound.

Defaults measure the flagship BASELINE config: 1024-class volume in
ONE whole z-block (v5e's 128MiB VMEM holds the full-height projection
chunk; measured round 3: single block C=24 72.2 Gupd/s vs the round-2
dz=512 banded split's 56.7), accuracy "fast" (bf16 interpolation
tables — the CUDA texture unit's precision class — which passes the
1e-3 RMSE gate; see BASELINE.md for the exact/fast table).

Env knobs: PARIS_BENCH_SIZE (default 1024), PARIS_BENCH_CHUNK (24),
PARIS_BENCH_BACKEND (pallas|xla), PARIS_BENCH_ACCURACY (fast|exact),
PARIS_BENCH_BLOCK_DZ (0=auto, -1=single full block, N=forced).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    size = int(os.environ.get("PARIS_BENCH_SIZE", "1024"))
    C = int(os.environ.get("PARIS_BENCH_CHUNK", "24"))
    backend = os.environ.get("PARIS_BENCH_BACKEND", "auto")
    accuracy = os.environ.get("PARIS_BENCH_ACCURACY", "fast")

    import jax
    import jax.numpy as jnp
    from paris_tpu.geometry import (DetectorGeometry, derive_volume_geometry,
                                    detector_row_band)
    from paris_tpu.pipeline import Reconstructor, max_chunk_size

    # geometry scaled so the derived volume is ~size^3
    det = DetectorGeometry(
        n_row=size, n_col=size, l_px_row=1.0, l_px_col=1.0,
        delta_s=0.0, delta_t=0.0, d_so=8.0 * size, d_od=4.0 * size,
        delta_phi=0.5,
    )
    vol = derive_volume_geometry(det)

    # 1024-class detectors exceed the VMEM projection budget at full
    # height: bench one z-block with the detector-row band + chunk the
    # app's planner would pick (app.run_job does the same per block).
    block_shape = None
    v_band = None
    block_dz = int(os.environ.get("PARIS_BENCH_BLOCK_DZ", "0"))
    if block_dz == 0 and size >= 1024:
        # v5e A/B round 3 (single-z-step kernel, 96MiB VMEM budget,
        # C=24 fast): dz 512/1024 -> 58.2/72.2 Gupd/s; one whole
        # 1024-slice block with the full-height projection band wins
        # (the app driver reaches the same shape via _perf_block_dz)
        block_dz = 1024
    if block_dz < 0:
        # full-volume single block: no banding, VMEM-clamped chunk
        C = min(C, max_chunk_size(det, accuracy=accuracy))
        block_dz = 0
    if block_dz:
        n_blocks = -(-vol.dim_z // block_dz)
        v_band = max(
            detector_row_band(det, vol, i * block_dz, block_dz)[1]
            - detector_row_band(det, vol, i * block_dz, block_dz)[0]
            for i in range(n_blocks))
        if v_band >= det.n_col:
            v_band = None
        block_shape = (block_dz, vol.dim_y, vol.dim_x)
        C = min(C, max_chunk_size(det, v_band, accuracy=accuracy))

    rec = Reconstructor(det, vol, chunk_size=C, backend=backend,
                        block_shape=block_shape, v_band_width=v_band,
                        accuracy=accuracy)
    rng = np.random.default_rng(0)
    chunk = rng.standard_normal((C, det.n_col, det.n_row)).astype(np.float32)
    phi = np.deg2rad(np.arange(C) * det.delta_phi).astype(np.float32)
    sin = jnp.asarray(np.sin(phi))
    cos = jnp.asarray(np.cos(phi))
    chunk_j = jnp.asarray(chunk)
    from paris_tpu.pipeline import identity_qparams
    qparams = jnp.asarray(identity_qparams(C))   # f32 chunk, no dequant
    z0 = 0
    vlo = rec._v_band_lo(z0) if rec.backend == "pallas" else 0
    offs = jnp.asarray([0, 0, z0, vlo], jnp.int32)
    extra = (z0, vlo) if rec.backend == "pallas" else ()

    volume = rec.init_block()
    # compile + warmup (materialize: block_until_ready alone can return
    # before donated-alias pallas outputs are actually computed)
    volume = rec._step(volume, chunk_j, sin, cos, qparams, offs, *extra)
    float(jnp.sum(volume))

    block_voxels = (block_shape[0] * block_shape[1] * block_shape[2]
                    if block_shape else vol.voxels)
    iters = min(100, max(3, int(np.ceil(2.0e10 / (block_voxels * C)))))
    t0 = time.perf_counter()
    for _ in range(iters):
        volume = rec._step(volume, chunk_j, sin, cos, qparams, offs, *extra)
    float(jnp.sum(volume))
    dt = (time.perf_counter() - t0) / iters

    updates = block_voxels * C
    gups = updates / dt / 1e9

    # speed-of-light reference (BASELINE.md): per-projection streaming
    # bound HBM_BW / 8 bytes-per-update; >1.0 means chunking has pushed
    # past what any one-projection-at-a-time implementation can reach.
    hbm_bw = float(os.environ.get("PARIS_HBM_GBPS", "819")) * 1e9  # v5e default
    ceiling_gups = hbm_bw / 8.0 / 1e9
    result = {
        "metric": (f"backprojection_gvoxel_updates_per_s_{vol.dim_x}cube_"
                   f"{rec.backend}_{accuracy}"),
        "value": round(gups, 2),
        "unit": "Gupd/s/chip",
        "vs_baseline": round(gups / ceiling_gups, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

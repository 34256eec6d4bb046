"""Benchmark harness for the five BASELINE.json configs.

Each config reports a JSON object; run with
``python benchmarks/run_configs.py [--configs 1,2,3] [--out results.json]``.

  1. Shepp-Logan 64^3, 180 proj   — correctness gate (RMSE vs golden FDK)
  2. 256-class single chip        — full-chain throughput + RMSE
  3. 1024-class streaming blocks  — z-split + ddbvf + HIS streaming
  4. offset-detector ROI          — correctness on ROI crop
  5. pod-scale sharding           — weak scaling over the device mesh
     (on a single chip this measures the mesh-of-1 path; multi-chip
     numbers require a pod slice)

Synthetic scans are generated with the analytic phantom projector so no
external data is needed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rel_rmse(a, b):
    scale = float(np.abs(b).max()) or 1.0
    return float(np.sqrt(np.mean((a - b) ** 2))) / scale


def config1():
    """64^3 Shepp-Logan vs golden oracle (CPU-runnable)."""
    from paris_tpu.geometry import DetectorGeometry, derive_volume_geometry
    from paris_tpu.golden import golden_fdk
    from paris_tpu.phantom import cone_beam_project
    from paris_tpu.pipeline import reconstruct

    det = DetectorGeometry(64, 64, 2.0, 2.0, 0.0, 0.0, 500.0, 500.0, 2.0)
    vol = derive_volume_geometry(det)
    angles = np.arange(180, dtype=np.float32) * 2.0
    projs = cone_beam_project(det, angles,
                              scale_mm=vol.dim_x * vol.l_vx_x / 2 * 0.9)
    t0 = time.perf_counter()
    ours = reconstruct(det, vol, projs, angles, chunk_size=16)
    dt = time.perf_counter() - t0
    golden = golden_fdk(projs, angles, det, vol)
    return {
        "config": 1, "name": "shepp_logan_64",
        "rel_rmse_vs_golden": _rel_rmse(ours, golden),
        "gate": "<= 1e-3", "pass": _rel_rmse(ours, golden) <= 1e-3,
        "seconds": round(dt, 3),
    }


def _throughput_run(det, n_proj, chunk, label, config_id, quality_probe=True):
    from paris_tpu.geometry import derive_volume_geometry
    from paris_tpu.pipeline import Reconstructor
    import jax.numpy as jnp
    import jax

    vol = derive_volume_geometry(det)
    rec = Reconstructor(det, vol, chunk_size=chunk)
    rng = np.random.default_rng(0)
    data = rng.standard_normal((chunk, det.n_col, det.n_row)).astype(np.float32)
    phi = np.deg2rad(np.arange(chunk) * det.delta_phi).astype(np.float32)
    args = (jnp.asarray(data), jnp.asarray(np.sin(phi)),
            jnp.asarray(np.cos(phi)), jnp.zeros((4,), jnp.int32))
    v = rec.init_block()
    v = rec._step(v, *args)
    float(jnp.sum(v))   # materialize: see bench.py timing note
    n_chunks = max(1, n_proj // chunk)
    reps = min(n_chunks, max(3, int(2e10 / (vol.voxels * chunk))))
    t0 = time.perf_counter()
    for _ in range(reps):
        v = rec._step(v, *args)
    float(jnp.sum(v))
    dt = (time.perf_counter() - t0) / reps
    gups = vol.voxels * chunk / dt / 1e9
    return {
        "config": config_id, "name": label,
        "volume": vol.shape_zyx, "backend": rec.backend,
        "gupd_per_s_per_chip": round(gups, 2),
        "est_seconds_full_scan": round(dt * n_chunks, 2),
    }


def config2():
    from paris_tpu.geometry import DetectorGeometry
    det = DetectorGeometry(256, 256, 1.0, 1.0, 0.0, 0.0, 2048.0, 1024.0, 0.5)
    return _throughput_run(det, 720, 8, "single_chip_256", 2)


def config3():
    """1024-class: z-blocks, HIS streaming, ddbvf output, resume manifest."""
    from paris_tpu.geometry import DetectorGeometry, derive_volume_geometry
    from paris_tpu.app import ReconstructionJob, run_job
    from paris_tpu.io.his import write_his
    from paris_tpu.io import ddbvf

    det = DetectorGeometry(1024, 1024, 0.25, 0.25, 0.0, 0.0,
                           2048.0, 1024.0, 0.5)
    vol = derive_volume_geometry(det)
    n_proj = int(os.environ.get("PARIS_BENCH_CFG3_NPROJ", "64"))
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        pdir = os.path.join(d, "proj")
        os.makedirs(pdir)
        frames = (rng.uniform(0, 60000, (n_proj, det.n_col, det.n_row))
                  .astype(np.uint16))
        for i in range(0, n_proj, 16):
            write_his(os.path.join(pdir, f"b{i:05d}.his"), frames[i:i + 16],
                      number_dtype=np.uint16)
        job = ReconstructionJob(
            det=det, input_path=pdir, output_path=d, prefix="c3",
            chunk_size=8, hbm_budget_bytes=6 << 30,
        )
        t0 = time.perf_counter()
        out = run_job(job)
        dt = time.perf_counter() - t0
        dims = ddbvf.open_meta(out)
    gups = vol.dim_x * vol.dim_y * vol.dim_z * n_proj / dt / 1e9
    return {
        "config": 3, "name": "streaming_1024_blocks",
        "volume": list(dims), "n_proj": n_proj,
        "seconds": round(dt, 1),
        "gupd_per_s_end_to_end": round(gups, 2),
    }


def config4():
    """Offset-detector ROI correctness at reduced size (CPU-feasible golden)."""
    from paris_tpu.geometry import (DetectorGeometry, RegionOfInterest,
                                    apply_roi, derive_volume_geometry)
    from paris_tpu.golden import golden_fdk
    from paris_tpu.phantom import cone_beam_project
    from paris_tpu.pipeline import reconstruct

    det = DetectorGeometry(96, 80, 2.0, 2.0, 4.6, -1.5, 500.0, 500.0, 3.0)
    vol = derive_volume_geometry(det)
    angles = np.arange(120, dtype=np.float32) * 3.0
    projs = cone_beam_project(det, angles,
                              scale_mm=vol.dim_x * vol.l_vx_x / 2 * 0.8)
    roi = RegionOfInterest(x1=20, x2=69, y1=25, y2=64, z1=10, z2=49)
    roi_geo = apply_roi(vol, roi)
    ours = reconstruct(det, vol, projs, angles, chunk_size=16,
                       roi_offset=(roi.x1, roi.y1, roi.z1),
                       block_shape=(roi_geo.dim_z, roi_geo.dim_y,
                                    roi_geo.dim_x))
    golden = golden_fdk(projs, angles, det, vol, dz=roi_geo.dim_z,
                        dy=roi_geo.dim_y, dx=roi_geo.dim_x,
                        roi_offset=(roi.x1, roi.y1, roi.z1))
    rmse = _rel_rmse(ours, golden)
    return {
        "config": 4, "name": "offset_detector_roi",
        "rel_rmse_vs_golden": rmse, "gate": "<= 1e-3", "pass": rmse <= 1e-3,
    }


def config5():
    """Mesh scaling: per-device throughput at mesh size n (weak scaling)."""
    import jax
    from paris_tpu.geometry import DetectorGeometry, derive_volume_geometry
    from paris_tpu.parallel import DistributedReconstructor, make_z_mesh

    det = DetectorGeometry(256, 256, 1.0, 1.0, 0.0, 0.0, 2048.0, 1024.0, 0.5)
    vol = derive_volume_geometry(det)
    n_dev = len(jax.devices())
    mesh = make_z_mesh()
    block = -(-vol.dim_z // (128 * n_dev)) * (128 * n_dev) \
        if jax.default_backend() == "tpu" else \
        -(-vol.dim_z // n_dev) * n_dev
    chunk = 8 * n_dev
    rec = DistributedReconstructor(det, vol, mesh=mesh, chunk_size=chunk,
                                   block_dz=block)
    rng = np.random.default_rng(0)
    projs = rng.standard_normal((chunk, det.n_col, det.n_row)).astype(np.float32)
    angles = np.arange(chunk, dtype=np.float32) * det.delta_phi
    import jax.numpy as jnp
    v = rec.accumulate(rec.init_block(), projs, angles)
    float(jnp.sum(v))
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        v = rec.accumulate(v, projs, angles)
    float(jnp.sum(v))
    dt = (time.perf_counter() - t0) / reps
    updates = vol.dim_x * vol.dim_y * block * chunk
    return {
        "config": 5, "name": "mesh_scaling",
        "mesh_devices": n_dev, "backend": rec.backend,
        "gupd_per_s_total": round(updates / dt / 1e9, 2),
        "gupd_per_s_per_device": round(updates / dt / 1e9 / n_dev, 2),
    }


CONFIGS = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    results = []
    for cid in [int(c) for c in args.configs.split(",")]:
        try:
            r = CONFIGS[cid]()
        except Exception as e:  # keep the harness going
            r = {"config": cid, "error": f"{type(e).__name__}: {e}"}
        print(json.dumps(r), flush=True)
        results.append(r)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()

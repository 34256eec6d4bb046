"""BASELINE config 5 at its stated problem size, single chip.

2048^3 volume (32 GB — twice the chip's HBM) reconstructed end-to-end
through ``run_job``: synthetic Shepp-Logan HIS projections streamed from
disk, the auto HBM-budget planner choosing the z-split, detector-row
banding, ddbvf output — the case the reference's subvolume machinery
existed for (src/cuda/subvolume_information.cpp:63-119, geometry.h:59-69).

Gates:
  * completes without OOM with NO manual --hbm-budget-gb (auto planner);
  * >1 z-block actually planned;
  * seam + content: a 4-slice slab straddling the first block seam is
    read back from the 32 GB ddbvf and RMSE-checked against the NumPy
    golden oracle (<= 1e-3 relative).

The projection count defaults to 360 (the 3600-projection scan at
--quality 10); pass PARIS_BENCH_CFG5_NPROJ=3600 for the full scan.
Writes benchmarks/results_round2.json (merging into any existing list).

Run:  python benchmarks/full_scale_2048.py [--out benchmarks/results_round3.json]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO,
                    format="%(asctime)s %(name)s: %(message)s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results_round3.json"))
    ap.add_argument("--accuracy", default="fast",
                    choices=["fast", "exact"])
    ap.add_argument("--workdir", default=None,
                    help="scratch dir (needs ~40 GB); default: mkdtemp")
    args = ap.parse_args()

    from paris_tpu.geometry import DetectorGeometry, derive_volume_geometry
    from paris_tpu.app import ReconstructionJob, run_job
    from paris_tpu.golden import golden_fdk
    from paris_tpu.phantom import cone_beam_project
    from paris_tpu.io.his import write_his
    from paris_tpu.io import ddbvf

    n_proj = int(os.environ.get("PARIS_BENCH_CFG5_NPROJ", "360"))
    det = DetectorGeometry(2048, 2048, 0.25, 0.25, 0.0, 0.0,
                           2048.0, 1024.0, 360.0 / n_proj)
    vol = derive_volume_geometry(det)
    print(f"volume: {vol.shape_zyx}, {4 * vol.voxels / 2**30:.1f} GB",
          flush=True)
    angles = np.arange(n_proj, dtype=np.float32) * det.delta_phi
    scale = vol.dim_x * vol.l_vx_x / 2 * 0.9

    res = {"config": 5, "name": "full_scale_2048_single_chip",
           "volume": vol.shape_zyx, "n_proj": n_proj,
           "accuracy": args.accuracy}

    workdir = args.workdir or tempfile.mkdtemp(prefix="paris2048_")
    pdir = os.path.join(workdir, "proj")
    os.makedirs(pdir, exist_ok=True)
    t0 = time.perf_counter()
    all_projs = np.empty((n_proj, det.n_col, det.n_row), np.float32)  # ~6 GB
    if len(os.listdir(pdir)) == -(-n_proj // 8):
        # pinned workdir with a previous run's synthesis: re-read it
        from paris_tpu.io.his import read_his
        pos = 0
        for f in sorted(os.listdir(pdir)):
            frames = read_his(os.path.join(pdir, f))
            all_projs[pos:pos + len(frames)] = frames
            pos += len(frames)
        assert pos == n_proj, (pos, n_proj)
        res["synthesize_seconds"] = 0.0
        print(f"reusing {n_proj} synthesized projections", flush=True)
    else:
        # stream phantom generation -> HIS in batches (f32 frames, 16 MB)
        for i in range(0, n_proj, 8):
            chunk_angles = angles[i:i + 8]
            projs = cone_beam_project(det, chunk_angles, scale_mm=scale)
            all_projs[i:i + len(chunk_angles)] = projs
            write_his(os.path.join(pdir, f"b{i:05d}.his"), projs,
                      number_dtype=np.float32)
        res["synthesize_seconds"] = round(time.perf_counter() - t0, 1)
        print(f"synthesized {n_proj} projections in "
              f"{res['synthesize_seconds']}s", flush=True)

    job = ReconstructionJob(
        det=det, input_path=pdir, output_path=workdir, prefix="c5",
        chunk_size=8, accuracy=args.accuracy,
        # hbm_budget_bytes=None -> auto from device memory_stats (the gate);
        # resume: a pinned workdir keeps completed blocks across reruns
        resume=args.workdir is not None,
    )

    # replicate run_job's planning to locate the first block seam (the
    # job itself plans identically; asserting >1 block is part of the
    # gate) — INCLUDING the finalize/write-overlap extent adjustment
    # (app.py), else the "seam" slab lands in a block interior
    from paris_tpu.geometry import plan_z_blocks
    from paris_tpu.app import (_auto_hbm_budget, _budget_max_dz,
                               _overlap_block_dz, _overlap_free_est,
                               _perf_block_dz)
    budget = _auto_hbm_budget()
    res["auto_hbm_budget_gb"] = round(budget / 2**30, 2) if budget else None
    proj_buffer = 4 * 4 * det.n_row * det.n_col * job.chunk_size
    block_dz = _perf_block_dz(job, vol, vol, budget, proj_buffer)
    if block_dz is not None and budget is not None:
        block_dz = min(block_dz, _budget_max_dz(budget, proj_buffer, vol))
    info = plan_z_blocks(vol, hbm_budget_bytes=budget,
                         proj_buffer_bytes=proj_buffer, block_dz=block_dz)
    if os.environ.get("PARIS_WRITE_OVERLAP", "1") != "0" and info.num > 1:
        free_est = _overlap_free_est(budget, budget_is_auto=True)
        if free_est is not None:
            dz2 = _overlap_block_dz(vol, free_est, proj_buffer,
                                    info.dim_z_padded)
            if dz2 is not None:
                info = plan_z_blocks(vol, hbm_budget_bytes=budget,
                                     proj_buffer_bytes=proj_buffer,
                                     block_dz=dz2)
    res["planned_blocks"] = info.num
    print(f"planned {info.num} blocks of {info.dim_z_padded}", flush=True)
    # PIN the planned extent into the job: the auto planner's live
    # free-HBM probe could drift between this plan and run_job's own
    # (ADVICE r4 — the "seam" slab silently gating an interior slab);
    # with block_dz forced, the job's block map IS this plan.  The
    # auto-planning itself (the config-5 gate) was still exercised by
    # the plan above.
    job = dataclasses.replace(job, block_dz=info.dim_z_padded)

    t0 = time.perf_counter()
    out = run_job(job)
    dt = time.perf_counter() - t0
    res["reconstruct_seconds"] = round(dt, 1)
    res["gupd_per_s_end_to_end"] = round(vol.voxels * n_proj / dt / 1e9, 2)

    # seam + content gate: 4-slice slab straddling the first block seam
    dims = ddbvf.open_meta(out)
    seam = info.blocks[1].z0 if info.num > 1 else vol.dim_z // 2
    seam0 = max(0, seam - 2)
    slab = ddbvf.read_slices(out, seam0, 4)
    t0 = time.perf_counter()
    golden = golden_fdk(all_projs, angles, det, vol, dz=4, z_offset=seam0)
    res["golden_seconds"] = round(time.perf_counter() - t0, 1)
    scale_ref = float(np.abs(golden).max()) or 1.0
    rmse = float(np.sqrt(np.mean((slab - golden) ** 2))) / scale_ref
    res["seam_slab_z0"] = seam0
    res["rel_rmse_vs_golden_seam_slab"] = rmse
    res["gate"] = "<= 1e-3, auto-planned blocks > 1"
    res["pass"] = (rmse <= 1e-3 and info.num > 1
                   and dims == (vol.dim_x, vol.dim_y, vol.dim_z))

    print(json.dumps(res), flush=True)
    existing = []
    if os.path.exists(args.out):
        try:
            existing = json.load(open(args.out))
        except Exception:
            existing = []
    existing = [r for r in existing if r.get("name") != res["name"]]
    existing.append(res)
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=2)
    # clean the 38 GB of scratch unless the caller pinned a workdir
    if args.workdir is None:
        import shutil
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()

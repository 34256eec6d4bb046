"""BASELINE config 3: streaming full-scan reconstruction at 1024-class.

Streams a Shepp-Logan HIS scan (default 360 projections = the 3600-scan
at --quality 10; set PARIS_BENCH_CFG3_NPROJ=3600 for the full scan)
from disk through ``run_job`` on the real chip: HIS decode -> prefetch
thread -> h2d -> weight/filter -> pallas backprojection -> ddbvf, the
reference's per-projection hot loop (src/main.cpp:98-105) as one
streaming pipeline.

Reports the per-stage split run_job already times (StageTimers):
``reconstruct`` covers disk streaming + device compute (overlapped via
the prefetch thread and XLA async dispatch); ``finalize+write`` is the
volume readback + ddbvf write.  On this environment the device tunnel
is asymmetric (h2d ~1 GB/s, d2h ~27 MB/s measured — a tunnel artifact,
not a pipeline property; a PCIe-attached host moves >10 GB/s), so the
reconstruct-phase rate is the design-relevant number and is gated at
within 2x of the kernel-only flagship throughput.

Writes benchmarks/results_round4.json (merging).  Set
PARIS_BENCH_CFG3_SCANDIR to a persistent directory to synthesize the
HIS scan once and reuse it across runs (the 3600-projection synthesis
costs ~20 min of host time on this 2-core box).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import re
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _TimerCapture(logging.Handler):
    """Collect run_job's StageTimers report line.

    Format (utils/logging.py): ``stage timings: reconstruct: 1m23s
    (2 calls); finalize+write: 45.20s (2 calls)``.
    """

    def __init__(self):
        super().__init__()
        self.stages = {}

    def emit(self, record):
        msg = record.getMessage()
        if not msg.startswith("stage timings:"):
            return
        for name, mins, secs in re.findall(
                r"([\w+/-]+): (?:(\d+)m)?([\d.]+)s \(\d+ calls\)", msg):
            self.stages[name] = int(mins or 0) * 60 + float(secs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results_round4.json"))
    ap.add_argument("--accuracy", default="fast", choices=["fast", "exact"])
    ap.add_argument("--size", type=int, default=1024)
    args = ap.parse_args()

    from paris_tpu.geometry import DetectorGeometry, derive_volume_geometry
    from paris_tpu.app import ReconstructionJob, run_job
    from paris_tpu.golden import golden_fdk
    from paris_tpu.phantom import cone_beam_project
    from paris_tpu.io.his import write_his
    from paris_tpu.io import ddbvf

    size = args.size
    n_proj = int(os.environ.get("PARIS_BENCH_CFG3_NPROJ", "360"))
    det = DetectorGeometry(size, size, 1.0, 1.0, 0.0, 0.0,
                           8.0 * size, 4.0 * size, 360.0 / n_proj)
    vol = derive_volume_geometry(det)
    angles = np.arange(n_proj, dtype=np.float32) * det.delta_phi
    scale = vol.dim_x * vol.l_vx_x / 2 * 0.9

    res = {"config": 3, "name": f"streaming_full_scan_{size}",
           "volume": vol.shape_zyx, "n_proj": n_proj,
           "accuracy": args.accuracy}

    with tempfile.TemporaryDirectory(prefix="paris_cfg3_") as workdir:
        scandir = os.environ.get("PARIS_BENCH_CFG3_SCANDIR")
        pdir = os.path.join(scandir or workdir, "proj")
        t0 = time.perf_counter()
        all_projs = np.empty((n_proj, det.n_col, det.n_row), np.float32)
        def _cache_matches() -> bool:
            # count AND frame shape: a scandir synthesized at another
            # --size must not be silently reused
            if not (os.path.isdir(pdir)
                    and len(os.listdir(pdir)) == -(-n_proj // 8)):
                return False
            from paris_tpu.io.his import read_his
            first = read_his(os.path.join(pdir, sorted(os.listdir(pdir))[0]))
            return first.shape[1:] == (det.n_col, det.n_row)

        if _cache_matches():
            from paris_tpu.io.his import read_his
            for i, name in enumerate(sorted(os.listdir(pdir))):
                fr = read_his(os.path.join(pdir, name))
                all_projs[i * 8:i * 8 + len(fr)] = fr
            res["synthesize_seconds"] = 0.0
            print(f"reusing cached scan in {pdir} "
                  f"(read back in {time.perf_counter() - t0:.0f}s)",
                  flush=True)
        else:
            os.makedirs(pdir, exist_ok=True)
            for i in range(0, n_proj, 8):
                p = cone_beam_project(det, angles[i:i + 8], scale_mm=scale)
                all_projs[i:i + len(p)] = p
                write_his(os.path.join(pdir, f"b{i:05d}.his"), p,
                          number_dtype=np.float32)
            res["synthesize_seconds"] = round(time.perf_counter() - t0, 1)
            print(f"synthesized {n_proj} projections in "
                  f"{res['synthesize_seconds']}s", flush=True)

        cap = _TimerCapture()
        logging.getLogger("paris_tpu.app").addHandler(cap)
        logging.getLogger("paris_tpu.app").setLevel(logging.INFO)

        # WARMUP: a 16-projection job with the same geometry/config
        # shares the compiled step (pipeline._STEP_CACHE), so the timed
        # run below measures streaming, not the tunnel's remote-compile
        # latency (measured 37-424 s for this program).  Deployed
        # services hold the compiled step the same way.
        wdir = os.path.join(workdir, "warm")
        os.makedirs(os.path.join(wdir, "proj"))
        write_his(os.path.join(wdir, "proj", "w.his"), all_projs[:16],
                  number_dtype=np.float32)
        t0 = time.perf_counter()
        run_job(ReconstructionJob(
            det=det, input_path=os.path.join(wdir, "proj"),
            output_path=wdir, prefix="warm", accuracy=args.accuracy))
        res["warmup_seconds"] = round(time.perf_counter() - t0, 1)
        cap.stages.clear()

        job = ReconstructionJob(
            det=det, input_path=pdir, output_path=workdir, prefix="c3",
            accuracy=args.accuracy)
        t0 = time.perf_counter()
        out = run_job(job)
        dt = time.perf_counter() - t0
        updates = vol.voxels * n_proj
        res["reconstruct_seconds"] = round(cap.stages.get("reconstruct", dt), 1)
        res["finalize_write_seconds"] = round(
            cap.stages.get("finalize+write", 0.0), 1)
        res["end_to_end_seconds"] = round(dt, 1)
        res["gupd_per_s_stream_reconstruct"] = round(
            updates / cap.stages.get("reconstruct", dt) / 1e9, 2)
        res["gupd_per_s_end_to_end"] = round(updates / dt / 1e9, 2)
        res["proj_per_s_stream"] = round(
            n_proj / cap.stages.get("reconstruct", dt), 1)

        # content gate: 4-slice slab at the volume center vs the oracle
        mid = vol.dim_z // 2 - 2
        slab = ddbvf.read_slices(out, mid, 4)
        golden = golden_fdk(all_projs, angles, det, vol, dz=4, z_offset=mid)
        scale_ref = float(np.abs(golden).max()) or 1.0
        rmse = float(np.sqrt(np.mean((slab - golden) ** 2))) / scale_ref
        res["rel_rmse_vs_golden_center_slab"] = rmse

        # kernel-only flagship reference for the 2x gate (BENCH round 3)
        kernel_only = float(os.environ.get("PARIS_BENCH_KERNEL_GUPS", "72.2"))
        res["kernel_only_gupd_per_s"] = kernel_only
        res["gate"] = "rmse <= 1e-3; stream-reconstruct >= kernel/2"
        res["pass"] = (rmse <= 1e-3 and
                       res["gupd_per_s_stream_reconstruct"] >= kernel_only / 2)

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


if __name__ == "__main__":
    main()

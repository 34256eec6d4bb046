"""Chip A/B: distributed driver (mesh of 1) vs single-chip driver.

VERDICT r3 item 3 "done" criterion.  The round-3 distributed path did
a synchronous per-chunk ``device_put`` inside the step loop — no
staging ahead — so on real hardware it serialized transfer and
compute.  Round 4 routes both drivers through the same staged
streaming (``pipeline.stage_stream``); this benchmark runs the SAME
job through ``run_job`` and through ``run_job_distributed`` on a mesh
of one real chip and compares the reconstruct-phase rates.

Uses the persistent cfg3 scan (PARIS_BENCH_CFG3_SCANDIR) decimated by
--quality; writes benchmarks/results_round4.json (merging).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _TimerCapture(logging.Handler):
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
    ap.add_argument("--quality", type=int, default=10)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results_round4.json"))
    args = ap.parse_args()

    scandir = os.environ.get("PARIS_BENCH_CFG3_SCANDIR", "/tmp/cfg3_scan")
    pdir = os.path.join(scandir, "proj")
    assert os.path.isdir(pdir), f"no cached scan at {pdir}"

    from paris_tpu.app import ReconstructionJob, run_job
    from paris_tpu.geometry import DetectorGeometry
    from paris_tpu.parallel.app import run_job_distributed

    size = args.size
    det = DetectorGeometry(size, size, 1.0, 1.0, 0.0, 0.0,
                           8.0 * size, 4.0 * size, 360.0 * args.quality / 3600)
    n_proj = 3600 // args.quality

    caps = {}
    for mode in ("single", "distributed"):
        cap = _TimerCapture()
        for lg in ("paris_tpu.app", "paris_tpu.parallel.app"):
            logging.getLogger(lg).addHandler(cap)
            logging.getLogger(lg).setLevel(logging.INFO)
        out = os.path.join(scandir, f"ab_{mode}")
        job = ReconstructionJob(
            det=det, input_path=pdir, output_path=out, prefix="v",
            quality=args.quality, accuracy="fast")
        if mode == "single":
            run_job(job)
        else:
            run_job_distributed(job)
        caps[mode] = cap.stages
        for lg in ("paris_tpu.app", "paris_tpu.parallel.app"):
            logging.getLogger(lg).removeHandler(cap)
        print(mode, cap.stages, flush=True)

    res = {"name": "dist_parity_ab_mesh1", "n_proj": n_proj,
           "reconstruct_s": {m: caps[m].get("reconstruct") for m in caps}}
    r_single = n_proj / caps["single"]["reconstruct"]
    r_dist = n_proj / caps["distributed"]["reconstruct"]
    res["proj_per_s"] = {"single": round(r_single, 1),
                         "distributed": round(r_dist, 1)}
    res["ratio_dist_over_single"] = round(r_dist / r_single, 3)
    res["gate"] = "distributed reconstruct-phase rate >= 0.85x single"
    res["pass"] = res["ratio_dist_over_single"] >= 0.85

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

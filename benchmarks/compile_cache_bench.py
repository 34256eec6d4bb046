"""Instant start: two consecutive run_job PROCESSES on chip.

VERDICT r3 item 1.  The reference binary reconstructs immediately
(src/main.cpp:112-178); this framework's flagship step costs minutes of
remote Mosaic/XLA compile per process.  With the persistent
compiled-step cache (paris_tpu/compile_cache.py) only the FIRST process
ever pays it:

  * process 1 (cold, empty cache): run_job on a 16-projection scan at
    the config-3 flagship geometry — compiles the step, serializes it;
  * process 2 (fresh interpreter, same cache): identical job — loads
    the executable; its time-to-first-chunk must be seconds.

Both workers report the wall time from interpreter start to the
driver's "first chunk accumulated" log line (app.py) — the honest
time-to-first-chunk through the REAL run_job path — plus total wall.
Writes benchmarks/results_round4.json (merging).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(cfg: dict) -> None:
    t_start = time.perf_counter()
    import logging

    import numpy as np  # noqa: F401

    from paris_tpu.app import ReconstructionJob, run_job
    from paris_tpu.geometry import DetectorGeometry

    marks = {}

    class Mark(logging.Handler):
        def emit(self, record):
            if "first chunk accumulated" in record.getMessage():
                marks["first_chunk_s"] = time.perf_counter() - t_start

    logging.getLogger("paris_tpu.app").addHandler(Mark())
    logging.getLogger("paris_tpu.app").setLevel(logging.INFO)

    run_job(ReconstructionJob(
        det=DetectorGeometry(**cfg["det"]), input_path=cfg["input"],
        output_path=cfg["output"], prefix=cfg["prefix"], accuracy="fast"))
    import jax
    marks["platform"] = jax.default_backend()
    marks["total_s"] = time.perf_counter() - t_start
    print("BENCH-RESULT " + json.dumps(marks), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", default=None)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results_round4.json"))
    args = ap.parse_args()
    if args.worker:
        worker(json.loads(args.worker))
        return

    import jax
    jax.config.update("jax_platforms", "cpu")   # parent stays off-chip
    import numpy as np

    from paris_tpu.geometry import DetectorGeometry, derive_volume_geometry
    from paris_tpu.io.his import write_his
    from paris_tpu.phantom import cone_beam_project

    size = args.size
    n_proj = 3600
    det_kw = dict(n_row=size, n_col=size, l_px_row=1.0, l_px_col=1.0,
                  delta_s=0.0, delta_t=0.0, d_so=8.0 * size,
                  d_od=4.0 * size, delta_phi=360.0 / n_proj)
    det = DetectorGeometry(**det_kw)
    vol = derive_volume_geometry(det)
    scale = vol.dim_x * vol.l_vx_x / 2 * 0.9

    res = {"name": f"compile_cache_instant_start_{size}",
           "det": f"{size}x{size}", "runs": []}
    with tempfile.TemporaryDirectory(prefix="paris_ccache_") as workdir:
        pdir = os.path.join(workdir, "proj")
        os.makedirs(pdir)
        angles = np.arange(16, dtype=np.float32) * det.delta_phi
        write_his(os.path.join(pdir, "w.his"),
                  cone_beam_project(det, angles, scale_mm=scale),
                  number_dtype=np.float32)
        cache = os.path.join(workdir, "step-cache")
        # PREPEND the repo: replacing PYTHONPATH would drop site dirs
        # (e.g. the TPU plugin's sitecustomize) and silently demote the
        # workers to CPU
        env = dict(os.environ, PARIS_COMPILE_CACHE=cache)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        for label in ("cold", "warm"):
            cfg = {"det": det_kw, "input": pdir,
                   "output": os.path.join(workdir, label), "prefix": label}
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--worker", json.dumps(cfg)],
                env=env, capture_output=True, text=True, timeout=3000)
            line = next((ln for ln in p.stdout.splitlines()
                         if ln.startswith("BENCH-RESULT ")), None)
            assert p.returncode == 0 and line, (
                f"{label} worker failed:\n{p.stdout}\n{p.stderr[-4000:]}")
            marks = json.loads(line.split(" ", 1)[1])
            marks["run"] = label
            res["runs"].append(marks)
            print(label, marks, flush=True)
        res["cache_entries"] = len(os.listdir(cache))

    cold, warm = res["runs"]
    res["cold_first_chunk_s"] = round(cold["first_chunk_s"], 1)
    res["warm_first_chunk_s"] = round(warm["first_chunk_s"], 1)
    res["speedup_to_first_chunk"] = round(
        cold["first_chunk_s"] / warm["first_chunk_s"], 1)
    res["gate"] = "warm process reaches its first chunk in < 60 s"
    res["pass"] = warm["first_chunk_s"] < 60.0

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

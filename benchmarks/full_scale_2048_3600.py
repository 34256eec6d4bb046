"""BASELINE config 5 at its STATED problem size, single chip:
2048^3 volume (32 GB), the FULL 3600-projection scan.

The reference streams the entire scan through every subvolume
(src/main.cpp:98-105); rounds 2-4 only ever ran the 2048-class volume
at 360 projections (the 3600 scan decimated by --quality 10).  This
runner closes that gap (r4 verdict 1):

  * scan: 3600 synthetic Shepp-Logan frames from synth_c5_3600.py
    (pinned workdir, ~58 GB of HIS);
  * plan: block_dz PINNED to 344 — the extent the round-4 auto planner
    chose (overlap-capable: two padded accumulators fit HBM), which
    makes the block map and the seam location exactly reproducible
    instead of replicating the live-probe planning out-of-band
    (ADVICE r4: the seam must come from the job's actual plan);
  * gates: seam slab (z 342..345, straddling the block-0/1 seam at 344)
    AND an interior slab (z 858..861, mid-block 2) read back from the
    32 GB ddbvf, each <= 1e-3 relative RMSE vs the slab-wise NumPy
    golden oracle (golden_slab.py partials, f32 stream);
  * recorded: stage timings, per-block proj/s + Gupd/s, end-to-end wall
    — comparable against the 360-projection round-4 entry.

Run:  python benchmarks/full_scale_2048_3600.py --workdir /root/c5w
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PROJ = 3600
BLOCK_DZ = 344          # round-4 auto plan: 6 blocks, seam at 344
SLABS = ((342, 4), (858, 4))


class _LogTap(logging.Handler):
    """Collect per-block rates + stage timer lines from the job log."""

    def __init__(self):
        super().__init__()
        self.block_rates = []          # (proj/s, Gupd/s) per block
        self.lines = []

    def emit(self, record):
        msg = record.getMessage()
        self.lines.append(msg)
        if "done (" in msg and "proj/s" in msg:
            try:
                parts = msg.split("(")[1]
                pps = float(parts.split(",")[1].split("proj/s")[0])
                gups = float(parts.split(",")[2].split("Gupd/s")[0])
                self.block_rates.append((pps, gups))
            except (IndexError, ValueError):
                pass


def _wait_goldens(workdir, timeout_s=7200):
    """Golden slab per z0: the merged ``golden_z{z0}.npy`` if present,
    else the sum of the sharded partials (``PARIS_GOLDEN_SHARDS``,
    default 2 — must match golden_slab.py's --shard W).  Loads retry:
    a partial written by an OLD (pre-atomic-rename) worker could be
    observed mid-write."""
    t0 = time.time()
    shards = int(os.environ.get("PARIS_GOLDEN_SHARDS", "2"))
    out = {}

    def load_retry(p):
        for _ in range(10):
            try:
                return np.load(p)
            except Exception:
                time.sleep(3)
        return np.load(p)

    for z0, _dz in SLABS:
        merged = os.path.join(workdir, f"golden_z{z0}.npy")
        parts = [os.path.join(workdir, f"golden_part_z{z0}_w{w}.npy")
                 for w in range(shards)]
        while not (os.path.exists(merged)
                   or all(os.path.exists(p) for p in parts)):
            if time.time() - t0 > timeout_s:
                raise RuntimeError(f"golden partials missing: {parts}")
            print(f"[gate] waiting for golden partials z0={z0} ...",
                  flush=True)
            time.sleep(30)
        time.sleep(2)
        out[z0] = load_retry(merged) if os.path.exists(merged) \
            else sum(load_retry(p) for p in parts)
    return out


def _child(args):
    """Compute ONE new block in this process and exit.

    The tunneled-TPU transport retains every h2d payload for the
    process lifetime (measured: each device_put leaks its full host
    buffer), so one process streaming the whole 181 GB job OOMs a
    125 GB host — the parent instead runs one ~30 GB block per process
    (``max_blocks=1`` + the durable resume manifest)."""
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s: %(message)s")
    tap = _LogTap()
    logging.getLogger("paris_tpu").addHandler(tap)
    from paris_tpu.geometry import DetectorGeometry
    from paris_tpu.app import ReconstructionJob, run_job

    det = DetectorGeometry(2048, 2048, 0.25, 0.25, 0.0, 0.0,
                           2048.0, 1024.0, 360.0 / N_PROJ)
    prefix = "c5" if args.accuracy == "fast" else "c5x"
    job = ReconstructionJob(
        det=det, input_path=os.path.join(args.workdir, "proj3600"),
        output_path=args.workdir, prefix=prefix,
        chunk_size=8, accuracy=args.accuracy, block_dz=BLOCK_DZ,
        cache_projections=False, resume=True, max_blocks=1,
    )
    run_job(job)
    print("CHILD-RESULT " + json.dumps({
        "rates": tap.block_rates,
        "timings": [l for l in tap.lines if l.startswith("stage timings:")],
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/c5w")
    ap.add_argument("--accuracy", default="fast", choices=["fast", "exact"])
    ap.add_argument("--one-block", action="store_true")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results_round5.json"))
    args = ap.parse_args()
    if args.one_block:
        return _child(args)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s: %(message)s")

    from paris_tpu.geometry import (DetectorGeometry, derive_volume_geometry,
                                    plan_z_blocks)
    from paris_tpu.app import ReconstructionJob, run_job
    from paris_tpu.io import ddbvf

    det = DetectorGeometry(2048, 2048, 0.25, 0.25, 0.0, 0.0,
                           2048.0, 1024.0, 360.0 / N_PROJ)
    vol = derive_volume_geometry(det)
    pdir = os.path.join(args.workdir, "proj3600")
    done = os.path.join(pdir, "SYNTH_DONE")
    assert os.path.exists(done), f"scan not synthesized: {done}"

    info = plan_z_blocks(vol, block_dz=BLOCK_DZ)
    assert info.blocks[1].z0 == SLABS[0][0] + 2, "seam slab must straddle"
    name = ("full_scale_2048_3600proj_single_chip" if args.accuracy == "fast"
            else "full_scale_2048_3600proj_single_chip_exact")
    res = {"config": 5, "name": name,
           "volume": vol.shape_zyx, "n_proj": N_PROJ,
           "accuracy": args.accuracy, "block_dz": BLOCK_DZ,
           "planned_blocks": info.num,
           "write_overlap": os.environ.get("PARIS_WRITE_OVERLAP", "1")
           != "0"}

    # one child process per block (see _child: transport h2d leak
    # containment); each child resumes from the durable manifest
    import subprocess
    prefix = "c5" if args.accuracy == "fast" else "c5x"
    manifest = os.path.join(args.workdir, f"{prefix}.ddbvf.manifest.json")
    rates, timings = [], []
    t0 = time.perf_counter()
    for attempt in range(info.num + 3):
        done = []
        if os.path.exists(manifest):
            done = json.load(open(manifest)).get("completed_blocks", [])
        if len(done) >= info.num:
            break
        print(f"[parent] blocks done {sorted(done)}; spawning child "
              f"(attempt {attempt})", flush=True)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one-block",
             "--workdir", args.workdir, "--accuracy", args.accuracy],
            capture_output=True, text=True)
        for line in p.stdout.splitlines():
            if line.startswith("CHILD-RESULT "):
                d = json.loads(line[len("CHILD-RESULT "):])
                rates.extend(d["rates"])
                timings.extend(d["timings"])
        if p.returncode != 0:
            print(f"[parent] child failed rc={p.returncode}\n"
                  f"{p.stderr[-2000:]}", flush=True)
    done = json.load(open(manifest)).get("completed_blocks", [])
    assert len(done) >= info.num, f"job incomplete: {sorted(done)}"
    wall = time.perf_counter() - t0
    out_path = os.path.join(args.workdir, f"{prefix}.ddbvf")
    res["end_to_end_seconds"] = round(wall, 1)
    res["gupd_per_s_end_to_end"] = round(
        vol.voxels * N_PROJ / wall / 1e9, 2)
    res["per_block_proj_per_s"] = [round(p, 2) for p, _ in rates]
    res["per_block_gupd_per_s"] = [round(g, 2) for _, g in rates]
    res["stage_timings"] = timings[-3:]
    res["note"] = ("one child process per block (max_blocks=1 + resume "
                   "manifest): the tunnel transport pins every h2d "
                   "payload for the process lifetime, ~30 GB/block")

    goldens = _wait_goldens(args.workdir)
    res["pass"] = info.num > 1
    for z0, dz in SLABS:
        slab = ddbvf.read_slices(out_path, z0, dz)
        g = goldens[z0]
        scale = float(np.abs(g).max()) or 1.0
        rmse = float(np.sqrt(np.mean((slab - g) ** 2))) / scale
        key = "seam" if z0 == SLABS[0][0] else "interior"
        res[f"rel_rmse_vs_golden_{key}_slab_z{z0}"] = rmse
        res["pass"] = res["pass"] and rmse <= 1e-3
    res["gate"] = "seam + interior slab rel RMSE <= 1e-3; blocks > 1"

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

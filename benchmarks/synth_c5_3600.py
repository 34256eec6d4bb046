"""Synthesize the BASELINE config-5 scan at its STATED size: 3600
projections, 2048x2048, as HIS files of 8 f32 frames each.

Chip-batched (``phantom.cone_beam_project_jax``) with double-buffered
d2h: batch i+1 is dispatched before batch i is pulled, so device
compute hides behind the transfer (the wire is the bound).  Resumable:
existing complete files are skipped, so an interrupted synthesis
continues where it stopped.  A ``SYNTH_DONE`` marker file is written
last — the streaming golden oracle (golden_slab.py) tails the
directory and uses the marker to distinguish "file not yet written"
from "scan complete".

Run:  python benchmarks/synth_c5_3600.py --workdir /root/c5w
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PROJ = 3600
BATCH = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--n-proj", type=int, default=N_PROJ)
    args = ap.parse_args()

    from paris_tpu.geometry import DetectorGeometry, derive_volume_geometry
    from paris_tpu.phantom import cone_beam_project_jax
    from paris_tpu.io.his import write_his

    n_proj = args.n_proj
    det = DetectorGeometry(2048, 2048, 0.25, 0.25, 0.0, 0.0,
                           2048.0, 1024.0, 360.0 / n_proj)
    vol = derive_volume_geometry(det)
    scale = vol.dim_x * vol.l_vx_x / 2 * 0.9
    angles = np.arange(n_proj, dtype=np.float64) * det.delta_phi

    pdir = os.path.join(args.workdir, "proj3600")
    os.makedirs(pdir, exist_ok=True)
    frame_bytes = 4 * det.n_row * det.n_col

    def path_for(i):
        return os.path.join(pdir, f"b{i:05d}.his")

    def complete(i, n):
        p = path_for(i)
        try:                        # full files only (crash-safe resume)
            return os.path.getsize(p) >= n * frame_bytes
        except OSError:
            return False

    t0 = time.perf_counter()
    pending = None                  # (file_start_idx, n, device_array)
    n_written = 0

    def drain(p):
        nonlocal n_written
        i, n, dev = p
        frames = np.asarray(dev)    # d2h (the bound on tunneled chips)
        write_his(path_for(i) + ".tmp", frames, number_dtype=np.float32)
        os.replace(path_for(i) + ".tmp", path_for(i))
        n_written += n

    for i in range(0, n_proj, BATCH):
        n = min(BATCH, n_proj - i)
        if complete(i, n):
            continue
        # dispatch batch i (async), THEN drain the previous one: device
        # compute of i hides behind the d2h + disk write of i-1
        dev = cone_beam_project_jax(det, angles[i:i + n], scale, block=False)
        if pending is not None:
            drain(pending)
        pending = (i, n, dev)
        if (i // BATCH) % 25 == 0:
            dt = time.perf_counter() - t0
            rate = n_written / dt if dt else 0.0
            print(f"[synth] {i + n}/{n_proj} frames "
                  f"({rate:.1f} fr/s, {dt:.0f}s)", flush=True)
    if pending is not None:
        drain(pending)
    open(os.path.join(pdir, "SYNTH_DONE"), "w").write(str(n_proj))
    print(f"[synth] done: {n_proj} frames in "
          f"{time.perf_counter() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()

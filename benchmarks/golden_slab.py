"""Streaming golden-oracle slabs for the config-5 full-scale gate.

Computes NumPy golden FDK slabs (``golden.golden_fdk_stream``) over a
HIS scan directory WITHOUT holding the scan in RAM (a 3600-frame
2048-class scan is 58 GB): files are read in order, weighted+filtered
once, and every requested z-slab accumulates in one pass.  Tails the
directory while the synthesizer is still writing (``SYNTH_DONE`` marker
distinguishes "not yet written" from "scan complete").

Sharded for the host's cores: ``--shard w/W`` processes files with
index % W == w and writes partial slab sums (backprojection is linear
in the projections, so partials sum exactly); ``--merge W`` adds the
partials and writes the final ``golden_z{z0}.npy`` per slab.

Run:
  python benchmarks/golden_slab.py --workdir /root/c5w --slabs 342:4,1020:4 --shard 0/2 &
  python benchmarks/golden_slab.py --workdir /root/c5w --slabs 342:4,1020:4 --shard 1/2 &
  wait; python benchmarks/golden_slab.py --workdir /root/c5w --slabs 342:4,1020:4 --merge 2
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_slabs(s):
    out = []
    for part in s.split(","):
        z0, dz = part.split(":")
        out.append((int(z0), int(dz)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--proj-subdir", default="proj3600")
    ap.add_argument("--slabs", required=True, help="z0:dz,z0:dz,...")
    ap.add_argument("--n-proj", type=int, default=3600)
    ap.add_argument("--shard", default=None, help="w/W")
    ap.add_argument("--merge", type=int, default=None,
                    help="merge W partial shards and exit")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "float64"])
    args = ap.parse_args()

    from paris_tpu.geometry import DetectorGeometry, derive_volume_geometry
    from paris_tpu.golden import golden_fdk_stream
    from paris_tpu.io.his import read_his

    slabs = parse_slabs(args.slabs)
    n_proj = args.n_proj
    det = DetectorGeometry(2048, 2048, 0.25, 0.25, 0.0, 0.0,
                           2048.0, 1024.0, 360.0 / n_proj)
    vol = derive_volume_geometry(det)
    pdir = os.path.join(args.workdir, args.proj_subdir)

    def partial_path(z0, w):
        return os.path.join(args.workdir, f"golden_part_z{z0}_w{w}.npy")

    def final_path(z0):
        return os.path.join(args.workdir, f"golden_z{z0}.npy")

    if args.merge is not None:
        for z0, dz in slabs:
            total = None
            for w in range(args.merge):
                part = np.load(partial_path(z0, w))
                total = part if total is None else total + part
            np.save(final_path(z0), total.astype(np.float32))
            print(f"[golden] merged slab z0={z0} -> {final_path(z0)}")
        return

    w, W = (0, 1) if args.shard is None else map(int, args.shard.split("/"))
    done_marker = os.path.join(pdir, "SYNTH_DONE")
    frame_bytes = 4 * det.n_row * det.n_col
    files = [(i, os.path.join(pdir, f"b{i:05d}.his"))
             for i in range(0, n_proj, 8)]
    mine = [(i, p) for k, (i, p) in enumerate(files) if k % W == w]

    def wait_for(path, n):
        # the synthesizer writes tmp+rename, so an existing file is
        # complete; poll until it appears (or SYNTH_DONE says it never will)
        while True:
            try:
                if os.path.getsize(path) >= n * frame_bytes:
                    return True
            except OSError:
                pass
            if os.path.exists(done_marker):
                # one more check after the marker (rename raced the poll)
                try:
                    return os.path.getsize(path) >= n * frame_bytes
                except OSError:
                    return False
            time.sleep(5.0)

    def pairs():
        t0 = time.perf_counter()
        done = 0
        for i, path in mine:
            n = min(8, n_proj - i)
            if not wait_for(path, n):
                raise RuntimeError(f"missing projection file {path}")
            frames = read_his(path)
            for j in range(n):
                yield frames[j], (i + j) * det.delta_phi
            done += n
            if (done // 8) % 25 == 0:
                dt = time.perf_counter() - t0
                print(f"[golden w{w}] {done}/{len(mine) * 8} frames "
                      f"({done / dt:.2f} fr/s)", flush=True)

    t0 = time.perf_counter()
    outs = golden_fdk_stream(pairs(), det, vol, slabs,
                             dtype=np.dtype(args.dtype))
    for (z0, dz), out in zip(slabs, outs):
        # tmp + rename: a concurrent poller (full_scale_2048_3600.py)
        # must never observe a half-written .npy
        tmp = partial_path(z0, w)[:-4] + f".tmp{os.getpid()}.npy"
        np.save(tmp, out)
        os.replace(tmp, partial_path(z0, w))
    print(f"[golden w{w}] done in {time.perf_counter() - t0:.0f}s",
          flush=True)


if __name__ == "__main__":
    main()

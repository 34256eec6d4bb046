"""Driver-parity A/B on the real chip: run_job vs run_job_distributed
(1-chip mesh), multi-block, finalize/write overlap ON in both.

r4 verdict 3's acceptance: with the overlap + perf-extent ported into
the distributed driver, a 1-chip-mesh distributed job's wall should
match the single-chip driver's (the two previously diverged: the
distributed driver serialized every block write).  1024-class with a
forced 3-block split keeps the A/B affordable (~15 min inc. writes);
the mechanism is block-count-, not size-, dependent.

Outputs byte-compare; walls and per-block rates recorded to
results_round5.json.

Run:  python benchmarks/dist_overlap_ab.py
"""

from __future__ import annotations

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
    from paris_tpu.geometry import DetectorGeometry, derive_volume_geometry
    from paris_tpu.phantom import cone_beam_project_jax
    from paris_tpu.io.his import write_his
    from paris_tpu.io import ddbvf
    from paris_tpu.app import ReconstructionJob, run_job
    from paris_tpu.parallel.app import run_job_distributed
    from paris_tpu.parallel.mesh import make_z_mesh

    n_proj = 360
    size = 1024
    det = DetectorGeometry(size, size, 1.0, 1.0, 0.0, 0.0,
                           8.0 * size, 4.0 * size, 360.0 / n_proj)
    vol = derive_volume_geometry(det)
    scale = vol.dim_x * vol.l_vx_x / 2 * 0.9
    angles = np.arange(n_proj, dtype=np.float64) * det.delta_phi

    work = tempfile.mkdtemp(prefix="paris_ab_")
    pdir = os.path.join(work, "proj")
    os.makedirs(pdir)
    t0 = time.perf_counter()
    for i in range(0, n_proj, 24):
        projs = cone_beam_project_jax(det, angles[i:i + 24], scale)
        write_his(os.path.join(pdir, f"b{i:05d}.his"), projs,
                  number_dtype=np.float32)
    print(f"synthesized {n_proj} frames in "
          f"{time.perf_counter() - t0:.0f}s", flush=True)

    block_dz = 384                       # 3 blocks of the ~1026 volume
    kw = dict(det=det, input_path=pdir, prefix="ab", chunk_size=24,
              accuracy="fast", block_dz=block_dz)

    t0 = time.perf_counter()
    single = run_job(ReconstructionJob(
        output_path=os.path.join(work, "single"), **kw))
    wall_single = time.perf_counter() - t0

    t0 = time.perf_counter()
    dist = run_job_distributed(ReconstructionJob(
        output_path=os.path.join(work, "dist"), **kw),
        mesh=make_z_mesh())
    wall_dist = time.perf_counter() - t0

    a = ddbvf.read_volume(single)
    b = ddbvf.read_volume(dist)
    identical = bool(np.array_equal(a, b))
    max_diff = float(np.abs(a - b).max()) if not identical else 0.0
    scale_ref = float(np.abs(a).max()) or 1.0
    res = {"name": "dist_overlap_ab_mesh1_1024", "n_proj": n_proj,
           "block_dz": block_dz, "blocks": 3,
           "wall_single_s": round(wall_single, 1),
           "wall_dist_s": round(wall_dist, 1),
           "ratio_dist_over_single": round(wall_dist / wall_single, 3),
           "outputs_identical": identical,
           "max_rel_diff": max_diff / scale_ref,
           "gate": "dist wall <= 1.2x single; outputs match <= 1e-5 rel",
           "pass": wall_dist <= 1.2 * wall_single
           and max_diff / scale_ref <= 1e-5}
    print(json.dumps(res), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_round5.json")
    existing = []
    if os.path.exists(out):
        try:
            existing = json.load(open(out))
        except Exception:
            existing = []
    existing = [r for r in existing if r.get("name") != res["name"]]
    existing.append(res)
    with open(out, "w") as f:
        json.dump(existing, f, indent=2)
    import shutil
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()

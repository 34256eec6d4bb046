"""Config-5 scaling harness: distribution overhead on a virtual mesh.

The reference scales by giving each GPU its own z-subvolume of the same
size (src/cuda/subvolume_information.cpp:63-119) with zero steady-state
inter-device communication; our distributed path adds one ICI
all-gather of the (banded) projection chunk per step.

Multi-chip hardware is not available in this environment, and a virtual
CPU mesh shares one host's silicon across all "devices" — so per-device
throughput CANNOT stay constant as the mesh grows and classic weak
scaling is unmeasurable here.  What IS honestly measurable on fixed
silicon is the cost of the distribution machinery itself: run the SAME
total problem (a) unsharded on a 1-device mesh and (b) sharded over an
N-device mesh, and report t_sharded / t_unsharded.  Ratios near 1 mean
the shard_map partition + all-gather + per-shard dispatch add little
overhead; on a real pod slice, where each shard gets its own chip, that
overhead is the only term that erodes weak-scaling efficiency (the
BASELINE config-5 gate, >= 80% at >= 2 hosts, needs pod hardware — run
this same script there via ``jax.distributed``).

Usage: python benchmarks/weak_scaling.py [N ...]   (default 1 2 4 8)
"""

import json
import os
import subprocess
import sys

_CHILD = r"""
import json, time, sys
import numpy as np
import jax
# sitecustomize pre-imports jax on TPU-tunnel images, making JAX_PLATFORMS
# env vars ineffective (see tests/conftest.py) — force the CPU platform here
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from paris_tpu.geometry import DetectorGeometry, derive_volume_geometry
from paris_tpu.parallel import DistributedReconstructor, make_z_mesh

assert jax.default_backend() == "cpu", jax.default_backend()
n = len(jax.devices())
total_dz = int(sys.argv[1])        # same TOTAL problem at every mesh size
det = DetectorGeometry(256, 256, 1.0, 1.0, 0.0, 0.0, 2048.0, 1024.0, 0.5)
vol = derive_volume_geometry(det)
C = 8                              # every device backprojects all 8
rec = DistributedReconstructor(det, vol, mesh=make_z_mesh(),
                               chunk_size=C, block_dz=total_dz,
                               backend="xla")
rng = np.random.default_rng(0)
projs = rng.standard_normal((C, det.n_col, det.n_row)).astype(np.float32)
angles = np.arange(C, dtype=np.float32) * det.delta_phi
v = rec.accumulate(rec.init_block(), projs, angles)
float(jnp.sum(v))                  # warmup/compile
reps = 10
t0 = time.perf_counter()
for _ in range(reps):
    v = rec.accumulate(v, projs, angles)
float(jnp.sum(v))
dt = (time.perf_counter() - t0) / reps
updates = vol.dim_x * vol.dim_y * total_dz * C
print(json.dumps({"n": n, "sec_per_step": dt,
                  "gupd_per_s_total": updates / dt / 1e9}))
"""


def run(n: int, total_dz: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + f" --xla_force_host_platform_device_count={n}")
    out = subprocess.run([sys.executable, "-c", _CHILD, str(total_dz)],
                         env=env, capture_output=True, text=True,
                         cwd=os.path.dirname(os.path.dirname(
                             os.path.abspath(__file__))))
    if out.returncode != 0:
        sys.stderr.write(out.stderr)
        raise RuntimeError(f"weak-scaling child n={n} failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [1, 2, 4, 8]
    total_dz = 32 * max(sizes)     # divisible by every mesh size
    rows = [run(n, total_dz) for n in sizes]
    base = rows[0]["sec_per_step"]
    for r in rows:
        r["overhead_vs_unsharded"] = round(r["sec_per_step"] / base - 1.0, 3)
        r["gupd_per_s_total"] = round(r["gupd_per_s_total"], 3)
        r["sec_per_step"] = round(r["sec_per_step"], 4)
    result = {
        "config": 5, "name": "distribution_overhead_virtual_mesh",
        "platform": "cpu-virtual-mesh",
        "total_block_dz": total_dz,
        "note": ("same TOTAL problem at every mesh size on one host's "
                 "fixed silicon; overhead_vs_unsharded isolates the "
                 "shard_map + all-gather machinery cost. True ICI weak "
                 "scaling (BASELINE config 5) requires pod hardware."),
        "gate": "<= 0.25 overhead at max mesh",
        "pass": rows[-1]["overhead_vs_unsharded"] <= 0.25,
        "rows": rows,
    }
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()

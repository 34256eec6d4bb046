"""Config-5 weak-scaling bound: measured bytes x stated ICI model.

Pod hardware is not reachable from this environment (a single chip via
tunnel), so the >= 80% weak-scaling gate cannot be *measured*; this
script bounds it defensibly instead (VERDICT round 2, item 6):

1. INSTRUMENT one distributed step on the virtual 8-device mesh and
   extract the actual all-gather bytes from the compiled HLO — this
   pins the communication volume of the real program, banded vs full
   (the banded broadcast slices detector rows BEFORE the gather,
   parallel/dist.py).
2. Combine with the measured single-chip kernel rate (BENCH round 3)
   and a stated ICI model into a projected efficiency table.

ICI model: a 1-D ring all-gather sustains ONE link direction per chip,
and the public "How to Scale Your Model" book (jax-ml.github.io/
scaling-book, Part 2 "TPUs") lists the v5e one-way ICI bandwidth as
4.5e10 bytes/s = 45 GB/s per link — that figure is the 45 GB/s used
here.  Each chip receives (N-1)/N * total_bytes at that rate, with NO
compute/comms overlap assumed (conservative: XLA overlaps collectives
with compute when it can).  Because the figure is an assumption about
hardware we cannot measure from this environment, the table is also
computed at 15 GB/s (a 3x de-rating) and the CROSSOVER bandwidth — the
slowest ICI for which the 32-chip efficiency still meets the 80% gate —
is reported (VERDICT r3 weak 6).

Writes benchmarks/results_round4.json (merging).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np  # noqa: E402

ICI_GBPS = 45.0        # v5e one-way per-link GB/s (scaling-book, Part 2)
ICI_SENSITIVITY = (45.0, 15.0)   # stated figure + 3x de-rating
KERNEL_GUPS = float(os.environ.get("PARIS_BENCH_KERNEL_GUPS", "72.2"))


def hlo_all_gather_elements(step, args) -> int:
    """Total ELEMENTS produced by all-gather ops in the compiled HLO.

    Elements, not bytes: the CPU backend lowers bf16 collectives through
    an f32 convert, so byte counts would misstate what a TPU (which
    gathers bf16 natively) moves.  The element count pins the compiled
    program's communication volume; bytes follow from the program dtype.
    """
    import jax
    txt = jax.jit(step).lower(*args).compile().as_text()
    total = 0
    for m in re.finditer(
            r"= \w+\[([\d,]+)\](?:\{[^}]*\})? all-gather", txt):
        n = 1
        for d in m.group(1).split(","):
            n *= int(d)
        total += n
    return total


def measured_gather_elements(banded: bool):
    """Actual per-step all-gather elements of the distributed program."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from paris_tpu.geometry import (DetectorGeometry, derive_volume_geometry,
                                    detector_row_band)
    from paris_tpu.parallel.dist import DistributedReconstructor
    from paris_tpu.parallel.mesh import make_z_mesh

    # small-geometry stand-in with the same program structure; bytes are
    # then scaled analytically to the 2048 config by (C x HP x VP)
    det = DetectorGeometry(64, 256, 2.0, 2.0, 0.0, 0.0, 2048.0, 1024.0, 1.0)
    vol = derive_volume_geometry(det)
    dz = 32
    band = None
    if banded:
        lo, hi = detector_row_band(det, vol, 0, dz)
        band = hi - lo
    rec = DistributedReconstructor(
        det, vol, mesh=make_z_mesh(), chunk_size=8, block_dz=dz,
        backend="pallas", interpret=True, v_band_width=band,
        accuracy="fast")
    import jax.numpy as jnp
    from paris_tpu.pipeline import identity_qparams
    vol0 = rec.init_block()
    chunk = jnp.zeros((8, det.n_col, det.n_row), jnp.float32)
    ang = jnp.zeros((8,), jnp.float32)
    offs = jnp.zeros((4,), jnp.int32)
    step = rec._step_for((0, 0))
    sharded = (jax.device_put(chunk, rec._proj_sharding),
               jax.device_put(ang, rec._ang_sharding),
               jax.device_put(ang, rec._ang_sharding),
               jax.device_put(identity_qparams(8), rec._qp_sharding))
    elems = hlo_all_gather_elements(
        lambda v, c, s, co, q, o: step(v, c, s, co, q, o),
        (vol0, *sharded, offs))
    return elems, rec._vp, det


def main():
    res = {"config": 5, "name": "weak_scaling_projection",
           "method": "measured all-gather bytes (HLO) x stated ICI model",
           "ici_gbps_assumed": ICI_GBPS,
           "kernel_gups_measured": KERNEL_GUPS,
           "overlap_assumed": False}

    got_banded, vp_banded, det_small = measured_gather_elements(True)
    got_full, vp_full, _ = measured_gather_elements(False)
    res["hlo_all_gather_elems_small_banded"] = got_banded
    res["hlo_all_gather_elems_small_full"] = got_full
    # analytic model of the same program: gather output = C x HP x VP
    # elements (the bf16 band) + 2 x C angle gathers (negligible)
    hp = 64  # n_row=64 padded to 16 -> 64
    for name, got, vp in (("banded", got_banded, vp_banded),
                          ("full", got_full, vp_full)):
        want = 8 * hp * vp + 2 * 8
        res[f"analytic_elems_small_{name}"] = want
        assert abs(got - want) <= 0.05 * want, (name, got, want)

    # --- scale to the 2048-class config-5 shapes ------------------------
    import jax
    jax.config.update("jax_platforms", "cpu")
    from paris_tpu.geometry import (DetectorGeometry, derive_volume_geometry,
                                    detector_row_band)
    n_proj, C = 3600, 8
    det = DetectorGeometry(2048, 2048, 0.25, 0.25, 0.0, 0.0,
                           2048.0, 1024.0, 360.0 / n_proj)
    vol = derive_volume_geometry(det)
    dz = 344                      # the auto planner's block extent (cfg5 run)
    lo, hi = detector_row_band(det, vol, vol.dim_z // 2 - dz // 2, dz)
    vp_band = -(-(hi - lo) // 128) * 128
    hp = -(-det.n_row // 16) * 16
    gather_total = C * hp * vp_band * 2                # bf16 band, bytes
    block_voxels = dz * vol.dim_y * vol.dim_x

    def project(n, gbps):
        recv = gather_total * (n - 1) / n
        t_comm = recv / (gbps * 1e9)
        t_comp = block_voxels / n * C / (KERNEL_GUPS * 1e9)
        return t_comm, t_comp, t_comp / (t_comp + t_comm)

    tables = {}
    for gbps in ICI_SENSITIVITY:
        table = []
        for n in (2, 4, 8, 16, 32):
            t_comm, t_comp, eff = project(n, gbps)
            table.append({"chips": n,
                          "gather_mb_per_step": round(gather_total / 1e6, 2),
                          "t_comm_ms": round(t_comm * 1e3, 3),
                          "t_comp_ms": round(t_comp * 1e3, 2),
                          "projected_efficiency": round(eff, 4)})
        tables[f"{gbps:g}_gbps"] = table
    # crossover: slowest per-chip ICI that still meets 80% at 32 chips
    # (eff >= 0.8  <=>  t_comm <= t_comp/4  <=>  gbps >= 4*recv/t_comp)
    n = 32
    recv = gather_total * (n - 1) / n
    t_comp = block_voxels / n * C / (KERNEL_GUPS * 1e9)
    res["crossover_gbps_for_80pct_at_32_chips"] = round(
        4.0 * recv / t_comp / 1e9, 2)
    res["vp_band"] = vp_band
    res["projected"] = tables[f"{ICI_GBPS:g}_gbps"]
    res["projected_sensitivity"] = tables
    res["ici_gbps_source"] = ("jax-ml.github.io/scaling-book Part 2: v5e "
                              "one-way ICI bandwidth 4.5e10 B/s per link; "
                              "1-D ring all-gather uses one link direction "
                              "per chip")
    res["gate"] = ">= 0.80 projected efficiency at every mesh size"
    res["pass"] = all(r["projected_efficiency"] >= 0.80
                      for r in res["projected"])

    print(json.dumps(res, indent=1), flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "results_round4.json")
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


if __name__ == "__main__":
    main()

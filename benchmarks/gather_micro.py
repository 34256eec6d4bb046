"""Micro-benchmark: TPU gather idioms for the bp kernel's stage 2.

The backprojection kernel's measured wall is the v-interpolation
gather (BASELINE.md bisection).  This ablation times the candidate
idioms in isolation inside a pallas kernel:

  lane      — jnp.take_along_axis(T(64,128), idx, axis=1): the current
              per-lane in-window gather.
  sublane   — jnp.take_along_axis(T(S,128), idx(64,128), axis=0):
              gather along sublanes; legal if Mosaic lowers dynamic
              row-gathers.  Feeds the transposed stage-2 design where
              v lives on sublanes and the per-VREG v range is tiny
              (dv/dz ~= 1 by FDK construction: l_vx = l_px / mag).
  selectN   — sum_s where(idx==s, broadcast(T[s]), .) over an S-row
              window: branch-free row-select ladder.

Each idiom runs REPS times over C x K tables per grid step; the report
is ns per (64,128) gather after subtracting the empty-loop baseline.
"""
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 64
C = 8


def _timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def make_kernel(mode: str, S: int):
    def kern(tab_ref, idx_ref, o_ref):
        acc = jnp.zeros((64, 128), jnp.int32)
        idx0 = idx_ref[...]
        for r in range(REPS):
            c = r % C
            idx = idx0 ^ r        # defeat CSE across reps
            if mode == "empty":
                acc = acc + idx
            elif mode == "lane":
                t = tab_ref[c, 0:64]
                acc = acc + jnp.take_along_axis(t, idx & 127, axis=1)
            elif mode == "lane2":  # two takes + bucket select (kernel's real pattern)
                t0 = tab_ref[c, 0:64]
                t1 = tab_ref[c, 64:128]
                g0 = jnp.take_along_axis(t0, idx & 127, axis=1)
                g1 = jnp.take_along_axis(t1, idx & 127, axis=1)
                acc = acc + jnp.where(((idx & 255) >> 7) == 1, g1, g0)
            elif mode == "sublane":
                t = tab_ref[c, 0:S]
                acc = acc + jnp.take_along_axis(
                    t, jnp.remainder(idx, S), axis=0)
            elif mode == "select":
                t = tab_ref[c, 0:S]
                idxm = jnp.remainder(idx, S)
                g = jnp.zeros((64, 128), jnp.int32)
                for s in range(S):
                    g = jnp.where(idxm == s, t[s, :][None, :], g)
                acc = acc + g
            else:
                raise ValueError(mode)
        o_ref[...] = acc

    return kern


def run(mode: str, S: int = 32):
    tab = jnp.arange(C * 128 * 128, dtype=jnp.int32).reshape(C, 128, 128)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (64, 128)), jnp.int32)
    f = pl.pallas_call(
        make_kernel(mode, S),
        grid=(256,),
        in_specs=[pl.BlockSpec((C, 128, 128), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((64, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
    )
    f = jax.jit(functools.partial(f))
    dt = _timeit(f, tab, idx)
    return dt / (256 * REPS) * 1e9  # ns per (64,128) gather


def main():
    base = run("empty")
    out = {"empty_ns": round(base, 2)}
    for mode, S in [("lane", 128), ("lane2", 128), ("sublane", 8),
                    ("sublane", 16), ("sublane", 32), ("select", 8),
                    ("select", 16), ("select", 24), ("select", 32)]:
        try:
            ns = run(mode, S)
            out[f"{mode}_{S}_ns"] = round(ns - base, 2)
        except Exception as e:  # noqa: BLE001 - report unlowerable idioms
            out[f"{mode}_{S}_ns"] = f"FAIL: {type(e).__name__}: {str(e)[:120]}"
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

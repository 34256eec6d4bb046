"""Micro-benchmark 2: is the bp kernel's gather slow because of the
take itself, or the DYNAMICALLY-INDEXED scratch window feeding it?

Modes (all defeat CSE by varying idx per rep):
  static_read   — read tab[c, k_static] + add            (slice cost)
  dyn_read      — read tab[c, k_traced] + add            (dynamic slice cost)
  static_take   — take_along_axis on tab[c, k_static]    (gather cost)
  dyn_take      — take_along_axis on tab[c, k_traced]    (kernel's pattern)
  dyn_take2     — two dyn takes + bucket select          (kernel's span_w=2)
"""
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = 64
C = 8
K = 16


def make_kernel(mode: str):
    def kern(k0_ref, tab_ref, idx_ref, o_ref):
        acc = jnp.zeros((64, 128), jnp.int32)
        idx0 = idx_ref[...]
        for r in range(REPS):
            c = r % C
            idx = idx0 ^ r
            iw = idx & 127
            if mode == "empty":
                acc = acc + idx
            elif mode == "static_read":
                acc = acc + tab_ref[c, r % K] + idx
            elif mode == "dyn_read":
                acc = acc + tab_ref[c, k0_ref[r]] + idx
            elif mode == "static_take":
                acc = acc + jnp.take_along_axis(tab_ref[c, r % K], iw, axis=1)
            elif mode == "dyn_take":
                acc = acc + jnp.take_along_axis(
                    tab_ref[c, k0_ref[r]], iw, axis=1)
            elif mode == "dyn_take2":
                k0 = k0_ref[r]
                g0 = jnp.take_along_axis(tab_ref[c, k0], iw, axis=1)
                g1 = jnp.take_along_axis(tab_ref[c, k0 + 2], iw, axis=1)
                acc = acc + jnp.where(((idx & 255) >> 7) == 1, g1, g0)
            elif mode in ("chain_take2", "chain_only"):
                # mirror the kernel's per-(angle, subtile) scalar chain:
                # fresh f32 scalar mins -> floor -> int -> shift -> clip,
                # feeding the dynamic window base of the takes
                s0 = k0_ref[r].astype(jnp.float32)
                s1 = k0_ref[(r + 1) % REPS].astype(jnp.float32)
                a = jnp.minimum(jnp.minimum(s0 * 1.01, s0 * 1.02),
                                jnp.minimum(s1 * 1.01, s1 * 1.02))
                b = (a - 3.0) * 0.25 - 0.5
                kr = (jnp.floor(b).astype(jnp.int32) - 1) >> 6
                k0 = jnp.clip(kr + k0_ref[r], 0, K - 3)
                if mode == "chain_only":
                    acc = acc + idx + k0
                else:
                    relv = idx - k0 * 64
                    iw2 = relv & 127
                    g0 = jnp.take_along_axis(tab_ref[c, k0], iw2, axis=1)
                    g1 = jnp.take_along_axis(tab_ref[c, k0 + 2], iw2, axis=1)
                    acc = acc + jnp.where((relv >> 7) == 1, g1, g0)
            else:
                raise ValueError(mode)
        o_ref[...] = acc

    return kern


def run(mode: str):
    tab = jnp.arange(C * K * 64 * 128, dtype=jnp.int32).reshape(C, K, 64, 128)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (64, 128)), jnp.int32)
    k0 = jnp.asarray(
        np.random.default_rng(1).integers(0, K - 2, (REPS,)), jnp.int32)
    f = pl.pallas_call(
        make_kernel(mode),
        grid=(256,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((C, K, 64, 128), lambda i: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((64, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((64, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
    )
    f = jax.jit(f)
    out = f(k0, tab, idx)
    jax.block_until_ready(out)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(k0, tab, idx)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    return dt / (256 * REPS) * 1e9  # ns per rep


def main():
    out = {}
    for mode in ["empty", "static_read", "dyn_read", "static_take",
                 "dyn_take", "dyn_take2", "chain_take2", "chain_only"]:
        try:
            out[f"{mode}_ns"] = round(run(mode), 3)
        except Exception as e:  # noqa: BLE001
            out[f"{mode}_ns"] = f"FAIL: {type(e).__name__}: {str(e)[:120]}"
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()

"""Kernel A/B sweep on the real chip: runs bench.py under different env
configurations and prints a result table.  Used to pick defaults
(BASELINE.md records the outcomes).

Usage: python benchmarks/kernel_sweep.py [sweep-name ...]
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# name -> env overrides (on top of the current environment)
SWEEPS = {
    # VMEM-budget x chunk scaling at the round-2 flagship shape
    "chunk": [
        ("dz512_c8_fast", {"PARIS_BENCH_CHUNK": "8"}),
        ("dz512_c16_fast", {"PARIS_BENCH_CHUNK": "16"}),
        ("dz512_c24_fast", {"PARIS_BENCH_CHUNK": "24"}),
    ],
    # single full-height block (no banding), deep z tiles
    "fullblock": [
        ("dz1024_zt512_c16_fast",
         {"PARIS_BENCH_CHUNK": "16", "PARIS_BENCH_BLOCK_DZ": "1024",
          "PARIS_BP_ZTILE": "512"}),
        ("dz1024_zt1024_c8_fast",
         {"PARIS_BENCH_CHUNK": "8", "PARIS_BENCH_BLOCK_DZ": "1024",
          "PARIS_BP_ZTILE": "1024"}),
        ("dz1024_zt1024_c16_fast",
         {"PARIS_BENCH_CHUNK": "16", "PARIS_BENCH_BLOCK_DZ": "1024",
          "PARIS_BP_ZTILE": "1024"}),
        ("dz1024_zt1024_c24_fast",
         {"PARIS_BENCH_CHUNK": "24", "PARIS_BENCH_BLOCK_DZ": "1024",
          "PARIS_BP_ZTILE": "1024"}),
    ],
    # stage-2 window strategies (dynamic machinery forced on)
    "windows": [
        (f"c24_{m}", {"PARIS_BP_WINDOWS": m, "PARIS_BP_STATICWIN": "0"})
        for m in ("dynamic", "direct")
    ] + [("c24_staticplan", {})],
    # compile-size / throughput trade (see PARIS_BP_FORI in the kernel)
    "fori": [
        (f"c24_fori{n}", {"PARIS_BP_FORI": str(n)}) for n in (1, 4, 8)
    ],
    # exact accuracy at the candidate flagship configs
    "exact": [
        ("dz512_c8_exact", {"PARIS_BENCH_CHUNK": "8",
                            "PARIS_BENCH_ACCURACY": "exact"}),
        ("dz1024_zt1024_c16_exact",
         {"PARIS_BENCH_CHUNK": "16", "PARIS_BENCH_BLOCK_DZ": "1024",
          "PARIS_BP_ZTILE": "1024", "PARIS_BENCH_ACCURACY": "exact"}),
    ],
    # exact-mode variant bisection (VERDICT r4 item: where does exact's
    # 56%-of-fast sit? variant 1 = scratch-read floor, 2 = stage 1 +
    # overhead, 3 = stage 2 + overhead), plus fast at the same C for an
    # apples-to-apples gap
    "exact_bisect": [
        (f"c16_exact_var{v}",
         {"PARIS_BENCH_CHUNK": "16", "PARIS_BENCH_ACCURACY": "exact",
          "PARIS_BP_DEBUG_VARIANT": str(v)}) for v in (0, 1, 2, 3)
    ] + [
        ("c16_fast_var0", {"PARIS_BENCH_CHUNK": "16"}),
    ],
}


def run_one(name, env_over, timeout=1200):
    env = dict(os.environ)
    env.update(env_over)
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, timeout=timeout, env=env,
            cwd=REPO)
    except subprocess.TimeoutExpired:
        return name, {"error": "timeout"}
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not line:
        return name, {"error": (out.stderr or out.stdout)[-300:]}
    return name, json.loads(line[-1])


def main():
    names = sys.argv[1:] or list(SWEEPS)
    results = {}
    for sweep in names:
        for name, env_over in SWEEPS[sweep]:
            name, res = run_one(name, env_over)
            results[name] = res
            print(f"{name:32s} {json.dumps(res)}", flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

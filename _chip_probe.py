"""Patient chip-recovery probe: retry a tiny op until it succeeds."""
import subprocess, sys, time, os
CODE = ("import jax, jax.numpy as jnp;"
        "print('CHIP_OK', float(jax.jit(lambda a:(a+1).sum())(jnp.ones((8,128)))))")
for attempt in range(40):
    t0 = time.time()
    try:
        out = subprocess.run([sys.executable, "-u", "-c", CODE],
                             capture_output=True, text=True, timeout=420)
        if "CHIP_OK" in out.stdout:
            print(f"recovered after attempt {attempt}, {round(time.time()-t0)}s", flush=True)
            open("/tmp/chip_ok", "w").write(str(time.time()))
            sys.exit(0)
        print(f"attempt {attempt}: rc={out.returncode} {out.stderr[-120:]}", flush=True)
    except subprocess.TimeoutExpired:
        print(f"attempt {attempt}: timeout", flush=True)
    time.sleep(120)
print("never recovered", flush=True)
sys.exit(1)

import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
from paris_tpu.geometry import DetectorGeometry, derive_volume_geometry, plan_z_blocks
from paris_tpu.pipeline import Reconstructor

size = 1024
det = DetectorGeometry(size, size, 1.0, 1.0, 0.0, 0.0, 8.0*size, 4.0*size, 1.0)
vol = derive_volume_geometry(det)
info = plan_z_blocks(vol, hbm_budget_bytes=int(7.2*2**30),
                     proj_buffer_bytes=4*4*size*size*16)
print("blocks", info.num, "padded", info.dim_z_padded, flush=True)
rec = Reconstructor(det, vol, chunk_size=16, backend="pallas",
                    block_shape=(info.dim_z_padded, vol.dim_y, vol.dim_x),
                    accuracy="fast")
print("state", rec._state_shape, "vp", rec._vp, flush=True)
rng = np.random.default_rng(0)
chunk = rng.standard_normal((16, det.n_col, det.n_row)).astype(np.float32)
phi = np.deg2rad(np.arange(16)).astype(np.float32)
sin, cos = jnp.asarray(np.sin(phi)), jnp.asarray(np.cos(phi))
offs = jnp.zeros(4, jnp.int32)
volume = rec.init_block()
chunk_dev = jnp.asarray(chunk); chunk_dev.block_until_ready()
t0 = time.perf_counter()
volume = rec._step(volume, chunk_dev, sin, cos, offs, 0, 0)
volume.block_until_ready()
print("first step (compile):", round(time.perf_counter()-t0, 1), flush=True)
t0 = time.perf_counter()
volume = rec._step(volume, chunk_dev, sin, cos, offs, 0, 0)
volume.block_until_ready()
print("steady sync step:", round(time.perf_counter()-t0, 2), flush=True)
t0 = time.perf_counter()
for _ in range(22):
    volume = rec._step(volume, jnp.asarray(chunk), sin, cos, offs, 0, 0)
volume.block_until_ready()
dt = time.perf_counter()-t0
upd = 22*16*np.prod(rec._state_shape)
print(f"22 async steps w/ h2d: {dt:.1f}s = {upd/dt/1e9:.1f} Gupd/s(padded)", flush=True)

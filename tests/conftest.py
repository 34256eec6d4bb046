"""Test config: force JAX onto a virtual 8-device CPU platform.

Multi-device sharding tests run on a virtual CPU mesh
(xla_force_host_platform_device_count), per SURVEY.md §4(d); the real
TPU path is exercised by bench.py / the driver instead.

Note: environments that pre-import jax via sitecustomize (e.g. remote
TPU tunnels) make JAX_PLATFORMS env settings ineffective, so we use
jax.config.update before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

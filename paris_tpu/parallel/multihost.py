"""Multi-host execution support (pod slices).

The reference was strictly single-node (SURVEY.md §2: no MPI/NCCL — one
process, one thread per GPU).  For pod scale the TPU-native pattern is
single-controller-per-host SPMD:

  * every host calls ``initialize()`` (jax.distributed) and then builds
    the SAME global mesh over all devices;
  * every host feeds the full projection stream (shared filesystem or a
    local copy) — input bandwidth scales with hosts;
  * each host materializes only ITS OWN shards of the sharded volume
    (``local_block_slices``) and writes them to the shared ddbvf at
    their global offsets via positional pwrite — no gather, no lock
    (io/ddbvf.py semantics).

These helpers are exercised in CI on a single process (where they
degenerate to trivial cases); real pod smoke tests are gated on
environment (SURVEY.md §4(e)).
"""

from __future__ import annotations

import logging
from typing import List, Optional, Tuple

import numpy as np
import jax

logger = logging.getLogger("paris_tpu.multihost")

__all__ = ["initialize", "is_multihost", "local_block_slices",
           "write_local_shards"]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed (no-op when single-process with no env).

    With no arguments, relies on the TPU environment's auto-detection
    (``jax.distributed.initialize()``), which is correct on Cloud TPU
    pods.  Safe to skip entirely for single-host runs.
    """
    if num_processes is not None and num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info("jax.distributed initialized: process %d/%d, %d/%d devices "
                "local", jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())


def is_multihost() -> bool:
    return jax.process_count() > 1


def local_block_slices(volume: jax.Array) -> List[Tuple[int, np.ndarray]]:
    """(global_offset_dim0, data) for each addressable contiguous shard.

    For a dim-0-sharded volume this yields the z-slabs this host owns.
    """
    out = []
    for shard in volume.addressable_shards:
        idx = shard.index[0]
        start = idx.start if idx.start is not None else 0
        out.append((start, np.asarray(shard.data)))
    return out


def write_local_shards(path: str, volume: jax.Array, z_base: int,
                       max_z: Optional[int] = None) -> int:
    """Write this host's z-shards of a (dz, ny, nx)-sharded block into the
    ddbvf at global offset ``z_base``; returns slices written."""
    from ..io import ddbvf
    written = 0
    for z0, data in local_block_slices(volume):
        dz = data.shape[0]
        if max_z is not None:
            dz = min(dz, max_z - (z_base + z0))
            if dz <= 0:
                continue
        ddbvf.write_slices(path, data[:dz], z_base + z0)
        written += dz
    return written

"""Persistent compiled-step cache (paris_tpu/compile_cache.py).

On-chip behavior (second process loads the flagship step in seconds
instead of a 400-700 s Mosaic compile) is measured by
benchmarks/compile_cache_bench.py; here the plumbing is verified on
CPU with the XLA backend, whose executables serialize too.
"""

import numpy as np
import pytest

from paris_tpu.geometry import DetectorGeometry, derive_volume_geometry


def _setup():
    det = DetectorGeometry(
        n_row=64, n_col=64, l_px_row=2.0, l_px_col=2.0,
        delta_s=0.0, delta_t=0.0, d_so=400.0, d_od=400.0, delta_phi=30.0,
    )
    vol = derive_volume_geometry(det)
    rng = np.random.default_rng(11)
    projs = rng.standard_normal((4, det.n_col, det.n_row)).astype(np.float32)
    angles = np.arange(4, dtype=np.float32) * det.delta_phi
    return det, vol, projs, angles


def test_cache_dir_gating(monkeypatch):
    from paris_tpu import compile_cache
    monkeypatch.setenv("PARIS_COMPILE_CACHE", "0")
    assert compile_cache.cache_dir() is None
    monkeypatch.setenv("PARIS_COMPILE_CACHE", "/some/dir")
    assert compile_cache.cache_dir() == "/some/dir"
    monkeypatch.delenv("PARIS_COMPILE_CACHE")
    # CPU default: off (compiles are cheap; TPU default is on)
    assert compile_cache.cache_dir() is None


def test_persistent_cache_second_build_loads_from_disk(tmp_path,
                                                       monkeypatch):
    """First build stores the serialized executable; a fresh build
    (in-process step cache cleared = a new process) loads it instead of
    compiling, and produces identical output."""
    from paris_tpu import compile_cache, pipeline
    monkeypatch.setenv("PARIS_COMPILE_CACHE", str(tmp_path))
    det, vol, projs, angles = _setup()

    rec = pipeline.Reconstructor(det, vol, chunk_size=2, backend="xla")
    assert isinstance(rec._step, pipeline._CachedStep)
    out1 = rec.run(projs, angles)
    files = list(tmp_path.glob("*.paris-exec"))
    assert len(files) == 1, "first run must store the compiled step"

    pipeline._STEP_CACHE.clear()          # simulate a fresh process
    hits = []
    orig_load = compile_cache.load

    def spy(parts, execution_devices=None):
        exe = orig_load(parts, execution_devices)
        hits.append(exe is not None)
        return exe

    monkeypatch.setattr(compile_cache, "load", spy)
    rec2 = pipeline.Reconstructor(det, vol, chunk_size=2, backend="xla")
    out2 = rec2.run(projs, angles)
    assert hits == [True], "second build must hit the on-disk cache"
    np.testing.assert_array_equal(out1, out2)


def test_corrupt_cache_entry_recompiles(tmp_path, monkeypatch):
    from paris_tpu import compile_cache, pipeline
    monkeypatch.setenv("PARIS_COMPILE_CACHE", str(tmp_path))
    det, vol, projs, angles = _setup()
    rec = pipeline.Reconstructor(det, vol, chunk_size=2, backend="xla")
    out1 = rec.run(projs, angles)
    (entry,) = tmp_path.glob("*.paris-exec")
    entry.write_bytes(b"not a pickle")
    pipeline._STEP_CACHE.clear()
    rec2 = pipeline.Reconstructor(det, vol, chunk_size=2, backend="xla")
    out2 = rec2.run(projs, angles)       # recompiles, removes bad entry
    np.testing.assert_allclose(out2, out1, rtol=1e-6, atol=1e-6)
    assert len(list(tmp_path.glob("*.paris-exec"))) == 1  # rewritten


def test_env_knob_changes_miss_the_disk_cache(tmp_path, monkeypatch):
    """A kernel-shaping env knob is part of the disk fingerprint: a
    changed knob must produce a SECOND cache entry, not a stale hit."""
    from paris_tpu import pipeline
    monkeypatch.setenv("PARIS_COMPILE_CACHE", str(tmp_path))
    det, vol, projs, angles = _setup()
    pipeline.Reconstructor(det, vol, chunk_size=2,
                           backend="xla").run(projs, angles)
    pipeline._STEP_CACHE.clear()
    monkeypatch.setenv("PARIS_BP_FORI", "2")
    pipeline.Reconstructor(det, vol, chunk_size=2,
                           backend="xla").run(projs, angles)
    assert len(list(tmp_path.glob("*.paris-exec"))) == 2


def test_run_job_with_cache_matches_without(tmp_path, monkeypatch):
    """End-to-end run_job under the persistent cache produces the same
    ddbvf as with the cache disabled (fresh-process load path included
    via a cleared in-process step cache)."""
    from paris_tpu import pipeline
    from paris_tpu.app import ReconstructionJob, run_job
    from paris_tpu.io import ddbvf
    from paris_tpu.io.his import write_his
    det, vol, projs, angles = _setup()
    pdir = tmp_path / "proj"
    pdir.mkdir()
    write_his(str(pdir / "s.his"), projs, number_dtype=np.float32)

    def job(out):
        return ReconstructionJob(det=det, input_path=str(pdir),
                                 output_path=str(tmp_path / out),
                                 prefix="v", backend="xla")

    monkeypatch.setenv("PARIS_COMPILE_CACHE", "0")
    ref = ddbvf.read_volume(run_job(job("plain")))
    monkeypatch.setenv("PARIS_COMPILE_CACHE", str(tmp_path / "cache"))
    pipeline._STEP_CACHE.clear()
    first = ddbvf.read_volume(run_job(job("cold")))     # compiles + stores
    pipeline._STEP_CACHE.clear()
    second = ddbvf.read_volume(run_job(job("warm")))    # loads from disk
    np.testing.assert_allclose(first, ref, rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(second, first)
    assert list((tmp_path / "cache").glob("*.paris-exec"))


def test_distributed_persistent_cache(tmp_path, monkeypatch):
    """The sharded step also round-trips through the persistent cache
    (single-process meshes): store on first build, disk-load on a
    fresh build, identical output."""
    import jax
    from paris_tpu import compile_cache
    from paris_tpu.parallel.dist import DistributedReconstructor
    from paris_tpu.parallel.mesh import make_z_mesh
    monkeypatch.setenv("PARIS_COMPILE_CACHE", str(tmp_path))
    det, vol, projs, angles = _setup()
    mesh = make_z_mesh()
    dz = -(-vol.dim_z // mesh.devices.size) * mesh.devices.size

    def build():
        return DistributedReconstructor(det, vol, mesh=mesh, chunk_size=8,
                                        block_dz=dz, backend="xla")

    out1 = build().reconstruct(projs[:8], angles[:8])
    assert list(tmp_path.glob("*.paris-exec"))
    hits = []
    orig_load = compile_cache.load

    def spy(parts, execution_devices=None):
        exe = orig_load(parts, execution_devices)
        hits.append(exe is not None)
        return exe

    monkeypatch.setattr(compile_cache, "load", spy)
    out2 = build().reconstruct(projs[:8], angles[:8])
    assert hits == [True]
    np.testing.assert_array_equal(out1, out2)


def test_cache_eviction_bounds_size(tmp_path, monkeypatch):
    """Oldest entries are evicted once the dir exceeds the budget; the
    just-stored entry is never evicted."""
    import os
    import time
    from paris_tpu import compile_cache
    monkeypatch.setenv("PARIS_COMPILE_CACHE", str(tmp_path))
    # ~1 MB budget; three fake 600 KB entries
    monkeypatch.setenv("PARIS_COMPILE_CACHE_MAX_GB", str(1 / 1024))
    for i in range(3):
        p = tmp_path / f"entry{i}.paris-exec"
        p.write_bytes(b"x" * (600 << 10))
        t = time.time() - 100 + i
        os.utime(p, (t, t))
    compile_cache._evict(str(tmp_path), keep=str(tmp_path / "entry2.paris-exec"))
    left = sorted(q.name for q in tmp_path.glob("*.paris-exec"))
    assert left == ["entry2.paris-exec"], left


def test_eviction_survives_malformed_budget_env(tmp_path, monkeypatch):
    """A malformed PARIS_COMPILE_CACHE_MAX_GB must not raise out of
    _evict: it propagated into store()'s except, which misreported a
    SUCCESSFUL store as 'compile-cache store failed' (and the bound was
    never enforced).  Falls back to the 16 GB default instead."""
    from paris_tpu import compile_cache
    monkeypatch.setenv("PARIS_COMPILE_CACHE_MAX_GB", "16GB")
    p = tmp_path / "entry.paris-exec"
    p.write_bytes(b"x" * 1024)
    compile_cache._evict(str(tmp_path), keep=str(p))   # must not raise
    assert p.exists()                                  # within 16 GB default

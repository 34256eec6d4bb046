"""Round-5 hardening: x-tile ladder for wide-fan geometries, short
angle tables as errors, user HBM budget as an absolute cap, and the
deliberate writer-thread error path."""

import logging
import threading

import numpy as np
import pytest

from paris_tpu.geometry import DetectorGeometry, derive_volume_geometry
from paris_tpu.exceptions import StageConstructionError, StageRuntimeError


def _wide_fan_det(d_so: float) -> DetectorGeometry:
    return DetectorGeometry(64, 64, 2.0, 2.0, 0.0, 0.0, d_so + 8.0,
                            float(d_so), 2.0)


class TestXTileLadder:
    def test_ladder_narrows_for_wide_fan(self):
        from paris_tpu.pipeline import resolve_pallas_x_tile
        from paris_tpu.ops.backprojection_xla import make_bp_grid
        from paris_tpu.ops.backprojection_pallas import pallas_supported
        det = _wide_fan_det(60.0)
        vol = derive_volume_geometry(det)
        grid = make_bp_grid(det, vol)
        assert not pallas_supported(grid, 64)
        xt = resolve_pallas_x_tile(grid)
        assert xt is not None and xt < 64

    def test_requested_tile_falls_through_ladder(self):
        """A requested/env x-tile is an UPPER bound: a stale
        PARIS_BP_XTILE=64 on a wide-fan geometry must still land on a
        narrower supported rung, not re-open the XLA fallback."""
        from paris_tpu.pipeline import resolve_pallas_x_tile
        from paris_tpu.ops.backprojection_xla import make_bp_grid
        det = _wide_fan_det(60.0)
        vol = derive_volume_geometry(det)
        grid = make_bp_grid(det, vol)
        assert resolve_pallas_x_tile(grid, 64) == resolve_pallas_x_tile(grid)
        assert resolve_pallas_x_tile(grid, 64) in (16, 32)
        # a supported explicit request is honored exactly
        assert resolve_pallas_x_tile(grid, 16) == 16

    def test_wide_fan_pallas_matches_golden(self):
        """A geometry whose span fails the default 64-tile envelope must
        still run on the Pallas backend (narrowed tile) and meet the
        1e-3 gate (r4 verdict 4: no silent 3000x fallback)."""
        from paris_tpu.pipeline import Reconstructor
        from paris_tpu.phantom import cone_beam_project
        from paris_tpu.golden import golden_fdk
        det = _wide_fan_det(60.0)
        vol = derive_volume_geometry(det)
        angles = np.arange(0, 180, 4, dtype=np.float32) * 2.0
        scale = vol.dim_x * vol.l_vx_x / 2.0 * 0.9
        projs = cone_beam_project(det, angles, scale_mm=scale)
        rec = Reconstructor(det, vol, chunk_size=16, backend="pallas",
                            interpret=True)
        assert rec.backend == "pallas" and rec.x_tile < 64
        ours = rec.run(projs, angles)
        golden = golden_fdk(projs, angles, det, vol)
        rmse = float(np.sqrt(np.mean((ours - golden) ** 2)))
        s = float(np.abs(golden).max())
        assert rmse / s <= 1e-3, f"relative RMSE {rmse/s:.2e}"

    def test_fallback_beyond_envelope_warns(self, caplog, monkeypatch):
        from paris_tpu import pipeline
        det = _wide_fan_det(45.0)     # span > every tile's envelope
        vol = derive_volume_geometry(det)
        monkeypatch.setattr(pipeline, "_auto_backend", lambda: "pallas")
        with caplog.at_level(logging.WARNING, "paris_tpu.pipeline"):
            rec = pipeline.Reconstructor(det, vol, chunk_size=4,
                                         backend="auto")
        assert rec.backend == "xla"
        assert any("Pallas envelope" in r.message for r in caplog.records)

    def test_explicit_pallas_beyond_envelope_raises(self):
        from paris_tpu.pipeline import Reconstructor
        det = _wide_fan_det(45.0)
        vol = derive_volume_geometry(det)
        with pytest.raises(ValueError, match="Pallas envelope"):
            Reconstructor(det, vol, chunk_size=4, backend="pallas",
                          interpret=True)


class TestShortAngleFile:
    def test_short_angle_table_is_construction_error(self, tmp_path):
        from paris_tpu.io.his import write_his
        from paris_tpu.io.source import ProjectionSource
        projdir = tmp_path / "projs"
        projdir.mkdir()
        frames = np.random.rand(6, 8, 8).astype(np.float32)
        write_his(str(projdir / "a.his"), frames)
        angf = tmp_path / "angles.txt"
        angf.write_text("\n".join(str(i * 1.5) for i in range(4)))  # 4 < 6
        with pytest.raises(StageConstructionError, match="angle file"):
            ProjectionSource(str(projdir), angle_file=str(angf),
                             delta_phi=1.0)

    def test_full_angle_table_ok(self, tmp_path):
        from paris_tpu.io.his import write_his
        from paris_tpu.io.source import ProjectionSource
        projdir = tmp_path / "projs"
        projdir.mkdir()
        write_his(str(projdir / "a.his"),
                  np.random.rand(6, 8, 8).astype(np.float32))
        angf = tmp_path / "angles.txt"
        angf.write_text("\n".join(str(i * 1.5) for i in range(6)))
        src = ProjectionSource(str(projdir), angle_file=str(angf),
                               delta_phi=1.0)
        assert [p.phi for p in src] == pytest.approx(
            [i * 1.5 for i in range(6)])


class TestUserBudgetCap:
    def test_live_stats_capped_by_user_budget(self, monkeypatch):
        """With live memory stats AND an explicit user budget, the
        overlap estimate must not exceed the budget (the cap is
        absolute — co-tenant setups; ADVICE r4 medium)."""
        from paris_tpu import app
        monkeypatch.setattr(app, "_free_hbm_bytes", lambda: 16 << 30)
        cap = 2 << 30
        est = app._overlap_free_est(cap, budget_is_auto=False)
        assert est == cap
        # auto budgets keep the live estimate
        est_auto = app._overlap_free_est(cap, budget_is_auto=True)
        assert est_auto == int((16 << 30) * 0.95)


class TestWriterErrorPath:
    def test_sink_failure_mid_overlap_raises_and_joins(self, tmp_path,
                                                       monkeypatch):
        """A write failure on the overlap writer thread must surface as
        StageRuntimeError, leave no block marked done, and leave no
        orphaned writer thread (r4 verdict 6)."""
        from paris_tpu.app import ReconstructionJob, run_job
        from paris_tpu.io.sink import VolumeSink
        from paris_tpu.io.his import write_his
        from paris_tpu.phantom import cone_beam_project
        det = DetectorGeometry(16, 16, 8.0, 8.0, 0.0, 0.0,
                               1000.0, 500.0, 24.0)
        vol = derive_volume_geometry(det)
        projdir = tmp_path / "projs"
        projdir.mkdir()
        scale = vol.dim_x * vol.l_vx_x / 2.0 * 0.9
        projs = cone_beam_project(det, np.arange(15) * 24.0, scale_mm=scale)
        write_his(str(projdir / "a.his"), projs)

        def boom(self, index, data, z0):
            raise OSError("injected sink failure")

        monkeypatch.setattr(VolumeSink, "write_block", boom)
        job = ReconstructionJob(
            det=det, input_path=str(projdir), output_path=str(tmp_path),
            prefix="v", backend="xla", block_dz=8, chunk_size=8)
        with pytest.raises(StageRuntimeError, match="injected"):
            run_job(job)
        assert not any(t.name.startswith("paris-write")
                       for t in threading.enumerate())
        sink = VolumeSink(str(tmp_path), "v", vol.dim_x, vol.dim_y,
                          vol.dim_z, resume=True)
        assert not any(sink.is_done(i) for i in range(4))


class TestMaxBlocks:
    def test_max_blocks_stops_and_resume_completes(self, tmp_path):
        """max_blocks=1 computes exactly one new block per invocation;
        re-running with resume=True completes the volume — the
        per-process containment knob for long jobs (e.g. transports
        that pin h2d payloads for the process lifetime)."""
        from paris_tpu.app import ReconstructionJob, run_job
        from paris_tpu.io.his import write_his
        from paris_tpu.io import ddbvf
        from paris_tpu.phantom import cone_beam_project
        import json

        det = DetectorGeometry(16, 16, 8.0, 8.0, 0.0, 0.0,
                               1000.0, 500.0, 24.0)
        vol = derive_volume_geometry(det)
        projdir = tmp_path / "projs"
        projdir.mkdir()
        scale = vol.dim_x * vol.l_vx_x / 2.0 * 0.9
        projs = cone_beam_project(det, np.arange(15) * 24.0,
                                  scale_mm=scale)
        write_his(str(projdir / "a.his"), projs)

        def job(**kw):
            return ReconstructionJob(
                det=det, input_path=str(projdir),
                output_path=str(tmp_path), prefix="v", backend="xla",
                block_dz=8, chunk_size=8, **kw)

        out = run_job(job(max_blocks=1))
        manifest = json.load(open(out + ".manifest.json"))
        assert manifest["completed_blocks"] == [0]
        out = run_job(job(resume=True))
        manifest = json.load(open(out + ".manifest.json"))
        assert len(manifest["completed_blocks"]) >= 2
        # complete volume equals a single uninterrupted run
        ref = run_job(ReconstructionJob(
            det=det, input_path=str(projdir),
            output_path=str(tmp_path / "ref"), prefix="v",
            backend="xla", block_dz=8, chunk_size=8))
        np.testing.assert_array_equal(ddbvf.read_volume(out),
                                      ddbvf.read_volume(ref))


def test_step_cache_key_delta_phi_invariant():
    """Two scans of one geometry at different angular steps (360- vs
    3600-projection) must share one compiled step: delta_phi never
    enters the traced program (angles are runtime sin/cos)."""
    from paris_tpu.pipeline import Reconstructor
    import dataclasses
    det = DetectorGeometry(32, 32, 4.0, 4.0, 0.0, 0.0, 500.0, 500.0, 1.0)
    vol = derive_volume_geometry(det)
    a = Reconstructor(det, vol, chunk_size=4, backend="xla")
    b = Reconstructor(dataclasses.replace(det, delta_phi=0.1), vol,
                      chunk_size=4, backend="xla")
    assert a._step is b._step


def test_quantize_concurrency_param_identical():
    from paris_tpu.pipeline import quantize_chunk_u16
    chunk = np.random.rand(4, 32, 64).astype(np.float32) * 100.0
    q1, p1 = quantize_chunk_u16(chunk, 6, concurrency=1)
    q2, p2 = quantize_chunk_u16(chunk, 6, concurrency=2)
    np.testing.assert_array_equal(q1, q2)
    np.testing.assert_array_equal(p1, p2)

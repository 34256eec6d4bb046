"""Device ops (jnp/XLA path) vs the independent NumPy golden oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from paris_tpu.geometry import DetectorGeometry, derive_volume_geometry
from paris_tpu.golden import golden_backproject, golden_filter, golden_weight
from paris_tpu.ops.backprojection_xla import backproject_chunk_xla, make_bp_grid
from paris_tpu.ops.filtering import filter_projections, ramp_filter_spectrum
from paris_tpu.ops.weighting import apply_weights, weight_map


@pytest.fixture(scope="module")
def det():
    return DetectorGeometry(
        n_row=96, n_col=80, l_px_row=1.0, l_px_col=1.0,
        delta_s=0.0, delta_t=0.0, d_so=200.0, d_od=400.0, delta_phi=2.0,
    )


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(42)


def test_weighting_matches_golden(det, rng):
    p = rng.standard_normal((det.n_col, det.n_row)).astype(np.float32)
    ours = np.asarray(apply_weights(jnp.asarray(p), weight_map(det)))
    ref = golden_weight(p, det)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_filtering_matches_golden(det, rng):
    p = rng.standard_normal((det.n_col, det.n_row)).astype(np.float32)
    spec = ramp_filter_spectrum(det.n_row, det.l_px_row)
    ours = np.asarray(filter_projections(jnp.asarray(p)[None], spec, det.n_row))[0]
    ref = golden_filter(p, det)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_filtering_dc_removal(det):
    # the ramp filter must suppress constant rows to ~0
    p = jnp.ones((1, det.n_col, det.n_row), jnp.float32)
    spec = ramp_filter_spectrum(det.n_row, det.l_px_row)
    out = np.asarray(filter_projections(p, spec, det.n_row))
    # interior of the row (away from truncation edges)
    assert np.abs(out[0, :, 20:-20]).max() < 0.05


def test_backprojection_matches_golden(det, rng):
    vol = derive_volume_geometry(det)
    grid = make_bp_grid(det, vol)
    n_proj = 4
    projs = rng.standard_normal((n_proj, det.n_col, det.n_row)).astype(np.float32)
    angles = np.array([0.0, 30.0, 117.5, 241.0], dtype=np.float32)

    ref = np.zeros((vol.dim_z, vol.dim_y, vol.dim_x), np.float32)
    for p, a in zip(projs, angles):
        ref = golden_backproject(ref, p, float(a), det, vol)

    phi = np.deg2rad(angles)
    ours = backproject_chunk_xla(
        jnp.zeros((vol.dim_z, vol.dim_y, vol.dim_x), jnp.float32),
        jnp.asarray(projs),
        jnp.asarray(np.sin(phi), dtype=jnp.float32),
        jnp.asarray(np.cos(phi), dtype=jnp.float32),
        grid,
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_backprojection_z_offset_consistency(det, rng):
    """Backprojecting two half-blocks with z offsets == full volume."""
    vol = derive_volume_geometry(det)
    grid = make_bp_grid(det, vol)
    p = rng.standard_normal((1, det.n_col, det.n_row)).astype(np.float32)
    phi = np.deg2rad([45.0]).astype(np.float32)
    sin, cos = jnp.sin(jnp.asarray(phi)), jnp.cos(jnp.asarray(phi))

    full = backproject_chunk_xla(
        jnp.zeros((vol.dim_z, vol.dim_y, vol.dim_x), jnp.float32),
        jnp.asarray(p), sin, cos, grid,
    )
    dz0 = vol.dim_z // 2
    top = backproject_chunk_xla(
        jnp.zeros((dz0, vol.dim_y, vol.dim_x), jnp.float32),
        jnp.asarray(p), sin, cos, grid, z_offset=0,
    )
    bot = backproject_chunk_xla(
        jnp.zeros((vol.dim_z - dz0, vol.dim_y, vol.dim_x), jnp.float32),
        jnp.asarray(p), sin, cos, grid, z_offset=dz0,
    )
    stacked = np.concatenate([np.asarray(top), np.asarray(bot)], axis=0)
    np.testing.assert_allclose(stacked, np.asarray(full), rtol=1e-5, atol=1e-6)


def test_backprojection_roi_offset_matches_crop(det, rng):
    """ROI-offset backprojection == crop of the full backprojection."""
    vol = derive_volume_geometry(det)
    grid = make_bp_grid(det, vol)
    p = rng.standard_normal((1, det.n_col, det.n_row)).astype(np.float32)
    phi = np.deg2rad([77.0]).astype(np.float32)
    sin, cos = jnp.sin(jnp.asarray(phi)), jnp.cos(jnp.asarray(phi))

    full = np.asarray(backproject_chunk_xla(
        jnp.zeros((vol.dim_z, vol.dim_y, vol.dim_x), jnp.float32),
        jnp.asarray(p), sin, cos, grid,
    ))
    x1, y1, z1 = 10, 14, 6
    dx, dy, dz = 16, 12, 8
    roi = np.asarray(backproject_chunk_xla(
        jnp.zeros((dz, dy, dx), jnp.float32),
        jnp.asarray(p), sin, cos, grid, roi_offset=(x1, y1, z1),
    ))
    np.testing.assert_allclose(
        roi, full[z1:z1 + dz, y1:y1 + dy, x1:x1 + dx], rtol=1e-5, atol=1e-6,
    )


def test_xla_backproject_z_slabbed_matches_unslabbed():
    """max_temp_bytes z-slabbing is a pure working-set knob: forcing
    many tiny slabs must reproduce the single-slab result exactly."""
    import jax.numpy as jnp

    from paris_tpu.geometry import DetectorGeometry, derive_volume_geometry
    from paris_tpu.ops.backprojection_xla import (backproject_chunk_xla,
                                                  make_bp_grid)

    det = DetectorGeometry(48, 48, 2.0, 2.0, 0.5, -0.25, 400.0, 400.0, 5.0)
    vol = derive_volume_geometry(det)
    grid = make_bp_grid(det, vol)
    rng = np.random.default_rng(3)
    projs = jnp.asarray(
        rng.standard_normal((4, det.n_col, det.n_row)).astype(np.float32))
    phi = np.deg2rad(np.arange(4) * 30.0).astype(np.float32)
    sin, cos = jnp.asarray(np.sin(phi)), jnp.asarray(np.cos(phi))
    v0 = jnp.zeros((vol.dim_z, vol.dim_y, vol.dim_x), jnp.float32)
    full = backproject_chunk_xla(v0, projs, sin, cos, grid)
    slabbed = backproject_chunk_xla(v0, projs, sin, cos, grid,
                                    max_temp_bytes=4 * vol.dim_x * vol.dim_y * 3)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(slabbed))

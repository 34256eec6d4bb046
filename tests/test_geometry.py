"""Geometry derivation, ROI, z-block planning, row-band tests."""

import math

import pytest

from paris_tpu.geometry import (
    DetectorGeometry,
    RegionOfInterest,
    VolumeGeometry,
    apply_roi,
    derive_volume_geometry,
    detector_row_band,
    filter_size_for,
    plan_z_blocks,
    weighting_constants,
)


def schaum_like_det():
    """Geometry resembling the reference's documented scan (doc/schaum.geo
    values, mapped to the parser's key names n_row/n_col/... —
    reference program_options.cpp:83-91)."""
    return DetectorGeometry(
        n_row=1016, n_col=401,
        l_px_row=0.2, l_px_col=0.2,
        delta_s=4.6, delta_t=0.0,
        d_so=200.0, d_od=1000.0,
        delta_phi=0.1,
    )


def test_derive_volume_geometry_matches_reference_math():
    det = schaum_like_det()
    vol = derive_volume_geometry(det)

    # independent recomputation of geometry.cpp:36-67
    d_so = abs(det.d_so)
    d_sd = d_so + abs(det.d_od)
    delta_s_mm = abs(det.delta_s * det.l_px_row)
    half_w = det.n_row * det.l_px_row / 2 + delta_s_mm
    alpha = math.atan(half_w / d_sd)
    r = d_so * math.sin(alpha)
    l_vx = r / (half_w / det.l_px_row)
    assert vol.l_vx_x == pytest.approx(l_vx)
    assert vol.l_vx_y == vol.l_vx_x == vol.l_vx_z
    assert vol.dim_x == int(2 * r / l_vx)
    assert vol.dim_x == vol.dim_y
    exp_dim_z = int((det.n_col * det.l_px_col / 2) * (d_so / d_sd) * 2 / l_vx)
    assert vol.dim_z == exp_dim_z
    # sanity: the cubic voxel assumption gives dim_x slightly over 1016
    assert 1000 <= vol.dim_x <= 1100


def test_volume_is_cube_when_no_offset():
    det = DetectorGeometry(1024, 1024, 0.1, 0.1, 0.0, 0.0, 100.0, 100.0, 0.5)
    vol = derive_volume_geometry(det)
    assert vol.dim_x == vol.dim_y
    assert vol.dim_x > 0 and vol.dim_z > 0


def test_apply_roi_inclusive_dims():
    vol = VolumeGeometry(100, 100, 50, 0.1, 0.1, 0.1)
    roi = RegionOfInterest(x1=10, x2=19, y1=0, y2=99, z1=5, z2=44)
    out = apply_roi(vol, roi)
    assert (out.dim_x, out.dim_y, out.dim_z) == (10, 100, 40)
    assert out.l_vx_x == vol.l_vx_x


def test_apply_roi_rejects_bad_coords():
    vol = VolumeGeometry(100, 100, 50, 0.1, 0.1, 0.1)
    with pytest.raises(ValueError):
        apply_roi(vol, RegionOfInterest(x1=5, x2=5, y1=0, y2=9, z1=0, z2=9))
    with pytest.raises(ValueError):
        apply_roi(vol, RegionOfInterest(x1=0, x2=99, y1=0, y2=99, z1=0, z2=60))


def test_plan_z_blocks_single():
    vol = VolumeGeometry(64, 64, 64, 0.1, 0.1, 0.1)
    info = plan_z_blocks(vol)
    assert info.num == 1
    assert info.blocks[0].z0 == 0
    assert info.blocks[0].dim_z == 64


def test_plan_z_blocks_budget_split_covers_volume():
    vol = VolumeGeometry(256, 256, 250, 0.1, 0.1, 0.1)
    slice_bytes = 4 * 256 * 256
    info = plan_z_blocks(vol, hbm_budget_bytes=slice_bytes * 64, num_shards=1)
    assert info.num >= 4
    covered = []
    for b in info.blocks:
        covered.extend(range(b.z0, b.z0 + b.dim_z))
        assert b.dim_z <= b.dim_z_padded
        assert b.dim_z_padded % 8 == 0
    assert covered == list(range(250))


def test_plan_z_blocks_forced_block_dz():
    vol = VolumeGeometry(128, 128, 500, 0.1, 0.1, 0.1)
    info = plan_z_blocks(vol, block_dz=128)
    assert info.num == 4
    assert info.dim_z_padded == 128
    covered = []
    for b in info.blocks:
        covered.extend(range(b.z0, b.z0 + b.dim_z))
    assert covered == list(range(500))
    # forced extent is aligned up for sharded meshes
    info8 = plan_z_blocks(vol, block_dz=100, num_shards=8)
    assert info8.dim_z_padded % 64 == 0


def test_plan_z_blocks_shard_alignment():
    vol = VolumeGeometry(128, 128, 100, 0.1, 0.1, 0.1)
    info = plan_z_blocks(vol, num_shards=8)
    assert info.dim_z_padded % 64 == 0  # 8 shards * z_align 8


def test_detector_row_band_full_volume_covers_all_rows():
    det = schaum_like_det()
    vol = derive_volume_geometry(det)
    lo, hi = detector_row_band(det, vol, 0, vol.dim_z)
    assert lo == 0
    assert hi == det.n_col


def test_detector_row_band_center_block_is_narrow():
    det = schaum_like_det()
    vol = derive_volume_geometry(det)
    z_mid = vol.dim_z // 2
    lo, hi = detector_row_band(det, vol, z_mid - 8, 16)
    assert 0 < lo < hi < det.n_col
    assert (hi - lo) < det.n_col // 2


def test_weighting_constants():
    det = schaum_like_det()
    h_min, v_min, d_sd = weighting_constants(det)
    assert h_min == pytest.approx(4.6 * 0.2 - 1016 * 0.2 / 2)
    assert v_min == pytest.approx(-401 * 0.2 / 2)
    assert d_sd == pytest.approx(1200.0)


def test_filter_size():
    assert filter_size_for(1016) == 2048
    assert filter_size_for(1024) == 2048
    assert filter_size_for(1025) == 4096
    assert filter_size_for(64) == 128


def test_detector_row_band_covers_corner_voxels():
    """The band must cover CORNER voxels' detector rows.

    The kernels compute every voxel of the square x/y extent (reference
    cuda/backprojection.cu:96-128 does too); a corner voxel magnifies by
    d_sd/(d_so - r*sqrt(2)), beyond the inscribed-radius bound.
    Regression: a band sized from the inscribed radius let an
    on-detector corner sample land outside the band and gather garbage.
    """
    det = DetectorGeometry(
        n_row=96, n_col=256, l_px_row=2.0, l_px_col=2.0,
        delta_s=0.0, delta_t=0.0, d_so=300.0, d_od=300.0, delta_phi=2.0,
    )
    vol = derive_volume_geometry(det)
    for z0 in range(0, vol.dim_z - 16, 16):
        lo, hi = detector_row_band(det, vol, z0, 16)
        # worst-case corner voxel of the block (mm -> fractional px)
        r_c = min(vol.dim_x / 2.0 * vol.l_vx_x * math.sqrt(2.0),
                  abs(det.d_so) * 0.95)
        v_min_mm = det.delta_t * det.l_px_col - det.n_col * det.l_px_col / 2
        need_lo, need_hi = det.n_col, 0
        for zi in (z0, z0 + 15):
            z_mm = (-(vol.dim_z * vol.l_vx_z) / 2.0 + vol.l_vx_z / 2.0
                    + zi * vol.l_vx_z)
            for f in (det.d_sd / (abs(det.d_so) - r_c),
                      det.d_sd / (abs(det.d_so) + r_c)):
                v_px = (z_mm * f - v_min_mm) / det.l_px_col - 0.5
                need_lo = min(need_lo, int(math.floor(v_px)))
                need_hi = max(need_hi, int(math.ceil(v_px)) + 1)
        assert lo <= max(0, need_lo), (z0, lo, need_lo)
        assert hi >= min(det.n_col, need_hi), (z0, hi, need_hi)

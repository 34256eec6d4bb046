"""HIS / ddbvf / geometry-file / angle-file round-trips (SURVEY.md §4(c))."""

import os
import struct

import numpy as np
import pytest

from paris_tpu.io.his import read_his, write_his, HisFormatError, HIS_FILE_ID
from paris_tpu.io import ddbvf
from paris_tpu.io.geometry_file import (
    dump_geometry_file, load_geometry_file, parse_geometry_text,
    geometry_format_help,
)
from paris_tpu.io.angles import read_angles, angles_for
from paris_tpu.io.source import ProjectionSource
from paris_tpu.geometry import DetectorGeometry


# ---------------------------------------------------------------- HIS

@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.uint32,
                                   np.float32, np.float64])
def test_his_roundtrip_dtypes(tmp_path, dtype):
    rng = np.random.default_rng(1)
    raw = rng.uniform(0, 200, size=(3, 12, 17))
    frames = raw.astype(dtype)
    p = str(tmp_path / "t.his")
    write_his(p, frames, number_dtype=dtype)
    back = read_his(p)
    assert back.shape == (3, 12, 17)
    assert back.dtype == np.float32
    np.testing.assert_array_equal(back, frames.astype(np.float32))


def test_his_header_layout(tmp_path):
    """Byte-level layout must match the reference reader (his.cpp:46-67)."""
    p = str(tmp_path / "t.his")
    write_his(p, np.zeros((2, 4, 6), np.uint16), number_dtype=np.uint16)
    with open(p, "rb") as f:
        buf = f.read()
    assert struct.unpack_from("<H", buf, 0)[0] == HIS_FILE_ID        # magic
    assert struct.unpack_from("<H", buf, 2)[0] == 68                 # header size
    ulx, uly, brx, bry = struct.unpack_from("<HHHH", buf, 12)
    assert (brx - ulx + 1, bry - uly + 1) == (6, 4)                  # bbox dims
    assert struct.unpack_from("<H", buf, 20)[0] == 2                 # frames
    assert struct.unpack_from("<H", buf, 32)[0] == 4                 # u16 type
    # total size: 68 + 2*(32 + 4*6*2)
    assert len(buf) == 68 + 2 * (32 + 48)


def test_his_rejects_garbage(tmp_path):
    p = str(tmp_path / "bad.his")
    with open(p, "wb") as f:
        f.write(b"\x00" * 200)
    with pytest.raises(HisFormatError):
        read_his(p)


# ---------------------------------------------------------------- ddbvf

def test_ddbvf_roundtrip(tmp_path):
    p = str(tmp_path / "v.ddbvf")
    ddbvf.create(p, 6, 5, 9)
    assert ddbvf.open_meta(p) == (6, 5, 9)
    rng = np.random.default_rng(2)
    vol = rng.standard_normal((9, 5, 6)).astype(np.float32)
    ddbvf.write_slices(p, vol[:4], 0)
    ddbvf.write_slices(p, vol[4:], 4)
    np.testing.assert_array_equal(ddbvf.read_volume(p), vol)
    np.testing.assert_array_equal(ddbvf.read_slices(p, 3, 2), vol[3:5])


def test_ddbvf_header_layout(tmp_path):
    """Layout per reference ddbvf.cpp:45-58: magic, version, dims; data@32."""
    p = str(tmp_path / "v.ddbvf")
    ddbvf.create(p, 2, 3, 4)
    with open(p, "rb") as f:
        buf = f.read(32)
    assert struct.unpack_from("<I", buf, 0)[0] == 0xEFDDDAFA
    assert struct.unpack_from("<H", buf, 4)[0] == 0x0010
    assert struct.unpack_from("<III", buf, 6) == (2, 3, 4)
    assert os.path.getsize(p) == 32 + 4 * 2 * 3 * 4


def test_ddbvf_bounds_checks(tmp_path):
    p = str(tmp_path / "v.ddbvf")
    ddbvf.create(p, 4, 4, 4)
    with pytest.raises(ddbvf.DdbvfFormatError):
        ddbvf.write_slices(p, np.zeros((2, 4, 5), np.float32), 0)   # wrong x
    with pytest.raises(ddbvf.DdbvfFormatError):
        ddbvf.write_slices(p, np.zeros((3, 4, 4), np.float32), 2)   # overrun
    with pytest.raises(ddbvf.DdbvfFormatError):
        ddbvf.open_meta(__file__)                                    # not ddbvf


# ---------------------------------------------------------------- geometry file

def test_geometry_file_roundtrip(tmp_path):
    det = DetectorGeometry(100, 80, 0.5, 0.4, 1.5, -0.5, 300.0, 700.0, 0.25)
    p = str(tmp_path / "a.geo")
    dump_geometry_file(det, p)
    assert load_geometry_file(p) == det


def test_geometry_file_missing_key():
    with pytest.raises(ValueError, match="missing"):
        parse_geometry_text("n_row = 10\nn_col = 10\n")


def test_geometry_file_unknown_key():
    with pytest.raises(ValueError, match="unknown"):
        parse_geometry_text("det_pixels_row = 1016\n")  # obsolete schaum.geo key


def test_geometry_file_comments_and_help():
    text = "\n".join(
        f"{k} = 1" for k in
        "n_row n_col l_px_row l_px_col delta_s delta_t d_so d_od delta_phi".split()
    ) + "\n# comment\n; other comment\n"
    det = parse_geometry_text(text)
    assert det.n_row == 1
    assert "n_row" in geometry_format_help()


# ---------------------------------------------------------------- angles

def test_angles_plain(tmp_path):
    p = str(tmp_path / "a.txt")
    with open(p, "w") as f:
        f.write("0.0 1.5\n3.0\n4.5")
    np.testing.assert_allclose(read_angles(p), [0.0, 1.5, 3.0, 4.5])


def test_angles_german_decimal(tmp_path):
    """Comma-decimal files (reference source.cpp:54-62 de_DE handling)."""
    p = str(tmp_path / "a.txt")
    with open(p, "w") as f:
        f.write("0,0 1,5 3,0")
    np.testing.assert_allclose(read_angles(p), [0.0, 1.5, 3.0])


def test_angles_for_fallback():
    np.testing.assert_allclose(angles_for([0, 2, 4], 0.5), [0.0, 1.0, 2.0])
    np.testing.assert_allclose(
        angles_for([1, 2], 0.5, angle_table=[9.0, 8.0, 7.0]), [8.0, 7.0]
    )


# ---------------------------------------------------------------- source

def _write_scan(tmp_path, n_files=3, frames_per_file=4):
    d = tmp_path / "proj"
    d.mkdir()
    rng = np.random.default_rng(3)
    all_frames = []
    for i in range(n_files):
        fr = rng.uniform(0, 100, (frames_per_file, 6, 8)).astype(np.float32)
        write_his(str(d / f"f{i:03d}.his"), fr)
        all_frames.append(fr)
    return str(d), np.concatenate(all_frames)


def test_source_streams_in_order(tmp_path):
    d, frames = _write_scan(tmp_path)
    src = ProjectionSource(d, delta_phi=0.5, prefetch=2)
    got = list(src)
    assert [p.idx for p in got] == list(range(12))
    assert got[5].phi == pytest.approx(2.5)
    np.testing.assert_array_equal(np.stack([p.data for p in got]), frames)


def test_source_quality_decimation(tmp_path):
    """quality=q keeps every q-th global frame (reference source.cpp:105)."""
    d, frames = _write_scan(tmp_path)
    src = ProjectionSource(d, delta_phi=1.0, quality=3, prefetch=0)
    got = list(src)
    assert [p.idx for p in got] == [0, 3, 6, 9]
    np.testing.assert_array_equal(got[1].data, frames[3])


def test_source_decode_strategy_crossover(tmp_path, monkeypatch):
    """Decoder selection: small quality factors keep the THREADED native
    full-decode (decoding 1/2 the frames single-threaded loses); large
    factors (>= 4) or a missing native lib switch to the selective
    reader, which skips unwanted frames' pixel decode entirely."""
    from paris_tpu.io import his, native
    d, frames = _write_scan(tmp_path)          # 3 files x 4 frames
    if native.available():
        his.DECODE_STATS["frames"] = 0
        got = list(ProjectionSource(d, delta_phi=1.0, quality=2,
                                    prefetch=0))
        assert his.DECODE_STATS["frames"] == 12      # native full decode
        assert [p.idx for p in got] == [0, 2, 4, 6, 8, 10]
    his.DECODE_STATS["frames"] = 0
    got = list(ProjectionSource(d, delta_phi=1.0, quality=4, prefetch=0))
    assert his.DECODE_STATS["frames"] == 3           # selective: kept only
    assert [p.idx for p in got] == [0, 4, 8]
    np.testing.assert_array_equal(got[1].data, frames[4])
    # without the native decoder, selective wins at any q > 1
    monkeypatch.setenv("PARIS_IO_NO_NATIVE", "1")
    his.DECODE_STATS["frames"] = 0
    got = list(ProjectionSource(d, delta_phi=1.0, quality=2, prefetch=0))
    assert his.DECODE_STATS["frames"] == 6
    assert [p.idx for p in got] == [0, 2, 4, 6, 8, 10]


def test_source_skips_invalid_files(tmp_path, caplog):
    d, frames = _write_scan(tmp_path)
    with open(os.path.join(d, "aaa_junk.his"), "wb") as f:
        f.write(b"garbage")
    src = ProjectionSource(d, delta_phi=1.0)
    got = list(src)
    assert len(got) == 12  # junk skipped, indices unaffected


def test_source_angle_file(tmp_path):
    d, _ = _write_scan(tmp_path)
    af = tmp_path / "angles.txt"
    af.write_text(" ".join(str(0.7 * i) for i in range(12)))
    src = ProjectionSource(d, angle_file=str(af), prefetch=0)
    got = list(src)
    assert got[4].phi == pytest.approx(2.8)


def test_source_chunks(tmp_path):
    d, _ = _write_scan(tmp_path)
    src = ProjectionSource(d, delta_phi=1.0)
    chunks = list(src.iter_chunks(5))
    assert [len(c) for c in chunks] == [5, 5, 2]


def test_read_his_selective_decodes_only_wanted(tmp_path):
    """read_his_selective skips the pixel decode of unwanted frames and
    returns bit-identical data for wanted ones."""
    from paris_tpu.io import his
    d, frames = _write_scan(tmp_path, n_files=1, frames_per_file=6)
    path = os.path.join(d, sorted(os.listdir(d))[0])
    his.DECODE_STATS["frames"] = 0
    n, got = his.read_his_selective(path, lambda j: j % 2 == 0)
    assert n == 6
    assert sorted(got) == [0, 2, 4]
    assert his.DECODE_STATS["frames"] == 3
    for j in (0, 2, 4):
        np.testing.assert_array_equal(got[j], frames[j])


def test_source_slot_filter_disjoint_decode(tmp_path, monkeypatch):
    """slot_filter: unwanted stream positions arrive with data=None and
    are never pixel-decoded; wanted ones are identical to a full read.
    Includes quality decimation crossing file boundaries."""
    from paris_tpu.io import his
    monkeypatch.setenv("PARIS_IO_NO_NATIVE", "1")
    d, frames = _write_scan(tmp_path)          # 3 files x 4 frames
    # quality=2 keeps global indices 0,2,4,6,8,10 -> stream pos 0..5
    chunk = 4
    owned = {1, 3}                             # slots of "this host"
    src = ProjectionSource(
        d, delta_phi=1.0, quality=2, prefetch=0,
        slot_filter=lambda pos: (pos % chunk) in owned)
    his.DECODE_STATS["frames"] = 0
    got = list(src)
    assert [p.idx for p in got] == [0, 2, 4, 6, 8, 10]
    # stream positions 1,3,5 owned (5 % 4 == 1); 0,2,4 skipped
    assert [p.data is None for p in got] == [True, False, True, False,
                                             True, False]
    assert his.DECODE_STATS["frames"] == 3
    for pos in (1, 3, 5):
        np.testing.assert_array_equal(got[pos].data, frames[got[pos].idx])
    # angles still assigned for undecoded frames
    assert got[0].phi == pytest.approx(0.0)
    assert got[2].phi == pytest.approx(4.0)


def test_ddbvf_rejects_negative_first(tmp_path):
    """Regression: first=-1 used to pass validation and corrupt offsets."""
    p = str(tmp_path / "v.ddbvf")
    ddbvf.create(p, 4, 4, 4)
    with pytest.raises(ddbvf.DdbvfFormatError):
        ddbvf.write_slices(p, np.zeros((2, 4, 4), np.float32), -1)
    with pytest.raises(ddbvf.DdbvfFormatError):
        ddbvf.write_subrows(p, np.zeros((2, 2, 4), np.float32), -1, 0)
    with pytest.raises(ddbvf.DdbvfFormatError):
        ddbvf.write_subrows(p, np.zeros((2, 2, 4), np.float32), 0, -1)


def test_ddbvf_write_subrows(tmp_path):
    """Disjoint y-slab writes tile the same volume as slice writes."""
    p = str(tmp_path / "v.ddbvf")
    dim_x, dim_y, dim_z = 6, 8, 5
    ddbvf.create(p, dim_x, dim_y, dim_z)
    rng = np.random.default_rng(9)
    vol = rng.standard_normal((dim_z, dim_y, dim_x)).astype(np.float32)
    # write in 4 y-slabs of 2 rows each (the multi-host shard pattern)
    for y0 in range(0, dim_y, 2):
        ddbvf.write_subrows(p, vol[:, y0:y0 + 2], 0, y0)
    np.testing.assert_array_equal(ddbvf.read_volume(p), vol)
    # y-range overrun rejected
    with pytest.raises(ddbvf.DdbvfFormatError):
        ddbvf.write_subrows(p, np.zeros((1, 3, dim_x), np.float32), 0, 6)


def test_his_fuzz_frame_headers_and_mixed_dtypes(tmp_path):
    """Real-world HIS archives mix dtypes across files and carry
    arbitrary non-zero per-frame image headers (reference tolerates any
    image_header_size, src/his.cpp:157-166).  Fuzz both the pure-Python
    and (if built) native decode paths through ProjectionSource."""
    from paris_tpu.io.his import (read_his, HIS_FILE_ID, _HEADER_FMT,
                                  _FILE_HEADER_SIZE, _DTYPE_TO_NUMBER_TYPE)
    from paris_tpu.io.source import ProjectionSource
    import struct as _struct

    rng = np.random.default_rng(11)
    h, w = 9, 13
    dtypes = [np.uint8, np.uint16, np.uint32, np.float64, np.float32]
    expected = []
    for fi, dt in enumerate(dtypes):
        n_frames = int(rng.integers(1, 4))
        ihs = int(rng.integers(0, 200))          # random image header size
        dtype = np.dtype(dt)
        if dtype.kind == "f":
            frames = rng.standard_normal((n_frames, h, w)).astype(dtype)
        else:
            frames = rng.integers(
                0, min(250, np.iinfo(dtype).max),
                (n_frames, h, w)).astype(dtype)
        file_size = _FILE_HEADER_SIZE + n_frames * (ihs + w * h * dtype.itemsize)
        header = _struct.pack(
            _HEADER_FMT, HIS_FILE_ID, _FILE_HEADER_SIZE, 100, file_size,
            ihs, 3, 5, 3 + w - 1, 5 + h - 1, n_frames, 0, 1.25,
            _DTYPE_TO_NUMBER_TYPE[dtype])
        header += b"\x00" * (_FILE_HEADER_SIZE - len(header))
        path = tmp_path / f"f{fi:02d}.his"
        with open(path, "wb") as f:
            f.write(header)
            for i in range(n_frames):
                # NON-zero junk header content must be skipped, not parsed
                f.write(rng.bytes(ihs))
                f.write(np.ascontiguousarray(frames[i]).tobytes())
        got = read_his(str(path))
        np.testing.assert_allclose(got, frames.astype(np.float32),
                                   rtol=0, atol=0)
        expected.extend(frames.astype(np.float32))

    # the streaming source flattens all files' frames in sorted order
    src = ProjectionSource(str(tmp_path), delta_phi=1.0)
    streamed = [p.data for chunk in src.iter_chunks(4) for p in chunk]
    assert len(streamed) == len(expected)
    for got, exp in zip(streamed, expected):
        np.testing.assert_array_equal(got, exp)


def test_his_fuzz_mixed_headers_and_dtypes(tmp_path):
    """Fuzz-ish HIS hardening (reference src/his.cpp:157-166 tolerates
    arbitrary per-frame image headers): random image_header_size (with
    NONZERO garbage content, which must be skipped, not parsed), every
    supported dtype mixed in one directory, random frame counts — all
    streamed through ProjectionSource in sorted order."""
    import struct

    from paris_tpu.io.his import read_his, write_his, _FILE_HEADER_SIZE
    from paris_tpu.io.source import ProjectionSource

    rng = np.random.default_rng(42)
    dtypes = [np.uint8, np.uint16, np.uint32, np.float64, np.float32]
    h, w = 24, 40
    expected = []
    for i, hdr_size in enumerate([0, 7, 32, 100, 257]):
        dt = dtypes[i]
        n = int(rng.integers(1, 5))
        if np.issubdtype(dt, np.integer):
            frames = rng.integers(0, np.iinfo(dt).max, (n, h, w)).astype(dt)
        else:
            frames = rng.standard_normal((n, h, w)).astype(dt)
        path = tmp_path / f"f{i:02d}.his"
        write_his(path, frames, number_dtype=dt, image_header_size=hdr_size)
        # overwrite the zeroed per-frame headers with garbage bytes: the
        # reader must SKIP them (a reader that parses or miscounts them
        # would corrupt every subsequent frame offset)
        if hdr_size:
            raw = bytearray(path.read_bytes())
            frame_bytes = w * h * np.dtype(dt).itemsize
            pos = _FILE_HEADER_SIZE
            for _ in range(n):
                raw[pos:pos + hdr_size] = rng.integers(
                    0, 256, hdr_size, dtype=np.uint8).tobytes()
                pos += hdr_size + frame_bytes
            path.write_bytes(bytes(raw))
        back = read_his(str(path))
        np.testing.assert_array_equal(back, frames.astype(np.float32))
        expected.append(frames.astype(np.float32))

    flat = np.concatenate(expected)
    src = ProjectionSource(str(tmp_path), delta_phi=1.0)
    got = []
    for chunk in src.iter_chunks(3):
        got.extend(p.data for p in chunk)
    assert len(got) == len(flat)
    np.testing.assert_array_equal(np.stack(got), flat)


def test_source_abandoned_iteration_reaps_prefetch_thread(tmp_path):
    """A consumer that abandons iteration mid-stream (exception in the
    reconstruct loop) must not leave the prefetch worker blocked on a
    full queue holding an open file."""
    import threading
    import time

    d, _ = _write_scan(tmp_path, n_files=3, frames_per_file=4)
    src = ProjectionSource(d, delta_phi=1.0, prefetch=1)
    it = iter(src)
    next(it)                    # worker is now parked on a full queue
    it.close()                  # abandon (same path as a raised exception)
    deadline = time.monotonic() + 5.0
    while time.monotonic() < deadline:
        if not any(t.name == "his-prefetch" and t.is_alive()
                   for t in threading.enumerate()):
            break
        time.sleep(0.02)
    assert not any(t.name == "his-prefetch" and t.is_alive()
                   for t in threading.enumerate()), "prefetch thread leaked"
    # the source is reusable after abandonment
    assert len(list(src)) == 12

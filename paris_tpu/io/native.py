"""ctypes bindings for the native I/O library (native/paris_io.cpp).

Loads ``libparis_io.so`` if present (built by ``native/build.sh``) and
exposes fast HIS decode and threaded ddbvf block I/O.  Every entry point
answers ``available()`` so callers (io/his.py, io/ddbvf.py) can fall
back to the pure-Python implementations — behavior is identical either
way; the native path just decodes/writes without the GIL and in
parallel.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libparis_io.so"),
    os.path.join(os.path.dirname(__file__), "libparis_io.so"),
]

OK = 0
_ERRORS = {
    -1: "cannot open file",
    -2: "bad file format",
    -3: "truncated file",
    -4: "out of bounds",
    -5: "I/O error",
}


class _HisInfo(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int32),
        ("height", ctypes.c_int32),
        ("frames", ctypes.c_int32),
        ("number_type", ctypes.c_int32),
        ("image_header_size", ctypes.c_int32),
    ]


def _load() -> Optional[ctypes.CDLL]:
    env = os.environ.get("PARIS_IO_LIB")
    paths = ([env] if env else []) + _LIB_PATHS
    for p in paths:
        try:
            lib = ctypes.CDLL(os.path.abspath(p))
        except OSError:
            continue
        lib.paris_his_info.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(_HisInfo)]
        lib.paris_his_read.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_float),
                                       ctypes.c_int64]
        lib.paris_ddbvf_create.argtypes = [ctypes.c_char_p, ctypes.c_uint32,
                                           ctypes.c_uint32, ctypes.c_uint32]
        lib.paris_ddbvf_open.argtypes = [ctypes.c_char_p,
                                         ctypes.POINTER(ctypes.c_uint32)]
        lib.paris_ddbvf_write.argtypes = [ctypes.c_char_p,
                                          ctypes.POINTER(ctypes.c_float),
                                          ctypes.c_uint32, ctypes.c_uint32]
        lib.paris_ddbvf_read.argtypes = [ctypes.c_char_p,
                                         ctypes.POINTER(ctypes.c_float),
                                         ctypes.c_uint32, ctypes.c_uint32]
        fns = ["paris_his_info", "paris_his_read", "paris_ddbvf_create",
               "paris_ddbvf_open", "paris_ddbvf_write", "paris_ddbvf_read"]
        if hasattr(lib, "paris_quantize_u16"):   # absent in older builds
            lib.paris_quantize_u16.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_uint16),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int]
            fns.append("paris_quantize_u16")
        for fn in fns:
            getattr(lib, fn).restype = ctypes.c_int
        return lib
    return None


_lib = _load()


def available() -> bool:
    return _lib is not None and os.environ.get("PARIS_IO_NO_NATIVE") != "1"


class NativeIoError(OSError):
    def __init__(self, rc: int, path: str):
        super().__init__(f"{path}: {_ERRORS.get(rc, f'error {rc}')}")
        self.rc = rc


def his_read(path: str) -> np.ndarray:
    """Native HIS decode -> (frames, height, width) f32."""
    info = _HisInfo()
    rc = _lib.paris_his_info(path.encode(), ctypes.byref(info))
    if rc != OK:
        raise NativeIoError(rc, path)
    out = np.empty((info.frames, info.height, info.width), dtype=np.float32)
    rc = _lib.paris_his_read(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.size)
    if rc != OK:
        raise NativeIoError(rc, path)
    return out


def quantize_u16_available() -> bool:
    return available() and hasattr(_lib, "paris_quantize_u16")


def quantize_u16(chunk: np.ndarray, out: np.ndarray,
                 qparams: np.ndarray, n_threads: int = 0) -> None:
    """Per-frame affine-u16 quantization (fused native two-pass loop).

    ``chunk``: (n, V, H) f32 C-contiguous; ``out``: (>=n, V, H) u16;
    ``qparams``: (>=n, 2) f32 — rows [scale, lo] for the first n frames.
    ``n_threads``: 0 = one per hardware thread; callers running several
    quantize calls concurrently (``pipeline.stage_stream``'s worker
    pool) pass their per-call share to avoid oversubscription.
    """
    n = chunk.shape[0]
    rc = _lib.paris_quantize_u16(
        chunk.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, chunk.size // n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        qparams.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads)
    if rc != OK:
        raise NativeIoError(rc, "<quantize>")


def ddbvf_create(path: str, dim_x: int, dim_y: int, dim_z: int) -> None:
    rc = _lib.paris_ddbvf_create(path.encode(), dim_x, dim_y, dim_z)
    if rc != OK:
        raise NativeIoError(rc, path)


def ddbvf_open(path: str) -> Tuple[int, int, int]:
    dims = (ctypes.c_uint32 * 3)()
    rc = _lib.paris_ddbvf_open(path.encode(), dims)
    if rc != OK:
        raise NativeIoError(rc, path)
    return tuple(int(d) for d in dims)


def ddbvf_write(path: str, volume: np.ndarray, first: int) -> None:
    vol = np.ascontiguousarray(volume, dtype=np.float32)
    rc = _lib.paris_ddbvf_write(
        path.encode(), vol.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        vol.shape[0], first)
    if rc != OK:
        raise NativeIoError(rc, path)


def ddbvf_read(path: str, first: int, count: int) -> np.ndarray:
    dims = ddbvf_open(path)
    out = np.empty((count, dims[1], dims[0]), dtype=np.float32)
    rc = _lib.paris_ddbvf_read(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        first, count)
    if rc != OK:
        raise NativeIoError(rc, path)
    return out

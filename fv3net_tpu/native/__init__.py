"""Native (C++) runtime components, loaded via ctypes.

Currently: the threaded zarr chunk assembler (chunkio.cpp) used as the
production read path of fv3net_tpu.core.zarrio.  Compiled on first use
with g++ (cached as libchunkio.so next to the source); all callers fall
back to the pure-python path when the toolchain or library is
unavailable.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_HERE = os.path.dirname(__file__)
_SO_PATH = os.path.join(_HERE, "libchunkio.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    src = os.path.join(_HERE, "chunkio.cpp")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", _SO_PATH, src, "-lz", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The chunkio library, building it on first use; None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO_PATH) or (
            os.path.getmtime(_SO_PATH)
            < os.path.getmtime(os.path.join(_HERE, "chunkio.cpp"))
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.assemble_chunks.restype = ctypes.c_int
        lib.assemble_chunks.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),  # paths
            ctypes.c_int,  # n_chunks
            ctypes.POINTER(ctypes.c_int64),  # chunk_starts
            ctypes.POINTER(ctypes.c_int64),  # chunk_shape
            ctypes.POINTER(ctypes.c_int64),  # out_shape
            ctypes.c_int,  # ndim
            ctypes.c_int,  # compressed
            ctypes.c_double,  # fill_value
            ctypes.c_int,  # itemsize
            ctypes.c_int,  # is_float
            ctypes.c_char_p,  # out buffer
            ctypes.c_int,  # n_threads
        ]
        _lib = lib
        return _lib


def assemble_chunks(
    paths: Sequence[Optional[str]],
    chunk_starts: np.ndarray,  # [n_chunks, ndim] element offsets
    chunk_shape: Sequence[int],
    out_shape: Sequence[int],
    compressed: bool,
    fill_value: float,
    dtype: np.dtype,
    n_threads: int = 8,
) -> Optional[np.ndarray]:
    """Read + decompress + assemble chunks into one array using the
    native thread pool; None if the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    dtype = np.dtype(dtype)
    out = np.empty(tuple(out_shape), dtype)
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(
        *[p.encode() if p is not None else None for p in paths]
    )
    starts = np.ascontiguousarray(chunk_starts, np.int64)
    cshape = np.ascontiguousarray(chunk_shape, np.int64)
    oshape = np.ascontiguousarray(out_shape, np.int64)
    fv = fill_value
    if fv is None or (isinstance(fv, float) and np.isnan(fv)):
        fv = np.nan if np.issubdtype(dtype, np.floating) else 0.0
    rc = lib.assemble_chunks(
        c_paths,
        n,
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cshape.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        oshape.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(out_shape),
        int(compressed),
        float(fv),
        dtype.itemsize,
        int(np.issubdtype(dtype, np.floating)),
        out.ctypes.data_as(ctypes.c_char_p),
        n_threads,
    )
    if rc != 0:
        return None
    return out


def write_chunks(
    paths: Sequence[str],
    buffers: Sequence[np.ndarray],
    compress_level: int = 0,
    n_threads: int = 8,
) -> bool:
    """Deflate + write chunk files with the native thread pool (the
    parallel store path; atomic via tmp+rename).  False if the native
    library is unavailable or any chunk failed — callers fall back to
    the pure-python writer."""
    lib = get_lib()
    if lib is None:
        return False
    if not hasattr(lib, "_write_ready"):
        lib.write_chunks.restype = ctypes.c_int
        lib.write_chunks.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),  # paths
            ctypes.c_int,  # n_chunks
            ctypes.POINTER(ctypes.c_char_p),  # buffers
            ctypes.POINTER(ctypes.c_int64),  # nbytes
            ctypes.c_int,  # compress_level
            ctypes.c_int,  # n_threads
        ]
        lib._write_ready = True
    n = len(paths)
    arrs = [np.ascontiguousarray(b) for b in buffers]
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    # cast raw addresses (NOT .value, which would copy to the first NUL)
    c_bufs = (ctypes.c_char_p * n)()
    for i, a in enumerate(arrs):
        c_bufs[i] = ctypes.cast(a.ctypes.data, ctypes.c_char_p)
    nbytes = np.asarray([a.nbytes for a in arrs], np.int64)
    rc = lib.write_chunks(
        c_paths,
        n,
        c_bufs,
        nbytes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(compress_level),
        n_threads,
    )
    return rc == 0

"""Native (C++) runtime components, bound via ctypes.

The compute path of this framework is JAX/XLA/Pallas; the runtime around
it uses native code where the reference's runtime does. Currently:

* :class:`AsyncRasterWriter` — a C++ worker pool (output_writer.cpp) that
  writes ESRI .flt/.hdr rasters from a queue, overlapping hourly output
  IO with accelerator compute (the reference writes synchronously from
  its C++ app loop, criteria3DProject.cpp:1274-1283 / gisIO.cpp).

The library is compiled on first use with the in-tree g++ (build.sh);
when no compiler is available everything degrades to the synchronous
numpy writers in :mod:`criteria3d_tpu.io.esri`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["native_available", "AsyncRasterWriter"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libc3d_native.so")
_lib = None
_load_failed = False


def _sources_newer() -> bool:
    src = os.path.join(_DIR, "output_writer.cpp")
    return (not os.path.exists(_SO)
            or os.path.getmtime(src) > os.path.getmtime(_SO))


def _load():
    """Build (if needed) and load the native library; None on failure."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if _sources_newer():
            subprocess.run(["sh", os.path.join(_DIR, "build.sh")],
                           check=True, capture_output=True, timeout=120)
        lib = ctypes.CDLL(_SO)
        lib.c3d_writer_create.restype = ctypes.c_void_p
        lib.c3d_writer_create.argtypes = [ctypes.c_int]
        lib.c3d_writer_submit.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        lib.c3d_writer_flush.argtypes = [ctypes.c_void_p]
        lib.c3d_writer_written.restype = ctypes.c_long
        lib.c3d_writer_written.argtypes = [ctypes.c_void_p]
        lib.c3d_writer_errors.restype = ctypes.c_long
        lib.c3d_writer_errors.argtypes = [ctypes.c_void_p]
        lib.c3d_writer_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    except Exception:
        _load_failed = True
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def _header_text(header) -> str:
    return (f"ncols         {header.ncols}\n"
            f"nrows         {header.nrows}\n"
            f"xllcorner     {header.xllcorner}\n"
            f"yllcorner     {header.yllcorner}\n"
            f"cellsize      {header.cellsize}\n"
            f"NODATA_value  {header.nodata}\n"
            f"byteorder     LSBFIRST\n")


class AsyncRasterWriter:
    """Queue .flt/.hdr raster writes onto C++ worker threads.

    ``submit`` copies the buffer and returns immediately; ``flush`` blocks
    until the queue drains. Falls back to synchronous
    :func:`criteria3d_tpu.io.esri.write_flt` when the native library is
    unavailable, so callers never need to branch.
    """

    def __init__(self, n_threads: int = 2):
        self._lib = _load()
        self._handle = None
        if self._lib is not None:
            self._handle = ctypes.c_void_p(
                self._lib.c3d_writer_create(int(n_threads)))

    @property
    def is_native(self) -> bool:
        return self._handle is not None

    def submit(self, path: str, data: np.ndarray, header) -> None:
        base = path[:-4] if path.endswith((".flt", ".hdr")) else path
        arr = np.ascontiguousarray(np.asarray(data), dtype="<f4")
        if self._handle is None:
            from criteria3d_tpu.io.esri import write_flt
            write_flt(base, arr, header)
            return
        self._lib.c3d_writer_submit(
            self._handle, base.encode(), _header_text(header).encode(),
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            arr.size)

    def flush(self) -> None:
        if self._handle is not None:
            self._lib.c3d_writer_flush(self._handle)

    @property
    def written(self) -> int:
        if self._handle is None:
            return 0
        return int(self._lib.c3d_writer_written(self._handle))

    @property
    def errors(self) -> int:
        if self._handle is None:
            return 0
        return int(self._lib.c3d_writer_errors(self._handle))

    def close(self) -> None:
        if self._handle is not None:
            self._lib.c3d_writer_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
